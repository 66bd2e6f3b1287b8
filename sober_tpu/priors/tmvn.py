"""Truncated multivariate normal sampling.

Rebuild of SOBER/_tmvn.py (Botev 2016 minimax-tilting sampler — a CPU-only
numpy/scipy implementation with scipy.optimize.root for the tilting
parameters and a Python accept-reject loop). The TPU-native sampler uses a
vectorized **Gibbs sweep** over coordinates: each conditional is a
univariate truncated normal sampled exactly by inverse-CDF, all chains
advance in parallel, and the whole chain is one `lax.scan` — statically
shaped, jittable, and embarrassingly parallel over samples.

Robustness upgrades over a naive Gibbs chain (matching the regimes where
the reference's tilting is exact-by-construction, SOBER/_tmvn.py:90-129):

  * burn-in scales with the chain's actual mixing speed: for a Gaussian
    target the Gibbs operator contracts at the spectral radius of the
    Gauss-Seidel iteration matrix of the precision, so burn_in is set to
    drive the initialization bias below 1e-3 (clamped to [30, 512]) instead
    of a fixed 30 sweeps that under-mixes at rho >= 0.9;
  * tail-flipped conditionals: each univariate truncated-normal draw is
    taken on whichever side of the mean keeps the CDF values far from 1, so
    deep tail boxes (z up to ~12) sample without fp32 quantization (a
    straight ndtri(Phi(a)+u*(Phi(b)-Phi(a))) collapses to ~6e-8 resolution
    near p=1).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.linalg import jitter_cholesky

_CLIP = 1e-30


def _phi(z):
    return jax.scipy.special.ndtr(z)


def _phinv(p):
    return jax.scipy.special.ndtri(jnp.clip(p, _CLIP, 1 - 1e-7))


def _sample_trunc_std_normal(alpha, beta, u):
    """Z ~ N(0,1) truncated to [alpha, beta], inverse-CDF with tail flip.

    When the box sits right of the mean, sample the mirrored variable
    -Z in [-beta, -alpha] where the CDF arguments are small and
    well-resolved in fp32, then negate.
    """
    flip = (alpha + beta) > 0.0
    a_eff = jnp.where(flip, -beta, alpha)
    b_eff = jnp.where(flip, -alpha, beta)
    pa = _phi(a_eff)
    pb = _phi(b_eff)
    z = _phinv(pa + (pb - pa) * u)
    # guard: exact-zero-width numerical boxes collapse to the boundary
    z = jnp.clip(z, a_eff, b_eff)
    return jnp.where(flip, -z, z)


class TruncatedMVN:
    """Sampler for N(mu, cov) restricted to the box [lb, ub]
    (SOBER/_tmvn.py:11 TruncatedMVN API: __init__(mu, cov, bounds),
    sample(n))."""

    def __init__(self, mu, cov, bounds, burn_in: int | None = None,
                 thin: int = 2):
        self.mu = jnp.asarray(mu, jnp.float32)
        self.cov = jnp.asarray(cov, jnp.float32)
        self.lb = jnp.asarray(bounds[0], jnp.float32)
        self.ub = jnp.asarray(bounds[1], jnp.float32)
        self.d = self.mu.shape[0]
        self.thin = thin
        # precision-based conditionals: X_i | X_-i ~ N(m_i, s_i^2) with
        # m_i = mu_i - (1/P_ii) sum_{j != i} P_ij (x_j - mu_j)
        chol, _ = jitter_cholesky(self.cov)
        eye = jnp.eye(self.d)
        cov_inv = jax.scipy.linalg.cho_solve((chol, True), eye)
        self.prec = cov_inv
        self.cond_sd = jnp.sqrt(1.0 / jnp.diagonal(cov_inv))
        self.burn_in = (self._auto_burn_in() if burn_in is None
                        else int(burn_in))

    def _auto_burn_in(self, target: float = 1e-3,
                      lo: int = 30, hi: int = 512) -> int:
        """Sweeps needed to contract the initialization bias below `target`.

        For a Gaussian target, systematic-scan Gibbs is exactly Gauss-Seidel
        on the precision matrix P = L + D + L^T: the error contracts per
        sweep at rho(M), M = -(L + D)^{-1} L^T. The truncated chain mixes at
        least as slow in the high-correlation regime, so this is the right
        scaling variable (host-side O(d^3), once per construction)."""
        p = np.asarray(self.prec, np.float64)
        d = p.shape[0]
        if d == 1:
            return lo
        lower = np.tril(p)          # L + D
        upper = np.triu(p, 1)       # L^T
        try:
            m = -np.linalg.solve(lower, upper)
            rho = float(np.max(np.abs(np.linalg.eigvals(m))))
        except np.linalg.LinAlgError:
            return hi
        if not np.isfinite(rho) or rho >= 1.0:
            return hi
        if rho <= 0.0:
            return lo
        need = int(np.ceil(np.log(target) / np.log(rho)))
        return int(np.clip(need, lo, hi))

    def _gibbs_sweep(self, x, u):
        """One full coordinate sweep for all chains. x: (n, d), u: (n, d)."""
        return _gibbs_sweep(x, u, self.mu, self.prec, self.cond_sd,
                            self.lb, self.ub)

    def sample(self, key, n_samples: int) -> jax.Array:
        """(n_samples, d) draws; one chain per sample, burn-in + thinning."""
        return tmvn_gibbs_sample(key, self.mu, self.prec, self.cond_sd,
                                 self.lb, self.ub, n_samples,
                                 self.burn_in + self.thin)


def _gibbs_sweep(x, u, mu, prec, cond_sd, lb, ub):
    """One full coordinate sweep for all chains — pure function so the
    fused candidate pipelines (core/fused_sampling.py) can trace the
    sampler with the distribution as program ARGUMENTS rather than baked
    constants."""
    d = mu.shape[0]

    def body(x, i):
        p_row = prec[i]
        # conditional mean (exclude own coordinate)
        delta = (x - mu[None, :]) @ p_row
        delta = delta - p_row[i] * (x[:, i] - mu[i])
        m = mu[i] - delta / prec[i, i]
        s = cond_sd[i]
        alpha = (lb[i] - m) / s
        beta = (ub[i] - m) / s
        z = _sample_trunc_std_normal(alpha, beta, u[:, i])
        return x.at[:, i].set(m + s * z), None

    x, _ = jax.lax.scan(body, x, jnp.arange(d))
    return x


def tmvn_gibbs_sample(key, mu, prec, cond_sd, lb, ub, n_samples: int,
                      n_sweeps: int) -> jax.Array:
    """(n_samples, d) Gibbs draws; one chain per sample (the pure body of
    TruncatedMVN.sample)."""
    x0 = jnp.clip(mu, lb, ub)
    x = jnp.broadcast_to(x0, (n_samples, mu.shape[0]))
    keys = jax.random.split(key, n_sweeps)

    def body(x, k):
        u = jax.random.uniform(k, (n_samples, mu.shape[0]))
        return _gibbs_sweep(x, u, mu, prec, cond_sd, lb, ub), None

    x, _ = jax.lax.scan(body, x, keys)
    return x
