"""Truncated multivariate normal sampling.

Rebuild of SOBER/_tmvn.py (Botev 2016 minimax-tilting sampler — a CPU-only
numpy/scipy implementation with scipy.optimize.root for the tilting
parameters and a Python accept-reject loop). The TPU-native sampler uses a
vectorized **Gibbs sweep** over coordinates: each conditional is a
univariate truncated normal sampled exactly by inverse-CDF, all chains
advance in parallel, and the whole chain is one `lax.scan` — statically
shaped, jittable, and embarrassingly parallel over samples. A short
burn-in from the box-projected mode gives effectively independent draws for
the low-dimensional (d <= ~20) settings SOBER uses.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.linalg import jitter_cholesky

_CLIP = 1e-7


def _phi(z):
    return jax.scipy.special.ndtr(z)


def _phinv(p):
    return jax.scipy.special.ndtri(jnp.clip(p, _CLIP, 1 - _CLIP))


class TruncatedMVN:
    """Sampler for N(mu, cov) restricted to the box [lb, ub]
    (SOBER/_tmvn.py:11 TruncatedMVN API: __init__(mu, cov, bounds),
    sample(n))."""

    def __init__(self, mu, cov, bounds, burn_in: int = 30, thin: int = 2):
        self.mu = jnp.asarray(mu, jnp.float32)
        self.cov = jnp.asarray(cov, jnp.float32)
        self.lb = jnp.asarray(bounds[0], jnp.float32)
        self.ub = jnp.asarray(bounds[1], jnp.float32)
        self.d = self.mu.shape[0]
        self.burn_in = burn_in
        self.thin = thin
        # precision-based conditionals: X_i | X_-i ~ N(m_i, s_i^2) with
        # m_i = mu_i - (1/P_ii) sum_{j != i} P_ij (x_j - mu_j)
        chol, _ = jitter_cholesky(self.cov)
        eye = jnp.eye(self.d)
        cov_inv = jax.scipy.linalg.cho_solve((chol, True), eye)
        self.prec = cov_inv
        self.cond_sd = jnp.sqrt(1.0 / jnp.diagonal(cov_inv))

    def _gibbs_sweep(self, x, u):
        """One full coordinate sweep for all chains. x: (n, d), u: (n, d)."""
        def body(x, i):
            p_row = self.prec[i]
            # conditional mean (exclude own coordinate)
            delta = (x - self.mu[None, :]) @ p_row
            delta = delta - p_row[i] * (x[:, i] - self.mu[i])
            m = self.mu[i] - delta / self.prec[i, i]
            s = self.cond_sd[i]
            a = _phi((self.lb[i] - m) / s)
            b = _phi((self.ub[i] - m) / s)
            z = _phinv(a + (b - a) * u[:, i])
            return x.at[:, i].set(m + s * z), None

        x, _ = jax.lax.scan(body, x, jnp.arange(self.d))
        return x

    def sample(self, key, n_samples: int) -> jax.Array:
        """(n_samples, d) draws; one chain per sample, burn-in + thinning."""
        x0 = jnp.clip(self.mu, self.lb, self.ub)
        x = jnp.broadcast_to(x0, (n_samples, self.d))
        n_sweeps = self.burn_in + self.thin
        keys = jax.random.split(key, n_sweeps)

        def body(x, k):
            u = jax.random.uniform(k, (n_samples, self.d))
            return self._gibbs_sweep(x, u), None

        x, _ = jax.lax.scan(body, x, keys)
        return x
