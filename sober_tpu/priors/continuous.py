"""Continuous priors: Uniform (Sobol QMC), Gaussian, TruncatedGaussian.

Rebuild of SOBER/_prior.py:26-184. The Uniform prior draws scrambled-Sobol
QMC points on-device (reference: torch SobolEngine, SOBER/_utils.py:49-54)
and advances a sequence offset across calls instead of re-scrambling a fresh
engine per call — strictly better discrepancy for the candidate pools.

TruncatedGaussian uses exact-Cholesky rejection sampling with a QMC-estimated
normalization constant. The reference offloads to a CPU-only scipy
minimax-tilting sampler (SOBER/_tmvn.py) and Genz integration
(SOBER/mvnorm/); a Botev tilting sampler is the planned upgrade for very
low-acceptance regions (see priors/tmvn.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import BasePrior
from ..utils.linalg import jitter_cholesky, mvn_logpdf
from ..utils.sobol import sobol_engine, sobol_sample


class Uniform(BasePrior):
    """Uniform prior over a box (SOBER/_prior.py:26-88)."""

    type = "continuous"

    def __init__(self, bounds, seed: int = 0, qmc: bool = True):
        self.bounds = jnp.asarray(bounds, jnp.float32)   # (2, d)
        self.n_dims = self.bounds.shape[1]
        self.qmc = qmc
        self._sobol = sobol_engine(self.n_dims, seed=seed)
        self._offset = 0

    def sample(self, key, n: int) -> jax.Array:
        if self.qmc:
            u = sobol_sample(self._sobol, self._offset, n)
            self._offset += n
        else:
            u = jax.random.uniform(key, (n, self.n_dims))
        lo, hi = self.bounds[0], self.bounds[1]
        return lo[None, :] + (hi - lo)[None, :] * u

    def _in_bounds(self, x):
        lo, hi = self.bounds[0], self.bounds[1]
        # reference treats boundary-touching points as out of domain
        # (SOBER/_prior.py:67-70 uses >= / <=)
        return jnp.logical_and(
            jnp.all(x > lo[None, :], axis=1),
            jnp.all(x < hi[None, :], axis=1),
        )

    def pdf(self, x) -> jax.Array:
        lo, hi = self.bounds[0], self.bounds[1]
        dens = jnp.prod(1.0 / (hi - lo))
        return jnp.where(self._in_bounds(x), dens, 0.0)

    def logpdf(self, x) -> jax.Array:
        lo, hi = self.bounds[0], self.bounds[1]
        logdens = -jnp.sum(jnp.log(hi - lo))
        # reference multiplies logpdf by the indicator (SOBER/_prior.py:83-88)
        # which zeroes rather than -infs; we return a proper log density
        return jnp.where(self._in_bounds(x), logdens, -jnp.inf)


class Gaussian(BasePrior):
    """Multivariate normal prior (SOBER/_prior.py:90-131)."""

    type = "continuous"

    def __init__(self, mu, cov):
        self.mu = jnp.asarray(mu, jnp.float32)
        self.cov = jnp.asarray(cov, jnp.float32)
        self.n_dims = self.mu.shape[0]
        self.chol, _ = jitter_cholesky(self.cov)

    def sample(self, key, n: int) -> jax.Array:
        z = jax.random.normal(key, (n, self.n_dims))
        return self.mu[None, :] + z @ self.chol.T

    def logpdf(self, x) -> jax.Array:
        return mvn_logpdf(x, self.mu, self.chol)

    def pdf(self, x) -> jax.Array:
        return jnp.exp(self.logpdf(x))


class TruncatedGaussian(BasePrior):
    """Box-truncated multivariate normal (SOBER/_prior.py:133-184).

    Sampling: iterative rejection from the parent Gaussian for
    high-acceptance boxes; a vectorized Gibbs TMVN chain (priors/tmvn.py)
    when the box probability is small — the regime the reference's Botev
    minimax-tilting sampler targets (SOBER/_tmvn.py). The normalization
    constant P(lo < X < hi) is the Genz QMC box probability
    (priors/mvn_cdf.py), replacing the reference's scipy integration
    (SOBER/_prior.py:150-152).
    """

    type = "continuous"

    def __init__(self, mu, cov, bounds, n_rounds: int = 10,
                 gibbs_threshold: float = 0.05):
        from .mvn_cdf import mvn_box_prob
        from .tmvn import TruncatedMVN

        self.mu = jnp.asarray(mu, jnp.float32)
        self.cov = jnp.asarray(cov, jnp.float32)
        self.bounds = jnp.asarray(bounds, jnp.float32)
        self.n_dims = self.mu.shape[0]
        self.chol, _ = jitter_cholesky(self.cov)
        self.n_rounds = n_rounds
        self.constant = jnp.maximum(
            mvn_box_prob(self.bounds[0], self.bounds[1], self.mu, self.cov),
            1e-8)
        self.tmvn = TruncatedMVN(self.mu, self.cov, self.bounds)
        self._use_gibbs = bool(self.constant < gibbs_threshold)

    def _inside(self, x):
        return jnp.logical_and(
            jnp.all(x >= self.bounds[0][None, :], axis=1),
            jnp.all(x <= self.bounds[1][None, :], axis=1),
        )

    def sample(self, key, n: int) -> jax.Array:
        if self._use_gibbs:
            return self.tmvn.sample(key, n)
        return tgauss_reject_sample(key, self.mu, self.chol,
                                    self.bounds[0], self.bounds[1], n,
                                    self.n_rounds)

    def pdf(self, x) -> jax.Array:
        base = jnp.exp(mvn_logpdf(x, self.mu, self.chol)) / self.constant
        return jnp.where(self._inside(x), base, 0.0)


def tgauss_reject_sample(key, mu, chol, lb, ub, n: int,
                         n_rounds: int) -> jax.Array:
    """Iterative-rejection draws from a box-truncated Gaussian — the pure
    body of TruncatedGaussian.sample's high-acceptance branch, shared with
    the fused candidate pipelines (core/fused_sampling.py) so both paths
    stay key-split-for-key-split identical. Rows still outside after
    n_rounds are clipped (the reference warns and returns fewer samples,
    SOBER/_tmvn.py:113-119)."""
    d = mu.shape[0]

    def draw(k):
        z = jax.random.normal(k, (n, d))
        return mu[None, :] + z @ chol.T

    def inside(x):
        return jnp.logical_and(
            jnp.all(x >= lb[None, :], axis=1),
            jnp.all(x <= ub[None, :], axis=1))

    def body(i, carry):
        x, key = carry
        key, sub = jax.random.split(key)
        fresh = draw(sub)
        bad = ~inside(x)
        return jnp.where(bad[:, None], fresh, x), key

    key, sub = jax.random.split(key)
    x = draw(sub)
    x, _ = jax.lax.fori_loop(0, n_rounds, body, (x, key))
    return jnp.clip(x, lb[None, :], ub[None, :])
