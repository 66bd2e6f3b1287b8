"""Weighted kernel density estimation — the learned continuous proposal.

Rebuild of WeightedKernelDensityEstimation (SOBER/_wkde.py:11-248). The WKDE
is refit every batch from the importance weights and becomes the continuous
prior for the next candidate pool.

TPU-native changes:
  * The component set has a static size (n_kde, padded with zero-weight
    components), so refits never change compiled shapes.
  * pdf() evaluates all n_x * n_kde Gaussians via one whitened squared-
    distance matmul on the MXU instead of the reference's (n_kde*n_x, d)
    reshape through a torch MVN (SOBER/_wkde.py:109-145).
  * sample() draws components categorically and redraws out-of-bounds rows
    for a fixed number of rounds (the reference's per-component Python loop
    with rejection, SOBER/_wkde.py:159-248, is ragged and host-bound).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .base import BasePrior
from ..utils.linalg import jitter_cholesky, make_psd
from ..utils.weights import (
    cleansing_weights,
    check_weights,
    deweighted_resampling,
)


class WeightedKernelDensityEstimation(BasePrior):
    type = "continuous"

    def __init__(self, x: jax.Array, w: jax.Array, n_dims: int,
                 bounds=None, n_kde: int = 4096, bw_method: str = "scott",
                 key: Optional[jax.Array] = None):
        self.n_dims = n_dims
        self.bounds = None if bounds is None else jnp.asarray(bounds,
                                                              jnp.float32)
        self.n_kde = min(n_kde, x.shape[0])
        if key is None:
            key = jax.random.key(0)

        w = jnp.asarray(w).reshape(-1)
        # component selection: uniform-izing resample when weights are rich,
        # else keep the positive-weight support (SOBER/_wkde.py:53-75)
        if bool(check_weights(w, thresh=min(self.n_kde, 5))):
            idx = deweighted_resampling(key, w, self.n_kde)
        else:
            order = jnp.argsort(-(w > 0).astype(jnp.float32))
            idx = order[: self.n_kde]
        self.x_obs = x[idx]                                   # (n_kde, d)
        self.weights = cleansing_weights(w[idx])              # (n_kde,)

        # Scott/Silverman bandwidth from effective sample size
        # (SOBER/_wkde.py:86-94)
        self.neff = 1.0 / jnp.sum(self.weights**2)
        if bw_method == "scott":
            self.bw = self.neff ** (-1.0 / (n_dims + 4))
        elif bw_method == "silverman":
            self.bw = (self.neff * (n_dims + 2.0) / 4.0) ** (
                -1.0 / (n_dims + 4))
        else:
            raise ValueError(bw_method)

        # weighted covariance with bias correction (SOBER/_wkde.py:96-107)
        mean = self.weights @ self.x_obs
        resid = self.x_obs - mean[None, :]
        data_cov = (resid.T * self.weights[None, :]) @ resid
        data_cov = data_cov / jnp.maximum(1.0 - jnp.sum(self.weights**2),
                                          1e-6)
        self.covariance = make_psd(data_cov * self.bw**2)
        self.chol, _ = jitter_cholesky(self.covariance)
        # log normalizer of one Gaussian component
        self._log_norm = (
            jnp.sum(jnp.log(jnp.diagonal(self.chol)))
            + 0.5 * n_dims * jnp.log(2.0 * jnp.pi)
        )

    def _whiten(self, x):
        return jax.scipy.linalg.solve_triangular(
            self.chol, x.T, lower=True).T

    def pdf(self, x) -> jax.Array:
        z = self._whiten(x)                      # (n, d)
        zo = self._whiten(self.x_obs)            # (n_kde, d)
        d2 = (
            jnp.sum(z * z, axis=1, keepdims=True)
            - 2.0 * z @ zo.T
            + jnp.sum(zo * zo, axis=1)[None, :]
        )
        log_pdfs = -0.5 * jnp.maximum(d2, 0.0) - self._log_norm
        vals = jnp.exp(log_pdfs) @ self.weights
        if self.bounds is not None:
            inside = jnp.logical_and(
                jnp.all(x >= self.bounds[0][None, :], axis=1),
                jnp.all(x <= self.bounds[1][None, :], axis=1),
            )
            vals = jnp.where(inside, vals, 0.0)
        return vals

    def sample(self, key, n: int, n_rounds: int = 10) -> jax.Array:
        k_comp, k_noise = jax.random.split(key)
        logw = jnp.log(jnp.maximum(self.weights, 1e-38))
        comp = jax.random.categorical(k_comp, logw, shape=(n,))
        centers = self.x_obs[comp]                            # (n, d)

        def draw(k):
            z = jax.random.normal(k, (n, self.n_dims))
            return centers + z @ self.chol.T

        x = draw(k_noise)
        if self.bounds is None:
            return x
        lo, hi = self.bounds[0], self.bounds[1]

        def body(i, carry):
            x, key = carry
            key, sub = jax.random.split(key)
            fresh = draw(sub)
            bad = jnp.logical_or(
                jnp.any(x < lo[None, :], axis=1),
                jnp.any(x > hi[None, :], axis=1),
            )
            return jnp.where(bad[:, None], fresh, x), key

        x, _ = jax.lax.fori_loop(0, n_rounds, body, (x, k_noise))
        return jnp.clip(x, lo[None, :], hi[None, :])
