"""Weighted kernel density estimation — the learned continuous proposal.

Rebuild of WeightedKernelDensityEstimation (SOBER/_wkde.py:11-248). The WKDE
is refit every batch from the importance weights and becomes the continuous
prior for the next candidate pool.

TPU-native changes:
  * Fit, pdf, and sampling are module-level JITTED functions over array
    pytrees (the class is a thin holder), so the per-iteration WKDE refit
    and the 20k-candidate pdf sweeps reuse compiled programs across the
    whole BO loop.
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

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .base import BasePrior
from ..utils.linalg import jitter_cholesky, make_psd
from ..utils.weights import (
    cleansing_weights,
    check_weights,
    deweighted_resampling,
    weighted_resampling,
)


@partial(jax.jit, static_argnames=("n_kde", "bw_method", "n_dims"))
def _wkde_fit(key, x, w, n_kde: int, bw_method: str, n_dims: int):
    """Select components, bandwidth, and shared covariance; returns the
    WKDE parameter pytree."""
    # component selection (SOBER/_wkde.py:53-75): uniform-izing resample
    # when weights are rich, else the positive-weight support
    rich = check_weights(w, thresh=min(n_kde, 5))
    idx_rich = deweighted_resampling(key, w, n_kde)
    idx_poor = jnp.argsort(-(w > 0).astype(jnp.float32))[:n_kde]
    idx = jnp.where(rich, idx_rich, idx_poor)
    x_obs = x[idx]
    weights = cleansing_weights(w[idx])

    # Scott/Silverman bandwidth (SOBER/_wkde.py:86-94)
    neff = 1.0 / jnp.sum(weights**2)
    if bw_method == "scott":
        bw = neff ** (-1.0 / (n_dims + 4))
    else:
        bw = (neff * (n_dims + 2.0) / 4.0) ** (-1.0 / (n_dims + 4))

    # weighted covariance with bias correction (SOBER/_wkde.py:96-107)
    mean = weights @ x_obs
    resid = x_obs - mean[None, :]
    data_cov = (resid.T * weights[None, :]) @ resid
    data_cov = data_cov / jnp.maximum(1.0 - jnp.sum(weights**2), 1e-6)
    covariance = make_psd(data_cov * bw**2)
    chol, _ = jitter_cholesky(covariance)
    log_norm = (jnp.sum(jnp.log(jnp.diagonal(chol)))
                + 0.5 * n_dims * jnp.log(2.0 * jnp.pi))
    return dict(x_obs=x_obs, weights=weights, covariance=covariance,
                chol=chol, log_norm=log_norm, neff=neff, bw=bw)


@jax.jit
def _wkde_pdf(params, bounds, x):
    chol = params["chol"]
    z = jax.scipy.linalg.solve_triangular(chol, x.T, lower=True).T
    zo = jax.scipy.linalg.solve_triangular(chol, params["x_obs"].T,
                                           lower=True).T
    d2 = (jnp.sum(z * z, axis=1, keepdims=True) - 2.0 * z @ zo.T
          + jnp.sum(zo * zo, axis=1)[None, :])
    log_pdfs = -0.5 * jnp.maximum(d2, 0.0) - params["log_norm"]
    vals = jnp.exp(log_pdfs) @ params["weights"]
    if bounds is not None:
        inside = jnp.logical_and(
            jnp.all(x >= bounds[0][None, :], axis=1),
            jnp.all(x <= bounds[1][None, :], axis=1))
        vals = jnp.where(inside, vals, 0.0)
    return vals


@partial(jax.jit, static_argnames=("n", "n_rounds"))
def _wkde_sample(key, params, bounds, n: int, n_rounds: int):
    k_comp, k_noise = jax.random.split(key)
    logw = jnp.log(jnp.maximum(params["weights"], 1e-38))
    comp = jax.random.categorical(k_comp, logw, shape=(n,))
    centers = params["x_obs"][comp]
    chol = params["chol"]
    d = centers.shape[1]

    def draw(k):
        return centers + jax.random.normal(k, (n, d)) @ chol.T

    x = draw(k_noise)
    if bounds is None:
        return x
    lo, hi = bounds[0], bounds[1]

    def body(i, carry):
        x, key = carry
        key, sub = jax.random.split(key)
        fresh = draw(sub)
        bad = jnp.logical_or(jnp.any(x < lo[None, :], axis=1),
                             jnp.any(x > hi[None, :], axis=1))
        return jnp.where(bad[:, None], fresh, x), key

    x, _ = jax.lax.fori_loop(0, n_rounds, body, (x, k_noise))
    return jnp.clip(x, lo[None, :], hi[None, :])


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
        self._params = _wkde_fit(key, jnp.asarray(x),
                                 jnp.asarray(w).reshape(-1),
                                 self.n_kde, bw_method, n_dims)

    @classmethod
    def from_params(cls, params, n_dims: int, bounds, n_kde: int):
        """Wrap an on-device _wkde_fit params pytree without refitting —
        the fused pipelines (core/fused_sampling.py) return updated proposal
        params from inside the traced program and rebuild the host object
        with zero fetches. Single source of the attribute contract; keep in
        sync with __init__."""
        new = object.__new__(cls)
        new.n_dims = n_dims
        new.bounds = bounds
        new.n_kde = n_kde
        new._params = params
        return new

    # attribute views kept for parity with the reference object
    @property
    def x_obs(self):
        return self._params["x_obs"]

    @property
    def weights(self):
        return self._params["weights"]

    @property
    def covariance(self):
        return self._params["covariance"]

    @property
    def chol(self):
        return self._params["chol"]

    @property
    def neff(self):
        return self._params["neff"]

    @property
    def bw(self):
        return self._params["bw"]

    def pdf(self, x) -> jax.Array:
        return _wkde_pdf(self._params, self.bounds, x)

    def sample(self, key, n: int, n_rounds: int = 10) -> jax.Array:
        return _wkde_sample(key, self._params, self.bounds, n, n_rounds)
