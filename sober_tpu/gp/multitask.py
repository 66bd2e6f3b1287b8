"""Multi-output GP regression (inverse-model surrogate).

The reference uses botorch's KroneckerMultiTaskGP (ICM kernel) for the
observations -> parameters inverse surrogate
(SOBER/_inverse_modelling.py:159-172). The TPU-native rebuild models the T
outputs as independent GPs with shared inputs, fitted as ONE vmapped batched
MAP optimization (a batched Cholesky per step instead of T sequential
gpytorch fits); task correlations enter through the shared input geometry.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .exact import (
    GPConfig,
    GPParams,
    GPState,
    init_params,
    _fit_adam,
    build_state,
    predict,
)


class MultiTaskGPState(NamedTuple):
    states: GPState          # batched GPState (leading axis = task)
    n_tasks: int


def fit_multitask_gp(x: jax.Array, y: jax.Array,
                     cfg: GPConfig | None = None) -> MultiTaskGPState:
    """Fit T independent GPs on shared inputs in one vmapped pass.

    x: (n, d) inputs; y: (n, T) multi-output targets.
    """
    if cfg is None:
        cfg = GPConfig(ard=False, noise_lo=1e-6, noise_hi=1.0,
                       standardize_y=True, use_priors=False, fit_iters=100)
    n, t = y.shape

    def fit_one(y_col):
        if cfg.standardize_y:
            ys = (y_col - jnp.mean(y_col)) / jnp.maximum(
                jnp.std(y_col, ddof=1), 1e-12)
        else:
            ys = y_col
        params = _fit_adam(init_params(cfg, x.shape[1], x.dtype), x, ys, cfg)
        return build_state(params, x, y_col, cfg)

    states = jax.jit(jax.vmap(fit_one, in_axes=1))(y)
    return MultiTaskGPState(states, t)


def predict_multitask(mt: MultiTaskGPState, xq: jax.Array,
                      include_noise: bool = True):
    """Returns (mean (m, T), var (m, T)) on the raw output scale."""

    def one(state):
        mu, var = predict(state, xq, include_noise)
        return mu * state.y_std + state.y_mean, var * state.y_std**2

    mu, var = jax.vmap(one)(mt.states)
    return mu.T, var.T


def sample_multitask(mt: MultiTaskGPState, key: jax.Array, xq: jax.Array,
                     n_samples: int) -> jax.Array:
    """Draw (n_samples, m, T) from the independent-output posterior."""
    mu, var = predict_multitask(mt, xq)
    z = jax.random.normal(key, (n_samples,) + mu.shape)
    return mu[None] + jnp.sqrt(jnp.maximum(var, 0.0))[None] * z
