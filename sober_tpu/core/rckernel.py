"""Recombination kernel adapters.

Rebuild of SOBER/_kernel.py: wraps a fitted GP into the k(x,y) callable that
RCHQ consumes — the posterior predictive covariance, its mean-weighted
variant (for non-negative targets), or the raw prior kernel.
"""
from __future__ import annotations

import jax

from ..gp.exact import GPState, predictive_covariance, predict_mean

MODES = ("predictive_covariance", "weighted_predictive_covariance", "kernel")


class RecombinationKernel:
    """Callable Gram adapter (SOBER/_kernel.py:4-47)."""

    def __init__(self, model: GPState, mode: str = "predictive_covariance"):
        if mode not in MODES:
            raise ValueError(f"mode should be one of {MODES}")
        self.model = model
        self.mode = mode

    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        if self.mode == "predictive_covariance":
            return predictive_covariance(self.model, x, y)
        if self.mode == "weighted_predictive_covariance":
            mu_x = predict_mean(self.model, x)
            mu_y = predict_mean(self.model, y)
            cov = predictive_covariance(self.model, x, y)
            return mu_x[:, None] * cov * mu_y[None, :]
        return self.model.kernel.gram(x, y)
