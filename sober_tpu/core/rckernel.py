"""Recombination kernel adapters.

Rebuild of SOBER/_kernel.py: wraps a fitted GP into the k(x,y) callable that
RCHQ consumes — the posterior predictive covariance, its mean-weighted
variant (for non-negative targets), or the raw prior kernel.
"""
from __future__ import annotations

import jax

from ..gp.exact import GPState, predictive_covariance, predict_mean

MODES = ("predictive_covariance", "weighted_predictive_covariance", "kernel")


def _apply_predictive_covariance(model: GPState, x, y):
    return predictive_covariance(model, x, y)


def _apply_weighted_covariance(model: GPState, x, y):
    mu_x = predict_mean(model, x)
    mu_y = predict_mean(model, y)
    cov = predictive_covariance(model, x, y)
    return mu_x[:, None] * cov * mu_y[None, :]


def _apply_prior_kernel(model: GPState, x, y):
    return model.kernel.gram(x, y)


_APPLY = {
    "predictive_covariance": _apply_predictive_covariance,
    "weighted_predictive_covariance": _apply_weighted_covariance,
    "kernel": _apply_prior_kernel,
}


def resolve_rc(obj, fallback_to_closure: bool = False):
    """Resolve an rc stable-callable to its (apply, tree) pair.

    The single home of the protocol check (CLAUDE.md jit-cache-stability
    rules): protocol objects split into a module-level apply + a pytree so
    jitted programs are reused across refits. `fallback_to_closure=True`
    wraps a bare callable as `(lambda _, x: obj(x), None)` — jit-cache-
    UNSTABLE (recompiles per object identity), used by the mesh paths that
    accept ad-hoc objectives; callers that have a cheaper non-fused
    fallback should leave it False and branch on (None, None)."""
    if obj is None:
        return None, None
    if hasattr(obj, "rc_apply"):
        return obj.rc_apply, obj.rc_tree
    if fallback_to_closure:
        return (lambda _, x: obj(x)), None
    return None, None


class RecombinationKernel:
    """Callable Gram adapter (SOBER/_kernel.py:4-47).

    Exposes the stable-callable protocol (rc_apply: module-level function,
    rc_tree: the model pytree) so the jitted recombination program is reused
    across model refits instead of recompiling per fresh adapter object.
    """

    def __init__(self, model: GPState, mode: str = "predictive_covariance"):
        if mode not in MODES:
            raise ValueError(f"mode should be one of {MODES}")
        self.model = model
        self.mode = mode

    @property
    def rc_apply(self):
        return _APPLY[self.mode]

    @property
    def rc_tree(self):
        return self.model

    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        return self.rc_apply(self.model, x, y)
