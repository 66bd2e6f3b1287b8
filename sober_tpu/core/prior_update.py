"""Prior updates: fit the proposal to the current importance weights.

Rebuild of SOBER/_prior_update.py. The reference runs 5x4 torch-LBFGS steps
with a sigmoid transform to maximize the weighted Bernoulli/categorical
likelihood (BernoulliMLE/CategoricalMLE, SOBER/_prior_update.py:33-229).
That objective has a CLOSED FORM optimum — the weighted empirical frequency —
so the TPU rebuild computes it directly (exact MLE, zero iterations) and
clamps probabilities away from {0,1} for continued exploration (the sigmoid
parameterization in the reference never reaches the boundary either).

Continuous dimensions are refit as a weighted KDE
(update_continuous_prior, SOBER/_prior_update.py:263-284).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..priors.discrete import (
    BinaryPrior,
    CategoricalPrior,
    MixedBinaryPrior,
    MixedCategoricalPrior,
)
from ..priors.wkde import WeightedKernelDensityEstimation

_P_CLAMP = 1e-3


def bernoulli_mle(weights: jax.Array, x_binary: jax.Array) -> jax.Array:
    """Weighted Bernoulli MLE: p_d = sum_i w_i x_id / sum_i w_i."""
    total = jnp.maximum(jnp.sum(weights), 1e-30)
    p = (weights @ x_binary) / total
    return jnp.clip(p, _P_CLAMP, 1.0 - _P_CLAMP)


def categorical_mle(weights: jax.Array, idx: jax.Array,
                    n_dims: int, c_max: int) -> jax.Array:
    """Weighted categorical MLE: per-dim weighted category frequencies.

    idx: (n, d) integer category indices. Returns (d, c_max) probabilities.
    """
    one_hot = jax.nn.one_hot(idx.astype(jnp.int32), c_max)      # (n, d, C)
    counts = jnp.einsum("n,ndc->dc", weights, one_hot)
    total = jnp.maximum(jnp.sum(counts, axis=1, keepdims=True), 1e-30)
    p = counts / total
    return jnp.clip(p, _P_CLAMP, 1.0)


def update_binary_prior(weights, x_binary, prior_binary: BinaryPrior
                        ) -> BinaryPrior:
    """(SOBER/_prior_update.py:231-245)"""
    return BinaryPrior(prior_binary.n_dims,
                       probs=bernoulli_mle(weights, x_binary))


def update_categorical_prior(weights, x_idx, prior: CategoricalPrior
                             ) -> CategoricalPrior:
    """x_idx are category INDICES (n, d) (SOBER/_prior_update.py:247-261)."""
    p = categorical_mle(weights, x_idx, prior.n_dims, prior.c_max)
    p = jnp.where(prior.valid_mask, p, 0.0)
    new = CategoricalPrior(prior.categories)
    new.weights = p
    return new


def update_continuous_prior(x_cand, weights, prior, n_dims: int,
                            key=None) -> WeightedKernelDensityEstimation:
    """Refit a WKDE proposal (SOBER/_prior_update.py:263-284)."""
    bounds = getattr(prior, "bounds", None)
    return WeightedKernelDensityEstimation(
        x_cand, weights, n_dims, bounds=bounds, key=key)


def update_mixed_prior(x_cand, weights, prior, label: str = "binary",
                       key=None):
    """Update both halves of a mixed prior (SOBER/_prior_update.py:286-313).

    For the categorical case, x_cand must carry category INDICES in the
    discrete block (the reference passes the indices variant too,
    SOBER/_sampler.py:290).
    """
    x_cont, x_disc = prior.separate_samples(x_cand)
    if label == "binary":
        prior.prior_disc = update_binary_prior(weights, x_disc,
                                               prior.prior_disc)
        prior.prior_binary = prior.prior_disc
    elif label == "categorical":
        prior.prior_disc = update_categorical_prior(
            weights, x_disc.astype(jnp.int32), prior.prior_disc)
    else:
        raise ValueError("label should be 'binary' or 'categorical'")
    prior.prior_cont = update_continuous_prior(
        x_cont, weights, prior.prior_cont, prior.n_dims_cont, key=key)
    return prior
