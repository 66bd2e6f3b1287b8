"""Importance-weight stabilisation engine.

Functional, statically-shaped rebuild of WeightsStabiliser
(SOBER/_weights.py:4-97). The weight invariants established here (w >= 0,
sum w = 1, degenerate -> uniform) gate every downstream stage (sampler, WKDE,
recombination), so the cleansing semantics mirror the reference exactly,
including its ordering quirks:

  1. w < eps  -> 0        (catches negatives and -inf)
  2. +/-inf   -> eps      (only +inf survives step 1)
  3. NaN      -> eps
  4. normalize; all-zero -> uniform

Resampling without replacement is done with the Gumbel-top-k trick — a single
fixed-shape `lax.top_k` instead of torch.multinomial's sequential draw
(SOBER/_weights.py:57-77), which is both exact (same distribution) and
TPU-friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import settings

DEFAULT_THRESH = 5  # reference anomaly threshold (SOBER/_weights.py:8)


def cleansing_weights(weights: jax.Array, eps: float | None = None) -> jax.Array:
    """Scrub and normalize weights (SOBER/_weights.py:21-38)."""
    if eps is None:
        eps = settings().eps_weights
    w = jnp.where(weights < eps, 0.0, weights)          # negatives, small, -inf
    w = jnp.where(jnp.isinf(w), eps, w)                 # +inf
    w = jnp.where(jnp.isnan(w), eps, w)                 # NaN
    total = jnp.sum(w)
    n = w.shape[0]
    uniform = jnp.full_like(w, 1.0 / n)
    return jnp.where(total > 0, w / jnp.where(total > 0, total, 1.0), uniform)


def check_weights(weights: jax.Array, thresh: int = DEFAULT_THRESH) -> jax.Array:
    """True if weights are usable (SOBER/_weights.py:40-55).

    The reference tests `len(weights.unique()) < thresh`; here the unique
    count is computed with a sort + adjacent-difference count (static shape).
    """
    total_ok = jnp.sum(weights) != 0
    s = jnp.sort(weights)
    n_unique = 1 + jnp.sum(s[1:] != s[:-1])
    return jnp.logical_and(total_ok, n_unique >= thresh)


def weighted_resampling(key: jax.Array, weights: jax.Array, n: int) -> jax.Array:
    """Sample `n` indices without replacement proportional to `weights`.

    Gumbel-top-k is distributionally identical to sequential multinomial
    sampling without replacement (SOBER/_weights.py:57-77). Zero-weight
    entries only appear when fewer than `n` positive weights exist; they are
    then filled uniformly at random (reference fallback behavior,
    SOBER/_weights.py:72-76).
    """
    g = jax.random.gumbel(key, weights.shape, dtype=jnp.float32)
    logw = jnp.where(weights > 0, jnp.log(jnp.maximum(weights, 1e-38)), -jnp.inf)
    # Zero-weight entries: -1e30 base + gumbel tiebreak = uniform random fill
    score = jnp.where(weights > 0, logw + g, -1e30 + g)
    _, idx = jax.lax.top_k(score, n)
    return idx


def deweighted_resampling(key: jax.Array, weights: jax.Array, n: int) -> jax.Array:
    """Uniform-izing resampling: sample inversely to weights
    (SOBER/_weights.py:79-93)."""
    w_inv = cleansing_weights(1.0 / weights)
    return weighted_resampling(key, w_inv, n)
