"""Dataset-as-domain prior with consumable-pool semantics.

Rebuild of DatasetPrior (SOBER/_prior.py:540-655). The reference physically
shrinks its feature tensor after each query (reset_indices,
SOBER/_prior.py:560-570), which would force recompilation under XLA every
batch. Here the feature matrix stays static and availability is a boolean
mask: all downstream candidate math runs over the full (padded) matrix with
unavailable rows weighted zero.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .base import BasePrior


class DatasetPrior(BasePrior):
    type = "dataset"

    def __init__(self, features, true_targets):
        self.features = jnp.asarray(features, jnp.float32)
        self.true_targets = jnp.asarray(true_targets, jnp.float32).reshape(-1)
        self.n_total = self.features.shape[0]
        self.n_dims = self.features.shape[1]
        self.available = np.ones(self.n_total, dtype=bool)

    @property
    def n_available(self) -> int:
        return int(self.available.sum())

    def available_mask(self) -> jax.Array:
        return jnp.asarray(self.available)

    def available_candidates(self) -> jax.Array:
        """Full feature matrix; combine with available_mask(). The reference
        returns the physically shrunk matrix (SOBER/_prior.py:644-651)."""
        return self.features

    def remove_sampled_index(self, idx_sampled):
        idx = np.asarray(idx_sampled).reshape(-1)
        self.available[idx] = False

    def query(self, idx_cand):
        """Query targets at global indices and consume them
        (SOBER/_prior.py:597-610)."""
        idx = np.asarray(idx_cand).reshape(-1)
        y = self.true_targets[jnp.asarray(idx)]
        self.remove_sampled_index(idx)
        return y

    def sample(self, key, n: int):
        """Draw (X, Y) uniformly from the available pool and consume
        (SOBER/_prior.py:612-628)."""
        avail_idx = np.flatnonzero(self.available)
        perm = jax.random.permutation(key, avail_idx.shape[0])
        chosen = avail_idx[np.asarray(perm[:n])]
        x = self.features[jnp.asarray(chosen)]
        y = self.true_targets[jnp.asarray(chosen)]
        self.remove_sampled_index(chosen)
        return x, y

    def sample_feature(self, key, n: int):
        """(indices, X) without consuming (SOBER/_prior.py:630-642)."""
        avail_idx = np.flatnonzero(self.available)
        perm = jax.random.permutation(key, avail_idx.shape[0])
        chosen = avail_idx[np.asarray(perm[:n])]
        return jnp.asarray(chosen), self.features[jnp.asarray(chosen)]

    def pdf(self, x) -> jax.Array:
        n = x.shape[0]
        return jnp.full((n,), 1.0 / max(self.n_available, 1))
