"""Discrete and mixed priors: Binary (Bernoulli), Categorical, and the
continuous+discrete product priors.

Rebuild of SOBER/_prior.py:186-538. The reference keeps one
torch.distributions object per dimension (ragged category counts,
SOBER/_prior.py:205-217); here categories are padded to a (d, C_max) table
with -inf logits on padding so sampling/pdf are single batched ops.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .base import BasePrior
from .continuous import Uniform


class BinaryPrior(BasePrior):
    """Independent Bernoulli prior (SOBER/_prior.py:289-336)."""

    type = "binary"

    def __init__(self, n_dims: int, probs=None):
        self.n_dims = n_dims
        self.probs = (jnp.full((n_dims,), 0.5)
                      if probs is None else jnp.asarray(probs, jnp.float32))

    def sample(self, key, n: int) -> jax.Array:
        u = jax.random.uniform(key, (n, self.n_dims))
        return (u < self.probs[None, :]).astype(jnp.float32)

    def logpdf(self, x) -> jax.Array:
        p = jnp.clip(self.probs, 1e-12, 1 - 1e-12)
        lp = x * jnp.log(p)[None, :] + (1 - x) * jnp.log1p(-p)[None, :]
        return jnp.sum(lp, axis=1)

    def pdf(self, x) -> jax.Array:
        return jnp.exp(self.logpdf(x))


class CategoricalPrior(BasePrior):
    """Independent categorical prior over per-dimension category values
    (SOBER/_prior.py:186-287).

    `categories` is a list of value lists (ragged); internally padded to
    (d, C_max). Weights are unnormalized per-category masses
    (reference initializes to 0.5 each, SOBER/_prior.py:210).
    """

    type = "categorical"

    def __init__(self, categories, weights=None):
        self.categories = categories
        self.n_dims = len(categories)
        self.n_categories = jnp.asarray([len(c) for c in categories],
                                        jnp.int32)
        cmax = max(len(c) for c in categories)
        self.c_max = cmax
        table = np.zeros((self.n_dims, cmax), np.float32)
        mask = np.zeros((self.n_dims, cmax), bool)
        for i, cats in enumerate(categories):
            table[i, : len(cats)] = np.asarray(cats, np.float32)
            mask[i, : len(cats)] = True
        self.value_table = jnp.asarray(table)
        self.valid_mask = jnp.asarray(mask)
        if weights is None:
            w = np.where(mask, 0.5, 0.0).astype(np.float32)
        else:
            w = np.zeros((self.n_dims, cmax), np.float32)
            for i, wi in enumerate(weights):
                w[i, : len(wi)] = np.asarray(wi, np.float32)
        self.weights = jnp.asarray(w)

    @property
    def probs(self) -> jax.Array:
        w = jnp.where(self.valid_mask, jnp.maximum(self.weights, 1e-12), 0.0)
        return w / jnp.sum(w, axis=1, keepdims=True)

    def _logits(self) -> jax.Array:
        return jnp.where(self.valid_mask, jnp.log(jnp.maximum(
            self.weights, 1e-12)), -jnp.inf)

    def sample_both(self, key, n: int):
        """Returns (values, indices) (SOBER/_prior.py:235-248)."""
        logits = self._logits()                      # (d, C)
        g = jax.random.gumbel(key, (n,) + logits.shape)
        idx = jnp.argmax(logits[None] + g, axis=-1)  # (n, d)
        vals = jnp.take_along_axis(
            self.value_table[None].repeat(n, 0), idx[..., None], axis=2
        )[..., 0]
        return vals.astype(jnp.float32), idx

    def sample(self, key, n: int) -> jax.Array:
        return self.sample_both(key, n)[0]

    def logpdf_indices(self, idx) -> jax.Array:
        """Log PMF given category indices (n, d)."""
        logp = jnp.log(self.probs)                  # (d, C)
        gathered = jnp.take_along_axis(
            logp[None].repeat(idx.shape[0], 0),
            idx[..., None].astype(jnp.int32), axis=2)[..., 0]
        return jnp.sum(gathered, axis=1)

    def _values_to_indices(self, x) -> jax.Array:
        # nearest-category lookup per dimension
        diff = jnp.abs(x[:, :, None] - self.value_table[None])  # (n, d, C)
        diff = jnp.where(self.valid_mask[None], diff, jnp.inf)
        return jnp.argmin(diff, axis=-1)

    def logpdf(self, x) -> jax.Array:
        return self.logpdf_indices(self._values_to_indices(x))

    def pdf(self, x) -> jax.Array:
        return jnp.exp(self.logpdf(x))


class _MixedPrior(BasePrior):
    """Shared machinery for continuous x discrete product priors
    (SOBER/_prior.py:338-538)."""

    def __init__(self, prior_cont, prior_disc, continuous_first: bool = True):
        self.prior_cont = prior_cont
        self.prior_disc = prior_disc
        self.continous_first = continuous_first  # reference spelling kept
        self.n_dims_cont = prior_cont.n_dims
        self.n_dims_disc = prior_disc.n_dims
        self.n_dims = self.n_dims_cont + self.n_dims_disc

    def separate_samples(self, x):
        nc = self.n_dims_cont
        nd = self.n_dims_disc
        if self.continous_first:
            return x[:, :nc], x[:, nc:]
        return x[:, nd:], x[:, :nd]

    def _join(self, x_cont, x_disc):
        if self.continous_first:
            return jnp.concatenate([x_cont, x_disc], axis=1)
        return jnp.concatenate([x_disc, x_cont], axis=1)

    def sample(self, key, n: int) -> jax.Array:
        k1, k2 = jax.random.split(key)
        return self._join(self.prior_cont.sample(k1, n),
                          self.prior_disc.sample(k2, n))

    def logpdf(self, x) -> jax.Array:
        x_cont, x_disc = self.separate_samples(x)
        return self.prior_cont.logpdf(x_cont) + self.prior_disc.logpdf(x_disc)

    def pdf(self, x) -> jax.Array:
        x_cont, x_disc = self.separate_samples(x)
        return self.prior_cont.pdf(x_cont) * self.prior_disc.pdf(x_disc)


class MixedBinaryPrior(_MixedPrior):
    """Uniform x Bernoulli product prior (SOBER/_prior.py:338-434)."""

    type = "mixedbinary"

    def __init__(self, n_dims_cont, n_dims_binary, bounds,
                 continous_first: bool = True, seed: int = 0):
        self.bounds = jnp.asarray(bounds, jnp.float32)
        self.n_dims_binary = n_dims_binary
        super().__init__(Uniform(bounds, seed=seed), BinaryPrior(n_dims_binary),
                         continous_first)
        # reference attribute name (SOBER/_prior.py:368)
        self.prior_binary = self.prior_disc


class MixedCategoricalPrior(_MixedPrior):
    """Uniform x Categorical product prior (SOBER/_prior.py:436-538)."""

    type = "mixedcategorical"

    def __init__(self, n_dims_cont, n_dims_disc, categories, bounds,
                 continous_first: bool = True, seed: int = 0):
        self.bounds = jnp.asarray(bounds, jnp.float32)
        self.categories = categories
        super().__init__(Uniform(bounds, seed=seed),
                         CategoricalPrior(categories), continous_first)

    def sample_both(self, key, n: int):
        """(values, values-with-indices) (SOBER/_prior.py:501-523)."""
        k1, k2 = jax.random.split(key)
        x_cont = self.prior_cont.sample(k1, n)
        vals, idx = self.prior_disc.sample_both(k2, n)
        joined_vals = self._join(x_cont, vals)
        joined_idx = self._join(x_cont, idx.astype(jnp.float32))
        return joined_vals, joined_idx

    def pdf_indices(self, x_with_idx) -> jax.Array:
        x_cont, idx = self.separate_samples(x_with_idx)
        return (self.prior_cont.pdf(x_cont)
                * jnp.exp(self.prior_disc.logpdf_indices(
                    idx.astype(jnp.int32))))
