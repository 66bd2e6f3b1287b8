"""Prior protocol.

Rebuild of BasePrior (SOBER/_prior.py:12-24). Priors are thin host-level
objects holding parameter pytrees; sampling/pdf math is jittable. All
randomness is explicit: `sample(key, n)`.

Every prior exposes:
  - sample(key, n) -> (n, d) array
  - pdf(x) -> (n,) densities        (jittable)
  - logpdf(x) -> (n,) log densities (jittable)
  - n_dims, type  (type in {"continuous", "binary", "categorical",
                   "mixedbinary", "mixedcategorical", "dataset"})
"""
from __future__ import annotations

import abc

import jax
import jax.numpy as jnp


class BasePrior(abc.ABC):
    type: str = "continuous"
    n_dims: int = 0

    @abc.abstractmethod
    def sample(self, key: jax.Array, n: int) -> jax.Array:
        ...

    @abc.abstractmethod
    def pdf(self, x: jax.Array) -> jax.Array:
        ...

    def logpdf(self, x: jax.Array) -> jax.Array:
        return jnp.log(jnp.maximum(self.pdf(x), 1e-38))
