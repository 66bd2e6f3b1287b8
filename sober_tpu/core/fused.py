"""Fused single-program acquisition: pi weighting + kernel recombination.

This is the jit boundary for the performance path: one XLA program takes a
fitted GPState and the candidate/Nystrom pools and returns the selected
batch indices and quadrature weights. The host-level Sober.next_batch
orchestrates prior updates around it; this function is what bench.py and the
multi-chip sharding layer drive.

There is no reference analogue — the reference pipeline crosses the
Python/torch boundary at every stage; fusing pi -> weights -> RCHQ into one
program is the core TPU-native speedup.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..gp.exact import GPState, predictive_covariance
from ..utils.weights import cleansing_weights
from .pi import lfi
from .rchq import recombination


@partial(jax.jit, static_argnames=("batch_size",))
def fused_acquisition(state: GPState, eta: jax.Array, x_cand: jax.Array,
                      x_nys: jax.Array, prior_pdf: jax.Array,
                      batch_size: int):
    """pi-importance weights + RCHQ in one XLA program.

    Args:
      state: fitted GP
      eta: incumbent (max posterior mean at observed inputs)
      x_cand: (n_rec, d) candidate pool
      x_nys: (n_nys, d) Nystrom subset
      prior_pdf: (n_rec,) proposal density at x_cand
      batch_size: number of points to select

    Returns (idx, w, weights): selected indices, quadrature weights, and the
    cleansed pool weights.
    """
    pi_vals = lfi(state, eta, x_cand)
    weights = cleansing_weights(pi_vals / jnp.maximum(prior_pdf, 1e-38))
    kernel = lambda x, y: predictive_covariance(state, x, y)
    idx, w = recombination(x_cand, x_nys, batch_size, kernel,
                           init_weights=weights)
    return idx, w, weights
