"""Device-mesh helpers for multi-chip scaling.

The reference has no distributed backend at all (SURVEY.md §5.8); its only
concurrency is a CPU multiprocessing pool for objective evaluation. The
TPU-native scaling model:

  * "cand" axis — the candidate-pool dimension n_rec (the long axis of every
    Gram strip, pi sweep, and WKDE pdf). Sharded over ICI; XLA/GSPMD inserts
    the collectives at the barycenter reductions.
  * "hyper" axis — FBGP hypersample chains (embarrassingly parallel).

Shardings are expressed with jax.sharding.NamedSharding annotations on jit
inputs; the compute functions themselves stay single-program (GSPMD
auto-partitioning), which is the idiomatic JAX approach for this
elementwise + matmul dominated workload.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("cand",)) -> Mesh:
    """Build a 1-D (or factored) mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devs = np.asarray(devices[:n_devices])
    if len(axis_names) == 1:
        return Mesh(devs.reshape(n_devices), axis_names)
    # factor n_devices as evenly as possible over two axes
    a = int(np.floor(np.sqrt(n_devices)))
    while n_devices % a:
        a -= 1
    return Mesh(devs.reshape(a, n_devices // a), axis_names)


def shard_candidates(mesh: Mesh, x_cand: jax.Array,
                     axis: str = "cand") -> jax.Array:
    """Place a (n_rec, d) pool row-sharded over the mesh."""
    return jax.device_put(x_cand, NamedSharding(mesh, P(axis, None)))


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))
