"""Lloyd's KMeans as a fixed-iteration jitted loop.

TPU-native rebuild of the Nyström-point sparsifier in SOBER/_weights.py:95-125.
Distances use the matmul form (MXU), assignment/update use segment sums, and
the iteration count is static (`lax.fori_loop`), so the whole sparsification
compiles into one XLA program.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_clusters", "n_iter"))
def kmeans(x: jax.Array, n_clusters: int, n_iter: int = 10):
    """Returns (labels, centroids).

    Initialization matches the reference (first K points,
    SOBER/_weights.py:103); empty clusters keep their previous centroid
    instead of dividing by zero.
    """
    n, d = x.shape
    k = n_clusters

    def body(_, c):
        # E-step: nearest centroid via ||x||^2 - 2 x.c + ||c||^2
        d2 = (
            jnp.sum(x * x, axis=1, keepdims=True)
            - 2.0 * (x @ c.T)
            + jnp.sum(c * c, axis=1)[None, :]
        )
        labels = jnp.argmin(d2, axis=1)
        # M-step
        sums = jax.ops.segment_sum(x, labels, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones((n,), x.dtype), labels,
                                     num_segments=k)
        new_c = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where(counts[:, None] > 0, new_c, c)

    c = jax.lax.fori_loop(0, n_iter, body, x[:k])
    d2 = (
        jnp.sum(x * x, axis=1, keepdims=True)
        - 2.0 * (x @ c.T)
        + jnp.sum(c * c, axis=1)[None, :]
    )
    labels = jnp.argmin(d2, axis=1)
    return labels, c


def kmeans_resampling(x: jax.Array, n_clusters: int, n_iter: int = 10):
    """Sparsify a point cloud to centroids (SOBER/_weights.py:95-97)."""
    _, c = kmeans(x, n_clusters, n_iter)
    return c
