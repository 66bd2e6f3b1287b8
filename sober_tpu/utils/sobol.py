"""Scrambled Sobol quasi-Monte-Carlo sampling, TPU-native.

The reference draws QMC samples with torch.quasirandom.SobolEngine
(SOBER/_utils.py:49-54). Here the (scrambled) direction numbers are prepared
once on the host (via scipy's Joe-Kuo table + LMS scramble + digital shift),
and point generation itself is a pure jittable JAX function using the
Gray-code direct formula:

    x_i = shift XOR ( XOR_{k : bit k of gray(i) set} v_k ),  gray(i)=i^(i>>1)

so candidate pools of any offset/length can be generated on-device inside the
acquisition step, with no host<->device transfer per iteration.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SobolState(NamedTuple):
    sv: jax.Array      # (d, bits) uint32 direction numbers (scrambled)
    shift: jax.Array   # (d,) uint32 digital shift
    bits: int          # static number of bits (30 for scipy's table)


def sobol_engine(n_dims: int, seed: int = 0, scramble: bool = True) -> SobolState:
    """Host-side setup: build (scrambled) direction numbers.

    Uses scipy's Joe-Kuo direction-number table when available; falls back to
    a pseudo-random full-rank lower-triangular generator matrix otherwise
    (still a valid (0, m, s)-net scramble basis, just not Sobol-optimal).
    """
    try:
        from scipy.stats import qmc

        eng = qmc.Sobol(n_dims, scramble=scramble, seed=seed)
        sv = np.asarray(eng._sv, dtype=np.uint32)
        shift = (
            np.asarray(eng._shift, dtype=np.uint32)
            if scramble
            else np.zeros(n_dims, dtype=np.uint32)
        )
        bits = int(eng.bits)
    except Exception:  # pragma: no cover - scipy is expected in this image
        bits = 30
        rng = np.random.default_rng(seed)
        sv = np.zeros((n_dims, bits), dtype=np.uint32)
        for k in range(bits):
            # identity bit + random lower bits: full-rank generator matrices
            base = np.uint32(1 << (bits - 1 - k))
            noise = rng.integers(0, 1 << max(bits - 1 - k, 1), size=n_dims)
            sv[:, k] = base | noise.astype(np.uint32)
        shift = (
            rng.integers(0, 1 << bits, size=n_dims).astype(np.uint32)
            if scramble
            else np.zeros(n_dims, dtype=np.uint32)
        )
    return SobolState(jnp.asarray(sv), jnp.asarray(shift), bits)


def sobol_sample(state: SobolState, start, n: int) -> jax.Array:
    """Generate points [start, start+n) of the sequence. Pure / jittable.

    Returns (n, d) float32 in [0, 1).
    """
    sv, shift, bits = state
    d = sv.shape[0]
    i = jnp.arange(n, dtype=jnp.uint32) + jnp.asarray(start, jnp.uint32)
    g = i ^ (i >> 1)  # Gray code

    def body(k, acc):
        bit = ((g >> k) & 1).astype(jnp.uint32)[:, None]       # (n, 1)
        return acc ^ (bit * sv[None, :, k])                     # (n, d)

    acc = jnp.broadcast_to(shift[None, :], (n, d)).astype(jnp.uint32)
    acc = jax.lax.fori_loop(0, bits, body, acc)
    return acc.astype(jnp.float32) * jnp.float32(2.0 ** (-bits))
