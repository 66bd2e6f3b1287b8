"""Pallas TPU kernel for the Caratheodory elimination loop.

The recombination tree's inner loop (core/rchq.py:_caratheodory) runs
n_take sequential eliminations, each a handful of small vector ops plus a
rank-1 Householder deflation. Under XLA the loop costs ~6 us/iteration of
pure dispatch overhead (~1.2 ms per CAR, ~11 ms of the 65k/200 headline
across the tree's 9 rounds); the arithmetic itself is trivial
(O(m * q) ~ 80k FLOPs/iteration). This kernel keeps the whole state —
the transposed null basis (q, m), the weights, and the elimination mask —
resident in VMEM and runs the entire loop inside ONE kernel, removing the
per-iteration dispatch cost.

Semantics mirror core/rchq.py:_caratheodory's loop body exactly (see the
comments there for the algorithm): the only structural difference is the
in-place deflation — instead of dropping the basis's first column after
each Householder reflection (a q -> q-1 shape change XLA handles by
concatenation), the basis is stored TRANSPOSED (directions = rows) and
iteration t reflects only rows t.., retiring row t in place. Reflecting
rows >= t with a vector supported on rows >= t is algebraically identical
to the drop-first-column scheme.

Reference for the underlying algorithm: Tchernychova_Lyons_CAR,
SOBER/_rchq.py:224-270.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


def _car_kernel(n_take: int, m: int,
                mu_ref, nt_ref, mask_ref, mu_out, elim_out, nt_scr):
    """mu_ref/mask_ref: (1, m_pad); nt_ref: (q_pad, m_pad) transposed null
    basis (direction t = row t); outputs mu_out/elim_out (1, m_pad)."""
    q_pad, m_pad = nt_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, m_pad), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (q_pad, 1), 0)
    in_m = (lane < m)

    nt_scr[:] = nt_ref[:]
    mu_out[:] = mu_ref[:]
    elim_out[:] = jnp.zeros((1, m_pad), jnp.float32)

    def body(t, _):
        mu = mu_out[:]
        elim = elim_out[:]
        nt = nt_scr[:]
        phi = nt_scr[pl.ds(t, 1), :]                     # (1, m_pad)
        # strip fp32 deflation dust from eliminated rows (rchq.py comment)
        mu = mu * (1.0 - elim)
        active = jnp.logical_and(mu > 0, mask_ref[:] > 0)
        active = jnp.logical_and(active, elim < 0.5)
        active = jnp.logical_and(active, in_m)
        has_norm = jnp.sum(phi * phi) > 1e-10
        # sign-flip recovery: either sign of a null direction is valid
        pos = jnp.logical_and(phi > 0, active)
        phi = jnp.where(jnp.any(pos), phi, -phi)
        plis = jnp.logical_and(phi > 0, active)
        alpha = jnp.where(plis, mu / jnp.where(plis, phi, 1.0), jnp.inf)
        a_min = jnp.min(alpha)
        # first-argmin lane (matches jnp.argmin tie-breaking)
        idx = jnp.min(jnp.where(alpha == a_min, lane, m_pad))
        valid = jnp.logical_and(has_norm, jnp.any(plis))
        valid = jnp.logical_and(valid, jnp.isfinite(a_min))
        vf = valid.astype(jnp.float32)

        at_idx = (lane == idx)
        mu_new = jnp.maximum(mu - a_min * phi, 0.0)
        mu_new = jnp.where(at_idx, 0.0, mu_new)
        mu_out[:] = jnp.where(valid, mu_new, mu)
        elim_out[:] = jnp.where(jnp.logical_and(at_idx, valid), 1.0, elim)

        # Householder deflation restricted to rows >= t: rotate so row t
        # carries ALL of lane idx's remaining support, then retire row t
        live = (row >= t).astype(jnp.float32)            # (q_pad, 1)
        u = jnp.sum(jnp.where(at_idx, nt, 0.0), axis=1, keepdims=True)
        u = u * live                                      # (q_pad, 1)
        u_t = jnp.sum(jnp.where(row == t, u, 0.0))
        unorm = jnp.sqrt(jnp.sum(u * u))
        sign = jnp.where(u_t >= 0, 1.0, -1.0)
        v = u + jnp.where(row == t, sign * unorm, 0.0)
        vsq = jnp.maximum(jnp.sum(v * v), 1e-30)
        w_row = jnp.sum(v * nt, axis=0, keepdims=True)    # (1, m_pad)
        nt_scr[:] = nt - (vf * 2.0 / vsq) * (v * w_row)
        return 0

    jax.lax.fori_loop(0, n_take, body, 0)


@functools.partial(jax.jit, static_argnames=("n_take", "interpret"))
def car_eliminate_pallas(mu: jax.Array, big_n: jax.Array, row_mask: jax.Array,
                         n_take: int, interpret: bool = False):
    """Run the elimination loop in one pallas kernel.

    Args match the XLA loop in core/rchq.py:_caratheodory: mu (m,) weights,
    big_n (m, n_take) null-direction basis (column j = direction j, zeroed
    columns are no-ops), row_mask (m,). Returns (mu', elim) with identical
    semantics to the fori_loop (up to fp reassociation).
    """
    m = mu.shape[0]
    q = big_n.shape[1]
    m_pad = _round_up(max(m, 128), 128)
    q_pad = _round_up(max(q, 8), 8)

    mu_p = jnp.zeros((1, m_pad), jnp.float32).at[0, :m].set(mu)
    mask_p = jnp.zeros((1, m_pad), jnp.float32).at[0, :m].set(row_mask)
    nt_p = jnp.zeros((q_pad, m_pad), jnp.float32).at[:q, :m].set(big_n.T)

    kernel = functools.partial(_car_kernel, n_take, m)
    mu_out, elim_out = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, m_pad), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((q_pad, m_pad), jnp.float32)],
        interpret=interpret,
    )(mu_p, nt_p, mask_p)
    return mu_out[0, :m], elim_out[0, :m]
