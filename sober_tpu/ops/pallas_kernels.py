"""Pallas TPU kernels for the hot Gram-matrix ops.

The dataset-domain hot loop is the Tanimoto Gram over 2048-bit molecular
fingerprints (SURVEY.md §3.5: n_nys x 133k strip per acquisition,
reference batch_tanimoto_sim SOBER/_drug_modelling.py:15-25). The Pallas
kernel:

  * runs the intersection counts as one fp32 MXU matmul per tile (this
    Mosaic toolchain rejects int8/bf16-operand tpu.matmul; fp32 is exact
    for 0/1 bits),
  * fuses the norm/denominator epilogue into the matmul tile, so the (n, m)
    intermediate never round-trips HBM,
  * tiles 256 x 256 output blocks with the full 2048-bit reduction axis in
    VMEM (256*2048 int8 = 512 KB per operand block).

A fused RBF Gram kernel (distance + exp epilogue in one tile) covers the
continuous-domain strips.

Measured on one v5e at solvent scale (512 x 131072 x 2048 bits), amortized
over chained evals to exclude the ~27 ms axon-tunnel round-trip (round-1's
"37.8 vs 34.5 ms" numbers were tunnel-dominated):

  * XLA fp32-highest pass:  9.1 ms/eval
  * this Pallas fp32 kernel: 9.2 ms/eval (ties XLA's fusion)
  * XLA single bf16 MXU pass with fp32 accumulation: 1.8 ms/eval — exact
    for 0/1 operands (every product is representable; counts < 2^24) and
    ~78% of the chip's peak bf16 throughput.

The bf16 single-pass is therefore the default tanimoto_gram path
(ops/kernels.py). Mosaic on this toolchain still rejects bf16/int8
tpu.matmul operands, so a Pallas kernel cannot express that schedule; these
fp32 kernels document the hand-tiled alternative and the upgrade path once
integer/bf16 MXU lands (bit-packed uint32 + in-tile unpack would then cut
HBM traffic another 32x, though at 1.8 ms the op is already compute-bound).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_rows(x: jax.Array, multiple: int) -> jax.Array:
    n = x.shape[0]
    pad = _cdiv(n, multiple) * multiple - n
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)


# ----------------------------------------------------------------------------
# Tanimoto Gram
# ----------------------------------------------------------------------------

def _tanimoto_kernel(x_ref, yt_ref, nx_ref, ny_ref, out_ref):
    # bf16 bits -> fp32 popcount-style intersection counts on the MXU
    inter = jnp.dot(x_ref[:], yt_ref[:],
                    preferred_element_type=jnp.float32)
    denom = nx_ref[:] + ny_ref[:] - inter
    out_ref[:] = inter / jnp.maximum(denom, 1e-20)


@partial(jax.jit, static_argnames=("tile_m", "tile_n", "interpret"))
def tanimoto_gram_pallas(x_bits: jax.Array, y_bits: jax.Array,
                         tile_m: int = 256, tile_n: int = 256,
                         interpret: bool | None = None) -> jax.Array:
    """T(x, y) = |x & y| / (|x| + |y| - |x & y|) for 0/1 fingerprints.

    x_bits: (n, d), y_bits: (m, d); any float/int dtype with 0/1 values.
    Returns (n, m) float32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, d = x_bits.shape
    m = y_bits.shape[0]
    x8 = _pad_rows(x_bits.astype(jnp.float32), tile_m)
    y8 = _pad_rows(y_bits.astype(jnp.float32), tile_n)
    np_, mp_ = x8.shape[0], y8.shape[0]
    y8t = y8.T                                             # (d, mp)
    nx = jnp.sum(x8, axis=1, keepdims=True)                # (np, 1)
    ny = jnp.sum(y8, axis=1).reshape(1, -1)                # (1, mp)

    grid = (np_ // tile_m, mp_ // tile_n)
    out = pl.pallas_call(
        _tanimoto_kernel,
        out_shape=jax.ShapeDtypeStruct((np_, mp_), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_m, d), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, tile_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * mp_ * d,
            bytes_accessed=np_ * d + mp_ * d + 4 * np_ * mp_,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x8, y8t, nx, ny)
    return out[:n, :m]


# ----------------------------------------------------------------------------
# fused RBF Gram (squared distance + exp epilogue in one tile)
# ----------------------------------------------------------------------------

def _rbf_kernel(x_ref, yt_ref, x2_ref, y2_ref, os_ref, out_ref):
    xy = jnp.dot(x_ref[:], yt_ref[:], preferred_element_type=jnp.float32)
    d2 = jnp.maximum(x2_ref[:] + y2_ref[:] - 2.0 * xy, 0.0)
    out_ref[:] = os_ref[0, 0] * jnp.exp(-0.5 * d2)


@partial(jax.jit, static_argnames=("tile_m", "tile_n", "interpret"))
def rbf_gram_pallas(params, x: jax.Array, y: jax.Array,
                    tile_m: int = 512, tile_n: int = 512,
                    interpret: bool | None = None) -> jax.Array:
    """outputscale * exp(-0.5 ||x/ls - y/ls||^2), fused in one Pallas pass.

    Feature dim is padded to the 128-lane boundary; rows to the tile size.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ls = params["lengthscale"]
    os_ = jnp.asarray(params["outputscale"], jnp.float32).reshape(1, 1)
    xs = (x / ls).astype(jnp.float32)
    ys = (y / ls).astype(jnp.float32)
    n, d = xs.shape
    m = ys.shape[0]
    d_pad = _cdiv(d, 128) * 128
    if d_pad != d:
        zx = jnp.zeros((n, d_pad - d), xs.dtype)
        zy = jnp.zeros((m, d_pad - d), ys.dtype)
        xs = jnp.concatenate([xs, zx], axis=1)
        ys = jnp.concatenate([ys, zy], axis=1)
    xs = _pad_rows(xs, tile_m)
    ys = _pad_rows(ys, tile_n)
    np_, mp_ = xs.shape[0], ys.shape[0]
    yst = ys.T                                             # (d_pad, mp)
    x2 = jnp.sum(xs * xs, axis=1, keepdims=True)
    y2 = jnp.sum(ys * ys, axis=1).reshape(1, -1)

    grid = (np_ // tile_m, mp_ // tile_n)
    out = pl.pallas_call(
        _rbf_kernel,
        out_shape=jax.ShapeDtypeStruct((np_, mp_), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_m, d_pad), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d_pad, tile_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * mp_ * d_pad,
            bytes_accessed=4 * (np_ * d_pad + mp_ * d_pad + np_ * mp_),
            transcendentals=np_ * mp_,
        ),
        interpret=interpret,
    )(xs, yst, x2, y2, os_)
    return out[:n, :m]
