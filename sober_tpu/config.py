"""Global configuration for sober-tpu.

The reference implementation (SOBER/_settings.py:3-22) keeps a mutable global
(device, dtype) singleton that every class reads at construction time. That
pattern is hostile to JAX's functional/jit model, so here configuration is an
immutable dataclass threaded explicitly, with a module-level *default* that can
be swapped once at program start (before tracing).

TPU-first dtype policy:
  - compute_dtype: dtype for the big Gram/matmul strips (fp32 by default;
    bf16 is available for the MXU-heavy candidate-axis work).
  - solve_dtype:   dtype for the small dense linear algebra (Cholesky, SVD,
    CAR elimination). fp32 on TPU; fp64 available for CPU parity testing.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Settings:
    compute_dtype: jnp.dtype = jnp.float32
    solve_dtype: jnp.dtype = jnp.float32
    # machine epsilon used for weight cleansing (reference: torch.finfo().eps
    # in SOBER/_weights.py:7)
    eps_weights: float = float(jnp.finfo(jnp.float32).eps)
    # cap on rows per chunk for batched MVN pdf evaluation
    # (reference: gpu_lim=5e5, SOBER/_utils.py:86)
    chunk_limit: int = 500_000
    # maximum PSD-repair jitter escalations (reference: SOBER/_utils.py:87)
    max_psd_iter: int = 10


_SETTINGS = Settings()


def settings() -> Settings:
    return _SETTINGS


def set_settings(
    compute_dtype: Optional[jnp.dtype] = None,
    solve_dtype: Optional[jnp.dtype] = None,
    **kwargs,
) -> Settings:
    """Replace the process-wide default settings (call before tracing).

    Mirrors the role of SOBER.setting_parameters (SOBER/_settings.py:11-22)
    without mutable per-class device state: JAX arrays carry their own
    placement, and sharding is explicit via ``sober_tpu.parallel``.
    """
    global _SETTINGS
    updates = dict(kwargs)
    if compute_dtype is not None:
        updates["compute_dtype"] = compute_dtype
    if solve_dtype is not None:
        updates["solve_dtype"] = solve_dtype
    _SETTINGS = dataclasses.replace(_SETTINGS, **updates)
    return _SETTINGS


def default_dtype() -> jnp.dtype:
    return _SETTINGS.compute_dtype
