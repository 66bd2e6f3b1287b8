"""Tanimoto-kernel GP for molecular fingerprints.

Rebuild of SOBER/_drug_modelling.py (batch_tanimoto_sim / BitKernel /
TanimotoKernel / TanimotoGP). The Tanimoto Gram is a single MXU matmul
(ops/kernels.py:tanimoto_gram); the GP is the standard Cholesky-cached
exact GP with the Tanimoto kernel plugged in.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.kernels import tanimoto_gram
from .exact import GPConfig, GPState, fit_gp


def batch_tanimoto_sim(x: jax.Array, y: jax.Array) -> jax.Array:
    """Bit-vector Tanimoto similarity <x,y>/(|x|^2+|y|^2-<x,y>)
    (SOBER/_drug_modelling.py:15-25)."""
    return tanimoto_gram({"outputscale": jnp.asarray(1.0, x.dtype)}, x, y)


def fit_tanimoto_gp(x: jax.Array, y: jax.Array,
                    noise_lo: float = 1e-8, noise_hi: float = 1e-2,
                    optimiser: str = "lbfgs", fit_iters: int = 100,
                    bucket: int = 128) -> GPState:
    """TanimotoGP (SOBER/_drug_modelling.py:103-113): ScaleKernel(Tanimoto)
    exact GP with standardized targets. Observations are bucket-padded so
    the screening loop reuses compiled programs as the pool is consumed."""
    from .exact import fit_gp_padded

    cfg = GPConfig(kernel_name="tanimoto", noise_lo=noise_lo,
                   noise_hi=noise_hi, train_lik=True, standardize_y=True,
                   use_priors=False, fit_iters=fit_iters)
    return fit_gp_padded(x, y, cfg, optimiser=optimiser, bucket=bucket)
