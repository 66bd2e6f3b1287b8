"""Numerics-safety linear algebra (TPU-native SafeTensorOperator equivalent).

Reimplements the behavior of SOBER/_utils.py:81-199 (NaN/Inf scrubbing, PSD
repair with escalating jitter, chunked batched MVN pdf) as pure jittable
functions with static shapes. Where the reference uses try/except around
torch.linalg.cholesky (SOBER/_utils.py:117-129), XLA has no exceptions, so
failure is detected by NaN in the factor and repaired inside a
`lax.while_loop` with an escalating diagonal jitter
(reference ladder: SOBER/_utils.py:131-157).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import settings


def remove_anomalies(y: jax.Array, floor: float | None = None) -> jax.Array:
    """Clamp NaN/Inf/very-negative observations (SOBER/_utils.py:88-99).

    The default floor is computed host-side (math, not jnp) so the
    function stays traceable inside jit (fbgp_refit's fused program)."""
    if floor is None:
        floor = -math.sqrt(float(np.finfo(np.float32).max))
    y = jnp.nan_to_num(y, nan=floor, posinf=floor, neginf=floor)
    return jnp.maximum(y, floor)


def remove_anomalies_uniform(x: jax.Array, uni_min: jax.Array,
                             uni_max: jax.Array) -> jax.Array:
    """Row mask of inputs inside the [uni_min, uni_max] box
    (SOBER/_utils.py:101-115)."""
    return jnp.logical_and(
        jnp.all(x >= uni_min[None, :], axis=1),
        jnp.all(x <= uni_max[None, :], axis=1),
    )


def symmetrize(a: jax.Array) -> jax.Array:
    return 0.5 * (a + a.T)


def jitter_cholesky(a: jax.Array, initial_jitter: float = 0.0,
                    max_tries: int | None = None,
                    floor_rel: float | None = None):
    """Cholesky with escalating diagonal jitter.

    Returns (L, jitter_used). If the factorization still fails after
    `max_tries` escalations, falls back to the diagonal matrix
    (reference fallback: SOBER/_utils.py:154-156).

    `floor_rel` is a relative jitter floor applied unconditionally: in fp32 a
    near-singular factorization often "succeeds" with garbage pivots instead
    of failing (e.g. noiseless-BQ kernels with noise 1e-10), so a floor of
    ~1e-6 x mean(diag) — gpytorch's fp32 cholesky_jitter policy — keeps
    posterior variances meaningful without changing anything representable
    at fp32 precision.
    """
    if max_tries is None:
        max_tries = settings().max_psd_iter
    a = symmetrize(jnp.nan_to_num(a))
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=a.dtype)
    if floor_rel is None:
        floor_rel = 1e-6 if a.dtype == jnp.float32 else 1e-12
    diag_scale = jnp.maximum(jnp.mean(jnp.abs(jnp.diagonal(a))), 1e-30)
    initial_jitter = jnp.maximum(
        jnp.asarray(initial_jitter, a.dtype), floor_rel * diag_scale)

    def find_jitter(a_const):
        """Non-differentiable jitter search (runs under stop_gradient so the
        escalation loop never appears on the autodiff tape)."""
        scale = jnp.maximum(jnp.mean(jnp.abs(jnp.diagonal(a_const))), 1e-30)
        base = jnp.asarray(initial_jitter, a_const.dtype)

        def ok_at(jit_val):
            L = jnp.linalg.cholesky(a_const + jit_val * eye)
            return jnp.all(jnp.isfinite(L))

        def cond(carry):
            i, _, ok = carry
            return jnp.logical_and(~ok, i < max_tries)

        def body(carry):
            i, jit_val, _ = carry
            new_jit = jnp.where(jit_val == 0.0, 1e-6 * scale, jit_val * 10.0)
            return i + 1, new_jit, ok_at(new_jit)

        _, jit_val, ok = lax.while_loop(cond, body, (0, base, ok_at(base)))
        return jit_val, ok

    jit_val, ok = jax.lax.stop_gradient(find_jitter(lax.stop_gradient(a)))
    # single differentiable factorization at the found jitter
    L = jnp.linalg.cholesky(a + jit_val * eye)
    # final fallback: diagonal-only covariance
    diag_L = jnp.sqrt(jnp.maximum(jnp.diagonal(a), 1e-30)) * eye
    L = jnp.where(ok, L, diag_L)
    return L, jit_val


def make_psd(a: jax.Array) -> jax.Array:
    """Return a PSD-repaired version of `a` (SOBER/_utils.py:131-157).

    The reference geometric-mean symmetrization sqrt(cov * cov.T) is replaced
    by the standard 0.5(A+Aᵀ) symmetrization plus the jitter that
    jitter_cholesky found necessary; this is cheaper, differentiable, and
    equivalent for the already-near-symmetric Gram matrices it is applied to.
    """
    a = symmetrize(jnp.nan_to_num(a))
    _, jit_val = jitter_cholesky(a)
    n = a.shape[-1]
    return a + jit_val * jnp.eye(n, dtype=a.dtype)


def solve_psd(a: jax.Array, b: jax.Array):
    """Solve a x = b for PSD a via jittered Cholesky."""
    L, _ = jitter_cholesky(a)
    return jax.scipy.linalg.cho_solve((L, True), b)


def mvn_logpdf(x: jax.Array, mean: jax.Array, chol: jax.Array) -> jax.Array:
    """Log N(x; mean, L Lᵀ) for batched x of shape (..., d)."""
    d = mean.shape[-1]
    diff = x - mean
    batch_shape = diff.shape[:-1]
    flat = diff.reshape(-1, d)
    w = jax.scipy.linalg.solve_triangular(chol, flat.T, lower=True)  # (d, N)
    maha = jnp.sum(w * w, axis=0).reshape(batch_shape)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
    return -0.5 * (maha + logdet + d * jnp.log(2.0 * jnp.pi))


def safe_mvn_prob(mean: jax.Array, cov: jax.Array, x: jax.Array) -> jax.Array:
    """Batched MVN pdf with PSD repair (SOBER/_utils.py:171-194).

    The reference chunks rows above gpu_lim=5e5 to bound GPU memory; under XLA
    the batched triangular solve is fused and streamed from HBM, so no
    host-level chunking is needed.
    """
    L, _ = jitter_cholesky(cov)
    return jnp.exp(mvn_logpdf(x, mean, L))
