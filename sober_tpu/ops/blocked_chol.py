"""Blocked batched Cholesky inverse / quadform in pure JAX.

The FBGP hyperposterior sweep factorizes ~1000 independent (n, n)
covariances per refit, twice per theta (gp/fbgp.py:fitbo_mll_batch).
XLA's batched `jnp.linalg.cholesky` at n=128 runs its UNBLOCKED panel
routine — a ~n-step sequential loop of small batched rank-1 updates that
never touches the MXU (measured 14 ms per factorization plus 10-11 ms
per triangular solve at (1001, 128, 128); docs/PERF.md r5). A Pallas
rank-1 inverse-accumulation kernel was tried first and TIED rather than
beat it (20.6 ms, r5 exploration) — the unblocked algorithm itself is
VPU-bound regardless of who schedules it.

This module implements the BLOCKED right-looking factorization with the
inverse accumulated from elementary factors, so that per block of p
columns all O(B n^2 p) work is TWO batched MXU matmuls:

    A = L L^T,  L = E_0 E_1 ... E_{n-1},  E_j = I + (l_j - e_j) e_j^T
    E_j^-1     = I - coef_j e_j^T,  coef_j = (l_j - e_j) / l_jj
    L^-1       = E_{n-1}^-1 ... E_0^-1

  * panel: p sequential column steps touching only (B, n) vectors and a
    (B, n, p) slab (lazily corrected within the block),
  * trailing Schur update  S -= P P^T            (B,n,p)@(B,p,n) matmul,
  * inverse accumulation   V -= C V[block rows]  (B,n,p)@(B,p,n) matmul,
    where the block's composed inverse  E_{jb+p-1}^-1 ... E_jb^-1 =
    I - C . [e_jb..e_jb+p-1]^T  is built by a p-step recurrence on the
    (B, n, p) matrix C:  C += coef_k (unit_k - C[j_k, :])^T.

The OUTER block loop is a `lax.scan` (n/p iterations of one shared block
body): a fully unrolled version measured the same runtime but blew the
fused FBGP pipeline's XLA compile time past 15 minutes — the scan keeps
the program size independent of n. Only the p INNER panel steps are
unrolled at trace time. Block offsets are therefore traced values; every
slice at them is a `lax.dynamic_slice`, and per-column reads inside the
panel are one-hot contractions (O(B n) VPU work, negligible next to the
O(B n^2 p) matmuls). Total matmul work is 2 B n^3 per output
(independent of p); p trades MXU contraction depth (k = p per GEMM)
against O(B n p^2) panel work — p=16 measures best at the sweep's
(1001, 128, 128) shape.

Numerics match `jnp.linalg.cholesky` + `solve_triangular`: same
operation count per column, fp32 throughout; a non-PD instance hits
rsqrt(<=0) and propagates NaN/Inf through that instance only (the
sweep's isfinite guard maps it to EPS_LML). Matches the reference's
per-theta `torch.cholesky` loop semantics
(/root/reference/SOBER/FBGP/_fully_Bayesian_gp.py:179-203).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _round_up(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


def _pad_identity(a: jax.Array, n_pad: int) -> jax.Array:
    """Embed (B, n, n) into (B, n_pad, n_pad) as blockdiag(A, I): the
    padded block factors exactly (L = blockdiag(L_A, I)) and is sliced
    away, so padded columns are pure no-ops."""
    b, n, _ = a.shape
    if n_pad == n:
        return a
    out = jnp.zeros((b, n_pad, n_pad), a.dtype)
    out = out + jnp.eye(n_pad, dtype=a.dtype)[None]
    return out.at[:, :n, :n].set(a)


def _panel_factor(s: jax.Array, jb: jax.Array, p: int):
    """Factor columns jb..jb+p of the current Schur complement.

    s: (B, n, n) whose trailing block (rows/cols >= jb) is the live Schur
    complement (earlier rows/cols hold stale values that are never read).
    jb is a TRACED block offset (the caller scans over blocks).
    Returns (P, C, logd):
      P (B, n, p)    columns jb..jb+p of L (zero above the diagonal),
      C (B, n, p)    composed-inverse coefficients (see module docstring),
      logd (B, p)    log of the block's diagonal of L.
    """
    b, n, _ = s.shape
    rows = jnp.arange(n)
    t = lax.dynamic_slice_in_dim(s, jb, p, axis=2)  # (B, n, p) lazy slab
    cols, coefs, logs = [], [], []
    c_acc = jnp.zeros((b, n, p), s.dtype)
    for k in range(p):
        j = jb + k
        onehot = (rows == j).astype(s.dtype)        # (n,)
        c = t[:, :, k]                              # (B, n)
        dj = c @ onehot                             # c[:, j], j traced
        inv = lax.rsqrt(dj)                         # non-PD -> NaN propagates
        l = jnp.where(rows[None, :] >= j, c, 0.0) * inv[:, None]
        cols.append(l)
        logs.append(-jnp.log(inv))                  # log l_jj
        if k + 1 < p:
            # within-block lazy correction: remaining panel columns see
            # this column's rank-1 update
            l_blk = lax.dynamic_slice_in_dim(l, jb, p, axis=1)  # (B, p)
            t = t - l[:, :, None] * l_blk[:, None, :]
        # coef_j = l/l_jj strictly below j, (1 - 1/l_jj) at j
        coef = jnp.where(rows[None, :] > j, l * inv[:, None], 0.0)
        coef = coef + (1.0 - inv)[:, None] * onehot[None, :]
        # C <- C + coef (unit_k - C[j, :])^T
        row_c = jnp.einsum("bnp,n->bp", c_acc, onehot)          # C[:, j, :]
        unit = (jnp.arange(p) == k).astype(s.dtype)
        c_acc = c_acc + coef[:, :, None] * (unit[None, None, :]
                                            - row_c[:, None, :])
    panel = jnp.stack(cols, axis=-1)                # (B, n, p)
    logd = jnp.stack(logs, axis=-1)                 # (B, p)
    return panel, c_acc, logd


@functools.partial(jax.jit, static_argnames=("p",))
def cholesky_inverse_blocked(a: jax.Array, p: int = 16) -> jax.Array:
    """L^-1 for a batch of symmetric PSD matrices: a (B, n, n) with any
    jitter already applied -> (B, n, n) lower-triangular L^-1, A = L L^T."""
    b, n, _ = a.shape
    n_pad = _round_up(n, p)
    s0 = _pad_identity(a.astype(jnp.float32), n_pad)
    v0 = jnp.broadcast_to(jnp.eye(n_pad, dtype=jnp.float32),
                          (b, n_pad, n_pad))

    def block(carry, jb):
        s, v = carry
        panel, c_acc, _ = _panel_factor(s, jb, p)
        # trailing Schur update runs full-width every block (the final
        # block's is dead work, 1/(n/p) of total — cheaper than a cond)
        s = s - panel @ panel.transpose(0, 2, 1)
        v_blk = lax.dynamic_slice_in_dim(v, jb, p, axis=1)      # (B, p, n)
        v = v - c_acc @ v_blk
        return (s, v), None

    (_, v), _ = lax.scan(block, (s0, v0), jnp.arange(0, n_pad, p))
    out = v[:, :n, :n]
    # the accumulation writes exact zeros above the diagonal only in
    # exact arithmetic for the padded block; real lanes are already
    # strictly lower — mask to match solve_triangular's clean zeros
    return jnp.tril(out)


@functools.partial(jax.jit, static_argnames=("p",))
def cholesky_quadform_blocked(a: jax.Array, rhs: jax.Array, p: int = 16):
    """(L^-1 rhs, log diag L) for a batch of symmetric PSD matrices.

    a: (B, n, n) with jitter applied; rhs: (B, n). Returns w (B, n) with
    sum(w**2, -1) = rhs^T A^-1 rhs and ld (B, n) with
    2*sum(ld, -1) = logdet A. Same blocked factorization as
    cholesky_inverse_blocked, but the inverse is applied to ONE vector:
    w <- w - C w[block rows] per block (a (B,n,p)@(B,p) matvec)."""
    b, n, _ = a.shape
    n_pad = _round_up(n, p)
    s0 = _pad_identity(a.astype(jnp.float32), n_pad)
    w0 = jnp.zeros((b, n_pad), jnp.float32).at[:, :n].set(
        rhs.astype(jnp.float32))

    def block(carry, jb):
        s, w = carry
        panel, c_acc, logd = _panel_factor(s, jb, p)
        s = s - panel @ panel.transpose(0, 2, 1)
        w_blk = lax.dynamic_slice_in_dim(w, jb, p, axis=1)      # (B, p)
        w = w - jnp.einsum("bnp,bp->bn", c_acc, w_blk)
        return (s, w), logd

    (_, w), lds = lax.scan(block, (s0, w0), jnp.arange(0, n_pad, p))
    # lds: (n_pad/p, B, p) in block order -> (B, n_pad)
    ld = jnp.moveaxis(lds, 0, 1).reshape(b, n_pad)[:, :n]
    return w[:, :n], ld
