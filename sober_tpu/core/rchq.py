"""Kernel recombination (RCHQ) — the quadrature core of SOBER.

Statically-shaped, fully jittable rebuild of SOBER/_rchq.py (recombination /
ker_svd_sparsify / Mod_Tchernychova_Lyons / Tchernychova_Lyons_CAR).

Algorithm (Hayakawa et al., kernel quadrature via recombination): given N
weighted candidates and s-1 Nystrom test functions, find <= s points with
non-negative weights whose weighted empirical measure matches the candidate
measure's mean embedding on the test-function span.

TPU-first redesign vs the reference:

  * The test-function matrix Phi = U @ K(X_nys, X_cand) is formed ONCE as a
    single MXU matmul. The reference re-evaluates kernel(pt_nys, samp[idx])
    inside every halving round (SOBER/_rchq.py:124-156) — O(2N) kernel
    evaluations; here rounds only gather columns of the precomputed Phi.
  * The data-dependently shrinking index story (SOBER/_rchq.py:63-221)
    becomes a power-of-two slot tree: slots are padded with a dummy index
    (zero feature column, zero weight), every round reshapes E*M slots into
    M barycenter columns of E members, Caratheodory elimination keeps
    exactly n+1 columns, so the slot count halves on a fully static
    schedule. Dummy slots are mathematically inert: they carry zero weight
    and a zero "mass" coordinate, so Caratheodory eliminates them with
    alpha=0 no-ops (the same mechanism the reference uses for
    already-zeroed points).
  * Caratheodory elimination (SOBER/_rchq.py:224-270) runs a fixed number of
    rank-1 null-space updates under lax.fori_loop, with sign-flip recovery
    where the reference breaks out (SOBER/_rchq.py:240-242).
  * The acquisition-augmentation path (calc_obj: extra objective row +
    null-space push, SOBER/_rchq.py:79-105,138-196) is implemented as a
    static post-CAR step.

Invariants (tested): w >= 0, sum w = sum mu, and Phi @ (w scattered) equals
Phi @ mu to fp32 tolerance (moment matching).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils.linalg import symmetrize


class RecombinationResult(NamedTuple):
    idx: jax.Array      # (num_pts,) int32 indices into pts_rec
    w: jax.Array        # (num_pts,) non-negative quadrature weights
                        # (entries may be 0 when fewer support points needed)


def _use_pallas_car() -> bool:
    """Route the elimination loop to the pallas kernel on TPU backends.

    Static at trace time. The CPU backend (tests, virtual mesh) keeps the
    XLA fori_loop — Mosaic kernels don't lower to XLA:CPU, and shard_map
    tracing on the CPU mesh must stay kernel-free. Opt out on TPU with
    SOBER_TPU_PALLAS_CAR=0."""
    import os

    if os.environ.get("SOBER_TPU_PALLAS_CAR", "1") == "0":
        return False
    try:
        # strictly TPU: the kernel's pltpu.VMEM block specs only lower via
        # Mosaic — on CUDA/ROCm/METAL backends the XLA loop is the safe path
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def nystrom_basis(k_nys: jax.Array, n_test: int) -> jax.Array:
    """Top-n_test spectral test functions of the PSD Nystrom Gram.

    Small Grams get the exact eigh. Large ones (the bench shapes: n_nys
    512/500 with n_test ~ 100-200) use randomized subspace iteration with
    Rayleigh-Ritz (Halko-Martinsson-Tropp): eigh(512) costs ~10 ms on the
    v5e while four QR(512, n_test+32) passes + a small Rayleigh-Ritz eigh
    cost ~4 ms. Three power passes capture >= 99% of the exact top-n_test
    Rayleigh energy even on slowly-decaying posterior-covariance spectra
    (measured on the 65k/200 bench Gram: 0.957/0.981/0.990 for 1/2/3
    passes); the residual sub-1% sits in near-degenerate tail directions
    whose eigenvalue mass is what bounds the quadrature error, so swapping
    them for their captured neighbours changes the worst-case integration
    error by O(1%). Moment matching on the span actually used is exact by
    construction either way. Exact path can be forced with
    SOBER_TPU_EXACT_EIGH=1 — read at TRACE time, like SOBER_TPU_PALLAS_CAR:
    set it before the first recombination at a given shape, or
    jax.clear_caches() after flipping it (the jit cache key doesn't include
    env vars, so already-compiled programs keep their traced choice)."""
    import os

    n_nys = k_nys.shape[0]
    if (n_nys < 384 or n_test >= n_nys - 40
            or os.environ.get("SOBER_TPU_EXACT_EIGH", "0") == "1"):
        _, eigvecs = jnp.linalg.eigh(k_nys)                # ascending
        return eigvecs[:, -n_test:].T
    n_sub = min(n_test + 32, n_nys)
    # Probe key derived from the Gram content (bitcast-hashed sum folded into
    # a fixed base key): deterministic given the Gram, so jit caching and
    # reproducibility are unchanged, but no single fixed probe exists for an
    # adversarial Gram to be orthogonal to (a rank-k Gram whose column space
    # is exactly orthogonal to a FIXED probe makes k_nys @ omega vanish and
    # the subspace iteration unrecoverable).
    probe_seed = jax.lax.bitcast_convert_type(
        jnp.nan_to_num(jnp.sum(k_nys)).astype(jnp.float32), jnp.int32)
    probe_key = jax.random.fold_in(jax.random.key(17), probe_seed)
    omega = jax.random.normal(probe_key, (n_nys, n_sub), k_nys.dtype)
    q, _ = jnp.linalg.qr(k_nys @ omega)
    for _ in range(3):
        q, _ = jnp.linalg.qr(k_nys @ q)
    b = symmetrize(q.T @ (k_nys @ q))
    _, v = jnp.linalg.eigh(b)                              # ascending
    return (q @ v[:, -n_test:]).T


# ----------------------------------------------------------------------------
# Caratheodory elimination
# ----------------------------------------------------------------------------

def _caratheodory(x: jax.Array, mu: jax.Array, n_elim: int,
                  row_mask: jax.Array) -> jax.Array:
    """Eliminate `n_elim` points from the weighted configuration (x, mu).

    x: (M, p) rows = points in test-function space INCLUDING the mass/mask
       column; mu: (M,) non-negative weights; row_mask: (M,) 1.0 for real
       rows, 0.0 for padding rows. Returns updated mu with at least n_elim
       more zeros (barring degenerate skips), preserving x.T @ mu exactly in
       infinite precision.

    Reference: Tchernychova_Lyons_CAR, SOBER/_rchq.py:224-270. The reference
    never sees padding rows (its index story is compacted dynamically); here
    padding rows must not receive mass, so null directions are additionally
    constrained to vanish on them. The basis is built in two cheap stages —
    a complete-QR complement of the active constraint rows followed by a
    small eigh split on the complement's inactive-row Gram (see the inline
    comment below); directions with non-vanishing inactive-row amplitude
    (eigenvalue above the split cutoff) are zeroed rather than used.
    """
    m, p = x.shape
    active0 = jnp.logical_and(mu > 0, row_mask > 0).astype(x.dtype)
    # Null directions must satisfy (a) x_active^T phi = 0 and (b) phi_i = 0
    # off the active set. Computed in two cheap stages instead of one SVD of
    # the (m, p+m) indicator-augmented constraint matrix (that SVD was ~70%
    # of CAR wall-clock on TPU; complete QR of the raw (m, p) matrix is
    # nearly free):
    #   1. complete-QR complement: Q[:, p:] is an exact orthonormal basis of
    #      the complement of col(x_active) — every column satisfies (a) by
    #      construction (col(x_active) subset span(Q[:, :p]) even under rank
    #      deficiency, in which case m-p of the >m-p null directions are
    #      kept, still enough for n_elim = m-p eliminations);
    #   2. a small (m-p, m-p) eigh of the complement's inactive-row Gram
    #      splits it into the subspace vanishing on inactive rows
    #      (eigenvalue ~0, kept, most-null first) and directions violating
    #      (b) (eigenvalue = squared inactive-row amplitude, zeroed — the
    #      Householder deflation below provably never repopulates them).
    xm = x * active0[:, None]
    q_full, _ = jnp.linalg.qr(xm, mode="complete")          # (M, M)
    n0 = q_full[:, p:]                                      # (M, M-p)
    inact = 1.0 - active0
    n_take = min(n_elim, m - p)

    def split_basis(_):
        # stage 2 proper: eigh-split the complement's inactive-row Gram.
        d_gram = (n0 * inact[:, None]).T @ n0               # (M-p, M-p)
        lam, c_vecs = jnp.linalg.eigh(0.5 * (d_gram + d_gram.T))  # ascending
        big = n0 @ c_vecs[:, :n_take]                       # (M, n_take)
        # split threshold: d_gram's eigenvalues are squared inactive-row
        # amplitudes in [0, 1] (orthonormal columns, 0/1 mask). Genuinely
        # vanishing directions read ~1e-7 from fp32 QR/eigh noise, so the
        # cutoff must sit well above that — 1e-6 tolerates inactive
        # amplitudes up to 1e-3, whose elimination dust the elim/active
        # masks below strip. (An earlier 1e-8 cutoff sat below the noise
        # floor and silently discarded valid eliminations, breaking moment
        # matching.)
        return big * (lam[:n_take] <= 1e-6)[None, :].astype(big.dtype)

    def all_active_basis(_):
        # every row is active, so constraint (b) is vacuous and ANY
        # orthonormal complement columns are valid null directions
        return n0[:, :n_take]

    # In the halving tree the all-active case is the COMMON one (CAR keeps
    # exactly n_keep positive barycenters, so the next round's columns are
    # all positive-mass); the eigh there diagonalizes an exactly-zero Gram.
    # lax.cond skips that wasted eigh at runtime on every such round.
    big_n = jax.lax.cond(jnp.any(inact > 0.5), split_basis,
                         all_active_basis, None)

    def body(t, carry):
        mu, nmat, elim = carry
        phi = nmat[:, 0]
        # an explicit eliminated mask keeps fp32 deflation residue (~1e-8
        # leftover support on eliminated rows) from reviving dust weights
        # that would win the alpha argmin with alpha ~ 0 and waste the
        # elimination (the reference zeroes Phi rows for the same purpose,
        # SOBER/_rchq.py:266)
        mu = mu * (1.0 - elim)
        active = jnp.logical_and(mu > 0, row_mask > 0)
        active = jnp.logical_and(active, elim < 0.5)
        has_norm = jnp.sum(phi * phi) > 1e-10
        # sign-flip recovery: either sign of a null direction is valid
        # (the reference breaks out instead, SOBER/_rchq.py:240-242)
        pos = jnp.logical_and(phi > 0, active)
        phi = jnp.where(jnp.any(pos), phi, -phi)
        plis = jnp.logical_and(phi > 0, active)
        alpha = jnp.where(plis, mu / jnp.where(plis, phi, 1.0), jnp.inf)
        idx = jnp.argmin(alpha)
        a_min = alpha[idx]
        valid = jnp.logical_and(has_norm, jnp.any(plis))
        valid = jnp.logical_and(valid, jnp.isfinite(a_min))
        mu_new = jnp.maximum(mu - a_min * phi, 0.0)
        mu_new = mu_new.at[idx].set(0.0)
        mu = jnp.where(valid, mu_new, mu)
        elim = jnp.where(valid, elim.at[idx].set(1.0), elim)
        # Householder deflation: rotate the basis so column 0 carries ALL of
        # row idx's null-space support, then drop it — the remaining columns
        # stay an orthonormal null basis with exact zeros at every
        # eliminated coordinate. Unlike the reference's rank-1 updates
        # (SOBER/_rchq.py:260-266) there is no small-pivot division, so
        # fp32 error does not compound across eliminations.
        u = nmat[idx, :]
        unorm = jnp.sqrt(jnp.sum(u * u))
        sign = jnp.where(u[0] >= 0, 1.0, -1.0)
        v = u.at[0].add(sign * unorm)
        vsq = jnp.maximum(jnp.sum(v * v), 1e-30)
        rotated = nmat - (2.0 / vsq) * jnp.outer(nmat @ v, v)
        rotated = jnp.where(valid, rotated, nmat)
        nmat = jnp.concatenate(
            [rotated[:, 1:], jnp.zeros((m, 1), nmat.dtype)], axis=1)
        return mu, nmat, elim

    if _use_pallas_car():
        # one pallas kernel for the whole loop: the basis/weights stay
        # VMEM-resident, removing ~6 us/iteration of XLA dispatch overhead
        # (ops/pallas_car.py; semantics identical to the loop below)
        from ..ops.pallas_car import car_eliminate_pallas

        mu, elim = car_eliminate_pallas(mu, big_n, row_mask, n_take)
        return mu * (1.0 - elim) * active0

    # derive from mu (not a fresh constant) so the carry keeps mu's varying
    # manual axes when this runs inside a shard_map block
    elim0 = mu * 0.0
    mu, _, elim = jax.lax.fori_loop(0, n_take, body, (mu, big_n, elim0))
    # rows outside the initial measure can only hold fp32 deflation dust
    return mu * (1.0 - elim) * active0


def _null_space_push(feats: jax.Array, mass: jax.Array, obj: jax.Array,
                     w: jax.Array) -> jax.Array:
    """Zero one more weight by pushing along the null space, improving the
    acquisition objective (reference: SOBER/_rchq.py:87-105,177-196).

    feats: (n_feat, K) kept test-function values (without the obj row);
    mass: (K,) mass coordinates (1 real / 0 dummy); obj: (K,) objective
    values (reference convention: obj = -calc_obj, so pushing with
    dot(obj, w_null) >= 0 increases total acquisition); w: (K,) weights.
    """
    # most-null direction via the same two-stage construction as
    # _caratheodory (complete-QR complement of the feature+mass constraints,
    # then the minimal eigenvector of the complement's dummy-row Gram)
    # instead of a full SVD of the indicator-augmented matrix.
    xp = jnp.concatenate([feats, mass[None, :]], axis=0).T  # (K, p)
    p = xp.shape[1]
    q_full, _ = jnp.linalg.qr(xp, mode="complete")          # (K, K)
    n0 = q_full[:, p:]                                      # (K, K-p)
    inact = 1.0 - mass
    d_gram = (n0 * inact[:, None]).T @ n0
    lam, c_vecs = jnp.linalg.eigh(0.5 * (d_gram + d_gram.T))
    w_null = n0 @ c_vecs[:, 0]
    # absolute cutoff on the squared dummy-row amplitude (see _caratheodory)
    sig_ok = lam[0] <= 1e-6
    w_null = jnp.where(jnp.dot(obj, w_null) < 0, -w_null, w_null)
    plis = w_null > 0
    alpha = jnp.where(plis, w / jnp.where(plis, w_null, 1.0), jnp.inf)
    idx = jnp.argmin(alpha)
    valid = jnp.logical_and(jnp.any(plis), jnp.isfinite(alpha[idx]))
    valid = jnp.logical_and(valid, sig_ok)
    w_new = jnp.maximum(w - alpha[idx] * w_null, 0.0)
    w_new = w_new.at[idx].set(0.0)
    return jnp.where(valid, w_new, w)


# ----------------------------------------------------------------------------
# hierarchical reduction over the precomputed feature matrix
# ----------------------------------------------------------------------------

def _reduce_tree(phi_ext: jax.Array, obj_ext: Optional[jax.Array],
                 mu_ext: jax.Array, n_test: int, n_pool: int):
    """Run the halving tree.

    phi_ext: (n_test, n_pool+1) test-function features, dummy column last
             (index n_pool, all zeros).
    obj_ext: optional (n_pool+1,) objective row (already negated), dummy 0.
    mu_ext:  (n_pool+1,) weights, dummy 0.

    Returns (idx (n_test+1,), w (n_test+1,)): the surviving pool indices
    with their normalized weights, descending, zero-weight slots last
    (remapped to index 0). Returning the survivors directly avoids a
    pool-sized scatter + top_k per call.
    """
    use_obj = obj_ext is not None
    n_keep = n_test + 1                    # columns kept per round
    m = 2 * n_keep                         # barycenters per round
    # pad the slot count to m * 2^R
    n_rounds = max(0, math.ceil(math.log2(max(n_pool / m, 1.0))))
    e0 = 2 ** n_rounds
    s0 = e0 * m
    dummy = n_pool

    slots = jnp.concatenate([
        jnp.arange(n_pool, dtype=jnp.int32),
        jnp.full((s0 - n_pool,), dummy, dtype=jnp.int32),
    ])

    def run_car(bary_feats, bary_obj, mask, tot):
        """CAR (+ optional push) on M barycenters; returns kept weights per
        barycenter (exactly n_keep positive at most)."""
        rows = [bary_feats]
        if use_obj:
            rows.append(bary_obj[None, :])
        rows.append(mask[None, :])
        x_car = jnp.concatenate(rows, axis=0).T            # (m, p)
        p = x_car.shape[1]
        mu_out = _caratheodory(x_car, tot, m - p, mask)
        if use_obj:
            # null-space push restricted to the post-CAR support
            # (reference pushes on the kept columns, _rchq.py:177-196)
            support = (mu_out > 0).astype(x_car.dtype)
            mu_out = _null_space_push(bary_feats, support, bary_obj, mu_out)
        return mu_out

    e = e0
    for _ in range(n_rounds):
        cols = slots.reshape(e, m)                         # member (e) x bary (m)
        w_cols = mu_ext[cols]                              # (e, m)
        tot = jnp.sum(w_cols, axis=0)                      # (m,)
        safe_tot = jnp.maximum(tot, 1e-30)
        f = phi_ext[:, cols]                               # (n_test, e, m)
        bary = jnp.einsum("tem,em->tm", f, w_cols) / safe_tot
        mask = (tot > 0).astype(phi_ext.dtype)
        if use_obj:
            bary_obj = jnp.einsum("em,em->m", obj_ext[cols], w_cols) / safe_tot
        else:
            bary_obj = None
        mu_out = run_car(bary, bary_obj, mask, tot)

        w_kept, kept = jax.lax.top_k(mu_out, n_keep)       # (n_keep,)
        scale = jnp.where(tot[kept] > 0, w_kept / jnp.maximum(tot[kept], 1e-30), 0.0)
        kept_cols = cols[:, kept]                          # (e, n_keep)
        new_w = w_cols[:, kept] * scale[None, :]           # (e, n_keep)
        mu_ext = jnp.zeros_like(mu_ext).at[kept_cols.reshape(-1)].add(
            new_w.reshape(-1))
        mu_ext = mu_ext.at[dummy].set(0.0)
        # fp drift control: renormalize to the original mass (=1)
        total = jnp.sum(mu_ext)
        mu_ext = jnp.where(total > 0, mu_ext / jnp.where(total > 0, total, 1.0),
                           mu_ext)
        slots = kept_cols.reshape(-1)                      # (e * n_keep,) = s/2
        e = e // 2

    # final stage: <= m slots, CAR on raw points
    n_slots = slots.shape[0]
    if n_slots < m:
        slots = jnp.concatenate([
            slots, jnp.full((m - n_slots,), dummy, jnp.int32)])
    w_slots = mu_ext[slots]
    f = phi_ext[:, slots]                                  # (n_test, m)
    mask = (w_slots > 0).astype(phi_ext.dtype)
    bary_obj = obj_ext[slots] if use_obj else None
    mu_out = run_car(f, bary_obj, mask, w_slots)

    # return the survivors directly: every pool index occupies at most one
    # slot (initial slots are distinct, later rounds keep subsets), so the
    # scatter-back + pool-wide top_k the callers used to do is redundant —
    # only dummy slots repeat, and they carry zero weight by construction
    _, order = jax.lax.top_k(mu_out, m)                    # full descending
    slots_ord = slots[order]
    w_kept = mu_out[order[:n_keep]]
    idx_kept = slots_ord[:n_keep]
    w_kept = jnp.where(idx_kept == dummy, 0.0, w_kept)
    total = jnp.sum(w_kept)
    w_kept = jnp.where(total > 0,
                       w_kept / jnp.where(total > 0, total, 1.0), w_kept)
    # Dummy survivors (possible only when fewer than n_keep support points
    # are needed) carry zero weight; give them DISTINCT pool indices so
    # callers that consume indices (dataset removal) never double-process a
    # row: backfill from the non-kept non-dummy slots — disjoint from the
    # kept ones since non-dummy slot entries are all distinct. If even
    # those run out (pool smaller than the batch), the leftovers repeat
    # the highest-weight index with weight 0.
    is_dummy = idx_kept == dummy
    repl = slots_ord[n_keep:]                              # (m - n_keep,)
    repl_valid = repl != dummy
    n_repl = m - n_keep
    compact = jnp.zeros((max(n_repl, 1),), slots.dtype).at[
        jnp.where(repl_valid, jnp.cumsum(repl_valid) - 1, n_repl)
    ].set(repl, mode="drop")
    n_valid = jnp.sum(repl_valid)
    rank = jnp.cumsum(is_dummy) - 1                        # (n_keep,)
    last_resort = jnp.where(idx_kept[0] == dummy, 0, idx_kept[0])
    fallback = jnp.where(rank < n_valid,
                         compact[jnp.minimum(rank, n_repl - 1)],
                         last_resort)
    idx_kept = jnp.where(is_dummy, fallback, idx_kept).astype(jnp.int32)
    return idx_kept, w_kept


def local_reduce(phi: jax.Array, mu: jax.Array, num_pts: int,
                 obj: Optional[jax.Array] = None) -> RecombinationResult:
    """Reduce one (n_test, blk) feature strip with (unnormalized) weights mu
    to <= num_pts support points, PRESERVING the strip's total mass and its
    feature moments: sum w = sum mu and phi @ scatter(w) ~= phi @ mu.

    This is the per-shard building block of the distributed recombination
    (parallel/sharded.py:sharded_recombination): recombination distributes
    over a partition of the measure, so each device reduces its own shard
    and only the <= num_pts survivors are communicated. phi must already
    carry any global normalization (extra pinned-integrand rows included —
    they are just rows of phi here).

    `obj` is an optional (blk,) ALREADY-NEGATED acquisition row (the
    reference convention obj = -calc_obj, SOBER/_rchq.py:69): it rides the
    halving tree as an extra constraint row and spends the final degree of
    freedom on a null-space push, mirroring the single-device augmented
    path (see _reduce_tree / _null_space_push)."""
    n_rows, blk = phi.shape
    if num_pts != n_rows + 1:
        raise ValueError("num_pts must equal n_test + 1")
    mass = jnp.sum(mu)
    safe = jnp.where(mass > 0, mass, 1.0)
    mu_n = jnp.where(mass > 0, mu / safe, mu)
    phi_ext = jnp.concatenate(
        [phi, jnp.zeros((n_rows, 1), phi.dtype)], axis=1)
    mu_ext = jnp.concatenate([mu_n, jnp.zeros((1,), mu.dtype)])
    obj_ext = (None if obj is None
               else jnp.concatenate([obj, jnp.zeros((1,), obj.dtype)]))
    idx, w = _reduce_tree(phi_ext, obj_ext, mu_ext, n_rows, blk)
    return RecombinationResult(idx, w * mass)


# ----------------------------------------------------------------------------
# public API
# ----------------------------------------------------------------------------

@partial(jax.jit,
         static_argnames=("num_pts", "kernel_apply", "calc_obj_apply"))
def _recombination_core(pts_rec, pts_nys, kernel_tree, init_weights,
                        extra_test_rows, obj_tree, num_pts: int,
                        kernel_apply, calc_obj_apply):
    kernel = lambda x, y: kernel_apply(kernel_tree, x, y)
    calc_obj = (None if calc_obj_apply is None
                else (lambda x: calc_obj_apply(obj_tree, x)))
    return _recombination_impl(pts_rec, pts_nys, num_pts, kernel,
                               init_weights, calc_obj, extra_test_rows)


def recombination(pts_rec: jax.Array, pts_nys: jax.Array, num_pts: int,
                  kernel: Callable, init_weights: Optional[jax.Array] = None,
                  calc_obj: Optional[Callable] = None,
                  extra_test_rows: Optional[jax.Array] = None
                  ) -> RecombinationResult:
    """Public entry. `kernel` (and `calc_obj`) may either be plain callables
    (closed over their parameters — re-jitted whenever the closure object
    changes) or expose the stable-callable protocol `rc_apply`/`rc_tree`
    (a module-level apply function + a parameter pytree), in which case the
    compiled program is reused across model refits — essential for the BO
    loop, which builds a fresh kernel adapter every iteration."""
    from .rckernel import resolve_rc

    k_apply, k_tree = resolve_rc(kernel)
    o_apply, o_tree = resolve_rc(calc_obj)

    if k_apply is not None and (calc_obj is None or o_apply is not None):
        return _recombination_core(pts_rec, pts_nys, k_tree, init_weights,
                                   extra_test_rows, o_tree, num_pts,
                                   k_apply, o_apply)
    return _recombination_closure(pts_rec, pts_nys, num_pts, kernel,
                                  init_weights, calc_obj, extra_test_rows)


@partial(jax.jit, static_argnames=("num_pts", "kernel", "calc_obj"))
def _recombination_closure(pts_rec, pts_nys, num_pts: int, kernel,
                           init_weights, calc_obj, extra_test_rows):
    return _recombination_impl(pts_rec, pts_nys, num_pts, kernel,
                               init_weights, calc_obj, extra_test_rows)


def _recombination_impl(pts_rec: jax.Array, pts_nys: jax.Array, num_pts: int,
                        kernel: Callable,
                        init_weights: Optional[jax.Array] = None,
                        calc_obj: Optional[Callable] = None,
                        extra_test_rows: Optional[jax.Array] = None
                        ) -> RecombinationResult:
    """Sparsify a weighted candidate pool to `num_pts` quadrature points.

    Args (reference signature: SOBER/_rchq.py:5-31, minus device/dtype which
    JAX arrays carry):
      pts_rec:  (N, d) candidate pool (the empirical measure support)
      pts_nys:  (n_nys, d) Nystrom subset for the spectral test functions
      num_pts:  batch size s; at most s points get positive weight
      kernel:   callable (X, Y) -> PSD Gram matrix
      init_weights: optional (N,) importance weights (default uniform)
      calc_obj: optional callable X -> (N,) acquisition values to be
                maximized subject to the quadrature constraints
      extra_test_rows: optional (k, N) function values on the pool to be
                matched EXACTLY alongside the Nystrom eigenfunctions (k
                eigenfunction slots are given up for them). Use this to pin
                the quadrature to a known integrand (e.g. the BQ posterior
                mean), which keeps evidence estimates exact even when the
                posterior-covariance kernel is numerically degenerate. No
                reference analogue — the reference relies on kernel
                informativeness alone (SOBER/BASQ/_basq.py:59-71).

    Returns RecombinationResult(idx (s,), w (s,)): some trailing weights may
    be zero (the reference returns a variable-length list instead).
    """
    n_pool = pts_rec.shape[0]
    n_extra = 0 if extra_test_rows is None else extra_test_rows.shape[0]
    n_test = num_pts - 1 - n_extra
    if n_test < 1:
        raise ValueError("num_pts too small for the extra test rows")
    if pts_nys.shape[0] < num_pts:
        raise ValueError(
            f"n_nys={pts_nys.shape[0]} must be >= num_pts={num_pts}")
    if init_weights is not None and init_weights.shape[0] != n_pool:
        raise ValueError(
            f"init_weights has {init_weights.shape[0]} entries but pts_rec "
            f"has {n_pool} rows")

    # Nystrom spectral basis (reference: ker_svd_sparsify, _rchq.py:34-39).
    # The reference PSD-repairs the Gram before its SVD; adding jitter*I only
    # shifts eigenvalues and leaves the eigenvectors (= the basis) unchanged,
    # so the jitter search is skipped — symmetrize + NaN-scrub suffices.
    k_nys = symmetrize(jnp.nan_to_num(kernel(pts_nys, pts_nys)))
    u = nystrom_basis(k_nys, n_test)                       # (n_test, n_nys)

    # the one big MXU matmul: test functions over the whole pool
    phi = u @ kernel(pts_nys, pts_rec)                     # (n_test, N)
    # global normalization: moment matching is scale-invariant in exact
    # arithmetic, but when the kernel is nearly degenerate (e.g. a confident
    # posterior-covariance kernel with values ~1e-8) the rows are numerically
    # invisible next to the O(1) mass column inside the Caratheodory QR.
    # One GLOBAL scale lifts them while preserving the eigenvalue-weighted
    # priority between test functions (per-row scaling would distort it).
    phi = phi / jnp.maximum(jnp.max(jnp.abs(phi)), 1e-30)
    if extra_test_rows is not None:
        extra = jnp.asarray(extra_test_rows, phi.dtype)
        extra_scale = jnp.maximum(
            jnp.max(jnp.abs(extra), axis=1, keepdims=True), 1e-30)
        phi = jnp.concatenate([phi, extra / extra_scale], axis=0)
    n_rows = phi.shape[0]                                  # num_pts - 1
    phi_ext = jnp.concatenate(
        [phi, jnp.zeros((n_rows, 1), phi.dtype)], axis=1)  # dummy col

    if init_weights is None:
        mu = jnp.full((n_pool,), 1.0 / n_pool, phi.dtype)
    else:
        mu = jnp.maximum(init_weights, 0.0)
        tot = jnp.sum(mu)
        mu = jnp.where(tot > 0, mu / jnp.where(tot > 0, tot, 1.0),
                       jnp.full((n_pool,), 1.0 / n_pool, phi.dtype))
    mu_ext = jnp.concatenate([mu, jnp.zeros((1,), mu.dtype)])

    if calc_obj is not None:
        obj = -calc_obj(pts_rec)                           # _rchq.py:69
        obj_ext = jnp.concatenate([obj, jnp.zeros((1,), obj.dtype)])
    else:
        obj_ext = None

    idx_star, w_star = _reduce_tree(phi_ext, obj_ext, mu_ext, n_rows, n_pool)
    return RecombinationResult(idx_star, w_star)
