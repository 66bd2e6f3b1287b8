"""Explicitly sharded compute paths for multi-chip scaling.

Two complementary mechanisms (SURVEY.md §5.7-5.8):

  1. GSPMD auto-partitioning: annotate candidate pools with
     NamedSharding(mesh, P("cand", None)) and jit the standard functions
     (parallel/mesh.py + core/fused.py) — XLA inserts the collectives.
  2. shard_map versions below: the candidate-axis math written with
     EXPLICIT per-shard blocks and collectives, for cases where manual
     scheduling beats GSPMD (very large pools where the (n_test, n_rec)
     feature strip must never materialize unsharded) and as the blueprint
     of the communication pattern: pi evaluation is embarrassingly
     parallel; the Nystrom feature matmul is a block-row matmul; the
     barycenter reduction is a per-shard partial sum + psum over ICI.

The FBGP hypersample axis ("hyper") is embarrassingly parallel and shards
the per-chain Cholesky caches.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..gp.exact import GPState, predictive_covariance
from ..core.pi import lfi
from ..core.rckernel import resolve_rc


# ---------------------------------------------------------------------------
# Program cache. These entry points build a shard_map program from a fresh
# closure on every call; without caching, every invocation RETRACES AND
# RELOWERS the whole program (the jit/eager dispatch caches key on callable
# identity). That cost is invisible single-chip but dominates the mesh
# paths: ~40 s per call on the 8-virtual-device CPU mesh, and through the
# axon tunnel every eagerly dispatched op in the un-jitted tail was a
# ~27 ms round-trip. Programs are cached on (entry, mesh, axis, static
# shape config, kernel/objective identity) — the rc stable-callable
# protocol (core/rckernel.py:resolve_rc) makes the kernel key a
# module-level function so refits reuse the program; ad-hoc closures key
# on the closure object itself (stable while the caller holds it).
_PROGRAM_CACHE: dict = {}
_PROGRAM_CACHE_MAX = 128


def _cached_program(key, build):
    prog = _PROGRAM_CACHE.get(key)
    if prog is None:
        if len(_PROGRAM_CACHE) >= _PROGRAM_CACHE_MAX:
            _PROGRAM_CACHE.pop(next(iter(_PROGRAM_CACHE)))
        prog = _PROGRAM_CACHE[key] = build()
    return prog


def _rc_key(obj):
    """Cache-key for a kernel/objective: the module-level apply function
    when the object speaks the rc protocol (jit-cache stable across
    refits), else the object itself (stable while the caller reuses it)."""
    if obj is None:
        return None
    if hasattr(obj, "rc_apply"):
        return obj.rc_apply
    return obj


def _pi_weight_block(state, eta, x_blk, pdf_blk, axis, eps):
    """Per-shard pi-importance weights with global (psum) normalization —
    mirrors utils/weights.py:cleansing_weights semantics on a sharded axis.
    Shared by sharded_pi_weights and sharded_acquisition."""
    pi_vals = lfi(state, eta, x_blk)
    w = pi_vals / jnp.maximum(pdf_blk, 1e-38)
    w = jnp.where(w < eps, 0.0, w)
    w = jnp.where(jnp.isfinite(w), w, eps)
    total = jax.lax.psum(jnp.sum(w), axis)
    n = jax.lax.psum(jnp.asarray(w.shape[0], w.dtype), axis)
    safe = jnp.where(total > 0, total, 1.0)
    return jnp.where(total > 0, w / safe, jnp.full_like(w, 1.0) / n)


def _local_survivor_block(phi_blk, w_blk, num_pts, axis, blk_size,
                          extra_blk=None, obj_blk=None):
    """Per-shard reduction: global phi scaling (pmax), full local halving
    tree, and the <= num_pts survivors with global indices. Shared by
    sharded_recombination and sharded_acquisition.

    `extra_blk` is this shard's strip of pinned-integrand rows (normalized
    per-row by a global pmax, matching core/rchq.py's per-row extra_scale)
    appended below the eigenfunction rows; `obj_blk` is this shard's strip
    of the ALREADY-NEGATED acquisition row, which rides the local tree and
    is returned restricted to the survivors so the replicated merge can
    keep optimizing it."""
    from ..core.rchq import local_reduce

    gmax = jax.lax.pmax(jnp.max(jnp.abs(phi_blk)), axis)
    phi_blk = phi_blk / jnp.maximum(gmax, 1e-30)
    if extra_blk is not None:
        escale = jax.lax.pmax(
            jnp.max(jnp.abs(extra_blk), axis=1, keepdims=True), axis)
        phi_blk = jnp.concatenate(
            [phi_blk, extra_blk / jnp.maximum(escale, 1e-30)], axis=0)
    idx_loc, w_loc = local_reduce(phi_blk, w_blk, num_pts, obj=obj_blk)
    shard = jax.lax.axis_index(axis)
    idx_glob = idx_loc + shard * blk_size
    phi_surv = phi_blk[:, idx_loc]                          # (num_pts-1, num_pts)
    if obj_blk is None:
        return idx_glob, w_loc, phi_surv
    return idx_glob, w_loc, phi_surv, obj_blk[idx_loc]


def sharded_pi_weights(mesh: Mesh, state: GPState, eta: jax.Array,
                       x_cand: jax.Array, prior_pdf: jax.Array,
                       axis: str = "cand") -> jax.Array:
    """pi-importance weights with the candidate axis sharded over `axis`.

    Each device computes pi on its block; the weight normalization is a
    psum over ICI.
    """
    from ..config import settings

    eps = settings().eps_weights

    def build():
        def block(state, eta, x_blk, pdf_blk):
            return _pi_weight_block(state, eta, x_blk, pdf_blk, axis, eps)

        return jax.jit(shard_map(
            block, mesh=mesh,
            in_specs=(P(), P(), P(axis, None), P(axis)),
            out_specs=P(axis),
        ))

    fn = _cached_program(("pi", mesh, axis, eps), build)
    return fn(state, eta, x_cand, prior_pdf)


def sharded_nystrom_features(mesh: Mesh, state: GPState, u: jax.Array,
                             x_nys: jax.Array, x_cand: jax.Array,
                             axis: str = "cand") -> jax.Array:
    """Phi = U @ k_post(X_nys, X_cand) with the candidate axis sharded:
    each device forms its (n_test, block) strip; the result stays sharded
    on its second axis (no all-gather until the small reduction tree)."""
    def build():
        def block(state, u, x_nys, x_blk):
            return u @ predictive_covariance(state, x_nys, x_blk)

        return jax.jit(shard_map(
            block, mesh=mesh,
            in_specs=(P(), P(), P(), P(axis, None)),
            out_specs=P(None, axis),
        ))

    fn = _cached_program(("nys", mesh, axis), build)
    return fn(state, u, x_nys, x_cand)


def sharded_barycenter_sums(mesh: Mesh, phi_sharded: jax.Array,
                            weights: jax.Array, group_ids: jax.Array,
                            n_groups: int, axis: str = "cand") -> jax.Array:
    """Per-group weighted feature sums across a sharded candidate axis:
    partial segment-sums per shard, combined with one psum over ICI —
    the communication pattern of each halving round's barycenter
    compression (SURVEY.md §5.7)."""
    def build():
        def block(phi_blk, w_blk, gid_blk):
            # phi_blk: (n_test, blk); this shard's contribution per group
            weighted = phi_blk * w_blk[None, :]
            partial = jax.ops.segment_sum(weighted.T, gid_blk,
                                          num_segments=n_groups)
            return jax.lax.psum(partial, axis)               # (G, n_test)

        return jax.jit(shard_map(
            block, mesh=mesh,
            in_specs=(P(None, axis), P(axis), P(axis)),
            out_specs=P(),
        ))

    fn = _cached_program(("bary", mesh, axis, n_groups), build)
    return fn(phi_sharded, weights, group_ids)


def sharded_recombination(mesh: Mesh, kernel, x_cand: jax.Array,
                          x_nys: jax.Array, weights: jax.Array,
                          num_pts: int, axis: str = "cand",
                          calc_obj=None, extra_test_rows=None):
    """End-to-end kernel recombination with the candidate axis sharded: the
    (n_test, n_rec) feature strip NEVER materializes replicated.

    Recombination distributes over a partition of the measure — reducing
    each shard to <= num_pts support points preserves that shard's mass and
    feature moments exactly, so the global measure's moments are preserved
    by construction. Schedule per device:

      1. form this shard's (n_test, blk) strip of Phi = U k(X_nys, X_cand)
         (block-row matmul, local),
      2. normalize by the GLOBAL |Phi| max (one pmax over ICI — matches the
         single-device scaling in core/rchq.py:366),
      3. run the full halving reduction tree locally (core/rchq.py:
         local_reduce) down to num_pts survivors,
      4. all-gather only the survivors: (num_pts,) weights + indices and
         the (n_test, num_pts) feature columns per device,

    then one final replicated reduction over the n_devices*num_pts
    survivors (tiny) picks the batch. Communication: one pmax scalar + one
    all-gather of O(n_devices * num_pts * n_test) floats, independent of
    n_rec. The per-device peak memory is the (n_test, n_rec/D) strip.

    `kernel` is a callable or a stable-callable adapter
    (core/rckernel.py); `weights` should be globally cleansed/normalized
    (e.g. sharded_pi_weights output). Returns (idx (num_pts,), w (num_pts,))
    with global indices into x_cand.

    Acquisition augmentation (VERDICT r2 item #2), mirroring the
    single-device path (core/rchq.py:160-192,443-447; reference
    SOBER/_rchq.py:79-105,138-196): `calc_obj` (callable or
    stable-callable, X -> (n,) values to MAXIMIZE) adds the negated
    objective row to every per-shard halving round and to the replicated
    merge, whose final null-space push spends the spare degree of freedom
    on it. `extra_test_rows` ((k, n_rec), sharded like the pool) are
    pinned-integrand rows matched exactly alongside the eigenfunctions (k
    eigenfunction slots are given up, as in core/rchq.py:396-397) — this
    is what the exact-evidence BASQ quadrature needs multi-chip.
    """
    if hasattr(kernel, "rc_apply"):
        k_apply, k_tree = kernel.rc_apply, kernel.rc_tree
    else:
        k_apply, k_tree = (lambda _, x, y: kernel(x, y)), None
    o_apply, o_tree = resolve_rc(calc_obj, fallback_to_closure=True)

    if x_nys.shape[0] < num_pts:
        raise ValueError(
            f"n_nys={x_nys.shape[0]} must be >= num_pts={num_pts}")
    n_extra = 0 if extra_test_rows is None else extra_test_rows.shape[0]
    if num_pts - 1 - n_extra < 1:
        raise ValueError("num_pts too small for the extra test rows")

    key = ("rec", mesh, axis, num_pts, n_extra, _rc_key(kernel),
           _rc_key(calc_obj))
    run = _cached_program(key, lambda: _build_sharded_recombination(
        mesh, axis, num_pts, n_extra, k_apply,
        o_apply if calc_obj is not None else None))
    return run(k_tree, o_tree, x_nys, x_cand, weights, extra_test_rows)


def _build_sharded_recombination(mesh, axis, num_pts, n_extra, k_apply,
                                 o_apply):
    """ONE jitted program for a sharded_recombination configuration:
    eigenbasis prelude, the shard_map survivor pass, and the replicated
    merge all trace together (see _PROGRAM_CACHE)."""
    from ..core.rchq import local_reduce
    from ..utils.linalg import symmetrize

    n_test = num_pts - 1 - n_extra
    use_obj = o_apply is not None
    use_extra = n_extra > 0

    def block(k_tree, o_tree, u, x_nys, x_blk, w_blk, extra_blk):
        phi_blk = u @ k_apply(k_tree, x_nys, x_blk)         # (n_test, blk)
        obj_blk = -o_apply(o_tree, x_blk) if use_obj else None
        return _local_survivor_block(phi_blk, w_blk, num_pts, axis,
                                     x_blk.shape[0], extra_blk=extra_blk,
                                     obj_blk=obj_blk)

    out_specs = [P(axis), P(axis), P(None, axis)]
    if use_obj:
        out_specs.append(P(axis))
    extra_spec = P(None, axis) if use_extra else P()
    fn = shard_map(
        block, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis, None), P(axis), extra_spec),
        out_specs=tuple(out_specs),
    )

    @jax.jit
    def run(k_tree, o_tree, x_nys, x_cand, weights, extra_test_rows):
        # symmetrize only — jitter shifts eigenvalues, not eigenvectors
        # (matches core/rchq.py's basis construction)
        k_nys = symmetrize(jnp.nan_to_num(k_apply(k_tree, x_nys, x_nys)))
        _, eigvecs = jnp.linalg.eigh(k_nys)
        u = eigvecs[:, -n_test:].T                          # (n_test, n_nys)
        out = fn(k_tree, o_tree, u, x_nys, x_cand, weights, extra_test_rows)
        if use_obj:
            idx_surv, w_surv, phi_surv, obj_surv = out
        else:
            (idx_surv, w_surv, phi_surv), obj_surv = out, None
        # final replicated merge over n_devices * num_pts survivors (tiny)
        idx_fin, w_fin = local_reduce(phi_surv, w_surv, num_pts,
                                      obj=obj_surv)
        return idx_surv[idx_fin], w_fin

    return run


def sharded_acquisition(mesh: Mesh, state: GPState, eta: jax.Array,
                        x_cand: jax.Array, x_nys: jax.Array,
                        prior_pdf: jax.Array, num_pts: int,
                        axis: str = "cand", calc_obj=None):
    """The full SOBER acquisition (pi weighting + kernel recombination) as
    ONE shard_map program over the candidate axis — the multi-chip analogue
    of core/fused.py:fused_acquisition.

    Per device: pi over its candidate block, global weight normalization
    (psum), its (n_test, blk) feature strip, global phi scaling (pmax), and
    the full local reduction tree; only the <= num_pts survivors per device
    are gathered for the tiny replicated merge. Communication: two scalar
    collectives + one all-gather of O(n_devices * num_pts * n_test) floats,
    independent of n_rec.

    `calc_obj` (callable or stable-callable, X -> values to MAXIMIZE)
    augments both the per-shard trees and the merge with the negated
    acquisition row — the multi-chip form of the BOLFI-UCB-augmented
    selection (core/rchq.py:443-447; reference SOBER/_rchq.py:79-105).

    Returns (idx, w, weights): global batch indices, quadrature weights,
    and the cleansed pool weights (sharded over `axis`).
    """
    from ..config import settings

    if x_nys.shape[0] < num_pts:
        raise ValueError(
            f"n_nys={x_nys.shape[0]} must be >= num_pts={num_pts}")
    eps = settings().eps_weights
    o_apply, o_tree = resolve_rc(calc_obj, fallback_to_closure=True)

    key = ("acq", mesh, axis, num_pts, eps, _rc_key(calc_obj))
    run = _cached_program(key, lambda: _build_sharded_acquisition(
        mesh, axis, num_pts, eps,
        o_apply if calc_obj is not None else None))
    return run(state, eta, o_tree, x_nys, x_cand, prior_pdf)


def _build_sharded_acquisition(mesh, axis, num_pts, eps, o_apply):
    """ONE jitted program for a sharded_acquisition configuration
    (see _PROGRAM_CACHE)."""
    from ..core.rchq import local_reduce
    from ..utils.linalg import symmetrize

    n_test = num_pts - 1
    use_obj = o_apply is not None

    def block(state, eta, o_tree, u, x_nys, x_blk, pdf_blk):
        w_blk = _pi_weight_block(state, eta, x_blk, pdf_blk, axis, eps)
        phi_blk = u @ predictive_covariance(state, x_nys, x_blk)
        obj_blk = -o_apply(o_tree, x_blk) if use_obj else None
        out = _local_survivor_block(
            phi_blk, w_blk, num_pts, axis, x_blk.shape[0], obj_blk=obj_blk)
        return out + (w_blk,)

    out_specs = ([P(axis), P(axis), P(None, axis)]
                 + ([P(axis)] if use_obj else []) + [P(axis)])
    fn = shard_map(
        block, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(axis, None), P(axis)),
        out_specs=tuple(out_specs),
    )

    @jax.jit
    def run(state, eta, o_tree, x_nys, x_cand, prior_pdf):
        k_nys = symmetrize(jnp.nan_to_num(
            predictive_covariance(state, x_nys, x_nys)))
        _, eigvecs = jnp.linalg.eigh(k_nys)
        u = eigvecs[:, -n_test:].T                          # (n_test, n_nys)
        out = fn(state, eta, o_tree, u, x_nys, x_cand, prior_pdf)
        if use_obj:
            idx_surv, w_surv, phi_surv, obj_surv, weights = out
        else:
            (idx_surv, w_surv, phi_surv, weights), obj_surv = out, None
        idx_fin, w_fin = local_reduce(phi_surv, w_surv, num_pts,
                                      obj=obj_surv)
        return idx_surv[idx_fin], w_fin, weights

    return run


def sharded_fbgp_batch_predict(mesh: Mesh, fbgp, x_test: jax.Array,
                               axis: str = "hyper"):
    """FBGP chain predictions with the hypersample axis sharded: each device
    owns a block of chains (and their Cholesky caches); the hyperposterior-
    weighted marginal is a psum (SURVEY.md §5.8c)."""
    theta = fbgp.Theta_qd
    linv = fbgp._cache.linv
    alpha = fbgp._cache.alpha
    w_qd = fbgp.w_qd

    def build():
        def block(theta_blk, linv_blk, alpha_blk, w_blk, x_test):
            f = jax.vmap(fbgp.fitbo_predict, in_axes=(None, 0, 0, 0))
            mu_b, var_b = f(x_test, theta_blk, linv_blk, alpha_blk)
            mu = jax.lax.psum(w_blk @ mu_b, axis)
            e2 = jax.lax.psum(w_blk @ (var_b + mu_b**2), axis)
            return mu, e2 - mu**2

        prog = jax.jit(shard_map(
            block, mesh=mesh,
            in_specs=(P(axis, None), P(axis, None, None), P(axis, None),
                      P(axis), P()),
            out_specs=(P(), P()),
        ))
        # fitbo_predict closes over THIS fbgp's Xobs/mask: key the program
        # on the instance identity and pin the instance so the id is never
        # recycled onto a different model while the entry lives
        return (prog, fbgp)

    fn, _ = _cached_program(("fbgp_predict", mesh, axis, id(fbgp)), build)
    return fn(theta, linv, alpha, w_qd, x_test)
