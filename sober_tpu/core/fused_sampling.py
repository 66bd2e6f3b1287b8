"""Fused candidate-generation pipeline: ONE XLA program per iteration.

The host pipeline (EmpiricalSampler.sampling_candidates,
SOBER/_sampler.py:263-323) crosses the host/device boundary at every stage —
draw, weight check, proposal update, redraw, Nystrom selection — which
through a remote-dispatch link costs a ~27 ms round-trip per blocking
fetch (6+ per iteration at the Ising bench scale). This module traces the
whole pipeline, data-dependent control flow included (`lax.cond` for the
weight-health branch, `lax.while_loop` for the accumulate-until-enough
refill), into one program per domain family:

  * fused_candidates_binary       — Bernoulli proposal (MLE update)
  * fused_candidates_cont_uniform — Sobol/uniform box proposal -> WKDE
  * fused_candidates_cont_wkde    — WKDE proposal -> WKDE refit
  * fused_candidates_discrete     — categorical and mixed (Uniform/WKDE x
    Bernoulli/Categorical) domains via a static DomainSpec

plus `fused_iteration_*` variants (including fused_iteration_dataset for
dataset pools) that additionally run kernel recombination in the SAME
program — the whole non-refit `Sober.next_batch` body as one dispatch —
and `fused_bo_step_*` variants that also fuse the bucket-padded GP MAP
refit (`Sober.step`): a full BO iteration in a single dispatch. The
`fused_iteration_*` family accepts an optional calc_obj stable-callable
pair (obj_apply/obj_tree, same protocol as the kernel) so acquisition-
augmented selection (e.g. BOLFI's SOBERUCB) also runs as one program.

Semantics mirror the host path exactly (same branch conditions, same
refill-round bounds, same uniform-weight fallbacks), and the COMMON path
(healthy first draw, refill satisfied by one redraw) consumes the KeyRing
stream identically — 4 keys in the host's order (draw, update, redraw,
Nystrom) fed to the same sampling primitives. Exact bit parity with the
staged path is opportunistic, not guaranteed: XLA fuses the one-program
pipeline differently from the staged programs, perturbing the pi weights
at the ulp level, and whenever that noise crosses a stochastic
resampler's decision boundary the component picks — and everything
downstream — diverge (while remaining equal in distribution).
tests/test_fused_sampling.py pins bit-identity at shapes/seeds where no
boundary is crossed and distributional agreement elsewhere. Rare branches
(degenerate
first draw, multi-round refill) additionally derive extra draws by
`fold_in` from the redraw key instead of consuming further host keys;
the host path's key stream shifts in those branches, so the two paths
decorrelate there too (but keep the same distribution and invariants).

No reference analogue: the reference's pipeline is inherently host-bound
(torch ops between Python branches, SOBER/_sampler.py:205-323).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..priors.wkde import _wkde_fit, _wkde_pdf, _wkde_sample
from ..utils.linalg import mvn_logpdf
from ..utils.sobol import sobol_sample
from ..utils.weights import (
    check_weights,
    cleansing_weights,
    deweighted_resampling,
    weighted_resampling,
)
from ..ops.kmeans import kmeans
from .pi import lfi_apply
from .prior_update import bernoulli_mle

# The pipelines are generic over the pi measure through the pi
# stable-callable protocol: `pi` is an (apply, tree) pair with
# `apply(tree, x) -> pi values`, `apply` a module-level function (hashable,
# stable across refits -> one cached jit program per pi family) and `tree`
# a pytree of traced arrays. core/pi.py:lfi_apply covers exact-GP
# surrogates, gp/fbgp.py:fbgp_pi_apply the fully-Bayesian family,
# gp/warped.py:bq_pi_apply the warped-BQ family — so FBGP and BASQ loops
# get the same one-dispatch iterations as plain BO.


def _pi_weights(pi, x, pdf):
    """w = cleanse(pi(x) / pdf(x)) — EmpiricalSampler.sampling's body."""
    pi_apply, pi_tree = pi
    w = pi_apply(pi_tree, x) / jnp.maximum(pdf, 1e-38)
    return cleansing_weights(w)


def _shard_cand(a, mesh):
    """GSPMD sharding constraint on a candidate-axis array: row-shard over
    the mesh's "cand" axis (Sober(mesh=..., schedule="gspmd")). A no-op
    without a mesh; with one, the constraint anchors XLA's sharding
    propagation so the pi sweep, the (n_test, n_rec) feature strip and the
    reduction tree's bulk stages partition over devices inside the SAME
    one-dispatch program the single-device path uses (SURVEY §5.7-5.8;
    explicit shard_map alternatives live in parallel/sharded.py)."""
    if mesh is None:
        return a
    from jax.sharding import NamedSharding, PartitionSpec

    spec = PartitionSpec("cand", *([None] * (a.ndim - 1)))
    return jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec))


def _shard_draw(draw, mesh):
    """Wrap a draw closure (k -> (x, w)) so its pool and weights carry the
    candidate-axis sharding constraint."""
    if mesh is None:
        return draw

    def wrapped(k, *args, **kwargs):
        x, w = draw(k, *args, **kwargs)
        return _shard_cand(x, mesh), _shard_cand(w, mesh)

    return wrapped


def _refill(key, draw_w, x0, w0, need, bound):
    """Accumulate-until-enough refill (recursive_sampling,
    core/sampler.py:208-234): rounds 1..bound-1 draw fresh pools and fill
    zero-weight rows in place until more than `need` rows are accepted.
    Returns (x, w, none_accepted); w is uniform when nothing was accepted,
    cleansed otherwise."""

    def cond(c):
        i, x, w = c
        return jnp.logical_and(i < bound, jnp.sum(w > 0) <= need)

    def body(c):
        i, x, w = c
        x2, w2 = draw_w(jax.random.fold_in(key, i))
        fill = jnp.logical_and(w == 0, w2 > 0)
        return (i + 1, jnp.where(fill[:, None], x2, x),
                jnp.where(fill, w2, w))

    _, x, w = jax.lax.while_loop(cond, body, (jnp.int32(1), x0, w0))
    none = jnp.sum(w > 0) == 0
    n = w.shape[0]
    w = jnp.where(none, jnp.full((n,), 1.0 / n, w.dtype),
                  cleansing_weights(w))
    return x, w, none


def _binary_pipeline(pi, probs, k_draw, k_update,
                     k_refill, k_nys, n_rec: int, n_nys: int, thresh: int,
                     mesh=None):
    """Binary domain: Bernoulli proposal with closed-form MLE update.

    Returns (x_cand, x_nys, weights, probs_out); probs_out equals the old
    probs on the no-update path, so the host can rebuild the prior
    unconditionally with zero device fetches.
    """
    d = probs.shape[0]

    def draw_with(p):
        def draw(k):
            u = jax.random.uniform(k, (n_rec, d))
            x = (u < p[None, :]).astype(jnp.float32)
            pc = jnp.clip(p, 1e-12, 1 - 1e-12)
            lp = (x * jnp.log(pc)[None, :]
                  + (1 - x) * jnp.log1p(-pc)[None, :])
            return x, _pi_weights(pi, x, jnp.exp(jnp.sum(lp, axis=1)))
        return _shard_draw(draw, mesh)

    x1, w1 = draw_with(probs)(k_draw)

    # bind the update pool per branch (healthy: first draw; degenerate: the
    # refilled pool) by routing through mutable-free closures: the healthy
    # branch updates on (x1, w1); the degenerate branch's update runs inside
    # _pipeline with (xa, wa) unavailable here, so the MLE is recomputed on
    # whatever pool the branch passes — handled by re-deriving from x/w at
    # the end instead would change semantics, so we keep two explicit paths:
    def update_on(x, w):
        return lambda k: bernoulli_mle(w, x)  # key burned (host parity)

    ok1 = check_weights(w1, thresh)

    def branch_healthy(_):
        p_new = update_on(x1, w1)(k_update)
        draw_new = draw_with(p_new)
        x0, w0 = draw_new(k_refill)
        x, w, _ = _refill(k_refill, draw_new, x0, w0, n_nys, n_nys)
        return x, w, p_new, jnp.bool_(False)

    def branch_degenerate(_):
        draw_old = draw_with(probs)
        x0, w0 = draw_old(jax.random.fold_in(k_refill, 0))
        xa, wa, none_a = _refill(jax.random.fold_in(k_refill, 1 << 20),
                                 draw_old, x0, w0, thresh, thresh)

        def a_fail(_):
            return xa, wa, probs, jnp.bool_(True)

        def a_ok(_):
            p_new = update_on(xa, wa)(k_update)
            draw_new = draw_with(p_new)
            x0b, w0b = draw_new(jax.random.fold_in(k_refill, 2 << 20))
            x, w, _ = _refill(jax.random.fold_in(k_refill, 3 << 20),
                              draw_new, x0b, w0b, n_nys, n_nys)
            return x, w, p_new, jnp.bool_(False)

        return jax.lax.cond(none_a, a_fail, a_ok, None)

    x, w, p_out, take_head = jax.lax.cond(
        ok1, branch_healthy, branch_degenerate, None)

    idx = deweighted_resampling(k_nys, w, n_nys)
    idx = jnp.where(take_head, jnp.arange(n_nys, dtype=idx.dtype), idx)
    return x, x[idx], w, p_out


@partial(jax.jit, static_argnames=("n_rec", "n_nys", "thresh", "pi_apply",
                                   "mesh"))
def fused_candidates_binary(pi_tree, probs, k_draw, k_update,
                            k_refill, k_nys, *, n_rec: int, n_nys: int,
                            thresh: int, pi_apply=lfi_apply, mesh=None):
    """Jitted wrapper of _binary_pipeline (see its docstring)."""
    return _binary_pipeline((pi_apply, pi_tree), probs, k_draw, k_update,
                            k_refill, k_nys, n_rec, n_nys, thresh, mesh)


def _cont_select_nys(k_nys, x, w, take_head, n_nys: int):
    """Continuous Nystrom subset (core/sampler.py:236-242): weight-resample
    up to 4096 rows, KMeans to n_nys centroids; head slice on the
    total-degeneracy path."""
    n_in = min(x.shape[0], 4096)
    idx = weighted_resampling(k_nys, w, n_in)
    _, cents = kmeans(x[idx], n_nys)
    return jnp.where(take_head, x[:n_nys], cents)


def _wkde_machinery(pi, bounds, n_rec: int, n_kde: int, n_dims: int,
                    mesh=None):
    def draw_with(params):
        def draw(k):
            x = _wkde_sample(k, params, bounds, n_rec, 10)
            return x, _pi_weights(pi, x, _wkde_pdf(params, bounds, x))
        return _shard_draw(draw, mesh)

    def update_on(x, w):
        return lambda k: _wkde_fit(k, x, w, n_kde, "scott", n_dims)

    return draw_with, update_on


def _cont_branches(probe, draw_old, update_on, draw_with, k_update, k_refill,
                   n_nys: int, thresh: int):
    """Shared continuous branch structure. `probe` = (x1, w1)."""
    x1, w1 = probe
    ok1 = check_weights(w1, thresh)

    def branch_healthy(_):
        params = update_on(x1, w1)(k_update)
        draw_new = draw_with(params)
        x0, w0 = draw_new(k_refill)
        x, w, _ = _refill(k_refill, draw_new, x0, w0, n_nys, n_nys)
        return x, w, params, jnp.bool_(True), jnp.bool_(False)

    def branch_degenerate(_):
        x0, w0 = draw_old(jax.random.fold_in(k_refill, 0))
        xa, wa, none_a = _refill(jax.random.fold_in(k_refill, 1 << 20),
                                 draw_old, x0, w0, thresh, thresh)

        def a_fail(_):
            # prior kept; params computed only to keep output shapes
            params = update_on(xa, wa)(jax.random.fold_in(k_update, 1))
            return xa, wa, params, jnp.bool_(False), jnp.bool_(True)

        def a_ok(_):
            params = update_on(xa, wa)(jax.random.fold_in(k_update, 2))
            draw_new = draw_with(params)
            x0b, w0b = draw_new(jax.random.fold_in(k_refill, 2 << 20))
            x, w, _ = _refill(jax.random.fold_in(k_refill, 3 << 20),
                              draw_new, x0b, w0b, n_nys, n_nys)
            return x, w, params, jnp.bool_(True), jnp.bool_(False)

        return jax.lax.cond(none_a, a_fail, a_ok, None)

    return jax.lax.cond(ok1, branch_healthy, branch_degenerate, None)


def _uniform_pipeline(pi, bounds, sobol_state,
                      sobol_offset, k_draw, k_update, k_refill,
                      k_nys, n_rec: int, n_nys: int,
                      thresh: int, n_kde: int, qmc: bool, mesh=None):
    """Continuous domain, Uniform (box) proposal -> WKDE update.

    Returns (x_cand, x_nys, weights, wkde_params, did_update). The host
    replaces the Uniform prior with the WKDE only when did_update — the
    one scalar fetch of the fused path, paid once per run (the proposal is
    a WKDE from the second iteration on).
    """
    d = bounds.shape[1]
    lo, hi = bounds[0], bounds[1]
    dens = jnp.prod(1.0 / (hi - lo))

    def draw_uniform(k, u=None):
        # rare-branch (degenerate first draw) redraws pass u=None and fall
        # back to pseudo-random uniform: the host path would advance the
        # Sobol engine a data-dependent number of times, which the host
        # cannot account for without a device fetch. Only the first draw
        # (the common path's single Uniform use) is QMC.
        if u is None:
            u = jax.random.uniform(k, (n_rec, d))
        x = lo[None, :] + (hi - lo)[None, :] * u
        inside = jnp.logical_and(
            jnp.all(x > lo[None, :], axis=1),
            jnp.all(x < hi[None, :], axis=1))
        pdf = jnp.where(inside, dens, 0.0)
        return x, _pi_weights(pi, x, pdf)

    draw_uniform = _shard_draw(draw_uniform, mesh)
    draw_old = draw_uniform
    if qmc:
        u0 = sobol_sample(sobol_state,
                          jnp.asarray(sobol_offset, jnp.uint32), n_rec)
        x1, w1 = draw_uniform(k_draw, u=u0)
    else:
        x1, w1 = draw_uniform(k_draw)
    draw_with, update_on = _wkde_machinery(pi, bounds, n_rec, n_kde, d,
                                           mesh)
    x, w, params, did, take_head = _cont_branches(
        (x1, w1), draw_old, update_on, draw_with, k_update, k_refill,
        n_nys, thresh)
    x_nys = _cont_select_nys(k_nys, x, w, take_head, n_nys)
    return x, x_nys, w, params, did


@partial(jax.jit, static_argnames=("n_rec", "n_nys", "thresh", "n_kde",
                                   "qmc", "pi_apply", "mesh"))
def fused_candidates_cont_uniform(pi_tree, bounds, sobol_state,
                                  sobol_offset, k_draw, k_update, k_refill,
                                  k_nys, *, n_rec: int, n_nys: int,
                                  thresh: int, n_kde: int, qmc: bool,
                                  pi_apply=lfi_apply, mesh=None):
    """Jitted wrapper of _uniform_pipeline (see its docstring)."""
    return _uniform_pipeline((pi_apply, pi_tree), bounds, sobol_state,
                             sobol_offset, k_draw, k_update, k_refill,
                             k_nys, n_rec, n_nys, thresh, n_kde, qmc, mesh)


def _wkde_pipeline(pi, params_old, bounds,
                   k_draw, k_update, k_refill, k_nys,
                   n_rec: int, n_nys: int, thresh: int, n_kde: int,
                   mesh=None):
    """Continuous domain, WKDE proposal -> WKDE refit.

    Returns (x_cand, x_nys, weights, params_out) with params_out already
    selected between refit and old on device (zero host fetches)."""
    d = params_old["x_obs"].shape[1]
    draw_with, update_on = _wkde_machinery(pi, bounds, n_rec, n_kde, d,
                                           mesh)
    draw_old = draw_with(params_old)
    x1, w1 = draw_old(k_draw)
    x, w, params, did, take_head = _cont_branches(
        (x1, w1), draw_old, update_on, draw_with, k_update, k_refill,
        n_nys, thresh)
    params_out = jax.tree.map(
        lambda a, b: jnp.where(did, a, b), params, params_old)
    x_nys = _cont_select_nys(k_nys, x, w, take_head, n_nys)
    return x, x_nys, w, params_out


@partial(jax.jit, static_argnames=("n_rec", "n_nys", "thresh", "n_kde",
                                   "pi_apply", "mesh"))
def fused_candidates_cont_wkde(pi_tree, params_old, bounds,
                               k_draw, k_update, k_refill, k_nys, *,
                               n_rec: int, n_nys: int, thresh: int,
                               n_kde: int, pi_apply=lfi_apply, mesh=None):
    """Jitted wrapper of _wkde_pipeline (see its docstring)."""
    return _wkde_pipeline((pi_apply, pi_tree), params_old, bounds, k_draw,
                          k_update, k_refill, k_nys, n_rec, n_nys, thresh,
                          n_kde, mesh)


def _gauss_pipeline(pi, mu, chol, k_draw, k_update, k_refill, k_nys,
                    n_rec: int, n_nys: int, thresh: int, n_kde: int,
                    mesh=None):
    """Continuous domain, Gaussian proposal -> WKDE update (the SBI /
    wrapper entry: run_BASQ starts from a Gaussian prior,
    apps/wrapper.py). The learned WKDE is bounds-free, mirroring the
    staged update_continuous_prior on a bounds-less prior.

    Returns (x_cand, x_nys, weights, wkde_params, did_update)."""
    d = mu.shape[0]

    def draw_gauss(k):
        z = jax.random.normal(k, (n_rec, d))
        x = mu[None, :] + z @ chol.T
        pdf = jnp.exp(mvn_logpdf(x, mu, chol))
        return x, _pi_weights(pi, x, pdf)

    draw_gauss = _shard_draw(draw_gauss, mesh)
    x1, w1 = draw_gauss(k_draw)
    draw_with, update_on = _wkde_machinery(pi, None, n_rec, n_kde, d, mesh)
    x, w, params, did, take_head = _cont_branches(
        (x1, w1), draw_gauss, update_on, draw_with, k_update, k_refill,
        n_nys, thresh)
    x_nys = _cont_select_nys(k_nys, x, w, take_head, n_nys)
    return x, x_nys, w, params, did


@partial(jax.jit, static_argnames=("n_rec", "n_nys", "thresh", "n_kde",
                                   "pi_apply", "mesh"))
def fused_candidates_cont_gauss(pi_tree, mu, chol, k_draw, k_update,
                                k_refill, k_nys, *, n_rec: int, n_nys: int,
                                thresh: int, n_kde: int,
                                pi_apply=lfi_apply, mesh=None):
    """Jitted wrapper of _gauss_pipeline (see its docstring)."""
    return _gauss_pipeline((pi_apply, pi_tree), mu, chol, k_draw, k_update,
                           k_refill, k_nys, n_rec, n_nys, thresh, n_kde,
                           mesh)


def _tgauss_pipeline(pi, mu, chol, lb, ub, constant, prec, cond_sd,
                     k_draw, k_update, k_refill, k_nys, n_rec: int,
                     n_nys: int, thresh: int, n_kde: int, gibbs: bool,
                     n_rounds: int, n_sweeps: int, mesh=None):
    """Continuous domain, box-truncated Gaussian proposal -> WKDE update
    (the wrapper's default SBI entry: TruncatedGaussian on the unit box,
    apps/wrapper.py). Draws mirror TruncatedGaussian.sample exactly —
    iterative rejection (static n_rounds) or the Gibbs chain (static
    n_sweeps = burn_in + thin), selected by the prior's host-side
    `_use_gibbs`. Returns (x_cand, x_nys, weights, wkde_params,
    did_update)."""
    d = mu.shape[0]
    bounds = jnp.stack([lb, ub])

    def inside(x):
        return jnp.logical_and(jnp.all(x >= lb[None, :], axis=1),
                               jnp.all(x <= ub[None, :], axis=1))

    def draw_tg(k):
        if gibbs:
            from ..priors.tmvn import tmvn_gibbs_sample

            x = tmvn_gibbs_sample(k, mu, prec, cond_sd, lb, ub, n_rec,
                                  n_sweeps)
        else:
            from ..priors.continuous import tgauss_reject_sample

            x = tgauss_reject_sample(k, mu, chol, lb, ub, n_rec, n_rounds)
        base = jnp.exp(mvn_logpdf(x, mu, chol)) / constant
        pdf = jnp.where(inside(x), base, 0.0)
        return x, _pi_weights(pi, x, pdf)

    draw_tg = _shard_draw(draw_tg, mesh)
    x1, w1 = draw_tg(k_draw)
    draw_with, update_on = _wkde_machinery(pi, bounds, n_rec, n_kde, d,
                                           mesh)
    x, w, params, did, take_head = _cont_branches(
        (x1, w1), draw_tg, update_on, draw_with, k_update, k_refill,
        n_nys, thresh)
    x_nys = _cont_select_nys(k_nys, x, w, take_head, n_nys)
    return x, x_nys, w, params, did


_TG_STATICS = ("n_rec", "n_nys", "thresh", "n_kde", "gibbs", "n_rounds",
               "n_sweeps", "mesh", "pi_apply")


@partial(jax.jit, static_argnames=_TG_STATICS)
def fused_candidates_cont_tgauss(pi_tree, mu, chol, lb, ub, constant, prec,
                                 cond_sd, k_draw, k_update, k_refill,
                                 k_nys, *, n_rec: int, n_nys: int,
                                 thresh: int, n_kde: int, gibbs: bool,
                                 n_rounds: int, n_sweeps: int,
                                 pi_apply=lfi_apply, mesh=None):
    """Jitted wrapper of _tgauss_pipeline (see its docstring)."""
    return _tgauss_pipeline((pi_apply, pi_tree), mu, chol, lb, ub,
                            constant, prec, cond_sd, k_draw, k_update,
                            k_refill, k_nys, n_rec, n_nys, thresh, n_kde,
                            gibbs, n_rounds, n_sweeps, mesh)


@partial(jax.jit, static_argnames=_TG_STATICS + ("batch", "kernel_apply",
                                                 "obj_apply"))
def fused_iteration_cont_tgauss(pi_tree, mu, chol, lb, ub, constant, prec,
                                cond_sd, k_draw, k_update, k_refill, k_nys,
                                kernel_tree, *, n_rec: int, n_nys: int,
                                thresh: int, n_kde: int, gibbs: bool,
                                n_rounds: int, n_sweeps: int, batch: int,
                                kernel_apply, obj_apply=None, obj_tree=None,
                                pi_apply=lfi_apply, mesh=None):
    """_tgauss_pipeline + kernel recombination, one program.

    Returns (x_batch, w_rchq, wkde_params, did_update)."""
    x, x_nys, w, params, did = _tgauss_pipeline(
        (pi_apply, pi_tree), mu, chol, lb, ub, constant, prec, cond_sd,
        k_draw, k_update, k_refill, k_nys, n_rec, n_nys, thresh, n_kde,
        gibbs, n_rounds, n_sweeps, mesh)
    x_batch, w_rchq, _ = _recombine(x, x_nys, w, kernel_tree, kernel_apply,
                                    batch, obj_apply, obj_tree, mesh)
    return x_batch, w_rchq, params, did, _npos(w)


@partial(jax.jit, static_argnames=("cfg", "optimiser", "batch",
                                   "kernel_apply") + _TG_STATICS[:-1])
def fused_bo_step_cont_tgauss(x_pad, y_pad, mask, mu, chol, lb, ub,
                              constant, prec, cond_sd, k_draw, k_update,
                              k_refill, k_nys, *, cfg, optimiser: str,
                              n_rec: int, n_nys: int, thresh: int,
                              n_kde: int, gibbs: bool, n_rounds: int,
                              n_sweeps: int, batch: int, kernel_apply,
                              params0=None, mesh=None):
    """Refit + _tgauss_pipeline + recombination, one program.

    Returns (state, x_batch, w_rchq, wkde_params, did_update)."""
    state, eta = _fit_and_eta(x_pad, y_pad, mask, cfg, optimiser, params0)
    x, x_nys, w, params, did = _tgauss_pipeline(
        (lfi_apply, (state, eta)), mu, chol, lb, ub, constant, prec,
        cond_sd, k_draw, k_update, k_refill, k_nys, n_rec, n_nys, thresh,
        n_kde, gibbs, n_rounds, n_sweeps, mesh)
    x_batch, w_rchq, _ = _recombine(x, x_nys, w, state, kernel_apply, batch,
                                    mesh=mesh)
    return state, x_batch, w_rchq, params, did, _npos(w)


# ----------------------------------------------------------------------------
# candidates + kernel recombination as ONE program (Sober.next_batch)
# ----------------------------------------------------------------------------

def _npos(w):
    """Pool weight-health diagnostic: count of strictly positive candidate
    weights after cleansing. Every fused_iteration_* / fused_bo_step_* /
    fused_fbgp_step_* program appends this int32 scalar as its LAST output
    so Sober can surface per-iteration pool health (Sober.last_npos) with
    zero extra dispatches — acceptance telemetry for diagnosing proposal
    collapse (docs/acceptance_runs.jsonl). Note the total-degeneracy
    fallback sets uniform weights, which reads as n_pos == n_rec here; the
    staged path's `flag` equivalent is visible through Sober.last_path
    instead."""
    return jnp.sum(w > 0).astype(jnp.int32)


def _recombine(x, x_nys, w, kernel_tree, kernel_apply, batch: int,
               obj_apply=None, obj_tree=None, mesh=None):
    from .rchq import _recombination_impl

    # obj_apply/obj_tree: the calc_obj stable-callable pair (same protocol
    # as kernel_apply/kernel_tree) — the augmented objective row + null-
    # space push then ride the reduce tree exactly as in the staged path
    # (rchq.recombination with calc_obj)
    calc_obj = (None if obj_apply is None
                else (lambda q: obj_apply(obj_tree, q)))
    # under mesh mode, anchor the pool/weights sharding so the (n_test, N)
    # feature strip partitions on its candidate axis
    x = _shard_cand(x, mesh)
    w = _shard_cand(w, mesh)
    idx, w_rchq = _recombination_impl(
        x, x_nys, batch, lambda a, b: kernel_apply(kernel_tree, a, b),
        init_weights=w, calc_obj=calc_obj)
    return x[idx], w_rchq, idx


@partial(jax.jit, static_argnames=("n_rec", "n_nys", "thresh", "batch",
                                   "kernel_apply", "obj_apply", "pi_apply",
                                   "mesh"))
def fused_iteration_binary(pi_tree, probs, k_draw, k_update,
                           k_refill, k_nys, kernel_tree, *, n_rec: int,
                           n_nys: int, thresh: int, batch: int,
                           kernel_apply, obj_apply=None, obj_tree=None,
                           pi_apply=lfi_apply, mesh=None):
    """_binary_pipeline + kernel recombination, one program.

    Returns (x_batch, w_rchq, probs_out)."""
    x, x_nys, w, probs_out = _binary_pipeline(
        (pi_apply, pi_tree), probs, k_draw, k_update, k_refill, k_nys,
        n_rec, n_nys, thresh, mesh)
    x_batch, w_rchq, _ = _recombine(x, x_nys, w, kernel_tree, kernel_apply,
                                    batch, obj_apply, obj_tree, mesh)
    return x_batch, w_rchq, probs_out, _npos(w)


@partial(jax.jit, static_argnames=("n_rec", "n_nys", "thresh", "n_kde",
                                   "qmc", "batch", "kernel_apply",
                                   "obj_apply", "pi_apply", "mesh"))
def fused_iteration_cont_uniform(pi_tree, bounds, sobol_state,
                                 sobol_offset, k_draw, k_update, k_refill,
                                 k_nys, kernel_tree, *, n_rec: int,
                                 n_nys: int, thresh: int, n_kde: int,
                                 qmc: bool, batch: int, kernel_apply,
                                 obj_apply=None, obj_tree=None,
                                 pi_apply=lfi_apply, mesh=None):
    """_uniform_pipeline + kernel recombination, one program.

    Returns (x_batch, w_rchq, wkde_params, did_update)."""
    x, x_nys, w, params, did = _uniform_pipeline(
        (pi_apply, pi_tree), bounds, sobol_state, sobol_offset, k_draw,
        k_update, k_refill, k_nys, n_rec, n_nys, thresh, n_kde, qmc, mesh)
    x_batch, w_rchq, _ = _recombine(x, x_nys, w, kernel_tree, kernel_apply,
                                    batch, obj_apply, obj_tree, mesh)
    return x_batch, w_rchq, params, did, _npos(w)


@partial(jax.jit, static_argnames=("n_rec", "n_nys", "thresh", "n_kde",
                                   "batch", "kernel_apply", "obj_apply",
                                   "pi_apply", "mesh"))
def fused_iteration_cont_wkde(pi_tree, params_old, bounds,
                              k_draw, k_update, k_refill, k_nys,
                              kernel_tree, *, n_rec: int, n_nys: int,
                              thresh: int, n_kde: int, batch: int,
                              kernel_apply, obj_apply=None, obj_tree=None,
                              pi_apply=lfi_apply, mesh=None):
    """_wkde_pipeline + kernel recombination, one program.

    Returns (x_batch, w_rchq, params_out)."""
    x, x_nys, w, params_out = _wkde_pipeline(
        (pi_apply, pi_tree), params_old, bounds, k_draw, k_update,
        k_refill, k_nys, n_rec, n_nys, thresh, n_kde, mesh)
    x_batch, w_rchq, _ = _recombine(x, x_nys, w, kernel_tree, kernel_apply,
                                    batch, obj_apply, obj_tree, mesh)
    return x_batch, w_rchq, params_out, _npos(w)


@partial(jax.jit, static_argnames=("n_rec", "n_nys", "thresh", "n_kde",
                                   "batch", "kernel_apply", "obj_apply",
                                   "pi_apply", "mesh"))
def fused_iteration_cont_gauss(pi_tree, mu, chol, k_draw, k_update,
                               k_refill, k_nys, kernel_tree, *, n_rec: int,
                               n_nys: int, thresh: int, n_kde: int,
                               batch: int, kernel_apply, obj_apply=None,
                               obj_tree=None, pi_apply=lfi_apply,
                               mesh=None):
    """_gauss_pipeline + kernel recombination, one program.

    Returns (x_batch, w_rchq, wkde_params, did_update)."""
    x, x_nys, w, params, did = _gauss_pipeline(
        (pi_apply, pi_tree), mu, chol, k_draw, k_update, k_refill, k_nys,
        n_rec, n_nys, thresh, n_kde, mesh)
    x_batch, w_rchq, _ = _recombine(x, x_nys, w, kernel_tree, kernel_apply,
                                    batch, obj_apply, obj_tree, mesh)
    return x_batch, w_rchq, params, did, _npos(w)


@partial(jax.jit, static_argnames=("n_rec", "n_nys", "thresh", "batch",
                                   "prune", "kernel_apply", "obj_apply",
                                   "pi_apply", "mesh"))
def fused_iteration_dataset(pi_tree, x_all, avail_mask, k_nys,
                            kernel_tree, *, n_rec: int, n_nys: int,
                            thresh: float, batch: int, prune: bool,
                            kernel_apply, obj_apply=None, obj_tree=None,
                            pi_apply=lfi_apply, mesh=None):
    """Dataset domain: pi over the whole pool -> adaptive top-k pruning ->
    Nystrom subset -> kernel recombination, one program (the staged path:
    EmpiricalSampler.sampling_datasets + sampling_recombination).

    Returns (idx_global, x_batch, w_rchq); idx_global are dataset-row
    indices of the selected batch."""
    idx_sampled, x_cand, x_nys, w = _dataset_pipeline(
        (pi_apply, pi_tree), x_all, avail_mask, k_nys, n_rec, n_nys,
        thresh, prune, mesh)
    x_batch, w_rchq, idx_local = _recombine(x_cand, x_nys, w, kernel_tree,
                                            kernel_apply, batch,
                                            obj_apply, obj_tree, mesh)
    return idx_sampled[idx_local], x_batch, w_rchq, _npos(w)


def _dataset_pipeline(pi, x_all, avail_mask, k_nys, n_rec: int,
                      n_nys: int, thresh: float, prune: bool, mesh=None):
    """pi over the whole pool -> adaptive top-k pruning -> Nystrom subset
    (the staged EmpiricalSampler.sampling_datasets body)."""
    pi_apply, pi_tree = pi
    x_all = _shard_cand(x_all, mesh)
    w_all = pi_apply(pi_tree, x_all)
    w_all = jnp.where(avail_mask, w_all, 0.0)
    if prune:
        k = min(n_rec, x_all.shape[0])
        w_top, idx_sampled = jax.lax.top_k(w_all, k)
        keep = jnp.logical_or(w_top > thresh, jnp.arange(k) < n_nys)
        x_cand = x_all[idx_sampled]
        w = jnp.where(keep, w_top, 0.0)
    else:
        idx_sampled = jnp.arange(x_all.shape[0])
        x_cand = x_all
        w = w_all
    w = cleansing_weights(w)
    idx_nys = deweighted_resampling(k_nys, w, n_nys)
    return idx_sampled, x_cand, x_cand[idx_nys], w


# ----------------------------------------------------------------------------
# categorical and mixed domains: one generic spec-driven program family
# ----------------------------------------------------------------------------
#
# The remaining domain labels (categorical, mixedbinary, mixedcategorical)
# share one pipeline parameterized by a static DomainSpec and an `entry`
# tag for the continuous block's proposal family (mixed domains start
# Uniform and switch to WKDE after the first update, like the pure
# continuous path). Pools carry `concat([values, category-indices])` so
# the categorical MLE update sees indices while the pi sweep and
# recombination see values (the staged path's dual representation,
# core/sampler.py:categorical_sampling).

class DomainSpec(NamedTuple):
    """Hashable static description of a discrete/mixed domain."""
    label: str        # "categorical" | "mixedbinary" | "mixedcategorical"
    cont_first: bool  # continuous block first in the joined layout
    nc: int           # continuous dims (0 for pure categorical)
    nd: int           # discrete dims
    c_max: int        # padded category count; 0 => Bernoulli block


def _join_blocks(spec: DomainSpec, xc, xd):
    if spec.nc == 0:
        return xd
    return (jnp.concatenate([xc, xd], axis=1) if spec.cont_first
            else jnp.concatenate([xd, xc], axis=1))


def _split_blocks(spec: DomainSpec, x):
    if spec.nc == 0:
        return None, x
    if spec.cont_first:
        return x[:, :spec.nc], x[:, spec.nc:]
    return x[:, spec.nd:], x[:, :spec.nd]


def _uncarry(spec: DomainSpec, xA):
    n_dims = spec.nc + spec.nd
    if spec.c_max:
        return xA[:, :n_dims], xA[:, n_dims:]
    return xA, None


def _disc_draw(spec: DomainSpec, dtree, k, n: int):
    """Draw the discrete block; returns (values, float indices)."""
    if spec.c_max:
        wtab, vmask, vtab = dtree
        logits = jnp.where(vmask, jnp.log(jnp.maximum(wtab, 1e-12)),
                           -jnp.inf)
        g = jax.random.gumbel(k, (n,) + logits.shape)
        idx = jnp.argmax(logits[None] + g, axis=-1)           # (n, d)
        vals = vtab[jnp.arange(spec.nd)[None, :], idx]
        return vals.astype(jnp.float32), idx.astype(jnp.float32)
    probs = dtree
    u = jax.random.uniform(k, (n, spec.nd))
    x = (u < probs[None, :]).astype(jnp.float32)
    return x, x


def _disc_logpdf(spec: DomainSpec, dtree, xd_vals, idxf):
    if spec.c_max:
        wtab, vmask, _ = dtree
        w = jnp.where(vmask, jnp.maximum(wtab, 1e-12), 0.0)
        probs = w / jnp.sum(w, axis=1, keepdims=True)
        lp = jnp.log(probs)[jnp.arange(spec.nd)[None, :],
                            idxf.astype(jnp.int32)]
        return jnp.sum(lp, axis=1)
    pc = jnp.clip(dtree, 1e-12, 1 - 1e-12)
    lp = (xd_vals * jnp.log(pc)[None, :]
          + (1 - xd_vals) * jnp.log1p(-pc)[None, :])
    return jnp.sum(lp, axis=1)


def _disc_update(spec: DomainSpec, dtree_old, w, xd_vals, idxf):
    from .prior_update import categorical_mle

    if spec.c_max:
        _, vmask, vtab = dtree_old
        p = categorical_mle(w, idxf.astype(jnp.int32), spec.nd, spec.c_max)
        return (jnp.where(vmask, p, 0.0), vmask, vtab)
    return bernoulli_mle(w, xd_vals)


def _discrete_machinery(pi, spec: DomainSpec, bounds, disc_tree0,
                        n_rec: int, n_kde: int, mesh=None):
    """draw_with/update_on closures over params = (cont_wkde, disc_tree);
    cont_wkde is () when spec.nc == 0."""

    def draw_with(params):
        cont_params, dtree = params

        def draw(k):
            if spec.nc:
                kc, kd = jax.random.split(k)
                xc = _wkde_sample(kc, cont_params, bounds, n_rec, 10)
                lpc = jnp.log(jnp.maximum(
                    _wkde_pdf(cont_params, bounds, xc), 1e-38))
            else:
                kd, xc, lpc = k, None, 0.0
            xd, idxf = _disc_draw(spec, dtree, kd, n_rec)
            lp = lpc + _disc_logpdf(spec, dtree, xd, idxf)
            x = _join_blocks(spec, xc, xd)
            xA = (jnp.concatenate([x, idxf], axis=1) if spec.c_max else x)
            return xA, _pi_weights(pi, x, jnp.exp(lp))
        return _shard_draw(draw, mesh)

    def update_on(xA, w):
        def upd(k):
            x, idxd = _uncarry(spec, xA)
            xc, xd = _split_blocks(spec, x)
            idxf = idxd if spec.c_max else xd
            dnew = _disc_update(spec, disc_tree0, w, xd, idxf)
            cnew = (_wkde_fit(k, xc, w, n_kde, "scott", spec.nc)
                    if spec.nc else ())
            return (cnew, dnew)
        return upd
    return draw_with, update_on


def _select_nys_disc(spec: DomainSpec, k_nys, xA, w, take_head, n_nys: int):
    x, _ = _uncarry(spec, xA)
    idx = deweighted_resampling(k_nys, w, n_nys)
    idx = jnp.where(take_head, jnp.arange(n_nys, dtype=idx.dtype), idx)
    return x[idx]


def _discrete_pipeline(pi, spec: DomainSpec, cont_tree, disc_tree,
                       sobol_state, sobol_offset, k_draw, k_update,
                       k_refill, k_nys, n_rec: int, n_nys: int, thresh: int,
                       n_kde: int, qmc: bool, entry: str, mesh=None):
    """entry: "none" (pure categorical), "uniform" (mixed, first
    iteration), "wkde" (mixed, after the first update). Returns
    (x_cand, x_nys, weights, (cont_params, disc_tree_out), did_update);
    for "wkde"/"none" entries the params are old-vs-new selected
    ON DEVICE, so the host rebuilds unconditionally with zero fetches."""
    if entry == "none":
        bounds, cont_old = None, ()
    elif entry == "uniform":
        bounds, cont_old = cont_tree, None
    else:
        cont_old, bounds = cont_tree

    draw_with, update_on = _discrete_machinery(
        pi, spec, bounds, disc_tree, n_rec, n_kde, mesh)

    if entry == "uniform":
        lo, hi = bounds[0], bounds[1]
        dens_log = -jnp.sum(jnp.log(hi - lo))

        def draw_uniform(k, u=None):
            kc, kd = jax.random.split(k)
            if u is None:
                u = jax.random.uniform(kc, (n_rec, spec.nc))
            xc = lo[None, :] + (hi - lo)[None, :] * u
            # staged parity: Uniform.pdf zeroes boundary-touching points
            inside = jnp.logical_and(
                jnp.all(xc > lo[None, :], axis=1),
                jnp.all(xc < hi[None, :], axis=1))
            xd, idxf = _disc_draw(spec, disc_tree, kd, n_rec)
            lp = dens_log + _disc_logpdf(spec, disc_tree, xd, idxf)
            x = _join_blocks(spec, xc, xd)
            xA = (jnp.concatenate([x, idxf], axis=1) if spec.c_max else x)
            pdf = jnp.where(inside, jnp.exp(lp), 0.0)
            return xA, _pi_weights(pi, x, pdf)

        draw_uniform = _shard_draw(draw_uniform, mesh)
        draw_old = draw_uniform   # PRNG on rare-branch redraws
        if qmc:
            u0 = sobol_sample(sobol_state,
                              jnp.asarray(sobol_offset, jnp.uint32), n_rec)
            x1A, w1 = draw_uniform(k_draw, u=u0)
        else:
            x1A, w1 = draw_uniform(k_draw)
    else:
        draw_old = draw_with((cont_old, disc_tree))
        x1A, w1 = draw_old(k_draw)

    xA, w, params, did, take_head = _cont_branches(
        (x1A, w1), draw_old, update_on, draw_with, k_update, k_refill,
        n_nys, thresh)
    if entry != "uniform":
        params = jax.tree.map(lambda a, b: jnp.where(did, a, b),
                              params, (cont_old, disc_tree))
    x, _ = _uncarry(spec, xA)
    x_nys = _select_nys_disc(spec, k_nys, xA, w, take_head, n_nys)
    return x, x_nys, w, params, did


@partial(jax.jit, static_argnames=("spec", "n_rec", "n_nys", "thresh",
                                   "n_kde", "qmc", "entry", "pi_apply",
                                   "mesh"))
def fused_candidates_discrete(pi_tree, cont_tree, disc_tree,
                              sobol_state, sobol_offset, k_draw, k_update,
                              k_refill, k_nys, *, spec: DomainSpec,
                              n_rec: int, n_nys: int, thresh: int,
                              n_kde: int, qmc: bool, entry: str,
                              pi_apply=lfi_apply, mesh=None):
    """Jitted wrapper of _discrete_pipeline (see its docstring)."""
    return _discrete_pipeline((pi_apply, pi_tree), spec, cont_tree,
                              disc_tree, sobol_state, sobol_offset, k_draw,
                              k_update, k_refill, k_nys, n_rec, n_nys,
                              thresh, n_kde, qmc, entry, mesh)


@partial(jax.jit, static_argnames=("spec", "n_rec", "n_nys", "thresh",
                                   "n_kde", "qmc", "entry", "batch",
                                   "kernel_apply", "obj_apply", "pi_apply",
                                   "mesh"))
def fused_iteration_discrete(pi_tree, cont_tree, disc_tree,
                             sobol_state, sobol_offset, k_draw, k_update,
                             k_refill, k_nys, kernel_tree, *,
                             spec: DomainSpec, n_rec: int, n_nys: int,
                             thresh: int, n_kde: int, qmc: bool, entry: str,
                             batch: int, kernel_apply, obj_apply=None,
                             obj_tree=None, pi_apply=lfi_apply, mesh=None):
    """_discrete_pipeline + kernel recombination, one program.

    Returns (x_batch, w_rchq, (cont_params, disc_tree_out), did)."""
    x, x_nys, w, params, did = _discrete_pipeline(
        (pi_apply, pi_tree), spec, cont_tree, disc_tree, sobol_state,
        sobol_offset, k_draw, k_update, k_refill, k_nys, n_rec, n_nys,
        thresh, n_kde, qmc, entry, mesh)
    x_batch, w_rchq, _ = _recombine(x, x_nys, w, kernel_tree, kernel_apply,
                                    batch, obj_apply, obj_tree, mesh)
    return x_batch, w_rchq, params, did, _npos(w)


@partial(jax.jit, static_argnames=("cfg", "optimiser", "spec", "n_rec",
                                   "n_nys", "thresh", "n_kde", "qmc",
                                   "entry", "batch", "kernel_apply",
                                   "mesh"))
def fused_bo_step_discrete(x_pad, y_pad, mask, cont_tree, disc_tree,
                           sobol_state, sobol_offset, k_draw, k_update,
                           k_refill, k_nys, *, cfg, optimiser: str,
                           spec: DomainSpec, n_rec: int, n_nys: int,
                           thresh: int, n_kde: int, qmc: bool, entry: str,
                           batch: int, kernel_apply, params0=None,
                           mesh=None):
    """Refit + _discrete_pipeline + recombination, one program.

    Returns (state, x_batch, w_rchq, (cont_params, disc_tree_out), did)."""
    state, eta = _fit_and_eta(x_pad, y_pad, mask, cfg, optimiser, params0)
    x, x_nys, w, params, did = _discrete_pipeline(
        (lfi_apply, (state, eta)), spec, cont_tree, disc_tree, sobol_state,
        sobol_offset, k_draw, k_update, k_refill, k_nys, n_rec, n_nys,
        thresh, n_kde, qmc, entry, mesh)
    x_batch, w_rchq, _ = _recombine(x, x_nys, w, state, kernel_apply, batch,
                                    mesh=mesh)
    return state, x_batch, w_rchq, params, did, _npos(w)


# ----------------------------------------------------------------------------
# GP refit + candidates + recombination as ONE program (Sober.step)
# ----------------------------------------------------------------------------
#
# The step programs take the bucket-padded observation buffer instead of a
# fitted GPState: the MAP refit (gp.exact.fit_gp_traced), the incumbent
# eta, the candidate pipeline, and kernel recombination all trace into a
# single dispatch — a whole BO iteration crosses the host/device boundary
# once. The fitted state is returned so the host can rebuild its pi and
# kernel adapters with zero fetches.

def _fit_and_eta(x_pad, y_pad, mask, cfg, optimiser, params0=None):
    from ..gp.exact import fit_gp_traced, posterior_max_mean

    state = fit_gp_traced(x_pad, y_pad, mask, cfg, optimiser,
                          params0=params0)
    return state, posterior_max_mean(state)


@partial(jax.jit, static_argnames=("cfg", "optimiser", "n_rec", "n_nys",
                                   "thresh", "batch", "kernel_apply",
                                   "mesh"))
def fused_bo_step_binary(x_pad, y_pad, mask, probs, k_draw, k_update,
                         k_refill, k_nys, *, cfg, optimiser: str,
                         n_rec: int, n_nys: int, thresh: int, batch: int,
                         kernel_apply, params0=None, mesh=None):
    """Refit + _binary_pipeline + recombination, one program.

    Returns (state, x_batch, w_rchq, probs_out)."""
    state, eta = _fit_and_eta(x_pad, y_pad, mask, cfg, optimiser, params0)
    x, x_nys, w, probs_out = _binary_pipeline(
        (lfi_apply, (state, eta)), probs, k_draw, k_update, k_refill,
        k_nys, n_rec, n_nys, thresh, mesh)
    x_batch, w_rchq, _ = _recombine(x, x_nys, w, state, kernel_apply, batch,
                                    mesh=mesh)
    return state, x_batch, w_rchq, probs_out, _npos(w)


@partial(jax.jit, static_argnames=("cfg", "optimiser", "n_rec", "n_nys",
                                   "thresh", "n_kde", "qmc", "batch",
                                   "kernel_apply", "mesh"))
def fused_bo_step_cont_uniform(x_pad, y_pad, mask, bounds, sobol_state,
                               sobol_offset, k_draw, k_update, k_refill,
                               k_nys, *, cfg, optimiser: str, n_rec: int,
                               n_nys: int, thresh: int, n_kde: int,
                               qmc: bool, batch: int, kernel_apply,
                               params0=None, mesh=None):
    """Refit + _uniform_pipeline + recombination, one program.

    Returns (state, x_batch, w_rchq, wkde_params, did_update)."""
    state, eta = _fit_and_eta(x_pad, y_pad, mask, cfg, optimiser, params0)
    x, x_nys, w, params, did = _uniform_pipeline(
        (lfi_apply, (state, eta)), bounds, sobol_state, sobol_offset,
        k_draw, k_update, k_refill, k_nys, n_rec, n_nys, thresh, n_kde,
        qmc, mesh)
    x_batch, w_rchq, _ = _recombine(x, x_nys, w, state, kernel_apply, batch,
                                    mesh=mesh)
    return state, x_batch, w_rchq, params, did, _npos(w)


@partial(jax.jit, static_argnames=("cfg", "optimiser", "n_rec", "n_nys",
                                   "thresh", "n_kde", "batch",
                                   "kernel_apply", "mesh"))
def fused_bo_step_cont_gauss(x_pad, y_pad, mask, mu, chol, k_draw,
                             k_update, k_refill, k_nys, *, cfg,
                             optimiser: str, n_rec: int, n_nys: int,
                             thresh: int, n_kde: int, batch: int,
                             kernel_apply, params0=None, mesh=None):
    """Refit + _gauss_pipeline + recombination, one program.

    Returns (state, x_batch, w_rchq, wkde_params, did_update)."""
    state, eta = _fit_and_eta(x_pad, y_pad, mask, cfg, optimiser, params0)
    x, x_nys, w, params, did = _gauss_pipeline(
        (lfi_apply, (state, eta)), mu, chol, k_draw, k_update, k_refill,
        k_nys, n_rec, n_nys, thresh, n_kde, mesh)
    x_batch, w_rchq, _ = _recombine(x, x_nys, w, state, kernel_apply, batch,
                                    mesh=mesh)
    return state, x_batch, w_rchq, params, did, _npos(w)


@partial(jax.jit, static_argnames=("cfg", "optimiser", "n_rec", "n_nys",
                                   "thresh", "n_kde", "batch",
                                   "kernel_apply", "mesh"))
def fused_bo_step_cont_wkde(x_pad, y_pad, mask, params_old, bounds, k_draw,
                            k_update, k_refill, k_nys, *, cfg,
                            optimiser: str, n_rec: int, n_nys: int,
                            thresh: int, n_kde: int, batch: int,
                            kernel_apply, params0=None, mesh=None):
    """Refit + _wkde_pipeline + recombination, one program.

    Returns (state, x_batch, w_rchq, params_out)."""
    state, eta = _fit_and_eta(x_pad, y_pad, mask, cfg, optimiser, params0)
    x, x_nys, w, params_out = _wkde_pipeline(
        (lfi_apply, (state, eta)), params_old, bounds, k_draw, k_update,
        k_refill, k_nys, n_rec, n_nys, thresh, n_kde, mesh)
    x_batch, w_rchq, _ = _recombine(x, x_nys, w, state, kernel_apply, batch,
                                    mesh=mesh)
    return state, x_batch, w_rchq, params_out, _npos(w)


# ----------------------------------------------------------------------------
# fully-Bayesian BO step: WSABI base fit + hyper pipeline + candidates +
# recombination as ONE program (Sober.step_fbgp)
# ----------------------------------------------------------------------------

def _fbgp_fit_and_tree(x_pad, y_pad, mask, hypermu, hyperstd, k_hyper,
                       k_qdnys, cfg, optimiser: str, alpha_factor: float,
                       n_hypers: int, n_nys_qd: int, n_qd: int):
    """FitboGP._refit + the whole fbgp_refit hyper pipeline, traced:
    WSABI warp -> base MAP fit -> theta_map -> hyperposterior LML sweep ->
    distillation -> chain caches. Returns (base GPState, alpha,
    fobs_padded, fbgp tree) with the tree in the rc/pi stable layout
    (gp/fbgp.py:_fbgp_tree)."""
    from ..gp.exact import fit_gp_traced
    from ..gp.fbgp import _VBQ_CFG, fbgp_refit_traced
    from ..utils.linalg import remove_anomalies

    y = remove_anomalies(y_pad.reshape(-1))
    alpha = alpha_factor * jnp.max(jnp.where(mask > 0, y, -jnp.inf))
    # padded rows warp at exactly alpha -> 0 before the mask zeroes them
    # (FitboGP._process_y's NaN guard)
    y_at = jnp.where(mask > 0, y, alpha)
    g = jnp.sign(alpha) * jnp.sqrt(
        jnp.maximum(2.0 * (alpha - y_at), 0.0)) * mask
    state = fit_gp_traced(x_pad, g, mask, cfg, optimiser)
    fobs = y_pad.reshape(-1) * mask
    ls = jnp.atleast_1d(state.kernel.params["lengthscale"])
    theta_map = jnp.concatenate([
        jnp.atleast_1d(state.noise), ls,
        jnp.atleast_1d(state.kernel.params["outputscale"])])
    w_qd, theta_qd, linv_ch, alpha_ch = fbgp_refit_traced(
        x_pad, fobs, mask, alpha, theta_map, hypermu, hyperstd,
        k_hyper, k_qdnys, n_hypers=n_hypers, n_nys=n_nys_qd, n_qd=n_qd,
        cfg=_VBQ_CFG)
    tree = (x_pad, theta_qd, linv_ch, alpha_ch, w_qd, mask)
    return state, alpha, fobs, tree


_FBGP_STEP_STATICS = ("cfg", "optimiser", "alpha_factor", "n_hypers",
                      "n_nys_qd", "n_qd", "n_rec", "n_nys", "thresh",
                      "n_kde", "batch", "acq_apply", "mesh")


def _fbgp_step_out(tree, alpha, fobs, x_batch, w_rchq, *tail):
    """Flatten a step result to (fbgp parts..., x_batch, w_rchq, *tail);
    `tail` matches each proposal family's trailing outputs ((params, did)
    for uniform/gauss, (params_out,) for wkde) so the shared dispatch
    branches unpack identically across the exact-GP and FBGP step
    programs. The base GPState is deliberately NOT an output — the host
    only keeps the FBGP tree, and materializing the unused O(n_pad^2)
    posterior caches as program outputs would cost device memory for
    nothing."""
    x_pad, theta_qd, linv_ch, alpha_ch, w_qd, mask = tree
    return (alpha, fobs, w_qd, theta_qd, linv_ch, alpha_ch,
            x_batch, w_rchq) + tail


@partial(jax.jit, static_argnames=_FBGP_STEP_STATICS + ("qmc",))
def fused_fbgp_step_cont_uniform(x_pad, y_pad, mask, hypermu, hyperstd,
                                 k_hyper, k_qdnys, bounds, sobol_state,
                                 sobol_offset, k_draw, k_update, k_refill,
                                 k_nys, *, cfg, optimiser: str,
                                 alpha_factor: float, n_hypers: int,
                                 n_nys_qd: int, n_qd: int, n_rec: int,
                                 n_nys: int, thresh: int, n_kde: int,
                                 qmc: bool, batch: int, acq_apply=None,
                                 mesh=None):
    """WSABI fit + hyper pipeline + _uniform_pipeline + recombination, one
    program. `acq_apply` is an optional FBGP acquisition apply
    (gp/fbgp.py:_fbgp_acq_*): the augmented objective row is then computed
    on the FRESH post-refit tree (strictly newer than the staged flow's
    pre-refit calc_obj). Returns (alpha, fobs, w_qd, theta_qd, chol,
    alpha_ch, x_batch, w_rchq, wkde_params, did_update)."""
    from ..gp.fbgp import _fbgp_cov_apply, fbgp_pi_apply

    state, alpha, fobs, tree = _fbgp_fit_and_tree(
        x_pad, y_pad, mask, hypermu, hyperstd, k_hyper, k_qdnys, cfg,
        optimiser, alpha_factor, n_hypers, n_nys_qd, n_qd)
    x, x_nys, w, params, did = _uniform_pipeline(
        (fbgp_pi_apply, tree), bounds, sobol_state, sobol_offset, k_draw,
        k_update, k_refill, k_nys, n_rec, n_nys, thresh, n_kde, qmc, mesh)
    x_batch, w_rchq, _ = _recombine(
        x, x_nys, w, tree, _fbgp_cov_apply, batch, acq_apply,
        tree if acq_apply is not None else None, mesh)
    return _fbgp_step_out(tree, alpha, fobs, x_batch, w_rchq, params, did,
                          _npos(w))


@partial(jax.jit, static_argnames=_FBGP_STEP_STATICS)
def fused_fbgp_step_cont_wkde(x_pad, y_pad, mask, hypermu, hyperstd,
                              k_hyper, k_qdnys, params_old, bounds, k_draw,
                              k_update, k_refill, k_nys, *, cfg,
                              optimiser: str, alpha_factor: float,
                              n_hypers: int, n_nys_qd: int, n_qd: int,
                              n_rec: int, n_nys: int, thresh: int,
                              n_kde: int, batch: int, acq_apply=None,
                              mesh=None):
    """WSABI fit + hyper pipeline + _wkde_pipeline + recombination, one
    program. Returns (alpha, fobs, w_qd, theta_qd, chol, alpha_ch,
    x_batch, w_rchq, params_out)."""
    from ..gp.fbgp import _fbgp_cov_apply, fbgp_pi_apply

    state, alpha, fobs, tree = _fbgp_fit_and_tree(
        x_pad, y_pad, mask, hypermu, hyperstd, k_hyper, k_qdnys, cfg,
        optimiser, alpha_factor, n_hypers, n_nys_qd, n_qd)
    x, x_nys, w, params_out = _wkde_pipeline(
        (fbgp_pi_apply, tree), params_old, bounds, k_draw, k_update,
        k_refill, k_nys, n_rec, n_nys, thresh, n_kde, mesh)
    x_batch, w_rchq, _ = _recombine(
        x, x_nys, w, tree, _fbgp_cov_apply, batch, acq_apply,
        tree if acq_apply is not None else None, mesh)
    return _fbgp_step_out(tree, alpha, fobs, x_batch, w_rchq, params_out,
                          _npos(w))


@partial(jax.jit, static_argnames=_FBGP_STEP_STATICS)
def fused_fbgp_step_cont_gauss(x_pad, y_pad, mask, hypermu, hyperstd,
                               k_hyper, k_qdnys, mu, chol_prior, k_draw,
                               k_update, k_refill, k_nys, *, cfg,
                               optimiser: str, alpha_factor: float,
                               n_hypers: int, n_nys_qd: int, n_qd: int,
                               n_rec: int, n_nys: int, thresh: int,
                               n_kde: int, batch: int, acq_apply=None,
                               mesh=None):
    """WSABI fit + hyper pipeline + _gauss_pipeline + recombination, one
    program. Returns (alpha, fobs, w_qd, theta_qd, chol, alpha_ch,
    x_batch, w_rchq, wkde_params, did_update)."""
    from ..gp.fbgp import _fbgp_cov_apply, fbgp_pi_apply

    state, alpha, fobs, tree = _fbgp_fit_and_tree(
        x_pad, y_pad, mask, hypermu, hyperstd, k_hyper, k_qdnys, cfg,
        optimiser, alpha_factor, n_hypers, n_nys_qd, n_qd)
    x, x_nys, w, params, did = _gauss_pipeline(
        (fbgp_pi_apply, tree), mu, chol_prior, k_draw, k_update, k_refill,
        k_nys, n_rec, n_nys, thresh, n_kde, mesh)
    x_batch, w_rchq, _ = _recombine(
        x, x_nys, w, tree, _fbgp_cov_apply, batch, acq_apply,
        tree if acq_apply is not None else None, mesh)
    return _fbgp_step_out(tree, alpha, fobs, x_batch, w_rchq, params, did,
                          _npos(w))


@partial(jax.jit, static_argnames=("cfg", "optimiser", "n_rec", "n_nys",
                                   "thresh", "batch", "prune",
                                   "kernel_apply", "mesh"))
def fused_bo_step_dataset(x_pad, y_pad, mask, x_all, avail_mask, k_nys, *,
                          cfg, optimiser: str, n_rec: int, n_nys: int,
                          thresh: float, batch: int, prune: bool,
                          kernel_apply, params0=None, mesh=None):
    """Refit + dataset pi sweep + pruning + recombination, one program.

    Returns (state, idx_global, x_batch, w_rchq)."""
    state, eta = _fit_and_eta(x_pad, y_pad, mask, cfg, optimiser, params0)
    idx_sampled, x_cand, x_nys, w = _dataset_pipeline(
        (lfi_apply, (state, eta)), x_all, avail_mask, k_nys, n_rec, n_nys,
        thresh, prune, mesh)
    x_batch, w_rchq, idx_local = _recombine(x_cand, x_nys, w, state,
                                            kernel_apply, batch, mesh=mesh)
    return state, idx_sampled[idx_local], x_batch, w_rchq, _npos(w)
