"""Importance sampler pipeline: prior -> pi-weighted candidate pool.

Rebuild of SOBER/_sampler.py (RecombinationSampler / EmpiricalSampler /
MixtureSampler). Structural redesign for XLA:

  * The candidate pool has a FIXED size n_rec throughout. The reference's
    recursive_sampling concatenates variable-length accepted subsets
    (SOBER/_sampler.py:205-261); here rejected rows simply keep weight 0 and
    later rounds refill them in place, so every downstream stage (RCHQ,
    KMeans, WKDE refit) compiles once per configuration.
  * Nystrom point selection for continuous domains resamples the pool by
    weight and runs jitted KMeans (reference: SOBER/_sampler.py:316-320).
  * Dataset domains evaluate pi over the full (masked) feature matrix and
    prune with a static top-k (adaptive_pruning, SOBER/_sampler.py:325-349).
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.kmeans import kmeans_resampling
from ..priors.base import BasePrior
from ..priors.continuous import Gaussian, TruncatedGaussian, Uniform
from ..priors.discrete import (
    BinaryPrior,
    CategoricalPrior,
    MixedBinaryPrior,
    MixedCategoricalPrior,
)
from ..utils.prng import KeyRing
from ..utils.weights import (
    cleansing_weights,
    check_weights,
    weighted_resampling,
    deweighted_resampling,
)
from .prior_update import (
    update_binary_prior,
    update_categorical_prior,
    update_continuous_prior,
    update_mixed_prior,
)

# dataset-domain pruning threshold (SOBER/_sampler.py:325-349): shared by
# the staged path (adaptive_pruning) and the fused dataset programs so both
# prune identically
PRUNE_THRESH = 1e-3
from .rchq import recombination


class RecombinationSampler:
    """Kernel recombination step (SOBER/_sampler.py:11-59).

    Multi-chip: when `mesh` is set (Sober(mesh=...)), candidate pools are
    placed row-sharded over the mesh's "cand" axis and every downstream
    stage runs on it. Two schedules:

      * "gspmd" (default): the SAME single-device programs run on sharded
        inputs — XLA auto-partitions the pi sweep, the Gram strips, and the
        reduction tree and inserts the collectives (the scaling-book
        recipe: pick a mesh, annotate shardings, let XLA do the rest).
        Results match the single-device path (identical program).
      * "blockwise": kernel recombination switches to the explicit
        shard_map schedule (parallel/sharded.py:sharded_recombination) —
        per-device local trees, only <= batch_size survivors communicated;
        communication independent of pool size. Selection differs from the
        single-device tree by bracketing (same quadrature invariants).
    """

    def __init__(self, kernel: Callable, thresh: int = 5, seed: int = 0,
                 mesh=None, schedule: str = "gspmd"):
        if schedule not in ("gspmd", "blockwise"):
            raise ValueError('schedule must be "gspmd" or "blockwise"')
        if mesh is not None and schedule == "blockwise":
            import warnings

            # explicit de-scope (VERDICT r4 #8): the fused one-dispatch
            # iteration/step programs are gspmd-only; blockwise keeps the
            # staged multi-dispatch pipeline in exchange for its bounded-
            # communication recombination (docs/MULTICHIP.md). Never
            # downgrade silently.
            warnings.warn(
                'schedule="blockwise" runs the STAGED (multi-dispatch) '
                "pipeline — the fused one-dispatch iteration/step programs "
                'are gspmd-only. Use schedule="gspmd" (default) for '
                "production latency; blockwise bounds recombination "
                "communication independently of the pool size "
                "(docs/MULTICHIP.md).", stacklevel=3)
        self.kernel = kernel
        self.thresh = thresh
        self.keys = KeyRing(seed)
        self.mesh = mesh
        self.schedule = schedule
        # per-iteration acceptance telemetry (set by the fused dispatch /
        # Sober.next_batch): count of positive candidate weights (device
        # scalar — fetch lazily), and which path produced the batch
        self.last_npos = None
        self.last_path = None

    def _pop_npos(self, res, has_diag: bool):
        """Strip the trailing _npos diagnostic from a fused-program result
        (fused_sampling._npos) and stash it; candidates-only programs
        (has_diag False) carry none."""
        if not has_diag:
            return res
        *rest, n_pos = res
        self.last_npos = n_pos
        return tuple(rest)

    def _place_cand(self, x):
        """Row-shard a candidate-axis array over the mesh (no-op without
        one). Row count must divide the mesh for explicit shard_map
        schedules; GSPMD tolerates any shape, so uneven pools just stay
        unsharded."""
        if self.mesh is None:
            return x
        from ..parallel.mesh import shard_candidates

        n_dev = self.mesh.devices.size
        if x.shape[0] % n_dev:
            if self.schedule == "blockwise":
                raise ValueError(
                    f"pool size {x.shape[0]} must be divisible by the "
                    f"{n_dev}-device mesh for the blockwise schedule")
            return x
        return shard_candidates(self.mesh, x)

    def sampling_recombination(self, x_cand, x_nys, weights, batch_size,
                               calc_obj=None):
        if self.mesh is not None and self.schedule == "blockwise":
            from ..parallel.sharded import sharded_recombination

            return sharded_recombination(
                self.mesh, self.kernel, x_cand, x_nys, weights, batch_size,
                calc_obj=calc_obj)
        return recombination(x_cand, x_nys, batch_size, self.kernel,
                             init_weights=weights, calc_obj=calc_obj)


class EmpiricalSampler(RecombinationSampler):
    """pi-importance sampling pipeline (SOBER/_sampler.py:61-382)."""

    def __init__(self, prior: BasePrior, pi, kernel: Callable,
                 thresh: int = 5, label: str = "mixedbinary", seed: int = 0,
                 mesh=None, schedule: str = "gspmd"):
        super().__init__(kernel, thresh=thresh, seed=seed, mesh=mesh,
                         schedule=schedule)
        self.thresh_initial = thresh
        self.prior = prior
        self.prior_initial = prior
        self.pi = pi
        self.label = label
        self.flag = False

    # -- prior management ----------------------------------------------------

    def initialise_prior(self):
        """Reset the proposal to the original domain prior
        (SOBER/_sampler.py:87-111). Reconstructed from the ORIGINAL
        prior's attributes rather than the current proposal's. Continuous
        flows whose original prior carries bounds (Uniform,
        TruncatedGaussian) reset to Uniform over the box exactly like the
        reference (broad re-exploration on stagnation); a bounds-less
        Gaussian original is restored as-is — the reference crashes there
        (Uniform(self.prior.bounds) on the Gaussian-descended bounds-less
        WKDE proposal, SOBER/_sampler.py:92)."""
        p = self.prior_initial
        if self.label == "continuous":
            bounds = getattr(p, "bounds", None)
            self.prior = p if bounds is None else Uniform(bounds)
        elif self.label == "binary":
            self.prior = BinaryPrior(p.n_dims)
        elif self.label == "categorical":
            self.prior = CategoricalPrior(p.categories)
        elif self.label == "mixedbinary":
            self.prior = MixedBinaryPrior(
                p.n_dims_cont, p.n_dims_binary, p.bounds, p.continous_first)
        elif self.label == "mixedcategorical":
            self.prior = MixedCategoricalPrior(
                p.n_dims_cont, p.n_dims_disc, p.categories, p.bounds,
                p.continous_first)

    def update_prior(self, x_cand, weights, verbose: bool = False):
        """Fit the proposal to the weights (SOBER/_sampler.py:113-157).

        For categorical domains x_cand must carry category indices in the
        discrete block.
        """
        key = self.keys.next()
        if self.label == "mixedbinary":
            self.prior = update_mixed_prior(x_cand, weights, self.prior,
                                            label="binary", key=key)
        elif self.label == "mixedcategorical":
            self.prior = update_mixed_prior(x_cand, weights, self.prior,
                                            label="categorical", key=key)
        elif self.label == "continuous":
            self.prior = update_continuous_prior(
                x_cand, weights, self.prior, self.prior.n_dims, key=key)
        elif self.label == "categorical":
            self.prior = update_categorical_prior(
                weights, x_cand.astype(jnp.int32), self.prior)
        elif self.label == "binary":
            self.prior = update_binary_prior(weights, x_cand, self.prior)
        else:
            raise ValueError(
                'The domain type should be from "continuous", "binary", '
                '"categorical", "mixedbinary", "mixedcategorical"')

    def check_categorical(self) -> bool:
        return self.label in ("categorical", "mixedcategorical")

    # -- sampling ------------------------------------------------------------

    def sampling(self, n_rec: int):
        """One pool draw: X ~ prior, w = pi(X)/p(X) (SOBER/_sampler.py:173-187).

        With a mesh, the drawn pool is placed row-sharded BEFORE the pi
        sweep and pdf evaluation — the O(n_rec * n_obs) predict and the
        O(n_rec * n_comp) proposal pdf (the heavy per-draw stages) then run
        partitioned over the candidate axis. The draw itself is O(n_rec*d)
        elementwise and stays replicated so the mesh mode consumes the
        SAME PRNG stream as the single-device path."""
        x_cand = self._place_cand(self.prior.sample(self.keys.next(), n_rec))
        weights = self.pi(x_cand) / jnp.maximum(self.prior.pdf(x_cand), 1e-38)
        return x_cand, cleansing_weights(weights)

    def categorical_sampling(self, n_rec: int):
        """Pool draw returning values and index representation
        (SOBER/_sampler.py:189-203)."""
        x_cand, x_indices = self.prior.sample_both(self.keys.next(), n_rec)
        x_cand = self._place_cand(x_cand)
        x_indices = self._place_cand(x_indices)
        if hasattr(self.prior, "pdf_indices"):
            pdfs = self.prior.pdf_indices(x_indices)
        else:
            pdfs = jnp.exp(self.prior.logpdf_indices(
                x_indices.astype(jnp.int32)))
        weights = self.pi(x_cand) / jnp.maximum(pdfs, 1e-38)
        return x_cand, x_indices, cleansing_weights(weights)

    def _draw(self, n_rec: int):
        if self.check_categorical():
            x, xi, w = self.categorical_sampling(n_rec)
        else:
            x, w = self.sampling(n_rec)
            xi = None
        return x, xi, w

    def recursive_sampling(self, n_rec: int, n_repeat: int = 5,
                           verbose: bool = False):
        """Fixed-size accumulate-until-enough sampling
        (SOBER/_sampler.py:205-261). Rows with zero weight are refilled in
        place by later rounds; if nothing is ever accepted, fall back to
        uniform weights over a fresh draw (self.flag = True)."""
        self.flag = False
        x, xi, w = self._draw(n_rec)
        n_accepted = int(jnp.sum(w > 0))
        for _ in range(1, n_repeat):
            if n_accepted > self.thresh:
                break
            x2, xi2, w2 = self._draw(n_rec)
            fill = jnp.logical_and(w == 0, w2 > 0)
            x = jnp.where(fill[:, None], x2, x)
            if xi is not None:
                xi = jnp.where(fill[:, None], xi2, xi)
            w = jnp.where(fill, w2, w)
            n_accepted = int(jnp.sum(w > 0))
        if n_accepted == 0:
            self.flag = True
            w = jnp.full((n_rec,), 1.0 / n_rec)
        else:
            w = cleansing_weights(w)
        if self.check_categorical():
            return x, xi, w
        return x, w

    def _select_nys(self, x_cand, weights, n_nys: int):
        """Nystrom subset: KMeans centroids for continuous domains, inverse-
        weight resampling otherwise (SOBER/_sampler.py:316-320)."""
        if self.label == "continuous":
            n_in = min(x_cand.shape[0], 4096)
            idx = weighted_resampling(self.keys.next(), weights, n_in)
            return kmeans_resampling(x_cand[idx], n_nys)
        idx_nys = deweighted_resampling(self.keys.next(), weights, n_nys)
        return x_cand[idx_nys]

    def _fused_candidates(self, n_rec: int, n_nys: int):
        """One-program fast path for the full candidate pipeline
        (core/fused_sampling.py): draw -> pi -> weight check -> proposal
        update -> refill redraw -> Nystrom subset traced into a single XLA
        program, eliminating the per-stage host round-trips of the staged
        path below. Returns (x_cand, x_nys, weights) or None when the
        configuration isn't covered (blockwise-schedule mesh mode,
        non-GPState pi, exotic continuous priors; dataset pools go through
        _fused_dataset_iteration instead) — the staged host path then runs
        unchanged. Under Sober(mesh=..., schedule="gspmd") the fused
        programs run with candidate pools sharded over the mesh's "cand"
        axis (fused_sampling._shard_cand). In the common branch the fused program
        consumes the same 4 KeyRing keys through the same primitives as the
        host path; outputs match the staged path in distribution (exactly,
        unless ulp-level XLA fusion noise shifts a stochastic resampler —
        see core/fused_sampling.py)."""
        return self._fused_dispatch(n_rec, n_nys, batch=None)

    def _fused_iteration(self, n_rec: int, n_nys: int, batch: int,
                         obj=None):
        """Candidates + kernel recombination as ONE program (the whole
        non-dataset `Sober.next_batch` body minus the model refit). Returns
        (x_batch, w_rchq) or None when the fused path doesn't cover the
        configuration (see _fused_candidates) or the kernel lacks the
        rc_apply/rc_tree stable-callable protocol. `obj` is an optional
        (rc_apply, rc_tree) pair of a calc_obj acquisition — the augmented
        objective row then joins the fused program too."""
        if not hasattr(self.kernel, "rc_apply"):
            return None
        return self._fused_dispatch(n_rec, n_nys, batch=batch, obj=obj)

    def _fused_step(self, fit, n_rec: int, n_nys: int, batch: int,
                    prune: bool = True):
        """GP refit + candidates + recombination as ONE program (the whole
        `Sober.step` body). `fit` = (x_pad, y_pad, mask, cfg, optimiser,
        params0) with params0 an optional warm-start GPParams (or None).
        Returns (state, x_batch, w_rchq) — or (state, idx_global, x_batch,
        w_rchq) for dataset pools — or None when not covered."""
        if not hasattr(self.kernel, "rc_apply"):
            return None
        if self.label == "dataset":
            return self._fused_dataset_iteration(n_rec, n_nys, batch,
                                                 prune, fit=fit)
        return self._fused_dispatch(n_rec, n_nys, batch, fit=fit)

    def _fused_dataset_iteration(self, n_rec: int, n_nys: int, batch: int,
                                 prune: bool, fit=None, obj=None):
        """Dataset-domain analogue of _fused_iteration: pi sweep + pruning
        + Nystrom subset + recombination as one program (plus the GP refit
        when `fit` is given). Returns (idx_global, x_batch, w_rchq) —
        prefixed with the fitted state in step mode — or None when not
        covered."""
        from ..priors.dataset import DatasetPrior

        if ((self.mesh is not None and self.schedule != "gspmd")
                or not hasattr(self.kernel, "rc_apply")
                or type(self.prior) is not DatasetPrior):
            return None
        pi_pair = self._pi_pair(step=fit is not None)
        if pi_pair is None:
            return None
        from . import fused_sampling as fs

        pool = (self.prior.available_candidates(),
                self.prior.available_mask(), self.keys.next())
        common = dict(n_rec=n_rec, n_nys=n_nys, thresh=PRUNE_THRESH,
                      batch=batch, prune=prune,
                      kernel_apply=self.kernel.rc_apply)
        if self.mesh is not None:
            common.update(mesh=self.mesh)
        if fit is not None:
            return self._pop_npos(fs.fused_bo_step_dataset(
                *fit[:3], *pool, cfg=fit[3], optimiser=fit[4],
                params0=fit[5], **common), True)
        if obj is not None:
            common.update(obj_apply=obj[0], obj_tree=obj[1])
        return self._pop_npos(fs.fused_iteration_dataset(
            pi_pair[1], *pool, self.kernel.rc_tree, pi_apply=pi_pair[0],
            **common), True)

    def _pi_pair(self, step: bool = False):
        """The pi stable-callable (pi_apply, pi_tree) for the fused
        programs, or None when self.pi doesn't expose the protocol (see
        core/fused_sampling.py). PI (exact GP), PIFBGP and PIBQ all carry
        it; step mode additionally requires the exact-GP pi because the
        in-trace refit rebuilds a plain GPState (Sober.step rejects
        FBGP/BQ models up front for the same reason)."""
        from ..gp.exact import GPState
        from .pi import PI

        if isinstance(self.pi, PI):
            if not isinstance(self.pi.model, GPState):
                return None
        elif step or not hasattr(self.pi, "pi_tree"):
            return None
        apply = getattr(self.pi, "pi_apply", None)
        if apply is None:
            return None
        return apply, self.pi.pi_tree

    def _fused_dispatch(self, n_rec: int, n_nys: int, batch, fit=None,
                        obj=None, fbgp_fit=None):
        if self.mesh is not None and self.schedule != "gspmd":
            # the blockwise schedule's explicit shard_map recombination
            # (parallel/sharded.py) only exists on the staged path
            return None
        # four modes share the pipeline bodies (core/fused_sampling.py):
        #   candidates-only (batch None), candidates+recombination
        #   (batch set), refit+candidates+recombination (fit set — the
        #   model/kernel tree is then built in-trace from the padded
        #   observation buffer instead of being passed in), and the
        #   fully-Bayesian step (fbgp_fit set — WSABI base fit + hyper
        #   pipeline + candidates + recombination; continuous proposal
        #   families only)
        step = fit is not None
        fstep = fbgp_fit is not None
        if fstep:
            if batch is None:
                return None
            # fbgp_fit = ((x_pad, y_pad, mask, hypermu, hyperstd, k_hyper,
            #              k_qdnys), statics-dict)
            head, tail = tuple(fbgp_fit[0]), ()
            rc = dict(batch=batch, **fbgp_fit[1])
        else:
            pi_pair = self._pi_pair(step=step)
            if pi_pair is None:
                return None
            rc = {} if batch is None else dict(
                kernel_apply=self.kernel.rc_apply, batch=batch)
            if step:
                head, tail = tuple(fit[:3]), ()
                rc.update(cfg=fit[3], optimiser=fit[4], params0=fit[5])
            else:
                head = (pi_pair[1],)
                tail = () if batch is None else (self.kernel.rc_tree,)
                rc.update(pi_apply=pi_pair[0])
                if obj is not None and batch is not None:
                    # calc_obj as a stable-callable pair: the augmented
                    # objective row rides the fused recombination (step
                    # mode excluded — its obj tree would be stale
                    # pre-refit)
                    rc.update(obj_apply=obj[0], obj_tree=obj[1])
        if self.mesh is not None:
            # gspmd mesh mode: the SAME one-dispatch programs run with
            # candidate pools constrained to P("cand", ...) inside the
            # trace (fused_sampling._shard_cand) — XLA partitions the pi
            # sweep, feature strip and reduction bulk over the mesh
            rc.update(mesh=self.mesh)

        if self.label == "binary" and type(self.prior) is BinaryPrior:
            if fstep:
                return None
            from . import fused_sampling as fs

            fn = (fs.fused_bo_step_binary if step
                  else fs.fused_iteration_binary if batch is not None
                  else fs.fused_candidates_binary)
            k = [self.keys.next() for _ in range(4)]
            *out, probs = self._pop_npos(fn(
                *head, self.prior.probs, *k, *tail,
                n_rec=n_rec, n_nys=n_nys, thresh=self.thresh_initial, **rc),
                "batch" in rc)
            self.prior = BinaryPrior(self.prior.n_dims, probs=probs)
            return tuple(out)

        if self.label == "continuous":
            from ..priors.wkde import WeightedKernelDensityEstimation
            from . import fused_sampling as fs

            prior = self.prior
            n_kde = min(4096, n_rec)

            def wkde_holder(params, bounds):
                return WeightedKernelDensityEstimation.from_params(
                    params, prior.n_dims, bounds, n_kde)

            if (type(prior) is WeightedKernelDensityEstimation
                    and prior._params["x_obs"].shape[0] == n_kde):
                fn = (fs.fused_fbgp_step_cont_wkde if fstep
                      else fs.fused_bo_step_cont_wkde if step
                      else fs.fused_iteration_cont_wkde if batch is not None
                      else fs.fused_candidates_cont_wkde)
                k = [self.keys.next() for _ in range(4)]
                *out, params = self._pop_npos(fn(
                    *head, prior._params, prior.bounds, *k, *tail,
                    n_rec=n_rec, n_nys=n_nys,
                    thresh=self.thresh_initial, n_kde=n_kde, **rc),
                    "batch" in rc)
                self.prior = wkde_holder(params, prior.bounds)
                return tuple(out)

            if type(prior) is Uniform:
                fn = (fs.fused_fbgp_step_cont_uniform if fstep
                      else fs.fused_bo_step_cont_uniform if step
                      else fs.fused_iteration_cont_uniform
                      if batch is not None
                      else fs.fused_candidates_cont_uniform)
                k = [self.keys.next() for _ in range(4)]
                *out, params, did = self._pop_npos(fn(
                    *head, prior.bounds, prior._sobol,
                    prior._offset, *k, *tail, n_rec=n_rec, n_nys=n_nys,
                    thresh=self.thresh_initial, n_kde=n_kde, qmc=prior.qmc,
                    **rc), "batch" in rc)
                if prior.qmc:
                    # the common path's one Sobol draw
                    prior._offset += n_rec
                # the Uniform -> WKDE switch needs one scalar fetch; it
                # happens once per run (the proposal is a WKDE afterwards)
                if bool(did):
                    self.prior = wkde_holder(params, prior.bounds)
                return tuple(out)

            if type(prior) is Gaussian:
                # the SBI / run_BASQ entry: Gaussian prior -> bounds-free
                # WKDE proposal (the family switch fetch, once per run)
                fn = (fs.fused_fbgp_step_cont_gauss if fstep
                      else fs.fused_bo_step_cont_gauss if step
                      else fs.fused_iteration_cont_gauss
                      if batch is not None
                      else fs.fused_candidates_cont_gauss)
                k = [self.keys.next() for _ in range(4)]
                *out, params, did = self._pop_npos(fn(
                    *head, prior.mu, prior.chol, *k, *tail, n_rec=n_rec,
                    n_nys=n_nys, thresh=self.thresh_initial, n_kde=n_kde,
                    **rc), "batch" in rc)
                if bool(did):
                    self.prior = wkde_holder(params, None)
                return tuple(out)

            if type(prior) is TruncatedGaussian:
                # the wrapper's default SBI entry (TruncatedGaussian on
                # the normalized unit box, apps/wrapper.py)
                if fstep:
                    return None
                fn = (fs.fused_bo_step_cont_tgauss if step
                      else fs.fused_iteration_cont_tgauss
                      if batch is not None
                      else fs.fused_candidates_cont_tgauss)
                k = [self.keys.next() for _ in range(4)]
                *out, params, did = self._pop_npos(fn(
                    *head, prior.mu, prior.chol, prior.bounds[0],
                    prior.bounds[1], prior.constant, prior.tmvn.prec,
                    prior.tmvn.cond_sd, *k, *tail, n_rec=n_rec,
                    n_nys=n_nys, thresh=self.thresh_initial, n_kde=n_kde,
                    gibbs=prior._use_gibbs, n_rounds=prior.n_rounds,
                    n_sweeps=prior.tmvn.burn_in + prior.tmvn.thin, **rc),
                    "batch" in rc)
                if bool(did):
                    self.prior = wkde_holder(params, prior.bounds)
                return tuple(out)

        if self.label in ("categorical", "mixedbinary", "mixedcategorical"):
            if fstep:
                return None
            return self._fused_discrete(n_rec, n_nys, head, tail, rc)

        return None

    def _fused_discrete(self, n_rec: int, n_nys: int, head, tail, rc):
        """Categorical / mixed domains through the generic spec-driven
        programs (fused_sampling.fused_*_discrete). `head`/`tail`/`rc`
        come from _fused_dispatch and select the fusion level."""
        from ..priors.wkde import WeightedKernelDensityEstimation
        from . import fused_sampling as fs

        prior = self.prior
        label = self.label
        n_kde = min(4096, n_rec)
        sob0 = jnp.zeros((), jnp.uint32)

        if label == "categorical":
            if type(prior) is not CategoricalPrior:
                return None
            spec = fs.DomainSpec("categorical", True, 0, prior.n_dims,
                                 prior.c_max)
            disc_tree = (prior.weights, prior.valid_mask, prior.value_table)
            cont_tree, entry = (), "none"
            sobol_state, sobol_offset, qmc = sob0, 0, False
            cont_prior = None
        else:
            if label == "mixedbinary":
                if (type(prior) is not MixedBinaryPrior
                        or type(prior.prior_disc) is not BinaryPrior):
                    return None
                disc_tree, c_max = prior.prior_disc.probs, 0
            else:
                if (type(prior) is not MixedCategoricalPrior
                        or type(prior.prior_disc) is not CategoricalPrior):
                    return None
                pd = prior.prior_disc
                disc_tree = (pd.weights, pd.valid_mask, pd.value_table)
                c_max = pd.c_max
            cont_prior = prior.prior_cont
            spec = fs.DomainSpec(label, prior.continous_first,
                                 prior.n_dims_cont, prior.n_dims_disc,
                                 c_max)
            if type(cont_prior) is Uniform:
                entry, cont_tree = "uniform", cont_prior.bounds
                sobol_state = cont_prior._sobol
                sobol_offset, qmc = cont_prior._offset, cont_prior.qmc
            elif (type(cont_prior) is WeightedKernelDensityEstimation
                    and cont_prior._params["x_obs"].shape[0] == n_kde):
                entry = "wkde"
                cont_tree = (cont_prior._params, cont_prior.bounds)
                sobol_state, sobol_offset, qmc = sob0, 0, False
            else:
                return None

        step = "cfg" in rc
        fn = (fs.fused_bo_step_discrete if step
              else fs.fused_iteration_discrete if "batch" in rc
              else fs.fused_candidates_discrete)
        k = [self.keys.next() for _ in range(4)]
        *out, params, did = self._pop_npos(fn(
            *head, cont_tree, disc_tree, sobol_state, sobol_offset, *k,
            *tail, spec=spec, n_rec=n_rec, n_nys=n_nys,
            thresh=self.thresh_initial, n_kde=n_kde, qmc=qmc, entry=entry,
            **rc), "batch" in rc)
        cont_out, disc_out = params

        def rebuild_disc(dt):
            if spec.c_max:
                cats = (prior.categories if label == "categorical"
                        else prior.prior_disc.categories)
                new = CategoricalPrior(cats)
                new.weights = dt[0]
                return new
            return BinaryPrior(spec.nd, probs=dt)

        def wkde_holder(params_c):
            return WeightedKernelDensityEstimation.from_params(
                params_c, spec.nc, cont_prior.bounds, n_kde)

        if label == "categorical":
            # disc_out was old-vs-new selected on device: rebuild always
            self.prior = rebuild_disc(disc_out)
        elif entry == "wkde":
            prior.prior_cont = wkde_holder(cont_out)
            prior.prior_disc = rebuild_disc(disc_out)
            if label == "mixedbinary":
                prior.prior_binary = prior.prior_disc
        else:
            # uniform entry: the Uniform -> WKDE family switch needs one
            # scalar fetch, paid once per run (see the continuous branch)
            if qmc:
                cont_prior._offset += n_rec
            if bool(did):
                prior.prior_cont = wkde_holder(cont_out)
                prior.prior_disc = rebuild_disc(disc_out)
                if label == "mixedbinary":
                    prior.prior_binary = prior.prior_disc
        return tuple(out)

    def sampling_candidates(self, n_rec: int, n_nys: int,
                            verbose: bool = False):
        """Full pipeline: draw -> update prior -> redraw -> Nystrom subset
        (SOBER/_sampler.py:263-323).

        verbose=True keeps the staged path (matching next_batch's guard at
        core/sober.py:190): the fused program hides the per-stage weight-
        health branch, self.flag and the thresh state machine that the
        staged diagnostics report."""
        assert n_rec > n_nys
        if not verbose:
            fused = self._fused_candidates(n_rec, n_nys)
            if fused is not None:
                return fused

        # the reference retries recursive_sampling up to self.thresh times
        # (n_nys after the prior update — SOBER/_sampler.py:292-315); round-1
        # hardcoded 5, giving up and falling back to uniform weights far
        # sooner in sparse-acceptance regimes (ADVICE r1)
        x_cand, xi, weights = self._draw(n_rec)
        if bool(check_weights(weights, self.thresh)):
            self.update_prior(xi if xi is not None else x_cand, weights)
            self.thresh = n_nys
            out = self.recursive_sampling(n_rec, n_repeat=self.thresh)
        else:
            out = self.recursive_sampling(n_rec, n_repeat=self.thresh)
            if self.flag:
                x_cand, weights = out[0], out[-1]
                self.thresh = self.thresh_initial
                return x_cand, x_cand[:n_nys], weights
            xj = out[1] if self.check_categorical() else out[0]
            self.update_prior(xj, out[-1])
            self.thresh = n_nys
            out = self.recursive_sampling(n_rec, n_repeat=self.thresh)
        x_cand, weights = out[0], out[-1]
        x_nys = self._select_nys(x_cand, weights, n_nys)
        self.thresh = self.thresh_initial
        return x_cand, x_nys, weights

    # -- dataset domains -----------------------------------------------------

    def adaptive_pruning(self, weights, n_rec: int, n_nys: int,
                         thresh: float = PRUNE_THRESH):
        """Static top-k pruning (SOBER/_sampler.py:325-349): keep the top
        n_rec candidates by weight; of those, rows below `thresh` are kept
        only down to the n_nys floor."""
        n = weights.shape[0]
        k = min(n_rec, n)
        w_top, idx_top = jax.lax.top_k(weights, k)
        rank = jnp.arange(k)
        keep = jnp.logical_or(w_top > thresh, rank < n_nys)
        return idx_top, keep

    def sampling_datasets(self, n_rec: int, n_nys: int,
                          dataset_pruning: bool = True):
        """pi over the whole dataset -> prune -> Nystrom subset
        (SOBER/_sampler.py:351-382). Returns (idx_sampled, X_cand, X_nys,
        weights); idx_sampled maps pool rows to dataset rows.

        With a mesh, the full (n_total, d) feature matrix is placed
        row-sharded, so the dataset-domain pi sweep — the dominant cost at
        reference scale (133k x 2048 Tanimoto fingerprints, SURVEY §5.7) —
        and the top-k pruning run partitioned over devices; only the
        pruned (n_rec, d) pool is gathered."""
        assert n_rec > n_nys
        x_all = self._place_cand(self.prior.available_candidates())
        weights = self.pi(x_all)
        weights = jnp.where(self.prior.available_mask(), weights, 0.0)

        if dataset_pruning:
            idx_sampled, keep = self.adaptive_pruning(weights, n_rec, n_nys)
            x_cand = self._place_cand(x_all[idx_sampled])
            w = jnp.where(keep, weights[idx_sampled], 0.0)
        else:
            idx_sampled = jnp.arange(x_all.shape[0])
            x_cand = x_all
            w = weights

        w = cleansing_weights(w)
        idx_nys = deweighted_resampling(self.keys.next(), w, n_nys)
        x_nys = x_cand[idx_nys]
        return idx_sampled, x_cand, x_nys, w


class MixtureSampler:
    """pi-WKDE + prior mixture for posterior SIR sampling
    (SOBER/_sampler.py:384-447)."""

    def __init__(self, prior, sober, ratio_wkde: float = 0.5, seed: int = 0):
        self.prior = prior
        self.sober = sober
        self.bounds = getattr(prior, "bounds", None)
        self.ratio_wkde = ratio_wkde
        self.keys = KeyRing(seed)

    def sample(self, key, n_samples: int) -> jax.Array:
        n_wkde = int(self.ratio_wkde * n_samples)
        n_prior = n_samples - n_wkde
        k1, k2 = jax.random.split(key)
        parts = []
        if n_wkde:
            parts.append(self.sober.prior.sample(k1, n_wkde))
        if n_prior:
            parts.append(self.prior.sample(k2, n_prior))
        return jnp.concatenate(parts, axis=0)

    def pdf(self, x) -> jax.Array:
        return (self.ratio_wkde * self.sober.prior.pdf(x)
                + (1.0 - self.ratio_wkde) * self.prior.pdf(x))
