"""The Sober orchestrator: batch Bayesian optimization as batch Bayesian
quadrature.

Rebuild of SOBER/_sober.py. One `next_batch` call runs the full acquisition
pipeline: (optional prior reset) -> pi-importance candidate pool -> Nystrom
subset -> kernel recombination -> batch.
"""
from __future__ import annotations

import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..gp.exact import GPState
from .pi import PI
from .rckernel import RecombinationKernel
from .sampler import EmpiricalSampler


class Sober(EmpiricalSampler):
    def __init__(self, prior, model, thresh: int = 5,
                 sampler_type: str = "lfi",
                 kernel_type: str = "predictive_covariance",
                 dataset_pruning: bool = True, seed: int = 0,
                 mesh=None, schedule: str = "gspmd"):
        """(SOBER/_sober.py:9-39)

        Args:
          prior: a prior from sober_tpu.priors
          model: a fitted GPState, or a model object exposing is_fbgp /
                 is_bq flags (FBGP / warped-BQ families)
          thresh: minimum distinct positive weights before the weights are
                  considered degenerate
          sampler_type: "lfi" (likelihood-free inference pi)
          kernel_type: "predictive_covariance" |
                       "weighted_predictive_covariance" | "kernel"
          dataset_pruning: prune dataset candidate pools by pi weight
          mesh: optional jax.sharding.Mesh with a "cand" axis — runs the
                FULL pipeline (pi sweep, learned-proposal updates, Nystrom
                selection, recombination, dataset pruning) with candidate
                pools sharded over the mesh. No reference analogue (the
                reference is single-device, SURVEY §5.8).
          schedule: "gspmd" (XLA auto-partitioning of the single-device
                programs — same results as mesh=None) or "blockwise"
                (explicit shard_map recombination with pool-size-
                independent communication); see RecombinationSampler.
        """
        self.sampler_type = sampler_type
        self.kernel_type = kernel_type
        self.dataset_pruning = dataset_pruning
        self.check_model_type(model)
        pi, kernel = self.initialisation(model)
        self.n_batches_until_reset = 3
        self.last_timings: dict[str, float] = {}
        # acceptance telemetry (VERDICT r4 #9): did the last iteration fire
        # the stagnation reset, and how many resets fired so far. last_npos
        # / last_path live on RecombinationSampler.
        self.last_reset = False
        self.reset_count = 0
        super().__init__(prior, pi, kernel, thresh=thresh, label=prior.type,
                         seed=seed, mesh=mesh, schedule=schedule)

    # -- model wiring --------------------------------------------------------

    def check_model_type(self, model):
        """Duck-typed model family sniffing (SOBER/_sober.py:41-54)."""
        if hasattr(model, "is_fbgp"):
            self.fbgp, self.is_bq = True, False
            if getattr(model, "mask", None) is not None:
                self.n_init = int(model.mask.sum())
            else:
                self.n_init = len(model.fobs)
        elif hasattr(model, "is_bq"):
            self.fbgp, self.is_bq = False, True
            self.n_init = len(model.y_log)
        else:
            self.fbgp, self.is_bq = False, False
            if getattr(model, "mask", None) is not None:
                self.n_init = int(model.mask.sum())
            else:
                self.n_init = int(model.y.shape[0])

    def initialisation(self, model):
        """Wire pi and the recombination kernel (SOBER/_sober.py:56-72)."""
        if self.fbgp:
            pi = model.make_pi()
            kernel = (model.rc_kernel() if hasattr(model, "rc_kernel")
                      else model.marginal_predictive_covariance)
        elif self.is_bq:
            pi = model.make_pi()
            kernel = (model.rc_kernel() if hasattr(model, "rc_kernel")
                      else model.gspace_kernel)
        else:
            pi = PI(model, label=self.sampler_type)
            kernel = RecombinationKernel(model, mode=self.kernel_type)
        return pi, kernel

    def update_model(self, model):
        """Swap in a refit model, keeping the learned proposal
        (SOBER/_sober.py:74-82). n_init is pinned at construction — the
        stagnation heuristic measures progress since then."""
        n_init = self.n_init
        self.check_model_type(model)
        self.n_init = n_init
        pi, kernel = self.initialisation(model)
        self.pi = pi
        self.kernel = kernel

    # -- prior reset heuristic ----------------------------------------------

    def _targets(self) -> np.ndarray:
        if self.fbgp:
            fobs = np.asarray(self.pi.model.fobs)
            mask = getattr(self.pi.model, "mask", None)
            if mask is not None:
                fobs = fobs[np.asarray(mask) > 0]
            return fobs
        if self.is_bq:
            return np.asarray(self.pi.model.y_log)
        y = np.asarray(self.pi.model.y)
        mask = getattr(self.pi.model, "mask", None)
        if mask is not None:
            y = y[np.asarray(mask) > 0]
        return y

    def should_reset_prior(self, batch_size: int,
                           recycle_prior: bool, targets=None) -> bool:
        """Stagnation heuristic: reset the proposal after 3 non-improving
        batches (SOBER/_sober.py:84-123). Host-side: operates on a handful
        of scalars. `targets` overrides the model-derived observation
        history (Sober.step runs the heuristic BEFORE the in-program
        refit, off the y buffer it is about to fit)."""
        if targets is None:
            targets = self._targets()
        n_targets = len(targets)
        learning_length = n_targets - self.n_init
        if learning_length <= 0 or learning_length == batch_size:
            return False
        cummax = np.maximum.accumulate(targets)
        y_max = targets.max()
        reached = np.flatnonzero(np.diff(cummax >= y_max))
        idx_max = int(reached[0]) if len(reached) else 0
        n_iterations = int(np.ceil(learning_length / batch_size))
        n_batches = 1
        for n_batches in range(1, n_iterations + 1):
            if n_batches * batch_size >= idx_max:
                break
        n_nonimproved = n_iterations - n_batches + 2
        if n_nonimproved >= self.n_batches_until_reset:
            return True
        if not recycle_prior:
            return True
        return False

    def _mark_reset(self):
        """initialise_prior + telemetry bookkeeping."""
        self.last_reset = True
        self.reset_count += 1
        self.initialise_prior()

    # -- main entry ----------------------------------------------------------

    def next_batch(self, n_rec: int, n_nys: int, batch_size: int,
                   calc_obj=None, return_weights: bool = False,
                   recycle_prior: bool = True, verbose: bool = False,
                   polish: bool = False):
        """Sample the next batch via kernel recombination
        (SOBER/_sober.py:125-195).

        Returns X_batch (batch_size, d); with return_weights=True returns
        (w, X_batch); for dataset domains returns (global_indices, X_batch).

        polish: exploit polish (no reference analogue) — replace the
        lowest-weight batch point with a projected-Adam ascent of the
        posterior mean, multi-started from the incumbent and the heaviest
        batch points (gp.exact.polish_posterior_mean). Active only for
        pure-BO selection on bounded continuous domains with an exact-GP
        model: quadrature batches (BQ/FBGP models, return_weights) must
        stay recombination-exact, gradients are meaningless on
        discrete/dataset pools, and calc_obj-augmented selection already
        spends its degree of freedom on the acquisition push.
        """
        t0 = time.monotonic()
        idx_sampled = None
        self.last_reset = False
        # calc_obj with the rc_apply/rc_tree stable-callable protocol (e.g.
        # SOBERUCB, FBGPAcquisitionFunction) keeps the fused fast path —
        # the augmented objective row joins the one-program recombination;
        # a bare callable falls back to the staged path
        obj = ((calc_obj.rc_apply, calc_obj.rc_tree)
               if calc_obj is not None and hasattr(calc_obj, "rc_apply")
               else None)
        fusable = calc_obj is None or obj is not None
        if self.label != "dataset":
            if self.should_reset_prior(batch_size, recycle_prior):
                if verbose:
                    print("The prior was initialised.")
                self._mark_reset()
            if not verbose and fusable:
                # candidates + recombination as ONE XLA program (verbose
                # wants per-stage prints, so it keeps the staged path)
                fused = self._fused_iteration(n_rec, n_nys, batch_size,
                                              obj=obj)
                if fused is not None:
                    x_batch, w_rchq = fused
                    return self._finish_batch(x_batch, w_rchq, t0,
                                              return_weights, polish,
                                              calc_obj)
            x_cand, x_nys, weights = self.sampling_candidates(
                n_rec, n_nys, verbose=verbose)
        else:
            if not verbose and fusable:
                fused = self._fused_dataset_iteration(
                    n_rec, n_nys, batch_size, self.dataset_pruning, obj=obj)
                if fused is not None:
                    idx_global, x_batch, w_rchq = fused
                    return self._finish_batch(x_batch, w_rchq, t0,
                                              return_weights, polish,
                                              calc_obj,
                                              idx_global=idx_global)
            idx_sampled, x_cand, x_nys, weights = self.sampling_datasets(
                n_rec, n_nys, dataset_pruning=self.dataset_pruning)
        t1 = time.monotonic()

        if verbose:
            print(f"--- candidate generation {t1 - t0:.3e} [s]")
            print("|| summary of sampling ||")
            print(f" # of recombination samples: {x_cand.shape[0]:.3e}")
            print(f" # of Nystrom samples: {x_nys.shape[0]:.3e}")
            print(f" # of nonzero weights: {int((weights > 0).sum()):.3e}")
            print("--- Start kernel recombination...")

        self.last_npos = jnp.sum(weights > 0)
        self.last_path = "staged"
        idx_rchq, w_rchq = self.sampling_recombination(
            x_cand, x_nys, weights, batch_size, calc_obj=calc_obj)
        x_batch = x_cand[idx_rchq]
        if self._polish_eligible(polish, calc_obj, return_weights):
            x_batch = self._exploit_polish(x_batch)
        t2 = time.monotonic()
        self.last_timings = {
            "candidates": t1 - t0,
            "recombination": t2 - t1,
            "total": t2 - t0,
        }
        if verbose:
            print(f"--- Finished all tasks {t2 - t0:.3e} [s]")

        if return_weights:
            return w_rchq, x_batch
        if self.label == "dataset":
            idx_global = idx_sampled[idx_rchq]
            return idx_global, x_batch
        return x_batch

    def step(self, x_obs, y_obs, n_rec: int, n_nys: int, batch_size: int,
             cfg=None, optimiser: str = "adam", bucket: int = 128,
             recycle_prior: bool = True, return_weights: bool = False,
             polish: bool = False, warm_start: bool = False):
        """One-program BO iteration: bucket-padded GP MAP refit + the full
        acquisition pipeline (candidate draw / dataset pi sweep, learned-
        proposal update, Nystrom selection, kernel recombination) traced
        into a SINGLE XLA dispatch (core/fused_sampling.py
        fused_bo_step_*). Semantically equivalent to

            model = fit_gp_padded(x_obs, y_obs, cfg, optimiser=optimiser)
            sober.update_model(model)
            sober.next_batch(n_rec, n_nys, batch_size, ...)

        and falls back to exactly that staged sequence when the fused path
        doesn't cover the configuration (blockwise-schedule mesh mode,
        exotic priors, kernels without the rc protocol; categorical/mixed/
        dataset domains ARE covered via fused_bo_step_discrete/_dataset,
        and gspmd mesh mode runs the same fused programs with the
        candidate axis sharded over the mesh). The learned proposal,
        prior-reset heuristic, and dataset pruning all stay active.

        FBGP/BQ models are rejected with a TypeError: `step` refits a plain
        exact GP, which would silently discard the fully-Bayesian (or
        warped-BQ) marginalization — refit those families explicitly
        (gp.fbgp.fbgp_refit / ScaleMmltGP) and call update_model +
        next_batch instead.

        warm_start: initialise the in-program MAP refit from the current
        model's hypers (gp.exact.raw_params_from_state) — with the plateau
        early-stop the refit then converges in a few live steps. Opt-in:
        carrying hypers across refits is only sound when successive fits
        target the same objective on growing data (a plain BO loop); it
        demonstrably hurts EP-style re-targeted refits (apps/wrapper.py
        set_rbf_model). Falls back to a cold start when the current model's
        parameter shapes don't match `cfg` (e.g. isotropic state, ARD cfg).

        No reference analogue: the reference's iteration is inherently
        multi-stage host code (SOBER/_sober.py:125-195 plus the
        per-iteration GPyTorch refit)."""
        from ..gp.exact import GPConfig, fit_gp_padded, pad_observations

        if self.fbgp or self.is_bq:
            raise TypeError(
                "Sober.step refits a plain exact GP and would silently "
                "replace this sampler's FBGP/BQ model (dropping the "
                "fully-Bayesian / warped-BQ marginalization). Refit the "
                "model explicitly (e.g. gp.fbgp.fbgp_refit) and call "
                "update_model + next_batch instead.")
        t0 = time.monotonic()
        self.last_reset = False
        if cfg is None:
            cfg = GPConfig()
        if self.label != "dataset" and self.should_reset_prior(
                batch_size, recycle_prior, targets=np.asarray(y_obs)):
            self._mark_reset()

        params0 = self._warm_start_params(cfg, jnp.asarray(x_obs).shape[1]) \
            if warm_start else None
        x_pad, y_pad, mask = pad_observations(
            jnp.asarray(x_obs), jnp.asarray(y_obs), bucket)
        fused = self._fused_step(
            (x_pad, y_pad, mask, cfg, optimiser, params0), n_rec, n_nys,
            batch_size, prune=self.dataset_pruning)
        if fused is None:
            model = fit_gp_padded(x_obs, y_obs, cfg, optimiser=optimiser,
                                  bucket=bucket, params0=params0)
            self.update_model(model)
            return self.next_batch(n_rec, n_nys, batch_size,
                                   return_weights=return_weights,
                                   recycle_prior=recycle_prior,
                                   polish=polish)
        state = fused[0]
        self.update_model(state)
        if self.label == "dataset":
            _, idx_global, x_batch, w_rchq = fused
            return self._finish_batch(x_batch, w_rchq, t0, return_weights,
                                      polish, None, idx_global=idx_global)
        _, x_batch, w_rchq = fused
        return self._finish_batch(x_batch, w_rchq, t0, return_weights,
                                  polish, None)

    def _finish_batch(self, x_batch, w_rchq, t0, return_weights: bool,
                      polish: bool, calc_obj, idx_global=None):
        """Shared tail of next_batch for the fused-iteration fast paths:
        exploit polish, timings, return value."""
        if self._polish_eligible(polish, calc_obj, return_weights):
            x_batch = self._exploit_polish(x_batch)
        total = time.monotonic() - t0
        # candidates + recombination ran as one program — no split exists
        self.last_timings = {"fused_iteration": total, "total": total}
        self.last_path = "fused"
        if return_weights:
            return w_rchq, x_batch
        if idx_global is not None:
            return idx_global, x_batch
        return x_batch

    def step_fbgp(self, x_obs, y_obs, hyperprior, n_rec: int, n_nys: int,
                  batch_size: int, n_hypers: int = 1000,
                  n_nys_qd: int = 100, n_qd: int = 50, cfg=None,
                  optimiser: str = "lbfgs", alpha_factor: float = 1.0,
                  bucket: int = 128, recycle_prior: bool = True,
                  return_weights: bool = False, calc_obj=None):
        """One-program fully-Bayesian BO iteration — the FBGP analogue of
        `step`: WSABI-warped base MAP refit + hyperposterior LML sweep +
        quadrature distillation + chain-cache build + candidate pipeline +
        kernel recombination, all traced into a single dispatch
        (core/fused_sampling.py:fused_fbgp_step_*). Updates self to the
        refit FullyBayesianGP (zero host fetches) and returns X_batch
        ((w, X_batch) with return_weights).

        hyperprior: gp.fbgp.RBFHyperPrior; its n_ls must match the base
        config (1 isotropic, d for cfg.ard). cfg defaults to FitboGP's
        fit config. calc_obj: an FBGP acquisition label ("EI"/"UCB"/
        "MES"/"BQBC"/"QBMGP") or an FBGPAcquisitionFunction (its label is
        used) — the augmented objective row is computed on the FRESH
        post-refit hyperposterior inside the same program (the staged
        flow can only augment with the pre-refit model). Proposal
        families outside the fused continuous entries (discrete/mixed/
        dataset domains) fall back to the staged flow: FitboGP +
        fbgp_refit + update_model + next_batch.

        No reference analogue: the reference's FBGP loop rebuilds a
        gpytorch model per hypersample in Python per refit
        (SOBER/FBGP/_fully_Bayesian_gp.py:179-245) on top of the staged
        host pipeline (SOBER/_sober.py:125-195)."""
        from ..gp.exact import pad_observations
        from ..gp.fbgp import (FBGPAcquisitionFunction, FitboGP,
                               FullyBayesianGP, _ChainCache, _VBQ_CFG,
                               fbgp_refit)

        acq_label = getattr(calc_obj, "label", calc_obj)
        if acq_label is not None:
            if acq_label not in FBGPAcquisitionFunction.LABELS:
                raise ValueError(
                    f"calc_obj must be one of "
                    f"{FBGPAcquisitionFunction.LABELS} (or an "
                    f"FBGPAcquisitionFunction); got {calc_obj!r}")
            acq_apply = FBGPAcquisitionFunction._APPLIES[acq_label]
        else:
            acq_apply = None
        if cfg is None:
            # FitboGP's default fit config (same numbers as the
            # hyper-surrogate's _VBQ_CFG: rbf, noise in [1e-11, 1e-9],
            # no y standardization, 200 iters)
            cfg = _VBQ_CFG
        x_obs = jnp.asarray(x_obs)
        n_ls_needed = x_obs.shape[1] if cfg.ard else 1
        if hyperprior.n_ls != n_ls_needed:
            raise ValueError(
                f"hyperprior.n_ls={hyperprior.n_ls} does not match the "
                f"base config ({'ARD, ' if cfg.ard else 'isotropic, '}"
                f"needs n_ls={n_ls_needed}); construct "
                f"RBFHyperPrior(n_ls={n_ls_needed})")
        t0 = time.monotonic()
        self.last_reset = False
        if self.label != "dataset" and self.should_reset_prior(
                batch_size, recycle_prior, targets=np.asarray(y_obs)):
            self._mark_reset()
        x_pad, y_pad, mask = pad_observations(
            x_obs, jnp.asarray(y_obs), bucket)
        data = (x_pad, y_pad, mask, hyperprior.hypermu, hyperprior.hyperstd,
                self.keys.next(), self.keys.next())
        statics = dict(cfg=cfg, optimiser=optimiser,
                       alpha_factor=alpha_factor, n_hypers=n_hypers,
                       n_nys_qd=n_nys_qd, n_qd=n_qd, acq_apply=acq_apply)
        out = self._fused_dispatch(n_rec, n_nys, batch_size,
                                   fbgp_fit=(data, statics))
        if out is None:
            # staged fallback (unsupported proposal family); FitboGP's own
            # defaults stand in for cfg's kernel/noise/fit-iter details
            gp = FitboGP(x_obs, y_obs, alpha_factor=alpha_factor,
                         optimiser=optimiser, bucket=bucket, ard=cfg.ard,
                         fit_iters=cfg.fit_iters)
            fbgp = fbgp_refit(gp, hyperprior, n_hypers=n_hypers,
                              n_nys=n_nys_qd, n_qd=n_qd,
                              key=self.keys.next())
            self.update_model(fbgp)
            obj = (None if acq_label is None
                   else FBGPAcquisitionFunction(fbgp, acq_label))
            return self.next_batch(n_rec, n_nys, batch_size, calc_obj=obj,
                                   return_weights=return_weights,
                                   recycle_prior=recycle_prior)
        (alpha, fobs, w_qd, theta_qd, linv_ch, alpha_ch, x_batch,
         w_rchq) = out
        fbgp = FullyBayesianGP.from_arrays(
            x_pad, fobs, mask, alpha, w_qd, theta_qd,
            _ChainCache(linv_ch, alpha_ch))
        self.update_model(fbgp)
        total = time.monotonic() - t0
        self.last_timings = {"fused_iteration": total, "total": total}
        self.last_path = "fused"
        if return_weights:
            return w_rchq, x_batch
        return x_batch

    def _warm_start_params(self, cfg, n_dims: int):
        """Recover warm-start GPParams from the current model, or None when
        the model isn't a plain GPState or its parameter pytree doesn't
        match what `cfg` would initialise (shape mismatch would break the
        traced refit, e.g. isotropic state under an ARD cfg)."""
        from ..gp.exact import init_params, raw_params_from_state

        state = self.pi.model
        if not isinstance(state, GPState):
            return None
        try:
            cand = raw_params_from_state(state)
        except (KeyError, TypeError, AttributeError):
            return None
        ref = init_params(cfg, n_dims)
        if jax.tree.structure(cand) != jax.tree.structure(ref):
            return None
        if any(jnp.shape(a) != jnp.shape(b) for a, b in
               zip(jax.tree.leaves(cand), jax.tree.leaves(ref))):
            return None
        return cand

    def _polish_eligible(self, polish: bool, calc_obj,
                         return_weights: bool) -> bool:
        """Single source of truth for the exploit-polish guard (see the
        `polish` arg of next_batch for the rationale of each condition)."""
        return (polish and calc_obj is None and not return_weights
                and self.label == "continuous"
                and not (self.fbgp or self.is_bq)
                and isinstance(self.pi.model, GPState)
                and getattr(self.prior, "bounds", None) is not None)

    def _exploit_polish(self, x_batch: jax.Array) -> jax.Array:
        """Replace the lowest-weight batch point with the best of 8
        posterior-mean ascents (started at the incumbent + the 7 heaviest
        batch points, which recombination returns first)."""
        from ..gp.exact import polish_posterior_mean

        state: GPState = self.pi.model
        y = state.y
        if state.mask is not None:
            y = jnp.where(state.mask > 0, y, -jnp.inf)
        incumbent = state.x[jnp.argmax(y)]
        n_head = min(7, x_batch.shape[0] - 1)
        starts = jnp.concatenate([incumbent[None, :], x_batch[:n_head]])
        lo, hi = self.prior.bounds[0], self.prior.bounds[1]
        x_pol, mu_pol = polish_posterior_mean(state, starts, lo, hi)
        return x_batch.at[-1].set(x_pol[jnp.argmax(mu_pol)])
