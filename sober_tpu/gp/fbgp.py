"""Fully Bayesian GP (FBGP): hyperparameter marginalization without MCMC.

Rebuild of SOBER/FBGP/ (_fitbo.py, _hyperprior.py, _fully_Bayesian_gp.py,
_scale_vbq.py, _acquisition_function.py). Pipeline:

  1. FitboGP — WSABI square-root-warped GP (g = sign(a) sqrt(2(a - y))).
  2. RBFHyperPrior — log-normal hyperprior over theta = (eta_excess,
     noise, lengthscale, outputscale) in log space.
  3. sampling_hypers — evaluate the FITBO marginal likelihood at ~1000
     hypersamples. The reference loops in Python, building a fresh gpytorch
     model per sample (SOBER/FBGP/_fully_Bayesian_gp.py:201); here the LML
     is a pure function of theta and the sweep is ONE vmapped batched
     Cholesky — the flagship vmap win of the TPU rebuild.
  4. quadrature_distillation — RCHQ-compress the 1000 weighted hypersamples
     to ~10-50 support hypersamples.
  5. FullyBayesianGP — per-chain conditioned GPs with cached Cholesky
     factors; batch/marginal prediction is a batched matmul over the chain
     axis (the reference loops chains in Python,
     _fully_Bayesian_gp.py:318-321).

Note: the reference FBGP path is bitrotten (Utils(device) TypeError, missing
dtype arg in quadrature_distillation — SURVEY.md §2 bug list); this rebuild
implements the intended behavior.
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import cho_solve, solve_triangular

from ..ops.kernels import rbf_gram
from ..utils.linalg import jitter_cholesky, remove_anomalies
from ..utils.weights import cleansing_weights, deweighted_resampling
from .exact import (GPConfig, GPState, build_state, fit_gp, fit_params,
                    materialize, predict, predictive_covariance)

# Device-free module constants: computed with math/numpy, NOT jnp ops —
# a jnp op at import time initializes the default backend, which breaks the
# driver's CPU-mesh dryrun (import sober_tpu must never touch a device).
EPS_LML = -math.sqrt(float(np.finfo(np.float32).max))
EPS = float(np.finfo(np.float32).eps)


# ----------------------------------------------------------------------------
# FitboGP — the WSABI-warped base model (SOBER/FBGP/_fitbo.py)
# ----------------------------------------------------------------------------

class FitboGP:
    """WSABI-L/M square-root-warped GP (SOBER/FBGP/_fitbo.py:7-305)."""

    def __init__(self, x_obs, y_obs, kernel_name: str = "rbf",
                 label: str = "wsabim", alpha_factor: float = 1.0,
                 lik: float = 1e-10, rng: float = 10.0,
                 train_lik: bool = False, optimiser: str = "lbfgs",
                 fit_iters: int = 200, bucket: int = 128,
                 ard: bool = False):
        self.label = label
        self.alpha_factor = alpha_factor
        self.bucket = bucket
        self.jitter = 0.0
        self.cfg = GPConfig(
            kernel_name=kernel_name, noise_lo=lik / rng, noise_hi=lik * rng,
            train_lik=train_lik, standardize_y=False, use_priors=False,
            fit_iters=fit_iters, ard=ard)
        self.optimiser = optimiser
        self.Y_unwarp = jnp.asarray(y_obs).reshape(-1)
        self._refit(jnp.asarray(x_obs), self.Y_unwarp)

    def warp_y(self, y):
        # clamp: y marginally above alpha (fp noise, or padded rows when
        # alpha < 0) would give sqrt(negative) = NaN and poison the masked
        # MLL — same guard as fitbo_mll
        return jnp.sign(self.alpha) * jnp.sqrt(
            jnp.maximum(2.0 * (self.alpha - y), 0.0))

    def unwarp_y(self, y):
        return self.alpha - 0.5 * y**2

    def _process_y(self, y, mask=None):
        y = remove_anomalies(y)
        if mask is not None:
            masked = jnp.where(mask > 0, y, -jnp.inf)
            self.alpha = self.alpha_factor * jnp.max(masked)
            # padded rows carry y=0 from pad_observations; with alpha < 0
            # (all-negative observations) warping them would NaN, so warp
            # them at exactly alpha -> 0 before the mask zeroes them out
            return self.warp_y(jnp.where(mask > 0, y, self.alpha)) * mask
        self.alpha = self.alpha_factor * jnp.max(y)
        return self.warp_y(y)

    def _refit(self, x, y_unwarp):
        """Bucket-padded fit: the hyperposterior sweep and chain caches keep
        stable compiled shapes as observations accumulate."""
        from .exact import pad_observations

        self.x_obs_raw = jnp.asarray(x)
        xp, yp, mask = pad_observations(self.x_obs_raw, y_unwarp, self.bucket)
        y_warp = self._process_y(yp, mask)
        self.model: GPState = fit_gp(xp, y_warp, self.cfg,
                                     optimiser=self.optimiser, mask=mask)
        # padded unwarped targets for the FBGP machinery
        self.fobs_padded = yp * mask

    def update_wsabi_gp(self, x_new, y_new):
        """(SOBER/FBGP/_fitbo.py:145-164)"""
        x_all = jnp.concatenate([self.x_obs_raw, jnp.asarray(x_new)])
        self.Y_unwarp = jnp.concatenate(
            [self.Y_unwarp, jnp.asarray(y_new).reshape(-1)])
        self._refit(x_all, self.Y_unwarp)

    def retrain_gp(self):
        self._refit(self.x_obs_raw, self.Y_unwarp)

    def memorise_parameters(self):
        self._memory = (self.model.kernel, self.model.noise)

    def remind_parameters(self):
        kernel, noise = self._memory
        self.model = self.model._replace(kernel=kernel, noise=noise)

    # warped-space predictions (SOBER/FBGP/_fitbo.py:254-304)
    def wsabil_predict(self, x):
        mu_w, var_w = predict(self.model, x)
        return self.alpha - 0.5 * mu_w**2, mu_w * var_w * mu_w

    def wsabim_predict(self, x):
        mu_w, var_w = predict(self.model, x)
        mu = self.alpha - 0.5 * (mu_w**2 + var_w)
        var = mu_w * var_w * mu_w + 0.5 * var_w**2
        return mu, var

    def predict(self, x):
        return (self.wsabil_predict(x) if self.label == "wsabil"
                else self.wsabim_predict(x))

    def predict_mean(self, x):
        return self.predict(x)[0]

    # warped-space kernels (SOBER/FBGP/_fitbo.py:218-252)
    def wsabil_kernel(self, x, y):
        mu_x, _ = predict(self.model, x)
        mu_y, _ = predict(self.model, y)
        cov = predictive_covariance(self.model, x, y)
        return mu_x[:, None] * cov * mu_y[None, :]

    def wsabim_kernel(self, x, y):
        mu_x, _ = predict(self.model, x)
        mu_y, _ = predict(self.model, y)
        cov = predictive_covariance(self.model, x, y)
        return mu_x[:, None] * cov * mu_y[None, :] + 0.5 * cov**2

    def kernel(self, x, y):
        return (self.wsabil_kernel(x, y) if self.label == "wsabil"
                else self.wsabim_kernel(x, y))


# ----------------------------------------------------------------------------
# Hyperprior (SOBER/FBGP/_hyperprior.py)
# ----------------------------------------------------------------------------

class RBFHyperPrior:
    """Log-normal hyperprior over theta = (eta_excess, noise, lengthscale,
    outputscale) in log space (SOBER/FBGP/_hyperprior.py:6-83).

    `n_ls` > 1 widens the lengthscale block to one entry per input
    dimension (ARD); theta layout is then (eta_excess, noise,
    ls_1..ls_{n_ls}, outputscale). The reference's hyperprior is
    isotropic-only (4 fixed entries)."""

    def __init__(self, theta_map=None, n_ls: int = 1):
        self.n_ls = n_ls
        self.initialise(theta_map)

    @property
    def dim(self) -> int:
        return 3 + self.n_ls

    def initialise(self, theta_map=None):
        if theta_map is None:
            self.hypermu = jnp.concatenate([
                jnp.array([-2.0, 0.1]),
                jnp.full((self.n_ls,), 0.1),
                jnp.array([0.4]),
            ])
            hyperstd = jnp.concatenate([
                jnp.array([0.7, 1.0]),
                jnp.full((self.n_ls,), 0.7),
                jnp.array([0.7]),
            ])
        else:
            theta_map = jnp.asarray(theta_map).reshape(-1)
            if theta_map.shape[0] != self.dim - 1:
                raise ValueError(
                    f"theta_map has {theta_map.shape[0]} entries; expected "
                    f"{self.dim - 1} = (noise, {self.n_ls} lengthscale(s), "
                    "outputscale)")
            self.hypermu = jnp.concatenate(
                [jnp.array([-2.0]), jnp.log(theta_map)])
            hyperstd = jnp.full((self.dim,), 0.1)
        self.hyperstd = hyperstd

    def sample(self, key, n_samples: int) -> jax.Array:
        z = jax.random.normal(key, (n_samples, self.dim))
        return self.hypermu[None, :] + z * self.hyperstd[None, :]

    def logpdf(self, theta) -> jax.Array:
        z = (theta - self.hypermu[None, :]) / self.hyperstd[None, :]
        return jnp.sum(-0.5 * z**2 - jnp.log(self.hyperstd)[None, :]
                       - 0.5 * jnp.log(2 * jnp.pi), axis=1)

    def pdf(self, theta) -> jax.Array:
        return jnp.exp(self.logpdf(theta))


# ----------------------------------------------------------------------------
# FITBO marginal likelihood as a pure function of theta
# ----------------------------------------------------------------------------

def _rbf_gram_xx(x, ls, os_):
    """RBF self-Gram written so the pairwise squared differences are
    theta-INDEPENDENT: under the vmapped hypersample sweep the (n, n, d)
    `diff2` tensor is an unbatched operand computed once and shared across
    all 1001 thetas, and the per-theta work collapses to one matvec + one
    fused scale/exp pass (vs re-deriving a batched sqdist per theta)."""
    diff2 = (x[:, None, :] - x[None, :, :]) ** 2        # (n, n, d) shared
    inv_ls2 = jnp.broadcast_to(1.0 / ls**2, (x.shape[1],))
    d2 = diff2 @ inv_ls2                                # batched matvec
    return os_ * jnp.exp(-0.5 * d2)


def _fixed_jitter_cholesky(a):
    """ONE fixed-jitter factorization for the vmapped LML sweep. The jitter
    equals jitter_cholesky's unconditional fp32 floor (1e-6 x mean diag), so
    the first-try factorization is IDENTICAL; what changes is the failure
    path: jitter_cholesky's escalation while_loop under vmap re-factorizes
    the ENTIRE 1001-theta batch until the worst lane succeeds (each retry is
    a full batched Cholesky — the sweep measured 109 ms/eval with it, the
    dominant FBGP stage). Here a failing lane yields NaNs that fitbo_mll
    already maps to EPS_LML — more principled than scoring an extreme
    hypersample through a crudely over-jittered factorization, and the
    escalation cost disappears for the 1000 good lanes."""
    scale = jnp.maximum(jnp.mean(jnp.diagonal(a)), 1e-30)
    n = a.shape[-1]
    return jnp.linalg.cholesky(a + (1e-6 * scale) * jnp.eye(n, dtype=a.dtype))


def _condition_g(x, g, noise, ls, os_, mask=None):
    """Condition a zero-mean RBF GP with fixed hypers on (x, g); return the
    posterior-at-train mean and covariance including observation noise (the
    likelihood-smeared model(Xobs) of SOBER/FBGP/_fully_Bayesian_gp.py:146-151).
    `mask` marks real rows of a padded observation buffer."""
    n = x.shape[0]
    kxx = _rbf_gram_xx(x, ls, os_)
    if mask is not None:
        mm = mask[:, None] * mask[None, :]
        kxx = kxx * mm
        kn = kxx + noise * jnp.diag(mask) + jnp.diag(1.0 - mask)
        noise_diag = noise * jnp.diag(mask)
    else:
        kn = kxx + noise * jnp.eye(n, dtype=x.dtype)
        noise_diag = noise * jnp.eye(n, dtype=x.dtype)
    chol = _fixed_jitter_cholesky(kn)
    alpha = cho_solve((chol, True), g)
    mu = kxx @ alpha
    v = solve_triangular(chol, kxx, lower=True)          # (n, n)
    cov = kxx - v.T @ v + noise_diag
    return mu, cov


def fitbo_mll(theta_log: jax.Array, x: jax.Array, fobs: jax.Array,
              eta: jax.Array, mask: jax.Array = None) -> jax.Array:
    """FITBO marginal log likelihood for one log-space hypersample
    (LogMarginalLikelihood.mll, SOBER/FBGP/_fully_Bayesian_gp.py:126-161).
    Pure and vmap-able; padded rows (mask 0) contribute nothing."""
    big = jnp.exp(theta_log)
    eta_h = eta + big[0]
    # theta layout (eta_raw, noise, ls-block, outputscale): the ls block is
    # 1 entry (isotropic) or d entries (ARD) — rbf_gram broadcasts either
    noise, ls, os_ = big[1], big[2:-1], big[-1]

    gobs = jnp.sign(eta_h) * jnp.sqrt(jnp.maximum(2.0 * (eta_h - fobs), 0.0))
    if mask is not None:
        gobs = gobs * mask
        n = jnp.sum(mask)
    else:
        n = x.shape[0]
    mu_g, cov_g = _condition_g(x, gobs, noise, ls, os_, mask)
    var_g = jnp.diagonal(cov_g)

    mu_f = eta_h - 0.5 * (mu_g**2 + var_g)
    cov_f = mu_g[:, None] * cov_g * mu_g[None, :] + 0.5 * cov_g**2
    diff = fobs - mu_f
    if mask is not None:
        mm = mask[:, None] * mask[None, :]
        cov_f = cov_f * mm + jnp.diag(1.0 - mask)
        diff = diff * mask
    chol_f = _fixed_jitter_cholesky(cov_f)
    w = solve_triangular(chol_f, diff, lower=True)
    logdiag = jnp.log(jnp.diagonal(chol_f))
    if mask is not None:
        logdiag = logdiag * mask
    ll = (-0.5 * jnp.sum(w**2) - jnp.sum(logdiag)
          - 0.5 * n * jnp.log(2.0 * jnp.pi))
    mll = ll / n
    return jnp.where(jnp.isfinite(mll), mll, EPS_LML)


def _use_blocked_fbgp() -> bool:
    """Route the LML sweep's two batched factorizations to the blocked
    MXU factorization (ops/blocked_chol.py) on TPU backends. Static at
    trace time (same pattern as core/rchq.py:_use_pallas_car). CPU keeps
    the plain vmap path: the blocked program unrolls n column steps at
    trace time, which XLA:CPU compiles slowly for no runtime win there.
    Opt out with SOBER_TPU_BLOCKED_FBGP=0."""
    import os

    if os.environ.get("SOBER_TPU_BLOCKED_FBGP", "1") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _batched_fixed_jitter(a):
    """Batched analogue of _fixed_jitter_cholesky's jitter (per-instance
    1e-6 x mean-diag floor); factorization happens in the Pallas kernel."""
    scale = jnp.maximum(
        jnp.mean(jnp.diagonal(a, axis1=-2, axis2=-1), axis=-1), 1e-30)
    n = a.shape[-1]
    return a + (1e-6 * scale)[:, None, None] * jnp.eye(n, dtype=a.dtype)


def fitbo_mll_batch(thetas_log, x, fobs, eta, mask=None, *,
                    use_blocked=None):
    """The FITBO LML sweep over a batch of hypersamples — semantically
    jax.vmap(fitbo_mll) (bitwise math per theta, reordered into batched
    matmuls), but with the two inner factorizations routed to the blocked
    right-looking Cholesky (ops/blocked_chol.py). XLA's batched Cholesky
    + triangular solves at (1001, 128, 128) run a sequential loop of
    small batched updates (~0.1% MXU) and were 49 of the 51 ms sweep;
    the blocked factorization does the same O(B n^2) work per block of p
    columns as two batched MXU matmuls and produces L^-1 / the quadratic
    form directly — 11-12 ms vs XLA's 28 ms per factorization+solve at
    the sweep shape (docs/PERF.md r5), so every remaining solve is a
    batched MXU matmul.

    use_blocked=None auto-detects the backend (TPU only); tests force it
    on CPU at small n where trace-time unrolling is cheap."""
    if use_blocked is None:
        use_blocked = _use_blocked_fbgp()
    if not use_blocked:
        return jax.vmap(fitbo_mll, in_axes=(0, None, None, None, None))(
            thetas_log, x, fobs, eta, mask)

    from ..ops.blocked_chol import (cholesky_inverse_blocked,
                                    cholesky_quadform_blocked)

    big = jnp.exp(thetas_log)                          # (T, p)
    eta_h = eta + big[:, 0]                            # (T,)
    noise, ls, os_ = big[:, 1], big[:, 2:-1], big[:, -1]
    n, d = x.shape

    gobs = jnp.sign(eta_h)[:, None] * jnp.sqrt(
        jnp.maximum(2.0 * (eta_h[:, None] - fobs[None, :]), 0.0))  # (T, n)
    # theta-independent pairwise differences shared across the sweep
    # (same structure as _rbf_gram_xx) — per-theta Gram is one matmul
    diff2 = (x[:, None, :] - x[None, :, :]) ** 2       # (n, n, d)
    inv_ls2 = jnp.broadcast_to(1.0 / ls**2, (ls.shape[0], d))  # (T, d)
    d2 = jnp.einsum("ijd,td->tij", diff2, inv_ls2)
    kxx = os_[:, None, None] * jnp.exp(-0.5 * d2)      # (T, n, n)
    if mask is not None:
        gobs = gobs * mask[None, :]
        mm = mask[:, None] * mask[None, :]
        kxx = kxx * mm[None]
        noise_diag = noise[:, None, None] * jnp.diag(mask)[None]
        kn = kxx + noise_diag + jnp.diag(1.0 - mask)[None]
        nreal = jnp.sum(mask)
    else:
        noise_diag = noise[:, None, None] * jnp.eye(n, dtype=x.dtype)[None]
        kn = kxx + noise_diag
        nreal = n
    linv = cholesky_inverse_blocked(_batched_fixed_jitter(kn))
    # alpha = (L L^T)^-1 g; posterior-at-train mean/cov (= _condition_g).
    # The two (T, n, n) @ (T, n, n) contractions run at HIGH (3-pass
    # bf16) instead of the package-wide HIGHEST (6-pass): the sweep's
    # output only RANKS hypersamples through exp(LML) weights, ~1e-6
    # relative matmul error is far below the fp32 Cholesky noise floor
    # already accepted here, and the two passes are the sweep's biggest
    # MXU cost. Batch SELECTION matmuls stay at highest (CLAUDE.md).
    hi = jax.lax.Precision.HIGH
    t1 = jnp.einsum("tij,tj->ti", linv, gobs)
    alpha = jnp.einsum("tji,tj->ti", linv, t1)
    mu_g = jnp.einsum("tij,tj->ti", kxx, alpha)
    v = jnp.einsum("tij,tjk->tik", linv, kxx, precision=hi)
    cov_g = kxx - jnp.einsum("tki,tkj->tij", v, v, precision=hi) \
        + noise_diag
    var_g = jnp.diagonal(cov_g, axis1=-2, axis2=-1)

    mu_f = eta_h[:, None] - 0.5 * (mu_g**2 + var_g)
    cov_f = mu_g[:, :, None] * cov_g * mu_g[:, None, :] + 0.5 * cov_g**2
    diff = fobs[None, :] - mu_f
    if mask is not None:
        cov_f = cov_f * mm[None] + jnp.diag(1.0 - mask)[None]
        diff = diff * mask[None, :]
    w, ld = cholesky_quadform_blocked(_batched_fixed_jitter(cov_f), diff)
    if mask is not None:
        ld = ld * mask[None, :]
    ll = (-0.5 * jnp.sum(w**2, axis=-1) - jnp.sum(ld, axis=-1)
          - 0.5 * nreal * jnp.log(2.0 * jnp.pi))
    mll = ll / nreal
    return jnp.where(jnp.isfinite(mll), mll, EPS_LML)


# module-level jitted sweep: a fresh jax.jit wrapper per call would retrace
# and recompile the 1000-theta batched Cholesky on every FBGP refit
# (ADVICE r1 / CLAUDE.md jit-cache stability invariant)
_fitbo_mll_sweep = jax.jit(fitbo_mll_batch,
                           static_argnames=("use_blocked",))


def _theta_map_of(model: "FitboGP", hyperprior: "RBFHyperPrior"):
    """The base model's MAP hypers as the theta layout the hyperprior uses
    (noise, ls-block, outputscale), with ARD-shape validation."""
    if "lengthscale" not in model.model.kernel.params:
        raise ValueError(
            "FBGP hypersampling needs a lengthscale-bearing kernel; "
            f"{model.model.kernel.name!r} has none")
    ls_map = jnp.atleast_1d(
        jnp.asarray(model.model.kernel.params["lengthscale"]))
    if ls_map.shape[0] != hyperprior.n_ls:
        raise ValueError(
            f"model lengthscale has {ls_map.shape[0]} dimension(s) but the "
            f"hyperprior was built with n_ls={hyperprior.n_ls}; construct "
            f"RBFHyperPrior(n_ls={ls_map.shape[0]}) for an ARD base model")
    return jnp.concatenate([
        jnp.atleast_1d(jnp.asarray(model.model.noise)),
        ls_map,
        jnp.atleast_1d(jnp.asarray(model.model.kernel.params["outputscale"])),
    ])


def sampling_hypers(model: FitboGP, hyperprior: RBFHyperPrior,
                    n_hypers: int = 1000, key=None, use_map: bool = False):
    """Evaluate the LML over hypersamples — one vmapped batched Cholesky
    instead of the reference's 1001-iteration Python loop
    (SOBER/FBGP/_fully_Bayesian_gp.py:179-203).

    Returns (Hypersamples in ORIGINAL space, LMLs).
    """
    if key is None:
        key = jax.random.key(0)
    x = model.model.x
    fobs = getattr(model, "fobs_padded", model.Y_unwarp)
    mask = model.model.mask
    eta = model.alpha
    theta_map = _theta_map_of(model, hyperprior)
    if use_map:
        hyperprior.initialise(theta_map)
    samples = hyperprior.sample(key, n_hypers)
    samples = jnp.vstack([
        jnp.concatenate([jnp.array([-10.0]), jnp.log(theta_map)])[None, :],
        samples,
    ])
    lmls = _fitbo_mll_sweep(samples, x, fobs, eta, mask)
    big = jnp.exp(samples)
    # original-space hypersamples: Theta[0] = eta + exp(theta[0])
    # (log_to_exp_transform, SOBER/FBGP/_fully_Bayesian_gp.py:112-124)
    hypersamples = jnp.concatenate([eta + big[:, :1], big[:, 1:]], axis=1)
    return hypersamples, lmls


# ----------------------------------------------------------------------------
# exp-warped hyper-surrogate (SOBER/FBGP/_scale_vbq.py)
# ----------------------------------------------------------------------------

# Hyper-surrogate MAP fits run on this many hypersamples (iid hyperprior
# draws, so a prefix is an unbiased subsample; row 0 is the MAP special row
# and is always kept). The fitted surrogate's ONLY consumer is its prior
# kernel as the recombination RKHS — RCHQ moment matching stays exact by
# construction for whatever kernel is chosen, so the lengthscale estimate
# just needs to be sensible, and a Cholesky(128) per L-BFGS linesearch eval
# is ~480x cheaper than the Cholesky(1001) the full fit pays (256 measured
# 13 ms of the fused refit's 46 ms; 128 fits the same lengthscales on the
# test surfaces at an eighth of the factorization cost).
_SURROGATE_FIT_N = 128


class ScaleVanillaGP:
    """exp-warped vanilla GP on log-likelihood observations
    (SOBER/FBGP/_scale_vbq.py:7-171).

    `fit_n` caps how many observations the hyperparameter MAP fit sees
    (prediction still conditions on ALL observations); None fits on all."""

    def __init__(self, x_obs, y_log, kernel_name: str = "rbf",
                 lik: float = 1e-10, rng: float = 10.0,
                 train_lik: bool = False, optimiser: str = "lbfgs",
                 fit_iters: int = 200, fit_n: int | None = None):
        self.cfg = GPConfig(
            kernel_name=kernel_name, noise_lo=lik / rng, noise_hi=lik * rng,
            train_lik=train_lik, standardize_y=False, use_priors=False,
            fit_iters=fit_iters)
        self.optimiser = optimiser
        self.jitter = 1e-6
        self.y_log = jnp.asarray(y_log).reshape(-1)
        y = remove_anomalies(self.y_log)
        self.beta = jnp.max(y)
        y_exp = jnp.exp(y - self.beta)
        x_obs = jnp.asarray(x_obs)
        if fit_n is not None and x_obs.shape[0] > fit_n:
            # subset-local renormalization, same rationale as
            # fbgp_refit_traced: keep the fit targets non-degenerate when
            # the global argmax lies outside the prefix (ADVICE r4)
            y_fit = y[:fit_n]
            y_exp_fit = jnp.exp(y_fit - jnp.max(y_fit))
            params = fit_params(x_obs[:fit_n], y_exp_fit, self.cfg,
                                optimiser=self.optimiser)
            self.model: GPState = build_state(params, x_obs, y_exp, self.cfg)
        else:
            self.model = fit_gp(x_obs, y_exp, self.cfg,
                                optimiser=self.optimiser)

    def predict(self, x):
        return predict(self.model, x)

    def predict_mean(self, x):
        return predict(self.model, x)[0]

    def predictive_kernel(self, x, y):
        return predictive_covariance(self.model, x, y)

    def prior_kernel(self, x, y):
        return self.model.kernel.gram(x, y)


def _nystrom_with_top(key, hypersamples, weights, n_nys: int):
    """Nyström test-point subset: deweighted (inverse-probability) resampling
    for coverage, PLUS the top-weighted hypersamples pinned in. The reference
    subsamples purely deweighted (SOBER/_weights.py:79-93), but when the
    hyperposterior is ultra-concentrated (ESS ~ 2 is routine for FITBO LMLs)
    every deweighted draw lands in the low-weight bulk, no test function sees
    the dominant hypersample, and RCHQ moment matching silently drops nearly
    all the posterior mass. Pinning the argmax block makes the embedding at
    the dominant thetas an explicit constraint, so the distilled measure must
    preserve their weight."""
    n_top = min(8, n_nys // 2)
    idx_nys = deweighted_resampling(key, weights, n_nys - n_top)
    if n_top == 0:
        # n_nys == 1: [-0:] would slice ALL rows, silently inflating the
        # Nystrom set to N+1 (ADVICE r4)
        return hypersamples[idx_nys]
    top = jnp.argsort(weights)[-n_top:]
    return jnp.concatenate([hypersamples[top], hypersamples[idx_nys]])


def quadrature_distillation(hypersamples, lmls, n_nys: int = 100,
                            n_qd: int = 50, key=None):
    """RCHQ-compress weighted hypersamples to ~n_qd support points
    (SOBER/FBGP/_fully_Bayesian_gp.py:205-245).

    Returns (w_qd, Theta_qd).
    """
    from ..core.rchq import recombination

    if key is None:
        key = jax.random.key(1)
    weights = jnp.exp(lmls - jnp.max(lmls))
    weights = cleansing_weights(weights)
    hyper_nys = _nystrom_with_top(key, hypersamples, weights, n_nys)
    vbq = ScaleVanillaGP(hypersamples, lmls, fit_n=_SURROGATE_FIT_N)
    idx, w_qd = recombination(hypersamples, hyper_nys, n_qd,
                              vbq.prior_kernel, init_weights=weights)
    return w_qd, hypersamples[idx]


# ----------------------------------------------------------------------------
# FullyBayesianGP (SOBER/FBGP/_fully_Bayesian_gp.py:247-371)
# ----------------------------------------------------------------------------

class _ChainCache(NamedTuple):
    # (q, n, n) explicit L^-1 per chain (NOT the Cholesky factor itself):
    # every downstream consumer only ever SOLVES against the factor with a
    # candidate-pool-wide right-hand side (the 50-chain pi sweep and the
    # marginal-covariance kernel), and caching the inverse turns those
    # batched triangular solves into batched MXU matmuls — the same
    # structural choice as GPState.linv, and the reference's own
    # covar_cache Woodbury route (SOBER/_gp.py:255-278).
    linv: jax.Array
    alpha: jax.Array   # (q, n)


def _chain_cache(theta, x, fobs, mask):
    """One chain's conditioning cache: L^-1 of K+noise and alpha on the
    WSABI-warped targets (pure function so the vmapped sweep below compiles
    once per observation-bucket shape rather than per FBGP refit)."""
    eta_h, noise, ls, os_ = theta[0], theta[1], theta[2:-1], theta[-1]
    gobs = jnp.sign(eta_h) * jnp.sqrt(
        jnp.maximum(2.0 * (eta_h - fobs), 0.0))
    params = {"lengthscale": ls, "outputscale": os_}
    kxx = rbf_gram(params, x, x)
    if mask is not None:
        gobs = gobs * mask
        mm = mask[:, None] * mask[None, :]
        kn = kxx * mm + noise * jnp.diag(mask) + jnp.diag(1.0 - mask)
    else:
        kn = kxx + noise * jnp.eye(x.shape[0], dtype=x.dtype)
    chol, _ = jitter_cholesky(kn)
    alpha = cho_solve((chol, True), gobs)
    linv = solve_triangular(chol, jnp.eye(chol.shape[0], dtype=chol.dtype),
                            lower=True)
    return linv, alpha


_chain_cache_sweep = jax.jit(
    jax.vmap(_chain_cache, in_axes=(0, None, None, None)))


# ScaleVanillaGP's defaults as a hashable config for the fused refit below
# (kernel_name="rbf", lik=1e-10, rng=10 -> noise in [1e-11, 1e-9])
_VBQ_CFG = GPConfig(kernel_name="rbf", noise_lo=1e-11, noise_hi=1e-9,
                    train_lik=False, standardize_y=False, use_priors=False,
                    fit_iters=200)


def fbgp_refit_traced(x, fobs, mask, eta, theta_map, hypermu, hyperstd,
                      k_sample, k_nys, *, n_hypers: int, n_nys: int,
                      n_qd: int, cfg: GPConfig):
    """The whole FBGP hyper pipeline as ONE XLA program: hyperprior draw ->
    vmapped LML sweep -> LML-weighted Nystrom subset -> exp-warped
    hyper-surrogate MAP fit -> RCHQ distillation -> chain-cache build.

    Plain traceable body — called standalone through the jitted
    _fbgp_refit_program wrapper below (fbgp_refit), or inlined into the
    one-program FBGP BO step (core/fused_sampling.py:fused_fbgp_step_*).

    The staged path (sampling_hypers + quadrature_distillation +
    FullyBayesianGP(...)) dispatches five programs with host fetches
    between them; through a remote-dispatch link the fetches and
    executable swaps dominate the actual compute. Semantics are identical
    stage-for-stage (the surrogate fit uses `materialize` instead of
    `build_state` because only the fitted prior kernel is consumed —
    ScaleVanillaGP's posterior cache is never used by the distillation,
    SOBER/FBGP/_fully_Bayesian_gp.py:205-245)."""
    dim = hypermu.shape[0]
    z = jax.random.normal(k_sample, (n_hypers, dim))
    samples = jnp.vstack([
        jnp.concatenate([jnp.array([-10.0]), jnp.log(theta_map)])[None, :],
        hypermu[None, :] + z * hyperstd[None, :],
    ])
    lmls = fitbo_mll_batch(samples, x, fobs, eta, mask)
    big = jnp.exp(samples)
    hypersamples = jnp.concatenate([eta + big[:, :1], big[:, 1:]], axis=1)

    weights = cleansing_weights(jnp.exp(lmls - jnp.max(lmls)))
    hyper_nys = _nystrom_with_top(k_nys, hypersamples, weights, n_nys)

    y_clamped = remove_anomalies(lmls)
    n_fit = min(_SURROGATE_FIT_N, n_hypers + 1)
    # normalize within the FIT SUBSET: a global-max normalization degrades
    # to all-near-zero targets whenever the LML argmax lane falls outside
    # the prefix, degenerating the surrogate kernel fit (ADVICE r4). The
    # subset-local rescale only shifts the fitted outputscale by a
    # constant, to which RCHQ's globally-normalized moment matching is
    # invariant.
    y_fit = y_clamped[:n_fit]
    y_exp_fit = jnp.exp(y_fit - jnp.max(y_fit))
    params = fit_params(hypersamples[:n_fit], y_exp_fit, cfg,
                        optimiser="lbfgs")
    kernel, _ = materialize(params, cfg)

    from ..core.rchq import _recombination_impl

    idx, w_qd = _recombination_impl(hypersamples, hyper_nys, n_qd,
                                    kernel.gram, init_weights=weights)
    theta_qd = hypersamples[idx]
    linv, alpha = jax.vmap(_chain_cache, in_axes=(0, None, None, None))(
        theta_qd, x, fobs, mask)
    return w_qd, theta_qd, linv, alpha


_fbgp_refit_program = jax.jit(
    fbgp_refit_traced, static_argnames=("n_hypers", "n_nys", "n_qd", "cfg"))


def fbgp_refit(model: "FitboGP", hyperprior: "RBFHyperPrior",
               n_hypers: int = 1000, n_nys: int = 100, n_qd: int = 50,
               key=None, use_map: bool = False) -> "FullyBayesianGP":
    """One-call FBGP refit: sampling_hypers + quadrature_distillation +
    FullyBayesianGP as a single XLA program (see _fbgp_refit_program).

    Equivalent in distribution to the staged calls (exact stage-for-stage
    semantics; the PRNG stream differs — the staged path uses two
    independent default keys, this splits `key`)."""
    if key is None:
        key = jax.random.key(0)
    theta_map = _theta_map_of(model, hyperprior)
    if use_map:
        hyperprior.initialise(theta_map)
    k_sample, k_nys = jax.random.split(key)
    w_qd, theta_qd, linv, alpha = _fbgp_refit_program(
        model.model.x, getattr(model, "fobs_padded", model.Y_unwarp),
        model.model.mask, model.alpha, theta_map, hyperprior.hypermu,
        hyperprior.hyperstd, k_sample, k_nys, n_hypers=n_hypers,
        n_nys=n_nys, n_qd=n_qd, cfg=_VBQ_CFG)
    return FullyBayesianGP(model, w_qd, theta_qd,
                           cache=_ChainCache(linv, alpha))


class FullyBayesianGP:
    """Distilled-hyperposterior GP: predictions marginalized over n_qd
    hypersample chains, each with a cached Cholesky factor."""

    is_fbgp = True

    def __init__(self, gp: FitboGP, w_qd, theta_qd, cache=None):
        self.Xobs = gp.model.x
        self.fobs = getattr(gp, "fobs_padded", gp.Y_unwarp)
        self.mask = gp.model.mask
        self.eta = gp.alpha
        self.w_qd = jnp.asarray(w_qd)
        self.Theta_qd = jnp.asarray(theta_qd)     # (q, 3+n_ls) ORIGINAL space
        if cache is None:
            self._build_caches()
        else:
            self._cache = cache                    # fbgp_refit's fused build

    @classmethod
    def from_arrays(cls, x_obs, fobs, mask, eta, w_qd, theta_qd, cache):
        """Rebuild from raw pieces — the host side of the one-program FBGP
        BO step (Sober.step_fbgp), where no FitboGP object exists because
        the base fit happened in-trace."""
        obj = object.__new__(cls)
        obj.Xobs = x_obs
        obj.fobs = fobs
        obj.mask = mask
        obj.eta = eta
        obj.w_qd = jnp.asarray(w_qd)
        obj.Theta_qd = jnp.asarray(theta_qd)
        obj._cache = cache
        return obj

    def _build_caches(self):
        linv, alpha = _chain_cache_sweep(
            self.Theta_qd, self.Xobs, self.fobs, self.mask)
        self._cache = _ChainCache(linv, alpha)

    def fitbo_predict(self, x_test, theta, linv, alpha):
        """One chain's f-space posterior (fitbo_predict,
        SOBER/FBGP/_fully_Bayesian_gp.py:262-289). `linv` is the cached
        L^-1 (see _ChainCache) so the pool-wide variance reduction is one
        matmul."""
        eta_h, noise, ls, os_ = theta[0], theta[1], theta[2:-1], theta[-1]
        params = {"lengthscale": ls, "outputscale": os_}
        kqx = rbf_gram(params, x_test, self.Xobs)
        if self.mask is not None:
            kqx = kqx * self.mask[None, :]
        mu_g = kqx @ alpha
        v = linv @ kqx.T
        var_g = jnp.maximum(os_ - jnp.sum(v * v, axis=0), 0.0) + noise
        mu_f = eta_h - 0.5 * (mu_g**2 + var_g)
        var_f = jnp.maximum(mu_g * var_g * mu_g + 0.5 * var_g**2, 0.0)
        return mu_f, var_f

    def batch_predict(self, x_test):
        """(q, m) per-chain predictions — vmapped over chains
        (SOBER/FBGP/_fully_Bayesian_gp.py:307-323)."""
        f = jax.vmap(self.fitbo_predict, in_axes=(None, 0, 0, 0))
        return f(x_test, self.Theta_qd, self._cache.linv, self._cache.alpha)

    def marginal_predict(self, x_test):
        """(SOBER/FBGP/_fully_Bayesian_gp.py:325-339)"""
        mu_b, var_b = self.batch_predict(x_test)
        mu = self.w_qd @ mu_b
        var = self.w_qd @ (var_b + mu_b**2) - mu**2
        return mu, var

    def marginal_predictive_mean(self, x_test):
        return self.w_qd @ self.batch_predict(x_test)[0]

    def marginal_predictive_covariance(self, x_test, y_test):
        """Weighted sample covariance of chain means
        (SOBER/FBGP/_fully_Bayesian_gp.py:354-371)."""
        mu_x, _ = self.batch_predict(x_test)
        mu_y, _ = self.batch_predict(y_test)
        ex = self.w_qd @ mu_x
        ey = self.w_qd @ mu_y
        w_corr = 1.0 / jnp.maximum(1.0 - jnp.sum(self.w_qd**2), 1e-6)
        cx = mu_x - ex[None, :]
        cy = mu_y - ey[None, :]
        return w_corr * (self.w_qd[:, None] * cx).T @ cy

    def make_pi(self):
        return PIFBGP(self)

    def rc_kernel(self):
        """Marginal predictive covariance with the stable-callable protocol
        (core/rchq.py:recombination)."""
        return _RCFbgpKernel(_fbgp_tree(self))


def _fbgp_chain_predict(tree, x_test):
    """Per-chain f-space posterior as a pure function of the FBGP tree
    (fitbo_predict vmapped over chains, as in batch_predict) — shared by
    the covariance apply, the pi apply, and the acquisition applies below
    so all of them ride the rc/pi stable-callable protocol."""
    x_obs, theta_qd, linv, alpha, w_qd, mask = tree

    def one(theta, linv_i, alpha_i):
        eta_h, noise, ls, os_ = theta[0], theta[1], theta[2:-1], theta[-1]
        params = {"lengthscale": ls, "outputscale": os_}
        kqx = rbf_gram(params, x_test, x_obs)
        if mask is not None:
            kqx = kqx * mask[None, :]
        mu_g = kqx @ alpha_i
        v = linv_i @ kqx.T         # cached L^-1: batched MXU matmul
        var_g = jnp.maximum(os_ - jnp.sum(v * v, axis=0), 0.0) + noise
        mu_f = eta_h - 0.5 * (mu_g**2 + var_g)
        var_f = jnp.maximum(mu_g * var_g * mu_g + 0.5 * var_g**2, 0.0)
        return mu_f, var_f

    return jax.vmap(one)(theta_qd, linv, alpha)


def _fbgp_chain_mu(tree, x_test):
    return _fbgp_chain_predict(tree, x_test)[0]


def _fbgp_cov_apply(tree, x, y):
    """Weighted sample covariance of chain means
    (SOBER/FBGP/_fully_Bayesian_gp.py:354-371) as a pure function."""
    w_qd = tree[4]
    mu_x = _fbgp_chain_mu(tree, x)
    mu_y = _fbgp_chain_mu(tree, y)
    ex = w_qd @ mu_x
    ey = w_qd @ mu_y
    w_corr = 1.0 / jnp.maximum(1.0 - jnp.sum(w_qd**2), 1e-6)
    cx = mu_x - ex[None, :]
    cy = mu_y - ey[None, :]
    return w_corr * (w_qd[:, None] * cx).T @ cy


class _RCFbgpKernel:
    def __init__(self, tree):
        self.tree = tree

    rc_apply = staticmethod(_fbgp_cov_apply)

    @property
    def rc_tree(self):
        return self.tree

    def __call__(self, x, y):
        return _fbgp_cov_apply(self.tree, x, y)


def _fbgp_tree(model: "FullyBayesianGP"):
    """The FBGP stable tree shared by the rc/pi/acquisition applies."""
    return (model.Xobs, model.Theta_qd, model._cache.linv,
            model._cache.alpha, model.w_qd, model.mask)


def fbgp_pi_apply(tree, x_cand):
    """PIFBGP's body as a pure function of the FBGP tree — the pi
    stable-callable (core/fused_sampling.py) that lets FBGP-surrogate
    iterations trace into one program."""
    theta_qd, w_qd = tree[1], tree[4]
    mu_b, var_b = _fbgp_chain_predict(tree, x_cand)
    z = (mu_b - theta_qd[:, 0][:, None]) / jnp.sqrt(
        jnp.maximum(var_b, 1e-30))
    return w_qd @ jax.scipy.special.ndtr(z)


class PIFBGP:
    """Hyperposterior-weighted LFI pi (PI_FBGP, SOBER/_pi.py:58-107)."""

    pi_apply = staticmethod(fbgp_pi_apply)

    def __init__(self, model: FullyBayesianGP, label: str = "lfi"):
        self.model = model
        self.label = label

    @property
    def pi_tree(self):
        return _fbgp_tree(self.model)

    def __call__(self, x_cand, log: bool = False):
        val = fbgp_pi_apply(self.pi_tree, x_cand)
        if log:
            return jnp.log(val + EPS)
        return val


def _fbgp_acq_ei(tree, x):
    theta_qd, w_qd = tree[1], tree[4]
    mu_b, var_b = _fbgp_chain_predict(tree, x)
    eta = theta_qd[:, 0][:, None]
    sd = jnp.sqrt(jnp.maximum(var_b, 1e-30))
    z = (mu_b - eta) / sd
    cdf = jax.scipy.special.ndtr(z)
    pdf = jnp.exp(-0.5 * z**2) / jnp.sqrt(2 * jnp.pi)
    return w_qd @ ((mu_b - eta) * cdf + sd * pdf)


def _fbgp_acq_ucb(tree, x):
    w_qd = tree[4]
    mu_b, var_b = _fbgp_chain_predict(tree, x)
    ey = w_qd @ mu_b
    vy = w_qd @ (var_b + mu_b**2) - ey**2
    return ey + jnp.sqrt(jnp.maximum(vy, 0.0))


def _fbgp_acq_mes(tree, x):
    theta_qd, w_qd = tree[1], tree[4]
    mu_b, var_b = _fbgp_chain_predict(tree, x)
    ey = w_qd @ mu_b
    vary = w_qd @ (var_b + mu_b**2) - ey**2
    two_pi_e = 2.0 * jnp.pi * jnp.e
    h1 = 0.5 * jnp.log(two_pi_e * (vary + w_qd @ theta_qd[:, 1]))
    h2 = 0.5 * (w_qd @ jnp.log(two_pi_e * (var_b + theta_qd[:, 1][:, None])))
    return h1 - h2


def _fbgp_acq_bqbc(tree, x):
    w_qd = tree[4]
    mu_b, _ = _fbgp_chain_predict(tree, x)
    ey = w_qd @ mu_b
    return w_qd @ (mu_b - ey[None, :])


def _fbgp_acq_qbmgp(tree, x):
    w_qd = tree[4]
    mu_b, var_b = _fbgp_chain_predict(tree, x)
    ey = w_qd @ mu_b
    vy = w_qd @ (var_b + mu_b**2) - ey**2
    return vy + w_qd @ (mu_b - ey[None, :])


class FBGPAcquisitionFunction:
    """EI / UCB / MES(FITBO) / BQBC / QBMGP over hyperposterior-weighted
    predictions (SOBER/FBGP/_acquisition_function.py:5-117).

    Each label is a module-level pure function of the FBGP tree, exposed
    through the rc_apply/rc_tree stable-callable protocol so calc_obj-
    augmented selection keeps Sober's fused one-program fast path."""

    LABELS = ("EI", "UCB", "MES", "BQBC", "QBMGP")
    _APPLIES = {"EI": _fbgp_acq_ei, "UCB": _fbgp_acq_ucb,
                "MES": _fbgp_acq_mes, "BQBC": _fbgp_acq_bqbc,
                "QBMGP": _fbgp_acq_qbmgp}

    def __init__(self, model: FullyBayesianGP, label: str = "MES"):
        if label not in self.LABELS:
            raise ValueError(
                f"Acquisition function type should be from {self.LABELS}")
        self.model = model
        self.label = label
        self.rc_apply = self._APPLIES[label]

    @property
    def rc_tree(self):
        return _fbgp_tree(self.model)

    def __call__(self, x):
        return self.rc_apply(self.rc_tree, x)
