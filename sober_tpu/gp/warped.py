"""Warped GP models for Bayesian quadrature (MMLT / WSABI families).

Rebuild of ScaleMmltGP (SOBER/BASQ/_scale_mmlt.py): a doubly-warped GP for
log-likelihood surfaces. Observed y are log-likelihoods (f-space, log scale);
the model fits h = log(exp(y - beta) + 1) with beta = max(y), and
moment-matches predictions back to g-space:

      f space    |        g space          |   h space
      f = g e^b  |   g = exp(h) - 1        |   h ~ GP
  mu_f = mu_g e^b| mu_g = e^{mu_h+s_h/2}-1 |   mu_h
                 | k_g = mu_g(x)mu_g(y)(e^{k_h(x,y)}-1)

(table: SOBER/BASQ/_scale_mmlt.py:28-37).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.linalg import remove_anomalies
from .exact import (
    GPConfig,
    GPState,
    fit_gp,
    predict,
    predictive_covariance,
)

EPS = float(jnp.finfo(jnp.float32).eps)


class ScaleMmltGP:
    """Scale-MMLT warped BQ model (SOBER/BASQ/_scale_mmlt.py:7-275)."""

    is_bq = True

    def __init__(self, x_obs, y_log, kernel_name: str = "rbf",
                 lik: float = 1e-10, rng: float = 10.0,
                 train_lik: bool = False, optimiser: str = "lbfgs",
                 fit_iters: int = 200):
        self.kernel_name = kernel_name
        self.cfg = GPConfig(
            kernel_name=kernel_name,
            noise_lo=lik / rng, noise_hi=lik * rng,
            train_lik=train_lik, standardize_y=False, use_priors=False,
            fit_iters=fit_iters,
        )
        self.optimiser = optimiser
        self.jitter = 0.0
        self.y_log = jnp.asarray(y_log).reshape(-1)
        self._refit(jnp.asarray(x_obs), self.y_log)

    # -- warps ---------------------------------------------------------------

    def _warp(self, y_log):
        """f(log) -> h with beta rescaling
        (process_y_warping_with_scaling, _scale_mmlt.py:88-101)."""
        y = remove_anomalies(y_log)
        self.beta = jnp.max(y)
        y_g = jnp.exp(y - self.beta)
        return jnp.log(y_g + 1.0)

    @staticmethod
    def warp_from_g_to_h(y_g):
        return jnp.log(y_g + 1.0)

    @staticmethod
    def unwarp_from_h_to_g(y_h):
        return jnp.exp(y_h) - 1.0

    def _refit(self, x, y_log):
        y_h = self._warp(y_log)
        self.model: GPState = fit_gp(x, y_h, self.cfg,
                                     optimiser=self.optimiser)

    # -- updates -------------------------------------------------------------

    def update(self, x_new, y_log_new):
        """Append observations and refit
        (update_mmlt_gp_with_scaling, _scale_mmlt.py:146-165)."""
        x_all = jnp.concatenate([self.model.x, jnp.asarray(x_new)])
        self.y_log = jnp.concatenate(
            [self.y_log, jnp.asarray(y_log_new).reshape(-1)])
        self._refit(x_all, self.y_log)

    def retrain(self):
        """(retrain_gp_with_scaling, _scale_mmlt.py:167-182)"""
        self._refit(self.model.x, self.y_log)

    def memorise_parameters(self):
        """In-memory hyperparameter snapshot (_scale_mmlt.py:184-195)."""
        self._memory = (self.model.kernel, self.model.noise)

    def remind_parameters(self):
        kernel, noise = self._memory
        self.model = self.model._replace(kernel=kernel, noise=noise)

    # -- prediction ----------------------------------------------------------

    def hspace_predict(self, x):
        return predict(self.model, x)

    def gspace_predict(self, x):
        """Moment-matched g-space prediction (_scale_mmlt.py:209-221)."""
        mu_h, var_h = self.hspace_predict(x)
        mu_g = jnp.exp(mu_h + 0.5 * var_h) - 1.0
        var_g = mu_g**2 * (jnp.exp(var_h) - 1.0)
        return mu_g, var_g

    def hspace_mean_predict(self, x):
        return self.hspace_predict(x)[0]

    def gspace_mean_predict(self, x):
        return self.gspace_predict(x)[0]

    def hspace_kernel(self, x, y):
        return predictive_covariance(self.model, x, y)

    def gspace_kernel(self, x, y):
        """g-space Gram (_scale_mmlt.py:256-275)."""
        mu_g_x = self.gspace_mean_predict(x)
        mu_g_y = self.gspace_mean_predict(y)
        cov_h = self.hspace_kernel(x, y)
        return (mu_g_x[:, None] * mu_g_y[None, :]
                * (jnp.exp(cov_h) - 1.0))

    # -- Sober wiring --------------------------------------------------------

    def make_pi(self):
        return PIBQ(self)

    def rc_kernel(self):
        """g-space kernel with the stable-callable protocol (see
        core/rchq.py:recombination) so refits reuse the compiled program."""
        return _RCGspaceKernel(self.model)


def _gspace_apply(state: GPState, x, y):
    mu_h_x, var_h_x = predict(state, x)
    mu_h_y, var_h_y = predict(state, y)
    mu_g_x = jnp.exp(mu_h_x + 0.5 * var_h_x) - 1.0
    mu_g_y = jnp.exp(mu_h_y + 0.5 * var_h_y) - 1.0
    cov_h = predictive_covariance(state, x, y)
    return mu_g_x[:, None] * mu_g_y[None, :] * (jnp.exp(cov_h) - 1.0)


class _RCGspaceKernel:
    def __init__(self, state: GPState):
        self.state = state

    rc_apply = staticmethod(_gspace_apply)

    @property
    def rc_tree(self):
        return self.state

    def __call__(self, x, y):
        return _gspace_apply(self.state, x, y)


def bq_pi_apply(state: GPState, x_cand):
    """PIBQ's body as a pure function of the h-space GPState — the pi
    stable-callable (core/fused_sampling.py) that lets BQ-surrogate
    iterations trace into one program."""
    mu_h, var_h = predict(state, x_cand)
    mu_g = jnp.exp(mu_h + 0.5 * var_h) - 1.0
    var_g = mu_g**2 * (jnp.exp(var_h) - 1.0)
    return jax.scipy.special.ndtr(
        (mu_g - 1.0) / jnp.sqrt(jnp.maximum(var_g, 1e-30)))


class PIBQ:
    """pi for BQ models: LFI against the g-space threshold 1
    (PI_BQ, SOBER/_pi.py:109-157)."""

    pi_apply = staticmethod(bq_pi_apply)

    def __init__(self, model: ScaleMmltGP, label: str = "lfi"):
        self.model = model
        self.label = label

    @property
    def pi_tree(self):
        return self.model.model

    def __call__(self, x_cand, log: bool = False):
        val = bq_pi_apply(self.pi_tree, x_cand)
        if log:
            return jnp.log(val + EPS)
        return val
