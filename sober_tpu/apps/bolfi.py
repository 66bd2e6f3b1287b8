"""BOLFI: Bayesian optimization for likelihood-free inference surrogates.

Rebuild of SOBER/BOLFI/ (_gpytorch_bolfi_model.py, _botorch_acquisition.py):
a structured GP surrogate with a learned per-dimension parabolic mean
(hyperpriors seeded by a parabolic least-squares fit of the initial data)
and Gamma-hyperprior RBF kernel, plus the UCB/LCB acquisition machinery.
"""
from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..gp.exact import GPConfig, GPState, fit_gp, predict
from ..utils.prng import KeyRing
from ..utils.sobol import sobol_engine, sobol_sample


def _parabolic_fit(x: np.ndarray, y: np.ndarray):
    """Least-squares fit of y ~ sum_j a_j x_j^2 + b_j x_j + c.

    The reference solves the same (linear) problem with scipy trust-constr
    (SOBER/BOLFI/_gpytorch_bolfi_model.py:392-446); lstsq is its exact
    optimum. Includes the reference's n=1/n=2 special cases.
    """
    n, d = x.shape
    if n == 1:
        return np.zeros(d), np.zeros(d), float(y[0])
    if n == 2:
        a = np.zeros(d)
        b = (y[1] - y[0]) / (x[1] - x[0])
        c = float(y[0] - np.sum(b * x[0]))
        return a, b, c
    design = np.concatenate([x**2, x, np.ones((n, 1))], axis=1)
    coef, *_ = np.linalg.lstsq(design, y, rcond=None)
    return coef[:d], coef[d:2 * d], float(coef[-1])


def make_bolfi_model(x, y, bounds, noise_lo: float = 1e-6,
                     noise_hi: float = 1e2, optimiser: str = "lbfgs",
                     fit_iters: int = 100,
                     manual_kernel: bool = False) -> GPState:
    """Build and MAP-fit the BOLFI surrogate
    (BOLFIModel, SOBER/BOLFI/_gpytorch_bolfi_model.py:341-460).

    Kernel heuristics: lengthscale prior Gamma(range/3, 1), outputscale
    prior Gamma((max y / 3)^2, 1); parabolic-mean Normal priors seeded from
    the initial fit with the reference's variance heuristics.

    ``manual_kernel=True`` selects the BOLFIKernel_manually_implemented
    variant (SOBER/BOLFI/_gpytorch_bolfi_model.py:179-338; kept as
    commented-out code at :368-386): a diagonal — i.e. ARD — RBF with one
    Gamma(length_scale, 1) hyperprior per dimension's lengthscale instead
    of the shared isotropic one. (The reference's forward at :332-338 has
    a sign bug, exp(+d^2); this rebuild implements the RBF its docstring
    specifies.)
    """
    x_np = np.asarray(x, np.float64)
    y_np = np.asarray(y, np.float64).reshape(-1)
    bounds_np = np.asarray(bounds, np.float64)
    n, d = x_np.shape

    length_scale = float((bounds_np.max() - bounds_np.min()) / 3.0)
    kernel_var = float((y_np.max() / 3.0) ** 2)
    kernel_var = max(kernel_var, 1e-6)

    a, b, c = _parabolic_fit(x_np, y_np)
    # variance heuristics (SOBER/BOLFI/_gpytorch_bolfi_model.py:425-437)
    if n > 2:
        with np.errstate(divide="ignore", invalid="ignore"):
            resid = (y_np[:, None] - b * x_np - c) / np.where(a == 0, 1.0, a)
            a_var = np.sum((np.sqrt(np.abs(resid)) - x_np) ** 2, axis=0)
    else:
        a_var = np.ones(d)
    b_var = (-b - 2 * a * x_np[np.argmin(y_np)]) ** 2
    c_var = float((c - y_np.min()) ** 2)
    a = np.maximum(a, 1e-4)  # Positive constraint on square coefficients

    ls_prior = ((length_scale,) * d, (1.0,) * d) if manual_kernel \
        else (length_scale, 1.0)
    cfg = GPConfig(
        kernel_name="rbf", ard=manual_kernel,
        noise_lo=noise_lo, noise_hi=noise_hi, train_lik=True,
        standardize_y=False, use_priors=True,
        ls_prior=ls_prior, os_prior=(kernel_var, 1.0),
        mean="parabolic",
        mean_priors=(
            tuple(float(v) for v in a),
            tuple(float(max(v, 1e-6)) for v in a_var),
            tuple(float(v) for v in b),
            tuple(float(max(v, 1e-6)) for v in b_var),
            c, max(c_var, 1e-6),
        ),
        fit_iters=fit_iters,
    )
    return fit_gp(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
                  cfg, optimiser=optimiser)


def _bolfi_beta(sample_size: int, dim: int, exploration_rate: float) -> float:
    """BOLFI's epsilon-greedy UCB schedule
    (SOBER/BOLFI/_botorch_acquisition.py:43-48,118-124)."""
    t = max(sample_size, 1)
    return 2.0 * math.log(
        t ** (2 * dim + 2) * math.pi**2 / (3.0 / exploration_rate))


def _soberucb_apply(tree, x):
    """Stable callable for the rc protocol (core/rckernel.py): jit caches
    key on this module-level function, not a per-instance closure."""
    state, beta = tree
    mu, var = predict(state, x, include_noise=False)
    return mu + jnp.sqrt(beta * var)


class SOBERUCB:
    """Pointwise UCB with the BOLFI beta schedule, used as calc_obj in the
    recombination (SOBER/BOLFI/_botorch_acquisition.py:118-129). Carries
    the rc_apply/rc_tree stable-callable protocol so calc_obj-augmented
    selection stays on the fused one-program path (core/sober.py)."""

    rc_apply = staticmethod(_soberucb_apply)

    def __init__(self, model: GPState, label: str = "UCB",
                 sample_size: int = 1, exploration_rate: float = 10.0):
        self.label = label
        self.model = model
        self.beta = _bolfi_beta(sample_size, model.x.shape[1],
                                exploration_rate)

    @property
    def rc_tree(self):
        return (self.model, jnp.asarray(self.beta, jnp.float32))

    def __call__(self, x) -> jax.Array:
        mu, var = predict(self.model, x, include_noise=False)
        return mu + jnp.sqrt(self.beta * var)


class BoTorchLCBSC:
    """LCB minimizer via sampled restarts + Adam polish — the analogue of
    botorch's gen_batch_initial_conditions + gen_candidates_torch pipeline
    (SOBER/BOLFI/_botorch_acquisition.py:41-115)."""

    def __init__(self, model: GPState, bounds, prior=None,
                 exploration_rate: float = 10.0, constraints=None,
                 seed: int = 0):
        if prior is not None:
            raise NotImplementedError(
                "Priors for acquisition function not implemented.")
        self.model = model
        self.bounds = jnp.asarray(bounds, jnp.float32)
        self.exploration_rate = exploration_rate
        self.keys = KeyRing(seed)

    def _beta(self, t: Optional[int]) -> float:
        t = 0 if t is None else t
        return _bolfi_beta(t + 1, self.model.x.shape[1],
                           self.exploration_rate)

    def evaluate(self, x, t: Optional[int] = None) -> jax.Array:
        """Negated LCB at x (to be maximized)."""
        mu, var = predict(self.model, x, include_noise=False)
        return -(mu - jnp.sqrt(self._beta(t) * var))

    def acquire(self, n: int, t: Optional[int] = None,
                std_scale: Optional[float] = None,
                num_restarts: int = 25, polish_steps: int = 50
                ) -> np.ndarray:
        """Minimize the LCB; returns (n, d) candidates."""
        beta = std_scale if std_scale is not None else self._beta(t)
        d = self.bounds.shape[1]
        lo, hi = self.bounds[0], self.bounds[1]

        def lcb(x):
            mu, var = predict(self.model, x, include_noise=False)
            return mu - jnp.sqrt(beta * var)

        n_raw = min(500 * 2**d, 65536)
        eng = sobol_engine(d, seed=int(jax.random.randint(
            self.keys.next(), (), 0, 2**31 - 1)))
        raw = lo + (hi - lo) * sobol_sample(eng, 0, n_raw)
        vals = lcb(raw)
        _, top = jax.lax.top_k(-vals, num_restarts)
        x0 = raw[top]

        opt = optax.adam(0.05 * float(jnp.max(hi - lo)))

        @jax.jit
        def polish(x0):
            def step(carry, _):
                x, state = carry
                g = jax.grad(lambda xx: jnp.sum(lcb(xx)))(x)
                updates, state = opt.update(g, state, x)
                x = jnp.clip(optax.apply_updates(x, updates),
                             lo[None, :], hi[None, :])
                return (x, state), None

            (x, _), _ = jax.lax.scan(step, (x0, opt.init(x0)), None,
                                     length=polish_steps)
            return x

        polished = polish(x0)
        final_vals = lcb(polished)
        _, best = jax.lax.top_k(-final_vals, min(n, num_restarts))
        return np.asarray(polished[best])
