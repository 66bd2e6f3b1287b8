"""Competitor batch-BO baselines.

Rebuild of benchmarks/_batch_bo.py: Thompson sampling, decoupled (pathwise)
TS, DPP-TS, GIBBON, hallucination (kriging believer), local penalisation,
TurBO, and the SOBER-TS hybrid — all JAX-native:

  * joint/pathwise posterior sampling comes from gp/sampling.py instead of
    botorch MaxPosteriorSampling / gp_sampling decoupled_sampler;
  * acquisition optimization (the reference's botorch optimize_acqf with
    restarts) is a Sobol-restart + projected-Adam-polish routine;
  * DPP-TS's batch-diversity MCMC uses posterior-covariance log-det swap
    acceptance (the mechanism of benchmarks/dpp_ts_bo/snippet_dppts.py).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..gp.exact import GPState, predict, predictive_covariance
from ..gp.sampling import decoupled_sampler, joint_posterior_samples
from ..utils.linalg import jitter_cholesky
from ..utils.sobol import sobol_engine, sobol_sample


# ----------------------------------------------------------------------------
# acquisition machinery
# ----------------------------------------------------------------------------

def expected_improvement(state: GPState, eta, x: jax.Array) -> jax.Array:
    mu, var = predict(state, x, include_noise=False)
    sd = jnp.sqrt(jnp.maximum(var, 1e-30))
    z = (mu - eta) / sd
    cdf = jax.scipy.special.ndtr(z)
    pdf = jnp.exp(-0.5 * z**2) / jnp.sqrt(2 * jnp.pi)
    return (mu - eta) * cdf + sd * pdf


def maximize_acqf(key: jax.Array, acq_fn: Callable, bounds: jax.Array,
                  q: int = 1, num_restarts: int = 5,
                  raw_samples: int = 512, polish_steps: int = 30
                  ) -> jax.Array:
    """Sobol restarts + projected Adam ascent — the optimize_acqf analogue
    used throughout benchmarks/_batch_bo.py."""
    d = bounds.shape[1]
    lo, hi = bounds[0], bounds[1]
    seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
    raw = lo + (hi - lo) * sobol_sample(sobol_engine(d, seed=seed), 0,
                                        raw_samples)
    vals = acq_fn(raw)
    _, top = jax.lax.top_k(vals, num_restarts)
    x0 = raw[top]

    opt = optax.adam(0.05 * float(jnp.max(hi - lo)))

    def step(carry, _):
        x, opt_state = carry
        g = jax.grad(lambda xx: -jnp.sum(acq_fn(xx)))(x)
        updates, opt_state = opt.update(g, opt_state, x)
        x = jnp.clip(optax.apply_updates(x, updates), lo[None], hi[None])
        return (x, opt_state), None

    (x, _), _ = jax.lax.scan(step, (x0, opt.init(x0)), None,
                             length=polish_steps)
    final = acq_fn(x)
    _, best = jax.lax.top_k(final, min(q, num_restarts))
    return x[best]


# ----------------------------------------------------------------------------
# baselines
# ----------------------------------------------------------------------------

def thompson_sampling(key: jax.Array, model: GPState, prior, n_rec: int,
                      batch_size: int) -> jax.Array:
    """Batch TS: joint posterior draw over a candidate pool, argmax each
    sample without replacement (benchmarks/_batch_bo.py:20-25)."""
    k1, k2 = jax.random.split(key)
    x_cand = prior.sample(k1, n_rec)
    y = joint_posterior_samples(k2, model, x_cand, batch_size)  # (B, n_rec)
    taken = jnp.zeros(n_rec, bool)
    idx_out = []
    y_np = np.asarray(y)
    for i in range(batch_size):
        row = np.where(np.asarray(taken), -np.inf, y_np[i])
        j = int(np.argmax(row))
        idx_out.append(j)
        taken = taken.at[j].set(True)
    return x_cand[jnp.asarray(idx_out)]


def decoupled_thompson_sampling(key: jax.Array, model: GPState, prior,
                                n_rec: int, batch_size: int,
                                num_basis: int = 4096) -> jax.Array:
    """Pathwise (RFF Matheron) batch TS (benchmarks/_batch_bo.py:27-41)."""
    k1, k2 = jax.random.split(key)
    x_cand = prior.sample(k1, n_rec)
    paths = decoupled_sampler(k2, model, batch_size, num_basis=num_basis)
    y = np.asarray(paths(x_cand))                      # (B, n_rec)
    taken = np.zeros(n_rec, bool)
    idx_out = []
    for i in range(batch_size):
        row = np.where(taken, -np.inf, y[i])
        j = int(np.argmax(row))
        idx_out.append(j)
        taken[j] = True
    return x_cand[jnp.asarray(idx_out)]


def _dpp_logdet(model: GPState, x_batch: jax.Array, dpp_lambda: float,
                lambda_mode: str) -> jax.Array:
    """log det of the regularized DPP kernel K_S = I + lambda s^-2 K_post
    ('mult') or (I + s^-2 K_post)^lambda ('pow') — the mixture kernel of
    Nava et al. 2021 (benchmarks/dpp_ts_bo/snippet_dppts.py:42-50)."""
    k_post = predictive_covariance(model, x_batch, x_batch)
    eye = jnp.eye(x_batch.shape[0], dtype=k_post.dtype)
    inv_s2 = 1.0 / jnp.maximum(model.noise, 1e-12)
    if lambda_mode == "mult":
        k_s = eye + dpp_lambda * inv_s2 * k_post
        lam_pow = 1.0
    elif lambda_mode == "pow":
        k_s = eye + inv_s2 * k_post
        lam_pow = dpp_lambda
    else:
        raise ValueError("lambda_mode must be 'mult' or 'pow'")
    chol, _ = jitter_cholesky(k_s)
    return lam_pow * 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))


_dpp_logdet_jit = jax.jit(_dpp_logdet, static_argnames=("lambda_mode",))


def dpp_ts(key: jax.Array, model: GPState, prior, n_rec: int,
           batch_size: int, n_mcmc: int = 50, dpp_lambda: float = 1.0,
           lambda_mode: str = "mult", first_ts: bool = False) -> jax.Array:
    """DPP-TS (Nava et al. 2021, AISTATS 2022): sample from the mixture of
    the TS distribution and a DPP over the posterior covariance via the
    paper's Algorithm-1 MCMC (benchmarks/dpp_ts_bo/snippet_dppts.py:19-91):

      * every batch slot is initialized by an INDEPENDENT TS draw
        (argmax over the pool of one joint posterior sample; duplicates
        allowed, as in the reference),
      * each MCMC step draws a fresh TS proposal, swaps it into a uniformly
        random slot, and accepts with min(1, det(K_S')/det(K_S)) where
        K_S = I + lambda s^-2 K_post ('mult') or (I + s^-2 K_post)^lambda
        ('pow') — the lambda-parametrizations of the paper's Appendix E.2,
      * first_ts=True pins slot 0 to plain TS (DPP-TS-alt, paper §5.2).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    x_cand = prior.sample(k1, n_rec)
    y = joint_posterior_samples(k2, model, x_cand, batch_size + n_mcmc)
    y_np = np.asarray(y)

    # per-slot independent TS initialization (snippet_dppts.py:33-41)
    idx = [int(np.argmax(y_np[i])) for i in range(batch_size)]
    cur_ld = float(_dpp_logdet_jit(model, x_cand[jnp.asarray(idx)],
                                   dpp_lambda, lambda_mode))
    rng = np.random.default_rng(int(jax.random.randint(k3, (), 0, 2**31 - 1)))
    lo_slot = 1 if first_ts else 0
    for t in range(n_mcmc):
        proposal_idx = int(np.argmax(y_np[batch_size + t]))
        slot = int(rng.integers(lo_slot, batch_size))
        cand = list(idx)
        cand[slot] = proposal_idx
        new_ld = float(_dpp_logdet_jit(model, x_cand[jnp.asarray(cand)],
                                       dpp_lambda, lambda_mode))
        # Metropolis: alpha = min(1, det'/det) (snippet_dppts.py:74-76)
        if np.log(rng.uniform()) < new_ld - cur_ld:
            idx, cur_ld = cand, new_ld
    return x_cand[jnp.asarray(idx)]


def gibbon(key: jax.Array, model: GPState, prior, n_rec: int,
           batch_size: int, n_max_samples: int = 16) -> jax.Array:
    """GIBBON-style max-value entropy batch selection: information gain
    about the max value (Gumbel-approximated max samples) plus a
    repulsion/log-det diversity term, greedily maximized
    (benchmarks/_batch_bo.py:52-63)."""
    k1, k2, k3 = jax.random.split(key, 3)
    x_cand = prior.sample(k1, n_rec)
    mu, var = predict(model, x_cand, include_noise=False)
    sd = jnp.sqrt(jnp.maximum(var, 1e-30))

    # Gumbel max-value samples (standard MES approximation)
    y_samples = joint_posterior_samples(k2, model, x_cand[:512],
                                        n_max_samples)
    y_star = jnp.max(y_samples, axis=1)                   # (S,)

    gamma = (y_star[:, None] - mu[None, :]) / sd[None, :]  # (S, n)
    cdf = jax.scipy.special.ndtr(gamma)
    pdf = jnp.exp(-0.5 * gamma**2) / jnp.sqrt(2 * jnp.pi)
    # truncated-normal variance ratio (MES information gain integrand)
    ratio = gamma * pdf / jnp.maximum(cdf, 1e-10)
    info = -0.5 * jnp.mean(jnp.log1p(-jnp.clip(ratio, None, 1 - 1e-6)),
                           axis=0)

    # greedy batch with covariance-based repulsion; chosen points are also
    # hard-excluded (the repulsion term vanishes at near-zero-variance
    # points, which would otherwise be re-picked forever)
    chosen = []
    penalty = jnp.zeros(n_rec)
    taken = jnp.zeros(n_rec, bool)
    for _ in range(batch_size):
        score = jnp.where(taken, -jnp.inf, info - penalty)
        j = int(jnp.argmax(score))
        chosen.append(j)
        taken = taken.at[j].set(True)
        cov_j = predictive_covariance(model, x_cand,
                                      x_cand[jnp.asarray([j])])[:, 0]
        corr2 = cov_j**2 / jnp.maximum(var * var[j], 1e-30)
        penalty = penalty - 0.5 * jnp.log1p(-jnp.clip(corr2, 0.0, 1 - 1e-6))
    return x_cand[jnp.asarray(chosen)]


def hallucination(key: jax.Array, model: GPState, set_model: Callable,
                  prior, batch_size: int) -> jax.Array:
    """Kriging believer: sequential EI with fantasized observations at the
    posterior mean (benchmarks/_batch_bo.py:65-90)."""
    x_f = model.x
    y_f = model.y * model.y_std + model.y_mean
    bounds = prior.bounds
    batch = []
    for i in range(batch_size):
        key, sub = jax.random.split(key)
        m = set_model(x_f, y_f)
        eta = jnp.max(m.y)
        x_next = maximize_acqf(
            sub, lambda x: expected_improvement(m, eta, x), bounds, q=1,
            num_restarts=5, raw_samples=max(batch_size, 64))
        mu_next, _ = predict(m, x_next)
        y_next = mu_next * m.y_std + m.y_mean
        x_f = jnp.concatenate([x_f, x_next])
        y_f = jnp.concatenate([y_f, y_next])
        batch.append(x_next)
    return jnp.concatenate(batch, axis=0)


def local_penalisation(key: jax.Array, model: GPState, prior,
                       batch_size: int, lipschitz: float = 1.0) -> jax.Array:
    """Sequential EI with erfc local penalties around already-chosen points
    (benchmarks/_batch_bo.py:92-111,171-193)."""
    eta = jnp.max(model.y)
    bounds = prior.bounds
    batch = []

    def penalised(x, chosen):
        ei = expected_improvement(model, eta, x)
        for xb in chosen:
            mu_b, var_b = predict(model, xb[None, :], include_noise=False)
            dist = jnp.sqrt(jnp.sum((x - xb[None, :]) ** 2, axis=1))
            z = (lipschitz * dist - eta + mu_b[0]) / jnp.sqrt(
                2.0 * jnp.maximum(var_b[0], 1e-30))
            ei = 0.5 * jax.scipy.special.erfc(-z) * ei
        return ei

    for i in range(batch_size):
        key, sub = jax.random.split(key)
        x_next = maximize_acqf(
            sub, lambda x: penalised(x, batch), bounds, q=1,
            num_restarts=5, raw_samples=max(batch_size, 64))
        batch.append(x_next[0])
    return jnp.stack(batch)


# ----------------------------------------------------------------------------
# TurBO (benchmarks/_batch_bo.py:113-149, 195-230)
# ----------------------------------------------------------------------------

@dataclass
class TurboState:
    dim: int
    batch_size: int
    length: float = 0.8
    length_min: float = 0.5**7
    length_max: float = 1.6
    failure_counter: int = 0
    failure_tolerance: int = field(default=0)
    success_counter: int = 0
    success_tolerance: int = 10
    best_value: float = -float("inf")
    restart_triggered: bool = False

    def __post_init__(self):
        self.failure_tolerance = math.ceil(
            max(4.0 / self.batch_size, self.dim / self.batch_size))


def update_turbo_state(state: TurboState, y_next) -> TurboState:
    """(benchmarks/_batch_bo.py:213-230)"""
    y_max = float(jnp.max(jnp.asarray(y_next)))
    if y_max > state.best_value + 1e-3 * abs(state.best_value):
        state.success_counter += 1
        state.failure_counter = 0
    else:
        state.success_counter = 0
        state.failure_counter += 1
    if state.success_counter == state.success_tolerance:
        state.length = min(2.0 * state.length, state.length_max)
        state.success_counter = 0
    elif state.failure_counter == state.failure_tolerance:
        state.length /= 2.0
        state.failure_counter = 0
    state.best_value = max(state.best_value, y_max)
    if state.length < state.length_min:
        state.restart_triggered = True
    return state


def turbo(key: jax.Array, state: TurboState, model: GPState, prior,
          batch_size: int) -> jax.Array:
    """Trust-region TS (benchmarks/_batch_bo.py:113-149)."""
    bounds = prior.bounds
    lo, hi = bounds[0], bounds[1]
    x_norm = (model.x - lo) / (hi - lo)
    dim = x_norm.shape[1]
    n_cand = min(5000, max(2000, 200 * dim))

    x_center = x_norm[int(jnp.argmax(model.y))]
    ls = jnp.atleast_1d(model.kernel.params["lengthscale"])
    if ls.shape[0] == 1:
        weights = jnp.ones(dim)
    else:
        weights = ls / ls.mean()
        weights = weights / jnp.prod(weights)
    tr_lb = jnp.clip(x_center - weights * state.length / 2.0, 0.0, 1.0)
    tr_ub = jnp.clip(x_center + weights * state.length / 2.0, 0.0, 1.0)

    k1, k2, k3, k4 = jax.random.split(key, 4)
    seed = int(jax.random.randint(k1, (), 0, 2**31 - 1))
    pert = tr_lb + (tr_ub - tr_lb) * sobol_sample(
        sobol_engine(dim, seed=seed), 0, n_cand)
    prob_perturb = min(20.0 / dim, 1.0)
    mask = jax.random.uniform(k2, (n_cand, dim)) <= prob_perturb
    none_on = ~jnp.any(mask, axis=1)
    rand_dim = jax.random.randint(k3, (n_cand,), 0, dim)
    fix = jax.nn.one_hot(rand_dim, dim, dtype=bool)
    mask = jnp.where(none_on[:, None], fix, mask)
    x_cand_norm = jnp.where(mask, pert, x_center[None, :])
    x_cand = lo + (hi - lo) * x_cand_norm

    y = joint_posterior_samples(k4, model, x_cand, batch_size)
    y_np = np.asarray(y)
    taken = np.zeros(n_cand, bool)
    idx_out = []
    for i in range(batch_size):
        row = np.where(taken, -np.inf, y_np[i])
        j = int(np.argmax(row))
        idx_out.append(j)
        taken[j] = True
    return x_cand[jnp.asarray(idx_out)]


def sober_ts(key: jax.Array, model: GPState, prior, batch_size: int,
             n_cand_super: int = 20000, n_cand: int = 2000,
             n_nys: int = 200) -> jax.Array:
    """SOBER-TS hybrid: decoupled-TS supersample -> kernel recombination
    (benchmarks/_batch_bo.py:151-169)."""
    from ..core.rchq import recombination

    k1, k2 = jax.random.split(key)
    x_cand = decoupled_thompson_sampling(k1, model, prior, n_cand_super,
                                         n_cand)
    weights = jnp.full((n_cand,), 1.0 / n_cand)
    x_nys = x_cand[:n_nys]
    kernel = lambda x, y: predictive_covariance(model, x, y)
    idx, w = recombination(x_cand, x_nys, batch_size, kernel,
                           init_weights=weights)
    return x_cand[idx]
