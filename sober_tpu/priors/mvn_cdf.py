"""Differentiable multivariate normal orthant/box probabilities.

Rebuild of SOBER/mvnorm/ (multivariate_normal_cdf.py, Phi.py,
conditioning.py, integration.py). The reference evaluates Genz's algorithm
through scipy's Fortran mvnun with joblib fan-out and wires a custom
autograd with the closed-form gradient

    dPhi_d(b; mu, S) / d b_i = N(b_i; mu_i, S_ii) * Phi_{d-1}(b_-i | b_i)

(SOBER/mvnorm/Phi.py:37-78). Here the forward pass is Genz's separation-of-
variables with scrambled-Sobol nodes as one jitted lax.scan over dimensions
(vectorized over QMC nodes), and the same closed-form gradient is installed
via jax.custom_jvp — fully on-device and batchable.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.linalg import jitter_cholesky
from ..utils.sobol import sobol_engine, sobol_sample

_NDTRI_CLIP = 1e-7


def _phi(z):
    return jax.scipy.special.ndtr(z)


def _phinv(p):
    return jax.scipy.special.ndtri(jnp.clip(p, _NDTRI_CLIP, 1 - _NDTRI_CLIP))


def _genz_cdf(upper_std: jax.Array, chol_corr: jax.Array,
              w: jax.Array) -> jax.Array:
    """Genz separation-of-variables for P(Z < upper_std), Z ~ N(0, C) with
    C = chol_corr @ chol_corr.T; w: (n_qmc, d-1) quasi-uniform nodes."""
    d = upper_std.shape[0]
    n = w.shape[0]

    e0 = _phi(upper_std[0] / chol_corr[0, 0])
    if d == 1:
        return e0
    prob = jnp.full((n,), e0)
    y = jnp.zeros((n, d))
    e_prev = jnp.full((n,), e0)

    def scan_body(carry, i):
        prob, y, e_prev = carry
        # draw y_{i-1} by inverse-cdf within the previous truncation
        y = y.at[:, i - 1].set(_phinv(e_prev * w[:, i - 1]))
        # e_i = Phi((b_i - sum_{j<i} L_ij y_j) / L_ii); y_i..y_d are still 0
        num = upper_std[i] - y @ chol_corr[i, :]
        e_i = _phi(num / chol_corr[i, i])
        return (prob * e_i, y, e_i), None

    (prob, _, _), _ = jax.lax.scan(scan_body, (prob, y, e_prev),
                                   jnp.arange(1, d))
    return jnp.mean(prob)


def _genz_box_prob(lower_std: jax.Array, upper_std: jax.Array,
                   chol_corr: jax.Array, w: jax.Array) -> jax.Array:
    """Two-sided Genz: P(lower_std < Z < upper_std), Z ~ N(0, C)."""
    d = upper_std.shape[0]
    n = w.shape[0]
    d0 = _phi(lower_std[0] / chol_corr[0, 0])
    e0 = _phi(upper_std[0] / chol_corr[0, 0])
    if d == 1:
        return e0 - d0
    prob = jnp.full((n,), e0 - d0)
    y = jnp.zeros((n, d))
    lo_prev = jnp.full((n,), d0)
    hi_prev = jnp.full((n,), e0)

    def scan_body(carry, i):
        prob, y, lo_prev, hi_prev = carry
        y = y.at[:, i - 1].set(
            _phinv(lo_prev + w[:, i - 1] * (hi_prev - lo_prev)))
        shift = y @ chol_corr[i, :]
        lo_i = _phi((lower_std[i] - shift) / chol_corr[i, i])
        hi_i = _phi((upper_std[i] - shift) / chol_corr[i, i])
        return (prob * jnp.maximum(hi_i - lo_i, 0.0), y, lo_i, hi_i), None

    (prob, _, _, _), _ = jax.lax.scan(
        scan_body, (prob, y, lo_prev, hi_prev), jnp.arange(1, d))
    return jnp.mean(prob)


def mvn_box_prob(lower: jax.Array, upper: jax.Array, loc: jax.Array,
                 covariance_matrix: jax.Array,
                 n_qmc: int = 8192) -> jax.Array:
    """P(lower < X < upper) for X ~ N(loc, cov) — the truncated-Gaussian
    normalization constant (used instead of the reference's
    cdf(ub) - cdf(lb) at SOBER/_prior.py:150-152, which is only the true
    box probability in one dimension)."""
    lower = jnp.atleast_1d(lower)
    upper = jnp.atleast_1d(upper)
    loc = jnp.broadcast_to(jnp.atleast_1d(loc), upper.shape)
    d = upper.shape[-1]
    sd = jnp.sqrt(jnp.diagonal(covariance_matrix))
    if d == 1:
        z_hi = (upper[..., 0] - loc[..., 0]) / sd[0]
        z_lo = (lower[..., 0] - loc[..., 0]) / sd[0]
        return _phi(z_hi) - _phi(z_lo)
    corr = covariance_matrix / (sd[:, None] * sd[None, :])
    chol, _ = jitter_cholesky(corr)
    eng = sobol_engine(d - 1, seed=11)
    w = sobol_sample(eng, 0, n_qmc)
    return _genz_box_prob((lower - loc) / sd, (upper - loc) / sd, chol, w)


@partial(jax.custom_jvp, nondiff_argnums=(3,))
def multivariate_normal_cdf(value: jax.Array, loc: jax.Array,
                            covariance_matrix: jax.Array,
                            n_qmc: int = 8192) -> jax.Array:
    """P(X < value), X ~ N(loc, covariance_matrix).

    Mirrors SOBER/mvnorm/multivariate_normal_cdf.py:13 (upper-limit form,
    diff=value-loc). `value`/`loc` broadcast over leading batch dims.
    """
    value = jnp.atleast_1d(value)
    loc = jnp.broadcast_to(jnp.atleast_1d(loc), value.shape)
    d = value.shape[-1]
    if d == 1:
        sd = jnp.sqrt(covariance_matrix.reshape(())
                      if covariance_matrix.size == 1
                      else covariance_matrix[..., 0, 0])
        return _phi((value[..., 0] - loc[..., 0]) / sd)
    sd = jnp.sqrt(jnp.diagonal(covariance_matrix))
    corr = covariance_matrix / (sd[:, None] * sd[None, :])
    chol, _ = jitter_cholesky(corr)
    eng = sobol_engine(d - 1, seed=7)
    w = sobol_sample(eng, 0, n_qmc)
    upper_std = (value - loc) / sd
    if upper_std.ndim == 1:
        return _genz_cdf(upper_std, chol, w)
    flat = upper_std.reshape(-1, d)
    vals = jax.vmap(lambda b: _genz_cdf(b, chol, w))(flat)
    return vals.reshape(value.shape[:-1])


@multivariate_normal_cdf.defjvp
def _mvn_cdf_jvp(n_qmc, primals, tangents):
    """Closed-form gradient wrt value and loc (SOBER/mvnorm/Phi.py:47-78):
    dPhi/db_i = N(b_i; mu_i, S_ii) * Phi_{d-1}(conditional distribution).
    Covariance tangents are not propagated (the reference's cov gradient
    uses second-order conditioning; rarely needed — raise if requested)."""
    value, loc, cov = primals
    dvalue, dloc, dcov = tangents
    primal_out = multivariate_normal_cdf(value, loc, cov, n_qmc)

    value = jnp.atleast_1d(value)
    loc = jnp.broadcast_to(jnp.atleast_1d(loc), value.shape)
    d = value.shape[-1]
    sd = jnp.sqrt(jnp.diagonal(cov))
    b = value - loc

    def grad_coord(i):
        # marginal pdf at b_i
        pdf_i = jnp.exp(-0.5 * (b[..., i] / sd[i]) ** 2) / (
            sd[i] * jnp.sqrt(2 * jnp.pi))
        if d == 1:
            return pdf_i
        # conditional N(mu_cond, cov_cond) of remaining coords given X_i=b_i
        # (SOBER/mvnorm/conditioning.py:3-24)
        others = jnp.asarray([j for j in range(d) if j != i])
        cov_oo = cov[jnp.ix_(others, others)]
        cov_oi = cov[others, i]
        mu_cond = b[..., others] - cov_oi * (b[..., i:i+1] / cov[i, i])
        cov_cond = cov_oo - jnp.outer(cov_oi, cov_oi) / cov[i, i]
        cdf_cond = multivariate_normal_cdf(
            mu_cond, jnp.zeros(d - 1), cov_cond, max(n_qmc // 4, 1024))
        return pdf_i * cdf_cond

    grads = jnp.stack([grad_coord(i) for i in range(d)], axis=-1)
    dval = jnp.atleast_1d(dvalue) if dvalue is not None else jnp.zeros_like(b)
    dlc = jnp.broadcast_to(jnp.atleast_1d(dloc), b.shape) \
        if dloc is not None else jnp.zeros_like(b)
    tangent_out = jnp.sum(grads * (dval - dlc), axis=-1)
    return primal_out, tangent_out
