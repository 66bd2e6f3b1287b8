"""Pathwise GP posterior sampling (decoupled / Matheron sampler).

Rebuild of benchmarks/gp_sampling/ (basis_functions.py, decoupled_samplers.py
— the RFF + kernel-basis pathwise sampler used by the decoupled-TS baseline).
The sampler follows Wilson et al. (2020): a posterior sample path is

    f_s(x) = Phi(x)^T w_s  +  k(x, X) (K + s^2 I)^-1 (y - Phi(X)^T w_s - e_s)

with random-Fourier-feature prior basis Phi, w_s ~ N(0, I),
e_s ~ N(0, s^2 I). All samples are drawn in one vmapped batch.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_solve

from .exact import GPState


class RFFBasis(NamedTuple):
    omega: jax.Array   # (num_basis, d) frequencies
    phase: jax.Array   # (num_basis,)
    scale: jax.Array   # sqrt(2 * outputscale / num_basis)
    lengthscale: jax.Array

    def __call__(self, x: jax.Array) -> jax.Array:
        """(n, num_basis) feature matrix."""
        proj = (x / self.lengthscale) @ self.omega.T + self.phase[None, :]
        return self.scale * jnp.cos(proj)


# Matern smoothness nu per kernel name; the spectral measure of Matern-nu
# (unit lengthscale) is the multivariate Student-t with 2*nu degrees of
# freedom — its characteristic function E[cos(omega . r)] is exactly the
# Matern correlation (nu=1/2: Cauchy frequencies -> exp(-r); nu=3/2:
# (1+sqrt(3)r)exp(-sqrt(3)r); nu=5/2: (1+sqrt(5)r+5r^2/3)exp(-sqrt(5)r)).
_MATERN_DF = {"matern12": 1.0, "matern32": 3.0, "matern52": 5.0}


def make_rff_basis(key: jax.Array, state: GPState,
                   num_basis: int = 1024) -> RFFBasis:
    """Random Fourier features for the fitted stationary kernel.

    RBF draws Gaussian frequencies; Matern-nu draws multivariate-t
    frequencies with df=2*nu via omega = z * sqrt(df/u), u ~ chi2_df
    (reference: benchmarks/gp_sampling/basis_functions.py:48, whose
    gpytorch-backed basis covers the same kernel families)."""
    name = state.kernel.name
    d = state.x.shape[1]
    k1, k2, k3 = jax.random.split(key, 3)
    z = jax.random.normal(k1, (num_basis, d))
    if name == "rbf":
        omega = z
    elif name in _MATERN_DF:
        df = _MATERN_DF[name]
        u = jax.random.chisquare(k3, df, shape=(num_basis,))
        omega = z * jnp.sqrt(df / jnp.maximum(u, 1e-12))[:, None]
    else:
        raise ValueError(
            f"no spectral density registered for kernel {name!r}; "
            f"pathwise sampling supports rbf and {sorted(_MATERN_DF)}")
    phase = jax.random.uniform(k2, (num_basis,), maxval=2 * jnp.pi)
    os_ = state.kernel.params["outputscale"]
    ls = state.kernel.params["lengthscale"]
    return RFFBasis(omega, phase, jnp.sqrt(2.0 * os_ / num_basis), ls)


def decoupled_sampler(key: jax.Array, state: GPState, n_samples: int,
                      num_basis: int = 1024):
    """Returns a function x -> (n_samples, n_x) of joint posterior sample
    paths (benchmarks/_batch_bo.py:27-41 decoupled_thompson_sampling's
    sampler)."""
    k_basis, k_w, k_eps = jax.random.split(key, 3)
    basis = make_rff_basis(k_basis, state, num_basis)
    w = jax.random.normal(k_w, (n_samples, num_basis))
    eps = jax.random.normal(k_eps, (n_samples, state.x.shape[0])) \
        * jnp.sqrt(state.noise)
    phi_train = basis(state.x)                            # (n, B)
    # residual corrections: (K + s^2 I)^-1 (y - phi w_s - e_s) per sample
    resid = state.y[None, :] - w @ phi_train.T - eps      # (S, n)
    corr = cho_solve((state.chol, True), resid.T).T       # (S, n)

    def paths(xq: jax.Array) -> jax.Array:
        prior_part = w @ basis(xq).T                      # (S, m)
        data_part = corr @ state.kernel.gram(state.x, xq)  # (S, m)
        return prior_part + data_part

    return paths


def joint_posterior_samples(key: jax.Array, state: GPState, xq: jax.Array,
                            n_samples: int) -> jax.Array:
    """Exact joint posterior samples over xq (for small pools): the analogue
    of botorch MaxPosteriorSampling's joint MVN draw
    (benchmarks/_batch_bo.py:20-25)."""
    from ..utils.linalg import jitter_cholesky
    from .exact import predict, predictive_covariance

    mu, _ = predict(state, xq, include_noise=False)
    cov = predictive_covariance(state, xq, xq)
    chol, _ = jitter_cholesky(cov)
    z = jax.random.normal(key, (n_samples, xq.shape[0]))
    return mu[None, :] + z @ chol.T
