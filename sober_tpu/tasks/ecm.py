"""ECM (equivalent circuit model) battery impedance simulator for SBI.

Rebuild of experiments/_ecm.py: a 2-RC canonical battery impedance model.
The reference wraps the per-sample simulator in functorch vmap
(experiments/_ecm.py:202); here the simulator is written batched from the
start — one jitted evaluation over the whole parameter batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..priors.continuous import TruncatedGaussian


class CanonicalECMTwoRCs:
    """Two-RC-pair canonical ECM (experiments/_ecm.py:10-174).

    Parameters theta = (rt, r1_, t1, r2_, t2): log total resistance, doubly-
    log-warped AC resistance fractions, normalized log time constants.
    """

    def __init__(self, rt, r1_, t1, r2_, t2, sigma, omega, seed: int = 0):
        self.omega = jnp.asarray(omega, jnp.float32)
        self.noise_sig = jnp.asarray(sigma, jnp.float32)
        self.mu = jnp.mean(jnp.log(self.omega))
        self.sigma = jnp.std(jnp.log(self.omega))
        theta_true = jnp.asarray([rt, r1_, t1, r2_, t2], jnp.float32)
        self.theta_true = theta_true
        # synthetic observations (experiments/_ecm.py:87-93)
        re, im = self._spectrum(theta_true)
        r_noise = jnp.exp(-jnp.exp(self.noise_sig))
        key = jax.random.key(seed)
        k1, k2 = jax.random.split(key)
        n = self.omega.shape[0]
        self.reZ = re + jax.random.normal(k1, (n,)) * jnp.sqrt(r_noise)
        self.imZ = im + jax.random.normal(k2, (n,)) * jnp.sqrt(r_noise)

    def _normalised_input(self, tau):
        return jnp.log(self.omega) - (self.sigma * tau + self.mu)

    def _spectrum(self, theta):
        rt, r1_, t1, r2_, t2 = theta[0], theta[1], theta[2], theta[3], theta[4]
        r1 = jnp.exp(-jnp.exp(r1_))
        r2 = jnp.exp(-jnp.exp(r2_))
        r0 = 1.0 - r1 - r2
        big_rt = jnp.exp(rt)
        z1 = self._normalised_input(t1)
        z2 = self._normalised_input(t2)
        re = big_rt * (r0 + r1 / 2 * (1 - jnp.tanh(z1))
                       + r2 / 2 * (1 - jnp.tanh(z2)))
        im = big_rt * ((r1 / 2) / jnp.cosh(z1) + (r2 / 2) / jnp.cosh(z2))
        return re, im

    def convert_circuit_elements(self, theta):
        """(R0, R1, C1, R2, C2) in physical units
        (experiments/_ecm.py:114-128)."""
        rt, r1_, t1, r2_, t2 = theta[0], theta[1], theta[2], theta[3], theta[4]
        r1 = jnp.exp(-jnp.exp(r1_))
        r2 = jnp.exp(-jnp.exp(r2_))
        big_rt = jnp.exp(rt)
        r0v = big_rt * (1 - r1 - r2)
        r1v, r2v = big_rt * r1, big_rt * r2
        c1 = jnp.exp(-(self.sigma * t1 + self.mu)) / r1v
        c2 = jnp.exp(-(self.sigma * t2 + self.mu)) / r2v
        return r0v, r1v, c1, r2v, c2

    def _one(self, theta):
        re, im = self._spectrum(theta)
        err = jnp.sum((self.reZ - re) ** 2) + jnp.sum((self.imZ - im) ** 2)
        n = 2 * self.omega.shape[0]
        r = err / n
        discrepancy = -jnp.log(r)
        loglik = -0.5 * jnp.log(2 * jnp.pi * r) * n - 0.5 * err / r
        return discrepancy, loglik

    def __call__(self, theta_batch):
        """Returns (discrepancy, loglikelihood) batched
        (experiments/_ecm.py:164-174)."""
        theta_batch = jnp.atleast_2d(theta_batch)
        return jax.vmap(self._one)(theta_batch)


def setup_ecm_two(seed: int = 0):
    """(experiments/_ecm.py:176-203): truncated-Gaussian prior over 5 ECM
    parameters + batched discrepancy/LL simulator."""
    n_data = 100
    f = jnp.logspace(1, 10, n_data)
    omega = 2 * jnp.pi * f
    params_true = jnp.array([2.0, -0.5, -1.0, 0.0, 0.5])
    sim = CanonicalECMTwoRCs(*params_true, sigma=1.0, omega=omega, seed=seed)

    mu_pi = params_true * 0.9
    cov_pi = 0.5 * jnp.eye(5)
    bounds = jnp.array([
        [1.0, -2.0, -2.0, -2.0, -2.0],
        [3.0, 2.0, 2.0, 2.0, 2.0],
    ])
    prior = TruncatedGaussian(mu_pi, cov_pi, bounds)
    return prior, jax.jit(sim.__call__)
