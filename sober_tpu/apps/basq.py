"""BASQ: batch Bayesian quadrature for evidence and posterior inference.

Rebuild of SOBER/BASQ/_basq.py. Estimates the marginal likelihood
E[Z] = w^T mu_g(x) by kernel recombination on the g-space kernel, exposes the
estimated posterior pdf, SIR posterior sampling through the pi/prior mixture,
and sample-max MAP.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.rchq import recombination
from ..core.sampler import MixtureSampler
from ..utils.prng import KeyRing
from ..utils.weights import cleansing_weights, weighted_resampling


class BASQ:
    def __init__(self, prior, model, sober, ratio_wkde: float = 1.0,
                 seed: int = 0, verbose: bool = True):
        """(SOBER/BASQ/_basq.py:6-26)

        Args:
          prior: prior distribution
          model: ScaleMmltGP BQ model
          sober: fitted Sober instance (provides the learned pi proposal)
          ratio_wkde: proportion of mixture samples drawn from pi
        """
        self.prior = prior
        self.keys = KeyRing(seed)
        self.verbose = verbose
        self.update_model(model, sober, ratio_wkde=ratio_wkde)

    def update_model(self, model, sober, ratio_wkde: float = 1.0):
        """(SOBER/BASQ/_basq.py:28-40)"""
        self.kernel = model.gspace_kernel
        self.pred_mean = model.gspace_mean_predict
        self.beta = model.beta
        self.sampler = MixtureSampler(self.prior, sober,
                                      ratio_wkde=ratio_wkde)

    def quadrature(self, n_quad: int, n_nys_quad: int, n_res_quad: int):
        """Evidence estimate (SOBER/BASQ/_basq.py:42-81).

        Returns (ELML, AVLML): expected and variance of log marginal
        likelihood.
        """
        x_cand = self.prior.sample(self.keys.next(), n_quad)
        w_is = jnp.full((n_quad,), 1.0 / n_quad)
        x_nys = x_cand[:n_nys_quad]
        # Pin the integrand itself as a matched test function so the
        # evidence estimate stays exact even when the posterior-covariance
        # kernel is numerically degenerate (TPU-rebuild robustness upgrade
        # over SOBER/BASQ/_basq.py:59-67).
        mean_row = self.pred_mean(x_cand)[None, :]
        idx, w = recombination(x_cand, x_nys, n_res_quad, self.kernel,
                               init_weights=w_is,
                               extra_test_rows=mean_row)
        x = x_cand[idx]
        eml = w @ self.pred_mean(x)
        # evidence is kept in LOG space (ADVICE r1): the reference stores
        # EML = exp(beta) in its non-positive fallback
        # (SOBER/BASQ/_basq.py:71-74), which in fp32 overflows to inf for
        # beta > ~88 and zeroes every posterior call
        if float(eml) <= 0:
            elml = self.beta
            self.log_EML = jnp.asarray(self.beta, jnp.float32)
        else:
            self.log_EML = jnp.log(eml)
            elml = jnp.log(eml) + self.beta
        avlml = jnp.log(jnp.abs(w @ self.kernel(x, x) @ w))
        if self.verbose:
            print(f"Expected log marginal likelihood: {float(elml):.5e}")
            print(f"Variance log marginal likelihood: {float(avlml):.5e}")
        return float(elml), float(avlml)

    @property
    def EML(self):
        """g-space evidence (reference attribute, SOBER/BASQ/_basq.py:71)."""
        if not hasattr(self, "log_EML"):
            raise ValueError("Evidence has not yet computed.")
        return jnp.exp(self.log_EML)

    def log_posterior(self, x) -> jax.Array:
        """log of the estimated posterior pdf, up to fp-safe clamping."""
        if not hasattr(self, "log_EML"):
            raise ValueError("Evidence has not yet computed.")
        lik_pred = jnp.maximum(self.pred_mean(x), 0.0)
        return (jnp.log(lik_pred + 1e-38)
                + jnp.log(self.prior.pdf(x) + 1e-38) - self.log_EML)

    def posterior(self, x) -> jax.Array:
        """Estimated posterior pdf (SOBER/BASQ/_basq.py:83-102)."""
        if not hasattr(self, "log_EML"):
            raise ValueError("Evidence has not yet computed.")
        lik_pred = jnp.maximum(self.pred_mean(x), 0.0)
        return lik_pred * self.prior.pdf(x) * jnp.exp(-self.log_EML)

    def sampling_posterior(self, n_samples: int, ratio_super: int = 100
                           ) -> jax.Array:
        """SIR posterior sampling (SOBER/BASQ/_basq.py:104-123).

        Importance weights are formed in log space and max-shifted before
        exponentiation — the evidence constant cancels under resampling, so
        an extreme log_EML can't underflow the whole weight vector."""
        n_super = int(ratio_super * n_samples)
        samples = self.sampler.sample(self.keys.next(), n_super)
        log_w = self.log_posterior(samples) - jnp.log(
            jnp.maximum(self.sampler.pdf(samples), 1e-38))
        w = jnp.exp(log_w - jnp.max(log_w))
        w = cleansing_weights(w)
        idx = weighted_resampling(self.keys.next(), w, n_samples)
        return samples[idx]

    def MAP(self, n_samples: int) -> jax.Array:
        """Sample-max maximum a posteriori (SOBER/BASQ/_basq.py:125-138)."""
        samples = self.sampler.sample(self.keys.next(), n_samples)
        log_pdf = self.log_posterior(samples)
        return samples[jnp.argmax(log_pdf)]
