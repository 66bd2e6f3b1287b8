"""Expectation propagation over data features.

Rebuild of SOBER/_expectation_propagation.py: feature-by-feature EP site
updates in natural parameters (Q, r), dampened, with the working prior
refreshed to a TruncatedGaussian around the current posterior after every
site visit. Each site visit runs a full SOBER + BASQ round against the
distance of ONE extracted feature.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..priors.continuous import TruncatedGaussian
from .wrapper import SoberWrapper


class ExpectationPropagation(SoberWrapper):
    def __init__(self, model, data, feature_extractor: Callable,
                 model_initial_samples: int = 0, mean=None, covariance=None,
                 bounds=None, use_bolfi: bool = False, transforms=None,
                 seed: Optional[int] = None, disable_numpy_mode: bool = False,
                 parallelization: bool = True, visualizations: bool = False,
                 true_optimum=None, **kwargs):
        """(SOBER/_expectation_propagation.py:10-134)

        feature_extractor maps one observation to a list/array of features;
        each feature becomes one EP site.
        """
        super().__init__(
            model=model, data=data,
            model_initial_samples=model_initial_samples,
            mean=mean, covariance=covariance, bounds=bounds,
            prior="TruncatedGaussian", maximize=False, use_bolfi=use_bolfi,
            weights=None, custom_objective_and_loglikelihood=None,
            transforms=transforms, seed=seed,
            disable_numpy_mode=disable_numpy_mode,
            parallelization=parallelization, visualizations=visualizations,
            true_optimum=true_optimum, standalone=False, **kwargs)

        self.normalized_mean = self.prior.mu
        self.normalized_covariance = self.prior.cov

        self.feature_extractor = feature_extractor
        self.experimental_features = self.feature_extractor(self.data)
        self.feature_dim = len(self.experimental_features)
        self.current_feature = 0

        # exponential-family natural parameters: mu = Q^-1 r, Sigma = Q^-1
        # (SOBER/_expectation_propagation.py:125-134)
        self.Q = jnp.linalg.inv(self.normalized_covariance)
        self.r = self.Q @ self.normalized_mean
        self.Q_features = [jnp.zeros_like(self.Q)
                           for _ in range(self.feature_dim)]
        self.r_features = [jnp.zeros_like(self.r)
                           for _ in range(self.feature_dim)]

    def distance_function(self, observations):
        """Distance of the CURRENT feature only
        (SOBER/_expectation_propagation.py:136-146)."""
        dists = []
        for single_obs in observations:
            feats = self.feature_extractor(single_obs)
            diff = jnp.asarray(feats[self.current_feature]) - jnp.asarray(
                self.experimental_features[self.current_feature])
            dists.append(jnp.linalg.norm(jnp.atleast_1d(diff)))
        return jnp.stack(dists)

    def run_Expectation_Propagation(self, ep_iterations: int = 3,
                                    final_dampening: float = 0.5, **kwargs):
        """(SOBER/_expectation_propagation.py:148-204)"""
        ep_dampener = 1.0 - self.feature_dim * (
            1.0 - final_dampening ** (
                1.0 / (self.feature_dim * ep_iterations)))

        for _ in range(ep_iterations):
            for i in range(self.feature_dim):
                self.current_feature = i
                self.initialize_sober()
                self.run_SOBER(**kwargs)
                taken_samples, *_ = self.run_BASQ(
                    return_raw_samples=True, **kwargs)
                interim_mean = jnp.mean(taken_samples, axis=0)
                interim_cov = jnp.atleast_2d(jnp.cov(taken_samples.T))
                q_interim = jnp.linalg.inv(interim_cov)
                r_interim = q_interim @ interim_mean
                self.Q_features[i] = self.Q_features[i] + (
                    1 - ep_dampener) * (q_interim - self.Q)
                self.r_features[i] = self.r_features[i] + (
                    1 - ep_dampener) * (r_interim - self.r)
                self.Q = (1 - ep_dampener) * q_interim + ep_dampener * self.Q
                self.r = (1 - ep_dampener) * r_interim + ep_dampener * self.r
                post_cov = jnp.linalg.inv(self.Q)
                post_mean = post_cov @ self.r
                sd = jnp.sqrt(jnp.diag(post_cov))
                post_bounds = jnp.stack(
                    [post_mean - 1.95 * sd, post_mean + 1.95 * sd])
                self.prior = TruncatedGaussian(post_mean, post_cov,
                                               post_bounds)
