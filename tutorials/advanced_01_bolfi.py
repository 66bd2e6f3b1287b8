"""Advanced 01 — BOLFI modelling (mirrors tutorials/Advanced 01 BOLFI
modelling.ipynb).

BOLFI structures the surrogate for likelihood-free inference: a learned
per-dimension parabolic mean (seeded from a parabolic fit of the initial
data) + Gamma-hyperprior RBF kernel, with the BOLFI UCB schedule as the
recombination acquisition. Available directly or via
SoberWrapper(use_bolfi=True).
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax.numpy as jnp

from sober_tpu.apps import SoberWrapper, make_bolfi_model, SOBERUCB

def model_fn(theta, **kwargs):
    theta = np.atleast_2d(np.asarray(theta))
    return (theta**2).sum(axis=1)          # pretend simulator

bounds = jnp.array([[-2.0, -2.0], [2.0, 2.0]])
wrapper = SoberWrapper(model=model_fn, data=np.zeros(1),
                       model_initial_samples=30, bounds=bounds,
                       use_bolfi=True, parallelization=False, seed=0)
wrapper.run_SOBER(sober_iterations=3, model_samples_per_iteration=16,
                  surrogate_samples=2048, surrogate_effective_samples=64,
                  verbose=True)
samples, MAP, best, elml, avlml = wrapper.run_BASQ(32, verbose=False)
print("MAP (should be near the origin):", np.asarray(MAP).round(3))
