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

def main(n_init=30, n_iterations=3, batch_size=16, n_rec=2048,
         n_nys=64, n_nodes=32):
    bounds = jnp.array([[-2.0, -2.0], [2.0, 2.0]])
    wrapper = SoberWrapper(model=model_fn, data=np.zeros(1),
                           model_initial_samples=n_init, bounds=bounds,
                           use_bolfi=True, parallelization=False, seed=0)
    wrapper.run_SOBER(sober_iterations=n_iterations,
                      model_samples_per_iteration=batch_size,
                      surrogate_samples=n_rec,
                      surrogate_effective_samples=n_nys,
                      verbose=True)
    samples, MAP, best, elml, avlml = wrapper.run_BASQ(n_nodes, verbose=False)
    print("MAP (should be near the origin):", np.asarray(MAP).round(3))
    return MAP


if __name__ == "__main__":
    main()
