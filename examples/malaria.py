"""Dataset-domain drug discovery: anti-malarial screening.

Mirrors examples/malaria.py: DatasetPrior over 2048-bit fingerprints,
Tanimoto GP, weighted-predictive-covariance recombination kernel,
consumable-pool querying (examples/malaria.py:22-95).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from sober_tpu import Sober
from sober_tpu.gp import fit_tanimoto_gp
from sober_tpu.tasks import setup_malaria
from sober_tpu.utils.prng import KeyRing


def main(n_init=100, batch_size=100, n_rec=2000, n_nys=500,
         n_iterations=15, n_pool=None):
    keys = KeyRing(0)
    prior = setup_malaria(n_pool=n_pool)
    x_all, y_all = prior.sample(keys.next(), n_init)
    model = fit_tanimoto_gp(x_all, y_all)
    sober = Sober(prior, model,
                  kernel_type="weighted_predictive_covariance")

    for n_iter in range(n_iterations):
        start = time.monotonic()
        model = fit_tanimoto_gp(x_all, y_all)
        sober.update_model(model)
        idx_batch, x_batch = sober.next_batch(n_rec, n_nys, batch_size)
        interval = time.monotonic() - start
        y_batch = prior.query(idx_batch)
        x_all = jnp.concatenate([x_all, x_batch])
        y_all = jnp.concatenate([y_all, y_batch])
        print(f"{len(x_all)}) Best value: {float(y_all.max()):.5e}")
        print(f"Acquisition time [s]: {interval:.5e}")


if __name__ == "__main__":
    main()
