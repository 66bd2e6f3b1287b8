"""Tutorial 06 — Tips for drug discovery (mirrors tutorials/06).

Dataset-as-domain optimization over 2048-bit molecular fingerprints with a
Tanimoto-kernel GP: the candidate pool is the dataset itself, queried rows
are consumed, and the recombination kernel is the mean-weighted predictive
covariance (right for non-negative activity targets).
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax.numpy as jnp

from sober_tpu import Sober
from sober_tpu.gp import fit_tanimoto_gp
from sober_tpu.tasks import setup_malaria
from sober_tpu.utils.prng import KeyRing

def main(n_init=100, n_iterations=3, n_rec=2000, n_nys=500,
         batch_size=100):
    keys = KeyRing(0)
    prior = setup_malaria()                  # ~19k molecules
    print(f"dataset: {prior.n_total} molecules x {prior.features.shape[1]} bits")
    x_all, y_all = prior.sample(keys.next(), n_init)

    for it in range(n_iterations):
        model = fit_tanimoto_gp(x_all, y_all)
        sober = Sober(prior, model,
                      kernel_type="weighted_predictive_covariance")
        idx_batch, x_batch = sober.next_batch(n_rec, n_nys, batch_size)
        y_batch = prior.query(idx_batch)     # consume the queried rows
        x_all = jnp.concatenate([x_all, x_batch])
        y_all = jnp.concatenate([y_all, y_batch])
        print(f"{len(x_all)}) best activity: {float(y_all.max()):.4f} "
              f"(remaining pool: {prior.n_available})")
    return float(y_all.max())


if __name__ == "__main__":
    main()
