"""Tutorial 01 — How SOBER works (mirrors tutorials/01 How does SOBER
work.ipynb): the algorithm's internals, stage by stage.

SOBER reframes batch BO as kernel quadrature:
  1. pi-measure: pi(x) = Phi((mu(x) - eta)/sigma(x)) is the probability the
     GP assigns to x improving on the incumbent eta.
  2. Importance sampling: draw n_rec candidates from the proposal (prior or
     learned WKDE) and weight them by pi/proposal.
  3. Proposal update: fit a weighted KDE (continuous dims) / weighted MLE
     (discrete dims) to the weights, and resample.
  4. Nystrom subset: KMeans centroids (continuous) summarize the pool.
  5. Kernel recombination: pick batch_size points whose weighted empirical
     measure matches the pool's mean embedding under the posterior
     covariance kernel — maximally informative AND diverse.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax.numpy as jnp
import numpy as np

from sober_tpu import Sober
from sober_tpu.core.pi import PI
from sober_tpu.core.rckernel import RecombinationKernel
from sober_tpu.core.rchq import recombination
from sober_tpu.gp.exact import fit_gp_padded
from sober_tpu.tasks import setup_branin
from sober_tpu.utils.prng import KeyRing
from sober_tpu.utils.weights import cleansing_weights

def main(n_init=50, n_rec=5000, n_nys=200, batch_size=20):
    keys = KeyRing(0)
    prior, f = setup_branin()
    x_obs = prior.sample(keys.next(), n_init)
    model = fit_gp_padded(x_obs, f(x_obs))

    # Stage 1-2: pi-importance weights over a candidate pool
    pi = PI(model)
    x_cand = prior.sample(keys.next(), n_rec)
    weights = cleansing_weights(pi(x_cand) / prior.pdf(x_cand))
    print(f"pi weights: {int((weights > 0).sum())} of {len(weights)} nonzero, "
          f"eta = {float(pi.eta):.3f}")

    # Stage 4-5: Nystrom subset + recombination
    kernel = RecombinationKernel(model, mode="predictive_covariance")
    x_nys = x_cand[np.argsort(-np.asarray(weights))[:n_nys]]
    idx, w = recombination(x_cand, x_nys, batch_size, kernel,
                           init_weights=weights)
    print(f"batch of {int((w > 0).sum())} points, sum of quadrature weights = "
          f"{float(w.sum()):.4f}")
    print("batch spread (std):", np.asarray(x_cand[idx]).std(0).round(2))

    # The full pipeline is Sober.next_batch:
    sober = Sober(prior, model)
    x_batch = sober.next_batch(n_rec, n_nys, batch_size)
    print("next_batch:", x_batch.shape)
    return x_batch


if __name__ == "__main__":
    main()
