"""Fully Bayesian GP batch BO on Hartmann6 (tutorial 04 flow):
FITBO warp -> vmapped hyperposterior sweep -> quadrature distillation ->
FBGP-marginal SOBER acquisition with MES."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from sober_tpu import Sober
from sober_tpu.gp import (FitboGP, RBFHyperPrior, fbgp_refit,
                          FBGPAcquisitionFunction)
from sober_tpu.tasks import setup_hartmann
from sober_tpu.utils.prng import KeyRing


def main(n_init=50, n_iterations=10, n_hypers=1000, n_nys_qd=100, n_qd=50,
         n_rec=8192, n_nys=256, batch_size=50):
    keys = KeyRing(0)
    prior, fn = setup_hartmann()
    x_all = prior.sample(keys.next(), n_init)
    y_all = fn(x_all)
    for it in range(n_iterations):
        gp = FitboGP(x_all, y_all)
        # the whole hyper pipeline (LML sweep -> distillation -> chain
        # caches) as one XLA program; the staged sampling_hypers /
        # quadrature_distillation / FullyBayesianGP calls remain available
        fbgp = fbgp_refit(gp, RBFHyperPrior(), n_hypers=n_hypers,
                          n_nys=n_nys_qd, n_qd=n_qd, key=keys.next())
        sober = Sober(prior, fbgp, seed=it)
        af = FBGPAcquisitionFunction(fbgp, "MES")
        xb = sober.next_batch(n_rec, n_nys, batch_size, calc_obj=af)
        x_all = jnp.concatenate([x_all, xb])
        y_all = jnp.concatenate([y_all, fn(xb)])
        print(f"{len(x_all)}) best: {float(y_all.max()):.5f} (truth 3.32237)")
    return x_all, y_all


if __name__ == "__main__":
    main()
