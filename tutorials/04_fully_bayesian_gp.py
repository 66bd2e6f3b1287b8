"""Tutorial 04 — Fast fully Bayesian GP modelling (mirrors tutorials/04).

Instead of a point estimate of the GP hyperparameters, FBGP marginalizes
over a hyperposterior WITHOUT MCMC: 1000 hypersamples are scored with the
FITBO marginal likelihood in ONE vmapped batched Cholesky, then compressed
to ~50 weighted support hypersamples by quadrature distillation (RCHQ over
hyperparameter space). Ground truth for Hartmann6: 3.32237.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax.numpy as jnp

from sober_tpu import Sober
from sober_tpu.gp import (FitboGP, RBFHyperPrior, sampling_hypers,
                          quadrature_distillation, FullyBayesianGP,
                          FBGPAcquisitionFunction)
from sober_tpu.tasks import setup_hartmann
from sober_tpu.utils.prng import KeyRing

def main(n_init=50, n_iterations=5, n_hypers=1000, n_nys_qd=100,
         n_qd=50, n_rec=8192, n_nys=256, batch_size=50):
    keys = KeyRing(0)
    prior, f = setup_hartmann()
    x_all = prior.sample(keys.next(), n_init)
    y_all = f(x_all)

    for it in range(n_iterations):
        gp = FitboGP(x_all, y_all)                       # WSABI-M warp
        hypers, lmls = sampling_hypers(gp, RBFHyperPrior(), n_hypers=n_hypers,
                                       key=keys.next())   # vmapped LML sweep
        w_qd, theta_qd = quadrature_distillation(hypers, lmls, n_nys=n_nys_qd,
                                                 n_qd=n_qd, key=keys.next())
        fbgp = FullyBayesianGP(gp, w_qd, theta_qd)
        sober = Sober(prior, fbgp, seed=it)
        af = FBGPAcquisitionFunction(fbgp, "MES")         # or EI/UCB/BQBC/QBMGP
        xb = sober.next_batch(n_rec, n_nys, batch_size, calc_obj=af)
        x_all = jnp.concatenate([x_all, xb])
        y_all = jnp.concatenate([y_all, f(xb)])
        print(f"{len(x_all)}) best: {float(y_all.max()):.5f} (truth 3.32237)")
    return float(y_all.max())


if __name__ == "__main__":
    main()
