"""Fully Bayesian GP batch BO on Hartmann6 (tutorial 04 flow):
FITBO warp -> vmapped hyperposterior sweep -> quadrature distillation ->
FBGP-marginal SOBER acquisition with MES."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from sober_tpu import Sober
from sober_tpu.gp import FitboGP, RBFHyperPrior, fbgp_refit
from sober_tpu.tasks import setup_hartmann
from sober_tpu.utils.prng import KeyRing


def main(n_init=50, n_iterations=10, n_hypers=1000, n_nys_qd=100, n_qd=50,
         n_rec=8192, n_nys=256, batch_size=50):
    keys = KeyRing(0)
    prior, fn = setup_hartmann()
    x_all = prior.sample(keys.next(), n_init)
    y_all = fn(x_all)
    hp = RBFHyperPrior()
    gp = FitboGP(x_all, y_all)
    fbgp = fbgp_refit(gp, hp, n_hypers=n_hypers, n_nys=n_nys_qd,
                      n_qd=n_qd, key=keys.next())
    sober = Sober(prior, fbgp, seed=0)
    for it in range(n_iterations):
        # the ENTIRE fully-Bayesian iteration — WSABI base refit,
        # hyperposterior sweep, quadrature distillation, chain caches,
        # candidate pipeline, MES-augmented kernel recombination — as ONE
        # XLA dispatch; calc_obj="MES" computes the acquisition row on
        # the FRESH post-refit hyperposterior inside the program. The
        # staged flow (FitboGP + fbgp_refit + update_model + next_batch
        # with calc_obj=FBGPAcquisitionFunction(fbgp, "MES"), which also
        # fuses) remains available.
        xb = sober.step_fbgp(x_all, y_all, hp, n_rec, n_nys, batch_size,
                             n_hypers=n_hypers, n_nys_qd=n_nys_qd,
                             n_qd=n_qd, calc_obj="MES")
        x_all = jnp.concatenate([x_all, xb])
        y_all = jnp.concatenate([y_all, fn(xb)])
        print(f"{len(x_all)}) best: {float(y_all.max()):.5f} (truth 3.32237)")
    return x_all, y_all


if __name__ == "__main__":
    main()
