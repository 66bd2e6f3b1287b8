"""Simulation-based inference on the 2-RC battery ECM (tutorial 05 flow):
SOBER acquisition on the discrepancy, then BASQ evidence + posterior."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax.numpy as jnp
from sober_tpu import Sober
from sober_tpu.apps.basq import BASQ
from sober_tpu.gp import fit_gp
from sober_tpu.gp.warped import ScaleMmltGP
from sober_tpu.tasks import setup_ecm_two
from sober_tpu.utils.prng import KeyRing


def main(n_init=100, n_iterations=10, n_rec=4096, n_nys=256, batch_size=50,
         n_quad=8192, n_quad_nys=256, n_nodes=64):
    keys = KeyRing(0)
    prior, sim = setup_ecm_two()
    x_all = prior.sample(keys.next(), n_init)
    d_all, ll_all = sim(x_all)
    model = fit_gp(x_all, d_all)
    sober = Sober(prior, model)
    for it in range(n_iterations):
        model = fit_gp(x_all, d_all)
        sober.update_model(model)
        xb = sober.next_batch(n_rec, n_nys, batch_size)
        db, llb = sim(xb)
        x_all = jnp.concatenate([x_all, xb])
        d_all = jnp.concatenate([d_all, db])
        ll_all = jnp.concatenate([ll_all, llb])
        print(f"{len(x_all)}) best discrepancy: {float(d_all.max()):.4f}")
    bq_model = ScaleMmltGP(x_all, ll_all)
    basq = BASQ(prior, bq_model, sober)
    elml, avlml = basq.quadrature(n_quad, n_quad_nys, n_nodes)
    posterior_samples = basq.sampling_posterior(500)
    map_est = basq.MAP(2000)
    print("MAP estimate:", map_est)
    print("true params:  [ 2.  -0.5 -1.   0.   0.5]")
    return map_est


if __name__ == "__main__":
    main()
