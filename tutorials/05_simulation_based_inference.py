"""Tutorial 05 — Fast Bayesian inference for SBI (mirrors tutorials/05).

Posterior + evidence for a battery equivalent-circuit model: SOBER explores
the discrepancy surface, then BASQ turns the collected log-likelihoods into
a quadrature evidence estimate, posterior samples (SIR), and a MAP.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax.numpy as jnp

from sober_tpu import Sober
from sober_tpu.apps.basq import BASQ
from sober_tpu.gp.exact import fit_gp_padded
from sober_tpu.gp.warped import ScaleMmltGP
from sober_tpu.tasks import setup_ecm_two
from sober_tpu.utils.prng import KeyRing

def main(n_init=100, n_iterations=5, n_rec=4096, n_nys=256,
         batch_size=50, n_quad=8192, n_quad_nys=256, n_nodes=64,
         n_post=500):
    keys = KeyRing(0)
    prior, simulator = setup_ecm_two()        # returns (discrepancy, loglik)
    x_all = prior.sample(keys.next(), n_init)
    d_all, ll_all = simulator(x_all)

    model = fit_gp_padded(x_all, d_all)
    sober = Sober(prior, model)
    for it in range(n_iterations):
        model = fit_gp_padded(x_all, d_all)
        sober.update_model(model)
        xb = sober.next_batch(n_rec, n_nys, batch_size)
        db, llb = simulator(xb)
        x_all = jnp.concatenate([x_all, xb])
        d_all = jnp.concatenate([d_all, db])
        ll_all = jnp.concatenate([ll_all, llb])

    bq_model = ScaleMmltGP(x_all, ll_all)     # doubly-warped GP on log-lik
    basq = BASQ(prior, bq_model, sober)
    log_evidence, log_var = basq.quadrature(n_quad, n_quad_nys, n_nodes)
    posterior_samples = basq.sampling_posterior(n_post)
    map_est = basq.MAP(2000)
    print("posterior mean:", np.asarray(posterior_samples).mean(0).round(2))
    print("MAP:", np.asarray(map_est).round(2))
    print("truth: [ 2.  -0.5 -1.   0.   0.5]")
    return map_est


if __name__ == "__main__":
    main()
