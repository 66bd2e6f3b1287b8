"""Tutorial 03 — Customise acquisition functions (mirrors tutorials/03
Customise acquisition function.ipynb).

SOBER's batch selection is quadrature-constrained, so any pointwise
acquisition can be layered on top via `calc_obj`: the recombination picks a
batch that satisfies the quadrature constraints while maximizing the
acquisition (null-space push, core/rchq.py).
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax.numpy as jnp

from sober_tpu import Sober
from sober_tpu.benchmarks import expected_improvement
from sober_tpu.gp.exact import fit_gp_padded
from sober_tpu.gp import predict
from sober_tpu.tasks import setup_branin
from sober_tpu.utils.prng import KeyRing

def main(n_init=50, n_rec=5000, n_nys=200, batch_size=16):
    keys = KeyRing(0)
    prior, f = setup_branin()
    x = prior.sample(keys.next(), n_init)
    y = f(x)
    model = fit_gp_padded(x, y)
    sober = Sober(prior, model)

    # Any callable X -> scores works as calc_obj:
    def ucb(x_cand):
        mu, var = predict(model, x_cand)
        return mu + 2.0 * jnp.sqrt(var)

    # compute the incumbent OUTSIDE the callable: calc_obj runs inside the
    # jitted recombination program, where float() on a traced value fails
    eta = float(model.y.max())

    def ei(x_cand):
        return expected_improvement(model, eta, x_cand)

    for name, acq in [("none", None), ("UCB", ucb), ("EI", ei)]:
        xb = sober.next_batch(n_rec, n_nys, batch_size, calc_obj=acq)
        yb = f(xb)
        print(f"calc_obj={name:<5} batch max objective: {float(yb.max()):.4f}")


if __name__ == "__main__":
    main()
