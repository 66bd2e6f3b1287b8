"""Tutorial 07 — Compare with Thompson sampling (mirrors tutorials/07).

Head-to-head on Branin: SOBER vs joint-draw TS vs pathwise (decoupled) TS
vs the SOBER-TS hybrid, same budget.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp

from sober_tpu import Sober
from sober_tpu.benchmarks import (thompson_sampling,
                                  decoupled_thompson_sampling, sober_ts)
from sober_tpu.gp.exact import fit_gp_padded
from sober_tpu.tasks import setup_branin
from sober_tpu.utils.prng import KeyRing


def run(method, n_iter=4, batch=25):
    keys = KeyRing(0)
    prior, f = setup_branin()
    x = prior.sample(keys.next(), 10)
    y = f(x)
    for it in range(n_iter):
        model = fit_gp_padded(x, y)
        if method == "sober":
            sober = Sober(prior, model, seed=it)
            xb = sober.next_batch(8192, 256, batch)
        elif method == "ts":
            xb = thompson_sampling(keys.next(), model, prior, 4096, batch)
        elif method == "dts":
            xb = decoupled_thompson_sampling(keys.next(), model, prior,
                                             8192, batch)
        else:
            xb = sober_ts(keys.next(), model, prior, batch,
                          n_cand_super=8192, n_cand=1024, n_nys=128)
        x = jnp.concatenate([x, xb]); y = jnp.concatenate([y, f(xb)])
    return float(y.max())


def main(n_iter=4, batch=25):
    results = {}
    for m in ["sober", "ts", "dts", "sober_ts"]:
        results[m] = run(m, n_iter=n_iter, batch=batch)
        print(f"{m:>9}: best = {results[m]:.4f}  (truth 10.6043)")
    return results


if __name__ == "__main__":
    main()
