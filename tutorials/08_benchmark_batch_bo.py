"""Tutorial 08 — Benchmarking against batch BO methods (mirrors
tutorials/08): SOBER vs the full baseline zoo on Branin."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp

from sober_tpu import Sober
from sober_tpu.benchmarks import (
    thompson_sampling, decoupled_thompson_sampling, dpp_ts, gibbon,
    hallucination, local_penalisation, TurboState, update_turbo_state,
    turbo, sober_ts)
from sober_tpu.gp.exact import fit_gp_padded
from sober_tpu.tasks import setup_branin
from sober_tpu.utils.prng import KeyRing

BATCH, POOL, ITERS = 20, 4096, 3


def loop(acquire):
    keys = KeyRing(0)
    prior, f = setup_branin()
    x = prior.sample(keys.next(), 10)
    y = f(x)
    state = {"turbo": TurboState(dim=2, batch_size=BATCH)}
    for it in range(ITERS):
        model = fit_gp_padded(x, y)
        xb = acquire(keys.next(), model, prior, state)
        x = jnp.concatenate([x, xb]); y = jnp.concatenate([y, f(xb)])
        if "turbo_state" in state:
            state["turbo"] = update_turbo_state(state["turbo"], f(xb))
    return float(y.max())


METHODS = {
    "SOBER": lambda k, m, p, s: Sober(p, m).next_batch(POOL, 200, BATCH),
    "TS": lambda k, m, p, s: thompson_sampling(k, m, p, POOL, BATCH),
    "decoupled TS": lambda k, m, p, s: decoupled_thompson_sampling(
        k, m, p, POOL, BATCH),
    "DPP-TS": lambda k, m, p, s: dpp_ts(k, m, p, 2048, BATCH, n_mcmc=20),
    "GIBBON": lambda k, m, p, s: gibbon(k, m, p, 2048, BATCH),
    "hallucination": lambda k, m, p, s: hallucination(
        k, m, lambda xx, yy: fit_gp_padded(xx, yy), p, BATCH),
    "local penal.": lambda k, m, p, s: local_penalisation(k, m, p, BATCH),
    "TurBO": lambda k, m, p, s: turbo(k, s["turbo"], m, p, BATCH),
    "SOBER-TS": lambda k, m, p, s: sober_ts(k, m, p, BATCH,
                                            n_cand_super=POOL,
                                            n_cand=1024, n_nys=128),
}

def main(batch=None, pool=None, iters=None, methods=None):
    global BATCH, POOL, ITERS
    if batch is not None: BATCH = batch
    if pool is not None: POOL = pool
    if iters is not None: ITERS = iters
    results = {}
    for name, acq in METHODS.items():
        if methods is not None and name not in methods:
            continue
        results[name] = loop(acq)
        print(f"{name:>14}: best = {results[name]:.4f}  (truth 10.6043)")
    return results


if __name__ == "__main__":
    main()
