"""Per-iteration stagnation diagnostics for an acceptance task.

Runs one (task, seed) at the reference config and prints, per iteration:
the stagnation-reset flag (Sober.last_reset), pool weight health
(Sober.last_npos), fitted GP hypers, the incumbent eta, batch diversity
(unique rows / how many duplicate the incumbent), and the batch's best new
value. Written for VERDICT r4 item 2 (rosenbrock seed-1 plateau) but
task-generic.

Usage: python tools/diagnose_stagnation.py [task=rosenbrock] [seed=1]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

# persistent compile cache (same store bench.py / acceptance.py use)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sober_tpu import Sober
from sober_tpu.gp.exact import fit_gp_padded
from sober_tpu.utils.prng import KeyRing

CFGS = {
    "rosenbrock": dict(module="rosenbrock", batch_size=100, n_rec=20000),
    "ackley": dict(module="ackley", batch_size=200, n_rec=20000),
    "maxsat": dict(module="maxsat", batch_size=200, n_rec=20000),
}


def main(task="rosenbrock", seed=1, n_iterations=15):
    cfg = CFGS[task]
    mod = __import__(f"examples.{cfg['module']}", fromlist=["main"])
    # reconstruct the example's setup without its loop
    import importlib
    setup = getattr(importlib.import_module("sober_tpu.tasks"),
                    f"setup_{task}")
    prior, fn = setup()
    batch_size, n_rec, n_nys, n_init = (cfg["batch_size"], cfg["n_rec"],
                                        500, 100)
    bucket = ((n_init + batch_size * n_iterations + 127) // 128) * 128

    keys = KeyRing(seed)
    x_all = prior.sample(keys.next(), n_init)
    y_all = fn(x_all)
    model = fit_gp_padded(x_all, y_all, bucket=bucket)
    sober = Sober(prior, model, seed=seed)

    print(f"task={task} seed={seed} n_init={n_init} batch={batch_size} "
          f"n_rec={n_rec} bucket={bucket}", flush=True)
    for it in range(n_iterations):
        t0 = time.monotonic()
        model = fit_gp_padded(x_all, y_all, bucket=bucket)
        sober.update_model(model)
        x_batch = sober.next_batch(n_rec, n_nys, batch_size)
        dt = time.monotonic() - t0

        y_batch = fn(x_batch)
        xb = np.asarray(x_batch)
        yb = np.asarray(y_batch)
        y_np = np.asarray(y_all)
        incumbent = np.asarray(x_all)[int(np.argmax(y_np))]
        n_unique = len(np.unique(np.round(xb, 6), axis=0))
        n_dup_inc = int(np.sum(np.all(np.isclose(xb, incumbent[None, :],
                                                 atol=1e-6), axis=1)))
        ls = np.asarray(model.kernel.params["lengthscale"]).ravel()
        print(
            f"it={it:2d} best={float(max(y_np.max(), yb.max())):+.6f} "
            f"batch_max={float(yb.max()):+.6f} "
            f"reset={int(sober.last_reset)} "
            f"npos={int(sober.last_npos)} path={sober.last_path} "
            f"eta={float(sober.pi.eta):+.4f} "
            f"ls={np.array2string(ls, precision=3)} "
            f"noise={float(model.noise):.2e} "
            f"os={float(model.kernel.params['outputscale']):.3f} "
            f"uniq={n_unique} dup_inc={n_dup_inc} t={dt:.1f}s",
            flush=True)
        x_all = jnp.concatenate([x_all, x_batch])
        y_all = jnp.concatenate([y_all, y_batch])
        np.savez(f"/tmp/diag_{task}_{seed}_it{it}.npz",
                 x=np.asarray(x_all), y=np.asarray(y_all))
    print(f"final best={float(np.asarray(y_all).max()):+.6f} "
          f"resets={sober.reset_count}")


if __name__ == "__main__":
    task = sys.argv[1] if len(sys.argv) > 1 else "rosenbrock"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    main(task, seed)
