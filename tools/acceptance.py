"""Reference-config acceptance runs: best-value trajectories + wall-clock.

Runs each example task at the reference's published config
(/root/reference/examples/*.py: n_init=100, batch=100, 15 iterations,
n_rec per task) for several seeds on the real TPU, appending one JSON line
per (task, seed) to docs/acceptance_runs.jsonl — incremental so a tunnel
drop keeps completed rows. Render the table with tools/render_acceptance.py.

Usage: python tools/acceptance.py [task ...]   (default: all)
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

# Persistent compilation cache (same store bench.py uses): the per-task
# fused programs take minutes each to first-compile through the tunnel.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = os.path.join(os.path.dirname(__file__), "..", "docs",
                   "acceptance_runs.jsonl")
SEEDS = (0, 1, 2)


def record(task, seed, cfg, history, wall_s, telemetry=None):
    row = {
        "task": task, "seed": seed, "cfg": cfg,
        "best_per_iter": [round(b, 6) for _, b in history],
        "acq_s_per_iter": [round(t, 4) for t, _ in history],
        "wall_s": round(wall_s, 2),
    }
    if telemetry:
        # stagnation/health diagnostics (VERDICT r4 #9): resets fired,
        # positive-weight pool counts, fused-vs-staged path per iteration
        row["resets_per_iter"] = [int(t["reset"]) for t in telemetry]
        row["n_pos_per_iter"] = [t["n_pos"] for t in telemetry]
        row["path_per_iter"] = [t["path"] for t in telemetry]
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(f"[{task} seed={seed}] best={row['best_per_iter'][-1]} "
          f"wall={wall_s:.1f}s", flush=True)


def _full_bucket(overrides):
    """One observation bucket covering the WHOLE run: linear 128-buckets
    cross a boundary nearly every iteration at batch 200, recompiling the
    big fused programs each time (minutes each through the tunnel). A
    fixed max-size pad means ONE compile per task, reused across seeds."""
    n_init = overrides.get("n_init", 100)
    n_iterations = overrides.get("n_iterations", 15)
    n_max = n_init + overrides.get("batch_size", 100) * n_iterations
    return ((n_max + 127) // 128) * 128


def run_example(task, module, seeds=SEEDS, **overrides):
    mod = __import__(f"examples.{module}", fromlist=["main"])
    overrides.setdefault(
        "gp_kwargs", {"bucket": _full_bucket(overrides)})
    for seed in seeds:
        if already_done(task, seed):
            continue
        t0 = time.monotonic()
        telemetry = []
        _, _, history = mod.main(seed=seed, verbose=False,
                                 telemetry=telemetry, **overrides)
        record(task, seed, {k: v for k, v in overrides.items()
                            if k != "gp_kwargs"} or "reference", history,
               time.monotonic() - t0, telemetry)


def run_dataset(task, setup, n_rec, seeds=SEEDS, n_init=100, batch_size=100,
                n_nys=500, n_iterations=15):
    """Dataset-domain loop (examples/malaria.py main, + seed support)."""
    from sober_tpu import Sober
    from sober_tpu.gp import fit_tanimoto_gp
    from sober_tpu.utils.prng import KeyRing

    bucket = _full_bucket({"batch_size": batch_size,
                           "n_iterations": n_iterations, "n_init": n_init})
    for seed in seeds:
        if already_done(task, seed):
            continue
        t0 = time.monotonic()
        keys = KeyRing(seed)
        prior = setup()
        x_all, y_all = prior.sample(keys.next(), n_init)
        model = fit_tanimoto_gp(x_all, y_all, bucket=bucket)
        sober = Sober(prior, model, seed=seed,
                      kernel_type="weighted_predictive_covariance")
        history = []
        telemetry = []
        for _ in range(n_iterations):
            start = time.monotonic()
            model = fit_tanimoto_gp(x_all, y_all, bucket=bucket)
            sober.update_model(model)
            idx_batch, x_batch = sober.next_batch(n_rec, n_nys, batch_size)
            interval = time.monotonic() - start
            y_batch = prior.query(idx_batch)
            x_all = jnp.concatenate([x_all, x_batch])
            y_all = jnp.concatenate([y_all, y_batch])
            history.append((interval, float(y_all.max())))
            telemetry.append({
                "reset": bool(sober.last_reset),
                "path": sober.last_path,
                "n_pos": (int(sober.last_npos)
                          if sober.last_npos is not None else None),
            })
        record(task, seed, {"n_rec": n_rec}, history, time.monotonic() - t0,
               telemetry)


def already_done(task, seed):
    if not os.path.exists(OUT):
        return False
    with open(OUT) as f:
        for line in f:
            row = json.loads(line)
            if row["task"] == task and row["seed"] == seed:
                return True
    return False


def _run_malaria():
    from sober_tpu.tasks import setup_malaria
    run_dataset("malaria", setup_malaria, n_rec=20000, batch_size=100)


def _run_solvent():
    from sober_tpu.tasks import setup_solvent
    run_dataset("solvent", setup_solvent, n_rec=20000, batch_size=200)


TASKS = {
    # configs pinned to the REFERENCE's (/root/reference/examples/<task>.py
    # lines 68-72); the local example scripts default some batch sizes to
    # 100, so the reference values are passed explicitly
    "ising": lambda: run_example("ising", "ising",
                                 batch_size=200, n_rec=200000),
    "maxsat": lambda: run_example("maxsat", "maxsat",
                                  batch_size=200, n_rec=20000),
    "pest": lambda: run_example("pest", "pest",
                                batch_size=200, n_rec=100000),
    "rosenbrock": lambda: run_example("rosenbrock", "rosenbrock",
                                      batch_size=100, n_rec=20000),
    "shekel": lambda: run_example("shekel", "shekel",
                                  batch_size=100, n_rec=200000),
    "ackley": lambda: run_example("ackley", "ackley",
                                  batch_size=200, n_rec=20000),
    "svm": lambda: run_example("svm", "svm", n_init=100, batch_size=200,
                               n_rec=20000, n_iterations=15),
    "malaria": _run_malaria,
    "solvent": _run_solvent,
}


def main():
    names = sys.argv[1:] or list(TASKS)
    for name in names:
        print(f"=== {name}", flush=True)
        try:
            TASKS[name]()
        except Exception as e:
            print(f"[{name}] FAILED: {e!r}", flush=True)


if __name__ == "__main__":
    main()
