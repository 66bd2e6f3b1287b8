"""Multi-chip batch BO: the FULL SOBER pipeline on a device mesh.

`Sober(prior, model, mesh=...)` is the first-class multi-chip mode: the
learned-proposal pipeline — pi-importance sweep, WKDE/prior updates,
recursive refill, KMeans Nystrom selection, kernel recombination — runs
with the candidate pools row-sharded over the mesh's "cand" axis. Two
schedules:

  * "gspmd" (default): XLA auto-partitions the single-device programs
    (identical results to mesh=None — sharding is a placement decision,
    not an algorithm change).
  * "blockwise": the recombination switches to the explicit shard_map
    schedule (parallel/sharded.py) — per-device local reduction trees,
    only <= batch_size survivors communicated, communication independent
    of the pool size.

No reference analogue: the reference is single-device (SURVEY.md §5.8).
Design notes: docs/MULTICHIP.md.

On a real TPU slice, run as-is (the mesh picks up every local device). On
a CPU host, set
  XLA_FLAGS=--xla_force_host_platform_device_count=8
to emulate an 8-device mesh (and force jax_platforms=cpu if the axon
plugin is installed — see tests/conftest.py).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from sober_tpu.core.sober import Sober
from sober_tpu.gp.exact import fit_gp_padded
from sober_tpu.parallel import make_mesh
from sober_tpu.tasks.synthetic import setup_branin
from sober_tpu.utils.prng import KeyRing


def main(n_init=10, batch_size=30, n_rec=16384, n_nys=128, n_iterations=5,
         seed=0, n_devices=None, schedule="gspmd", verbose=True, **_):
    n_devices = n_devices or len(jax.devices())
    mesh = make_mesh(n_devices, axis_names=("cand",))
    # shard-friendly pool size: divisible by the mesh
    if n_rec < n_devices:
        raise ValueError(
            f"n_rec={n_rec} must be >= n_devices={n_devices} to give every "
            "shard at least one candidate")
    n_rec = (n_rec // n_devices) * n_devices

    prior, objective = setup_branin(seed=seed)
    keys = KeyRing(seed)
    x_all = prior.sample(keys.next(), n_init)
    y_all = objective(x_all)
    best = float(y_all.max())
    history = []

    state = fit_gp_padded(x_all, y_all)
    sober = Sober(prior, state, seed=seed, mesh=mesh, schedule=schedule)

    for it in range(n_iterations):
        start = time.monotonic()
        # full pipeline on the mesh: prior resets/updates, pi sweep,
        # recursive refill, KMeans Nystrom, sharded recombination
        x_batch = sober.next_batch(n_rec, n_nys, batch_size)
        interval = time.monotonic() - start

        y_batch = objective(x_batch)
        x_all = jnp.concatenate([x_all, x_batch])
        y_all = jnp.concatenate([y_all, y_batch])
        best = max(best, float(y_batch.max()))
        history.append((best, interval))
        if verbose:
            print(f"iter {it}: best {best:.4f}  acq {interval:.3f}s  "
                  f"({n_devices} devices, pool {n_rec}, {schedule})",
                  flush=True)
        state = fit_gp_padded(x_all, y_all)
        sober.update_model(state)
    return history


if __name__ == "__main__":
    main()
