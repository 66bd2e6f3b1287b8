"""Multi-chip batch BO: the acquisition sharded over a device mesh.

Runs the quick-start Branin loop with the candidate pool sharded across
all available devices and the acquisition executed by
`sober_tpu.parallel.sharded_acquisition` — ONE shard_map program whose
communication (two scalar collectives + a survivor all-gather) is
independent of the pool size. No reference analogue: the reference is
single-device (SURVEY.md §5.8). Design notes: docs/MULTICHIP.md.

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

from sober_tpu.gp.exact import fit_gp_padded
from sober_tpu.gp import posterior_max_mean
from sober_tpu.parallel import (
    make_mesh,
    shard_candidates,
    sharded_acquisition,
)
from sober_tpu.tasks.synthetic import setup_branin
from sober_tpu.utils.prng import KeyRing


def main(n_init=10, batch_size=30, n_rec=16384, n_nys=256, n_iterations=5,
         seed=0, n_devices=None, verbose=True, **_):
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

    for it in range(n_iterations):
        start = time.monotonic()
        state = fit_gp_padded(x_all, y_all)
        eta = posterior_max_mean(state)

        x_cand = prior.sample(keys.next(), n_rec)
        prior_pdf = prior.pdf(x_cand)
        x_sh = shard_candidates(mesh, x_cand)
        idx, w, _ = sharded_acquisition(
            mesh, state, eta, x_sh, x_cand[:n_nys], prior_pdf, batch_size)
        x_batch = x_cand[idx]
        interval = time.monotonic() - start

        y_batch = objective(x_batch)
        x_all = jnp.concatenate([x_all, x_batch])
        y_all = jnp.concatenate([y_all, y_batch])
        best = max(best, float(y_batch.max()))
        history.append((best, interval))
        if verbose:
            print(f"iter {it}: best {best:.4f}  acq {interval:.3f}s  "
                  f"({n_devices} devices, pool {n_rec})", flush=True)
    return history


if __name__ == "__main__":
    main()
