"""Shared batch-BO driver loop for the example scripts.

Mirrors the uniform driver of the reference examples (examples/ackley.py:
61-102): initial sample -> [fit GP -> next_batch -> query -> append] x N,
printing best value and wall-clock per batch.
"""
from __future__ import annotations

import time

import jax.numpy as jnp

from sober_tpu import Sober
from sober_tpu.gp.exact import fit_gp_padded
from sober_tpu.utils.prng import KeyRing


def run_bo_loop(prior, fn, n_init=100, batch_size=200, n_rec=20000,
                n_nys=500, n_iterations=15, seed=0, gp_kwargs=None,
                verbose=True, polish=False, telemetry=None):
    """telemetry: optional list; one dict per iteration is appended with
    the stagnation-reset flag, the pipeline path taken (fused/staged) and
    the pool weight-health count (acceptance diagnostics,
    tools/acceptance.py)."""
    keys = KeyRing(seed)
    gp_kwargs = gp_kwargs or {}
    x_all = prior.sample(keys.next(), n_init)
    y_all = fn(x_all)
    # bucket-padded fit: the compiled GP/acquisition programs are reused
    # until the observation count crosses a bucket boundary
    model = fit_gp_padded(x_all, y_all, **gp_kwargs)
    sober = Sober(prior, model, seed=seed)

    history = []
    for n_iter in range(n_iterations):
        start = time.monotonic()
        model = fit_gp_padded(x_all, y_all, **gp_kwargs)
        sober.update_model(model)
        x_batch = sober.next_batch(n_rec, n_nys, batch_size, polish=polish)
        interval = time.monotonic() - start

        y_batch = fn(x_batch)
        x_all = jnp.concatenate([x_all, x_batch])
        y_all = jnp.concatenate([y_all, y_batch])
        best = float(y_all.max())
        history.append((interval, best))
        if telemetry is not None:
            telemetry.append({
                "reset": bool(sober.last_reset),
                "path": sober.last_path,
                "n_pos": (int(sober.last_npos)
                          if sober.last_npos is not None else None),
            })
        if verbose:
            print(f"{len(x_all)}) Best value: {best:.5e}")
            print(f"Acquisition time [s]: {interval:.5e}, per sample [ms]: "
                  f"{interval / batch_size * 1e3:.5e}")
    return x_all, y_all, history
