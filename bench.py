"""Headline benchmark: one full batch-BO iteration on one chip.

Measures GP MAP-fit + pi-importance weighting + kernel recombination at the
BASELINE.md north-star configuration (n_cand=65536, batch=200, n_nys=512)
and prints ONE JSON line.

vs_baseline compares against the reference's best recorded full-iteration
wall-clock, 4.898 s (tutorials/00 Quick start.ipynb stored outputs,
BASELINE.md) — measured there at batch=30, n_rec=20k on CPU; this
configuration is ~3.3x more candidates and ~6.7x larger batch, so the ratio
understates the true speedup.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from sober_tpu.gp import fit_gp, posterior_max_mean
    from sober_tpu.gp.exact import GPConfig
    from sober_tpu.core.fused import fused_acquisition

    rng = np.random.default_rng(0)
    n_obs, d = 500, 10
    n_cand, n_nys, batch = 65536, 512, 200

    x_obs = jnp.asarray(rng.uniform(-1, 1, (n_obs, d)), jnp.float32)
    y_obs = jnp.sin(3 * x_obs[:, 0]) * jnp.cos(2 * x_obs[:, 1]) \
        + 0.1 * jnp.asarray(rng.normal(size=n_obs), jnp.float32)
    x_cand = jnp.asarray(rng.uniform(-1, 1, (n_cand, d)), jnp.float32)
    x_nys = x_cand[:n_nys]
    prior_pdf = jnp.full((n_cand,), 1.0 / 2.0**d)
    cfg = GPConfig(fit_iters=100)

    from sober_tpu.gp.exact import build_state, fit_params

    @jax.jit
    def full_iteration(x_obs, y_obs, x_cand, x_nys, prior_pdf):
        y_std = (y_obs - y_obs.mean()) / y_obs.std(ddof=1)
        params = fit_params(x_obs, y_std, cfg, optimiser="adam")
        state = build_state(params, x_obs, y_obs, cfg)
        eta = posterior_max_mean(state)
        idx, w, _ = fused_acquisition(state, eta, x_cand, x_nys, prior_pdf,
                                      batch)
        return idx, w

    # warmup / compile
    idx, w = jax.block_until_ready(
        full_iteration(x_obs, y_obs, x_cand, x_nys, prior_pdf))
    assert bool(jnp.all(w >= 0)) and abs(float(w.sum()) - 1.0) < 1e-2

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(
            full_iteration(x_obs, y_obs, x_cand, x_nys, prior_pdf))
        times.append(time.perf_counter() - t0)
    value = float(np.median(times))

    baseline = 4.898  # s, reference quick-start best iteration (BASELINE.md)
    print(json.dumps({
        "metric": "full_bo_iteration_65k_batch200",
        "value": round(value, 4),
        "unit": "s",
        "vs_baseline": round(baseline / value, 2),
    }))


if __name__ == "__main__":
    main()
