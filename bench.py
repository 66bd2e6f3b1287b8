"""Benchmarks: full batch-BO iterations on one chip, at three scales.

Prints one JSON line per metric (headline first):

  1. full_bo_iteration_65k_batch200 — the BASELINE.md north-star config
     (n_cand=65536, batch=200, n_nys=512): GP MAP-fit + pi weighting +
     kernel recombination, all inside one jitted program.
  2. full_bo_iteration_200k_batch100 — the reference's largest continuous
     config (n_rec=200,000: /root/reference/examples/shekel.py:69,
     ising.py:69).
  3. full_bo_iteration_200k_ising_d24 — the reference's hardest published
     large-pool config: Ising sparsification, 24 binary dims, 200k-point
     discrete pool (/root/reference/examples/ising.py:69), one full
     iteration through Sober.next_batch (prior sampling + pi + learned
     proposal + KMeans Nystrom + recombination).
  4. dataset_iteration_133k_2048 — solvent-scale dataset-as-domain
     iteration (133,303 x 2048-bit fingerprints, tutorial 06): Tanimoto GP
     fit + pi over the whole pool + adaptive pruning + recombination via
     Sober.next_batch.
  5. fbgp_hyper_sweep_1000 — the fully-Bayesian hyper pipeline at the
     tutorial-04 config (1000 hypersamples -> RCHQ-distilled to 50 chains,
     n_nys=100): LML sweep as ONE vmapped batched Cholesky + quadrature
     distillation + chain-cache build. The reference runs the sweep as a
     1001-iteration Python loop per refit
     (/root/reference/SOBER/FBGP/_fully_Bayesian_gp.py:179-245).
  6. fbgp_full_iteration_1000hypers — the ENTIRE fully-Bayesian BO
     iteration (WSABI base refit + the hyper pipeline above + candidate
     pipeline + kernel recombination) as ONE dispatch via Sober.step_fbgp.

vs_baseline for every row compares against the reference's best recorded
full-iteration wall-clock, 4.898 s (tutorials/00 Quick start.ipynb stored
outputs, BASELINE.md) — measured there at batch=30, n_rec=20k on CPU. Every
config here is substantially heavier than that measurement, so the ratios
understate the true speedup (the reference records no wall-clock at these
scales; SURVEY.md §6).

The exact-GP iterations (1-3) measure the STEADY STATE of a BO loop: the
in-program MAP refit is warm-started from hypers fitted at the previous
iteration (on the data minus the newest batch). This matches the
reference, whose `optimize_model` refits the same GPyTorch model object
in place every iteration and therefore always starts from the current
hypers (/root/reference/SOBER/_sober_wrapper.py:640-652).
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_S = 4.898  # s, reference quick-start best iteration (BASELINE.md)

# Same-config torch-reference measurements recorded on THIS box by
# tools/measure_reference.py (docs/reference_measured.jsonl): the
# like-for-like denominators. The notebook 4.898 s above was recorded at a
# LIGHTER config (20k candidates, batch 30), so vs_baseline understates or
# overstates depending on the row; vs_measured_ref divides by the
# reference's own code at the exact config (where it can run — its GP
# layer needs gpytorch, absent here, so those stages are measured with
# reference-favorable plain-torch stand-ins; see the harness docstring).
_REF_MEASURED_MAP = {
    "full_bo_iteration_65k_batch200": "ref_iteration_65k_batch200",
    "full_bo_iteration_200k_batch100": "ref_iteration_200k_batch100",
    "full_bo_iteration_200k_ising_d24": "ref_iteration_200k_ising_d24",
    "dataset_iteration_133k_2048": "ref_dataset_iteration_133k_2048",
    "fbgp_hyper_sweep_1000": "ref_fbgp_hyper_sweep_1000",
    "fbgp_full_iteration_1000hypers": "ref_fbgp_full_iteration_1000hypers",
}


def _load_ref_measured():
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "docs", "reference_measured.jsonl")
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    row = json.loads(line)
                    out[row["metric"]] = float(row["value"])
                except (ValueError, KeyError):
                    continue
    return out


_REF_MEASURED = _load_ref_measured()


def _median_time(fn, n=9):
    fn()  # warmup / compile
    fn()  # second warmup: the axon tunnel reloads executables on the first
    #       dispatch after another large program ran (CLAUDE.md artifacts)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _emit(metric, value):
    row = {
        "metric": metric,
        "value": round(value, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / value, 2),
    }
    ref_key = _REF_MEASURED_MAP.get(metric)
    if ref_key in _REF_MEASURED:
        row["ref_measured_s"] = round(_REF_MEASURED[ref_key], 4)
        row["vs_measured_ref"] = round(_REF_MEASURED[ref_key] / value, 2)
    print(json.dumps(row), flush=True)


def bench_fused(n_cand, n_nys, batch, d, metric, n_obs=500):
    from sober_tpu.gp import posterior_max_mean
    from sober_tpu.gp.exact import GPConfig, build_state, fit_params
    from sober_tpu.core.fused import fused_acquisition

    rng = np.random.default_rng(0)
    x_obs = jnp.asarray(rng.uniform(-1, 1, (n_obs, d)), jnp.float32)
    y_obs = jnp.sin(3 * x_obs[:, 0]) * jnp.cos(2 * x_obs[:, 1]) \
        + 0.1 * jnp.asarray(rng.normal(size=n_obs), jnp.float32)
    x_cand = jnp.asarray(rng.uniform(-1, 1, (n_cand, d)), jnp.float32)
    x_nys = x_cand[:n_nys]
    prior_pdf = jnp.full((n_cand,), 1.0 / 2.0**d)
    cfg = GPConfig(fit_iters=100)

    # Steady-state BO iteration: the refit is warm-started from the hypers
    # fitted at the PREVIOUS iteration (the data minus the newest batch) —
    # exactly what the reference does, which refits the same GPyTorch model
    # object in place every iteration (SOBER/_sober_wrapper.py:640-652).
    x_prev, y_prev = x_obs[:n_obs - batch], y_obs[:n_obs - batch]
    params_prev = fit_params(
        x_prev, (y_prev - y_prev.mean()) / y_prev.std(ddof=1), cfg)

    @jax.jit
    def full_iteration(x_obs, y_obs, x_cand, x_nys, prior_pdf, params_prev):
        y_std = (y_obs - y_obs.mean()) / y_obs.std(ddof=1)
        # default optimiser ladder (L-BFGS with Adam fallback), the same
        # path fit_gp takes; plateau early-stop makes the warm-started
        # refit converge in a few live steps
        params = fit_params(x_obs, y_std, cfg, params0=params_prev)
        state = build_state(params, x_obs, y_obs, cfg)
        eta = posterior_max_mean(state)
        idx, w, _ = fused_acquisition(state, eta, x_cand, x_nys, prior_pdf,
                                      batch)
        return idx, w

    idx, w = jax.block_until_ready(
        full_iteration(x_obs, y_obs, x_cand, x_nys, prior_pdf, params_prev))
    assert bool(jnp.all(w >= 0)) and abs(float(w.sum()) - 1.0) < 1e-2

    value = _median_time(lambda: jax.block_until_ready(
        full_iteration(x_obs, y_obs, x_cand, x_nys, prior_pdf, params_prev)))
    _emit(metric, value)


def bench_dataset(n_total=133303, n_bits=2048, n_obs=512, n_rec=2000,
                  n_nys=500, batch=100):
    """Solvent-scale screening iteration (tutorial 06 config on the full
    133,303-molecule pool; fingerprints synthesized at the dataset's
    sparsity since the raw CSV isn't shipped here)."""
    from sober_tpu import Sober
    from sober_tpu.gp import fit_tanimoto_gp
    from sober_tpu.priors.dataset import DatasetPrior
    from sober_tpu.utils.prng import KeyRing

    rng = np.random.default_rng(0)
    # ~2.5% bit density, typical of 2048-bit Morgan fingerprints
    feats = (rng.random((n_total, n_bits)) < 0.025).astype(np.float32)
    targets = jnp.asarray(rng.normal(size=n_total), jnp.float32)
    prior = DatasetPrior(feats, targets)
    keys = KeyRing(0)
    x_obs, y_obs = prior.sample(keys.next(), n_obs)
    model = fit_tanimoto_gp(x_obs, y_obs)
    sober = Sober(prior, model,
                  kernel_type="weighted_predictive_covariance")
    sober.update_model(model)

    def iteration():
        idx, xb = sober.next_batch(n_rec, n_nys, batch)
        jax.block_until_ready(xb)

    value = _median_time(iteration)
    _emit(f"dataset_iteration_{n_total // 1000}k_{n_bits}", value)


def bench_ising(n_rec=200000, n_nys=500, batch=100, n_obs=500):
    """One full iteration of the reference's hardest published large-pool
    config (Ising, 24 binary edge masks, n_rec=200,000:
    /root/reference/examples/ising.py:69): one full iteration — bucket-
    padded GP refit + binary prior sampling + pi weighting + learned
    proposal + Nystrom selection + kernel recombination — as ONE XLA
    dispatch via Sober.step."""
    from sober_tpu import Sober
    from sober_tpu.gp.exact import fit_gp_padded
    from sober_tpu.tasks import setup_ising
    from sober_tpu.utils.prng import KeyRing

    keys = KeyRing(0)
    prior, fn = setup_ising()
    x_all = prior.sample(keys.next(), n_obs)
    # objective values live HOST-side, as in any real black-box loop (the
    # experiment/simulator returns host scalars): step's prior-reset
    # heuristic reads y on the host, and a device-resident y would charge
    # an artificial ~30 ms tunnel fetch per iteration to the bench
    y_all = np.asarray(fn(x_all))
    # steady state: the current model was fitted at the previous iteration
    # (data minus the newest batch); the measured step refits on the full
    # data warm-started from it, as the reference does in place every
    # iteration (SOBER/_sober_wrapper.py:640-652)
    model = fit_gp_padded(x_all[:n_obs - batch], y_all[:n_obs - batch])
    sober = Sober(prior, model, seed=0)

    def iteration():
        # re-pin the previous-iteration model so every timed step is a
        # genuine warm-started refit on grown data (step calls update_model
        # on its result, which would otherwise degenerate the steady state
        # into refitting already-converged hypers)
        sober.update_model(model)
        xb = sober.step(x_all, y_all, n_rec, n_nys, batch, warm_start=True)
        float(jnp.sum(xb))   # scalar fetch (see bench_fbgp's note)

    value = _median_time(iteration)
    _emit("full_bo_iteration_200k_ising_d24", value)


def bench_fbgp_step(n_obs=100, d=3, n_hypers=1000, n_nys_qd=100, n_qd=50,
                    n_rec=8192, n_nys=256, batch=50):
    """One FULL fully-Bayesian BO iteration as ONE dispatch
    (Sober.step_fbgp): WSABI base MAP refit + 1001-theta hyperposterior
    sweep + quadrature distillation + chain caches + candidate pipeline +
    kernel recombination, at the tutorial-04 config. The reference runs
    this as a per-hypersample Python loop inside a multi-stage host
    iteration (SOBER/FBGP/_fully_Bayesian_gp.py:179-245 +
    SOBER/_sober.py:125-195)."""
    from sober_tpu import Sober
    from sober_tpu.gp.fbgp import FitboGP, RBFHyperPrior, fbgp_refit
    from sober_tpu.priors import Uniform

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (n_obs, d)), jnp.float32)
    # y stays HOST-side (see bench_ising's note): step_fbgp's reset
    # heuristic reads it on the host every iteration
    y = np.exp(-0.5 * np.sum((np.asarray(x) / 0.6) ** 2, axis=1))
    hp = RBFHyperPrior()
    fbgp = fbgp_refit(FitboGP(x, jnp.asarray(y)), hp, n_hypers=n_hypers,
                      n_nys=n_nys_qd, n_qd=n_qd, key=jax.random.key(0))
    bounds = jnp.stack([-jnp.ones(d), jnp.ones(d)])
    sober = Sober(Uniform(bounds), fbgp, seed=0)

    def iteration():
        xb = sober.step_fbgp(x, y, hp, n_rec, n_nys, batch,
                             n_hypers=n_hypers, n_nys_qd=n_nys_qd,
                             n_qd=n_qd)
        float(jnp.sum(xb))   # scalar fetch (see pipeline above)

    value = _median_time(iteration)
    _emit("fbgp_full_iteration_1000hypers", value)


def bench_fbgp(n_obs=100, d=3, n_hypers=1000, n_nys=100, n_qd=50):
    """The fully-Bayesian hyper pipeline at the tutorial-04 config
    (BASELINE.md: 1000 hypersamples -> distilled to 10-50, n_nys=100):
    the 1001-theta LML sweep (ONE vmapped batched Cholesky vs the
    reference's Python loop, _fully_Bayesian_gp.py:179-203) + RCHQ
    quadrature distillation + the per-chain Cholesky cache build, all as
    ONE XLA program (gp.fbgp.fbgp_refit)."""
    from sober_tpu.gp.fbgp import FitboGP, RBFHyperPrior, fbgp_refit

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (n_obs, d)), jnp.float32)
    ll = -0.5 * jnp.sum((x / 0.6) ** 2, axis=1)
    model = FitboGP(x, jnp.exp(ll))
    hp = RBFHyperPrior()
    key = jax.random.key(0)

    def pipeline():
        fbgp = fbgp_refit(model, hp, n_hypers=n_hypers, n_nys=n_nys,
                          n_qd=n_qd, key=key)
        # scalar fetch: block_until_ready does NOT reliably block through
        # the remote-dispatch tunnel (CLAUDE.md) — an async no-op here once
        # measured 0.4 ms for a 60+ ms pipeline. The fetch includes one
        # host round-trip, as every per-call timing in this file does.
        float(jnp.sum(fbgp.w_qd))

    value = _median_time(pipeline)
    _emit("fbgp_hyper_sweep_1000", value)


def _probe_backend(probe_timeout_s=150, max_wait_s=2400):
    """Wait (bounded) for the device backend to become reachable.

    The axon TPU tunnel occasionally drops; a dead tunnel makes the first
    dispatch hang forever (not error), which would stall the whole bench
    run. Probe with a tiny computation in a subprocess so a hang converts
    into a timeout, and RETRY for up to max_wait_s — tunnel outages are
    usually transient, and a single failed probe must not forfeit the
    entire benchmark record (round-3 postmortem).
    """
    import subprocess
    import sys
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "print(float(jnp.ones(()) + 1.0), jax.devices())"],
                timeout=probe_timeout_s, check=True, capture_output=True)
            if attempt > 1:
                print(f"bench: backend reachable after {attempt} probes",
                      file=sys.stderr)
            return
        except subprocess.TimeoutExpired:
            msg = f"no response in {probe_timeout_s}s"
        except subprocess.CalledProcessError as e:
            msg = f"probe failed: {e.stderr.decode()[-500:]}"
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            print(f"bench: device backend unreachable after {attempt} "
                  f"probes over {max_wait_s}s — is the TPU tunnel up?",
                  file=sys.stderr)
            sys.exit(1)
        print(f"bench: probe {attempt} failed ({msg}); retrying "
              f"({remaining:.0f}s left)", file=sys.stderr)
        time.sleep(min(60, max(1, remaining)))


def _watchdog(limit_s=1500):
    """Force-exit if a single metric wedges (mid-run tunnel drop).

    Rows already printed were flushed, so a partial record survives; a
    silent hang until the driver's global timeout records nothing extra
    and wastes the slot. The timer is re-armed after every metric.
    """
    import os
    import sys
    import threading

    state = {"timer": None}

    def rearm():
        if state["timer"] is not None:
            state["timer"].cancel()

        def fire():
            print(f"bench: watchdog — metric exceeded {limit_s}s "
                  f"(tunnel drop mid-run?); exiting with partial rows",
                  file=sys.stderr)
            sys.stderr.flush()
            os._exit(3)

        t = threading.Timer(limit_s, fire)
        t.daemon = True
        t.start()
        state["timer"] = t

    return rearm


def main():
    # Persistent compilation cache: the six bench programs are large and
    # first-compiles through the tunnel take minutes each; caching them on
    # disk means a rerun (or the driver's end-of-round run) starts warm.
    # Misses degrade gracefully if the backend rejects serialization.
    import os
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _probe_backend()
    rearm = _watchdog()
    steps = [
        lambda: bench_fused(65536, 512, 200, 10,
                            "full_bo_iteration_65k_batch200"),
        lambda: bench_fused(200000, 500, 100, 4,
                            "full_bo_iteration_200k_batch100"),
        bench_ising,
        bench_dataset,
        bench_fbgp,
        bench_fbgp_step,
    ]
    for step in steps:
        rearm()
        step()


if __name__ == "__main__":
    main()
