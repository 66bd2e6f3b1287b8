"""Acceptance harness for the reference's recorded behavior.

The only recorded regression baseline in the reference is the quick-start
trajectory: product-Branin on [-2,3]^2, 10 Sobol init points, batches of 30
at n_rec=20000 / n_nys=500, best value 10.6043 reached in 5 batches
(tutorials/00 Quick start.ipynb stored outputs; BASELINE.md). SURVEY.md §4
calls for statistical (multi-seed) equivalence rather than bitwise parity:
this test runs the exact config over 5 seeds (varying both the Sobol init
design and the sampler stream) and requires >= 4/5 seeds to reach >= 10.59
within 8 batches. Measured on TPU and the CPU mesh: 5/5 seeds converge
within 5 batches (median 3), matching or beating the reference's recorded
5-batch run.
"""
import jax.numpy as jnp
import pytest

from sober_tpu import Sober
from sober_tpu.gp.exact import fit_gp_padded
from sober_tpu.tasks.synthetic import setup_branin
from sober_tpu.utils.prng import KeyRing

TRUTH = 10.6043
TARGET = 10.59
N_SEEDS = 5
MIN_HITS = 4
MAX_BATCHES = 8


def _run_quickstart(seed: int) -> float:
    prior, objective = setup_branin(seed=seed)
    keys = KeyRing(seed)
    x = prior.sample(keys.next(), 10)
    y = objective(x)
    model = fit_gp_padded(x, y)
    sober = Sober(prior, model, seed=seed)
    best = float(y.max())
    for _ in range(MAX_BATCHES):
        model = fit_gp_padded(x, y)
        sober.update_model(model)
        xb = sober.next_batch(20000, 500, 30)
        yb = objective(xb)
        x = jnp.concatenate([x, xb])
        y = jnp.concatenate([y, yb])
        best = max(best, float(yb.max()))
        if best >= TARGET:
            break
    return best


@pytest.mark.slow
def test_quickstart_multiseed_acceptance():
    bests = [_run_quickstart(seed) for seed in range(N_SEEDS)]
    hits = sum(b >= TARGET for b in bests)
    assert hits >= MIN_HITS, (
        f"quick-start acceptance: only {hits}/{N_SEEDS} seeds reached "
        f">={TARGET} within {MAX_BATCHES} batches (bests: {bests}); the "
        f"reference's recorded run reaches {TRUTH} in 5 batches")


def _run_hartmann(seed: int, n_init: int = 50, batches: int = 8,
                  batch: int = 50, n_rec: int = 16384, n_nys: int = 256,
                  target: float = 3.2) -> float:
    from sober_tpu.tasks.synthetic import setup_hartmann

    prior, objective = setup_hartmann(seed=seed)
    keys = KeyRing(seed)
    x = prior.sample(keys.next(), n_init)
    y = objective(x)
    sober = Sober(prior, fit_gp_padded(x, y), seed=seed)
    best = float(y.max())
    for _ in range(batches):
        sober.update_model(fit_gp_padded(x, y))
        xb = sober.next_batch(n_rec, n_nys, batch, polish=True)
        yb = objective(xb)
        x = jnp.concatenate([x, xb])
        y = jnp.concatenate([y, yb])
        best = max(best, float(yb.max()))
        if best >= target:
            break
    return best


@pytest.mark.slow
def test_hartmann6_multiseed_acceptance():
    """Hartmann-6 (tutorial 03/04 task, optimum 3.32237): from 50 init
    points, batches of 50 at n_rec=16384 with the exploit polish on,
    >= 2/3 seeds must reach >= 3.2 within 8 batches (450 evaluations).

    Context for the bar: the reference's own stored Hartmann-6 runs
    plateau well below the optimum — tutorial 03 records 3.145/3.154/3.210
    at 150 evals across its three acquisition variants, tutorial 04 (FBGP)
    2.907 at 600 evals. Plain recombination batches here match that
    behavior (TPU seeds 3.157-3.188, CPU >= 3.2 at 450 evals): batch
    selection resolves the optimum only to candidate-pool resolution. The
    posterior-mean exploit polish (next_batch(polish=True)) closes the
    platform-dependent tail gap: measured on TPU 3/3 seeds at
    3.297/3.310/3.317 over the full 8 batches (>= 3.25 by batch 3); the
    CPU mesh clears the 3.2 bar within 3 batches on 3/3 seeds."""
    bests = [_run_hartmann(seed) for seed in range(3)]
    hits = sum(b >= 3.2 for b in bests)
    assert hits >= 2, (
        f"hartmann acceptance: only {hits}/3 seeds reached >=3.2 within 8 "
        f"batches (bests: {bests}); optimum 3.32237")


# ----------------------------------------------------------------------------
# Discrete trio (ising / maxsat / pest) — CPU-scale convergence bars
# ----------------------------------------------------------------------------

def _run_discrete(task: str, seed: int, n_iterations: int = 3):
    """Run an example's BO loop at a CPU-practical config (reference-config
    trajectories live in docs/ACCEPTANCE.md; this is the regression bar)."""
    import importlib

    mod = importlib.import_module(f"examples.{task}")
    _, y, hist = mod.main(seed=seed, verbose=False, n_init=50,
                          batch_size=50, n_rec=8192, n_nys=128,
                          n_iterations=n_iterations)
    init_best = float(y[:50].max())
    return init_best, [b for _, b in hist]


@pytest.mark.slow
@pytest.mark.parametrize("task,bar", [
    ("ising", -0.85),    # measured seeds 0/1: -0.629 / -0.792 after 3 iters
    ("maxsat", 20.0),    # measured: 24.92 / 20.58
    ("pest", -8.40),     # measured: -8.22 / -7.98
])
def test_discrete_trio_convergence(task, bar):
    """The discrete trio must IMPROVE on its initial design and clear a
    task-specific bar within 3 batches of 50 at n_rec=8192, on at least one
    of two seeds. Bars sit below both measured seeds' finals (2026-08-19,
    CPU mesh) with ~0.1-0.5 margin; the reference records no optima for
    these tasks (docs/ACCEPTANCE.md), so the signal is monotone improvement
    at reproducible margins, not a known optimum."""
    results = [_run_discrete(task, seed) for seed in (0, 1)]
    improved = [traj[-1] > init + 1e-6 for init, traj in results]
    cleared = [traj[-1] >= bar for _, traj in results]
    assert any(improved), f"{task}: no seed improved on init ({results})"
    assert any(cleared), f"{task}: no seed cleared {bar} ({results})"
