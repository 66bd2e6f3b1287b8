"""Render docs/ACCEPTANCE.md from docs/acceptance_runs.jsonl."""
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

HERE = os.path.dirname(os.path.abspath(__file__))
RUNS = os.path.join(HERE, "..", "docs", "acceptance_runs.jsonl")
OUT = os.path.join(HERE, "..", "docs", "ACCEPTANCE.md")

# (target best value, descriptor). Targets are the tutorial/example-recorded
# optima or established task optima the run must approach; "n/a" rows are
# reported without a bar (no recorded reference optimum).
TARGETS = {
    "ising": (None, "upper bound 0 (negated sparsification error)"),
    "maxsat": (None, "no recorded optimum (28-var weighted MaxSAT)"),
    "pest": (None, "no recorded optimum (negated pest-control cost)"),
    "rosenbrock": (0.0, "max = 0 at the categorical-mixed optimum"),
    "shekel": (10.5364, "Shekel m=10 global max 10.5364"),
    "ackley": (0.0, "max = 0 (negated Ackley)"),
    "svm": (None, "no recorded optimum (negated SVR test RMSE)"),
    "malaria": (None, "pool max = dataset best EC50 transform"),
    "solvent": (15.7709, "pool max 15.7709 D (tutorial 06 ground truth)"),
}

TASK_ORDER = ["rosenbrock", "ackley", "shekel", "maxsat", "ising", "pest",
              "svm", "malaria", "solvent"]


def main():
    rows = defaultdict(list)
    with open(RUNS) as f:
        for line in f:
            r = json.loads(line)
            rows[r["task"]].append(r)

    lines = [
        "# Acceptance matrix — reference-config convergence runs",
        "",
        "Every task below ran at the REFERENCE's published config",
        "(/root/reference/examples/<task>.py:68-72: n_init=100, 15",
        "iterations, the reference's batch_size and n_rec) on one TPU v5e",
        "chip, 3 seeds each, via `python tools/acceptance.py`. `best@k` is",
        "the best observed objective value after k batches (seed",
        "mean ± span). Per-iteration acquisition time (GP refit + batch",
        "selection, host-visible incl. tunnel round-trips) is split into",
        "`first iter` (dominated by one-time XLA compilation, paid once",
        "per task config and cached on disk afterwards) and `steady`",
        "(median over iterations 3-15 across seeds) — the steady number is",
        "the one comparable to the reference's 4.9-8.6 s/iter notebook",
        "wall-clock (BASELINE.md). `resets` counts stagnation-triggered",
        "prior resets across all seeds (SOBER/_sober.py:84-123 heuristic);",
        "`pool health` is the median count of positive-weight candidates",
        "per draw. Raw trajectories: docs/acceptance_runs.jsonl.",
        "",
        "| task | config | best@init | best@5 | best@15 | target "
        "| steady s/iter | first iter s | resets | pool health | wall "
        "s/seed |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    import numpy as np
    tasks = [t for t in TASK_ORDER if t in rows] + sorted(
        t for t in rows if t not in TASK_ORDER)
    for task in tasks:
        runs = rows[task]
        cfgs = {json.dumps(r["cfg"], sort_keys=True) for r in runs}
        cfg = json.loads(next(iter(cfgs)))
        cfg_s = ",".join(f"{k}={v}" for k, v in sorted(cfg.items())
                         ) if isinstance(cfg, dict) else str(cfg)
        best = np.array([r["best_per_iter"] for r in runs])  # (seeds, iters)
        steady = np.median(np.concatenate(
            [r["acq_s_per_iter"][2:] for r in runs]))
        first = max(r["acq_s_per_iter"][0] for r in runs)
        wall = np.mean([r["wall_s"] for r in runs])
        resets = sum(sum(r.get("resets_per_iter", [])) for r in runs)
        npos_all = [v for r in runs
                    for v in (r.get("n_pos_per_iter") or []) if v]
        npos = f"{int(np.median(npos_all))}" if npos_all else "—"
        tgt, _ = TARGETS.get(task, (None, ""))
        n_it = best.shape[1]

        def cell(k):
            col = best[:, min(k, n_it) - 1]
            return f"{col.mean():.4f} ± {(col.max()-col.min())/2:.4f}"

        tgt_s = f"{tgt:.4f}" if tgt is not None else "—"
        lines.append(
            f"| {task} | {cfg_s} | {cell(1)} | {cell(5)} | {cell(n_it)} "
            f"| {tgt_s} | {steady:.3f} | {first:.1f} | {resets} | {npos} "
            f"| {wall:.0f} |")

    lines += [
        "",
        "Notes:",
        "- `best@init` is after the FIRST batch (n_init + batch points).",
        "- Targets marked — have no recorded optimum in the reference; the",
        "  trajectory itself (monotone improvement, seed agreement) is the",
        "  acceptance signal, matching how the reference's examples are",
        "  used (run-and-eyeball, no asserted thresholds).",
        "- All rows were recorded AFTER the r5 fit-freeze fix",
        "  (gp/exact.py:_rescued_cholesky): rosenbrock seed 1, which",
        "  previously stagnated at -3.27 for 12 iterations, now reaches",
        "  ~-6e-5 like the other seeds.",
        "- CPU-mesh threshold tests for the discrete trio live in",
        "  tests/test_acceptance.py.",
        "",
    ]
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {OUT} ({len(rows)} tasks)")


if __name__ == "__main__":
    main()
