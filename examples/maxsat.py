"""Batch BO on 28-bit weighted MaxSAT. Mirrors examples/maxsat.py."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from sober_tpu.tasks import setup_maxsat
from examples.common import run_bo_loop


def main(**overrides):
    cfg = dict(n_init=100, batch_size=100, n_rec=20000, n_nys=500, n_iterations=15)
    cfg.update(overrides)
    prior, fn = setup_maxsat()
    return run_bo_loop(prior, fn, **cfg)


if __name__ == "__main__":
    main()
