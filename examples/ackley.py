"""Batch BO on mixed Ackley (3 continuous + 20 binary dims).

Mirrors examples/ackley.py of the reference (config: examples/ackley.py:68-72).
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from sober_tpu.tasks import setup_ackley
from examples.common import run_bo_loop


def main(**overrides):
    cfg = dict(n_init=100, batch_size=200, n_rec=20000, n_nys=500, n_iterations=15)
    cfg.update(overrides)
    prior, fn = setup_ackley()
    return run_bo_loop(prior, fn, **cfg)


if __name__ == "__main__":
    main()
