"""Batch BO on Shekel m=10 (truth 10.5364). Mirrors examples/shekel.py
(n_rec=2e5, examples/shekel.py:69)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from sober_tpu.tasks import setup_shekel
from examples.common import run_bo_loop


def main(**overrides):
    cfg = dict(n_init=100, batch_size=100, n_rec=200000, n_nys=500, n_iterations=15)
    cfg.update(overrides)
    prior, fn = setup_shekel()
    return run_bo_loop(prior, fn, **cfg)


if __name__ == "__main__":
    main()
