"""Batch BO on pest control (15 categorical x 5). Mirrors examples/pest.py
(n_rec=1e5, examples/pest.py:69)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from sober_tpu.tasks import setup_pest
from examples.common import run_bo_loop


def main(**overrides):
    cfg = dict(n_init=100, batch_size=100, n_rec=100000, n_nys=500, n_iterations=15)
    cfg.update(overrides)
    prior, fn = setup_pest()
    return run_bo_loop(prior, fn, **cfg)


if __name__ == "__main__":
    main()
