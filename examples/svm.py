"""Batch BO on SVM feature selection (20 binary + 3 continuous).
Mirrors examples/svm.py."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from sober_tpu.tasks import setup_svm
from examples.common import run_bo_loop


def main(**overrides):
    cfg = dict(n_init=50, batch_size=50, n_rec=5000, n_nys=200, n_iterations=10)
    cfg.update(overrides)
    prior, fn = setup_svm()
    return run_bo_loop(prior, fn, **cfg)


if __name__ == "__main__":
    main()
