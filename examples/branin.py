"""Quick-start: product-Branin on [-2,3]^2 (tutorial 00).
Ground truth maximum: 10.6043 at (-1.0254, -1.0254)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from sober_tpu.tasks import setup_branin
from examples.common import run_bo_loop


def main(**overrides):
    cfg = dict(n_init=10, batch_size=30, n_rec=20000, n_nys=500, n_iterations=5)
    cfg.update(overrides)
    prior, fn = setup_branin()
    return run_bo_loop(prior, fn, **cfg)


if __name__ == "__main__":
    main()
