"""Tutorial 02 — Customise the prior for various domain types (the
reference's notebook 02 is missing from its repo; this reconstructs it from
the prior zoo).

SOBER supports continuous / binary / categorical / mixed / dataset domains.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax.numpy as jnp

from sober_tpu.priors import (
    Uniform, Gaussian, TruncatedGaussian, BinaryPrior, CategoricalPrior,
    MixedBinaryPrior, MixedCategoricalPrior, DatasetPrior,
)
from sober_tpu.utils.prng import KeyRing

def main():
    keys = KeyRing(0)

    # Continuous box with Sobol QMC sampling
    uniform = Uniform(jnp.array([[-1.0, 0.0], [1.0, 2.0]]))
    print("uniform:", uniform.sample(keys.next(), 4))

    # Correlated Gaussian
    gauss = Gaussian(jnp.zeros(2), jnp.array([[1.0, 0.5], [0.5, 1.0]]))
    print("gaussian pdf at 0:", float(gauss.pdf(jnp.zeros((1, 2)))[0]))

    # Truncated Gaussian (Genz-normalized, Gibbs-sampled in the tails)
    tg = TruncatedGaussian(jnp.zeros(2), jnp.eye(2),
                           jnp.array([[-1.0, -1.0], [1.0, 1.0]]))
    print("truncated constant:", float(tg.constant))

    # 20 binary dims; categorical with ragged category values
    binary = BinaryPrior(20)
    cats = CategoricalPrior([[0.0, 1.0, 2.0], [10.0, 20.0]])
    print("binary:", binary.sample(keys.next(), 2)[0][:5])
    print("categorical:", cats.sample(keys.next(), 3))

    # Mixed domains: [continuous | discrete] blocks
    mixed = MixedBinaryPrior(2, 3, jnp.array([[-1.0, -1.0], [1.0, 1.0]]))
    print("mixed:", mixed.sample(keys.next(), 2))

    # Dataset-as-domain: a consumable pool of candidates (drug discovery)
    ds = DatasetPrior(jnp.arange(20.0).reshape(10, 2), jnp.arange(10.0))
    y = ds.query(jnp.array([3, 5]))
    print("dataset queried:", y, "| remaining:", ds.n_available)


if __name__ == "__main__":
    main()
