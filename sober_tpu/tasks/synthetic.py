"""Synthetic benchmark objectives, in JAX.

Rebuild of experiments/_synthetic_function.py: the (negated, maximization-
convention) Ackley / "Branin"-product / Rosenbrock variants used by the
reference examples, plus standard Hartmann6 and Shekel (the reference pulls
these from botorch.test_functions with negate=True).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def ackley(x: jax.Array) -> jax.Array:
    """Negated Ackley (experiments/_synthetic_function.py:11-22).
    Maximum 0 at x = 0 (on the continuous block; binary dims enter the same
    formula as 0/1 values)."""
    x = jnp.atleast_2d(x)
    a, b, c = 20.0, 0.2, 2.0 * jnp.pi
    first = -a * jnp.exp(-b * jnp.sqrt(jnp.mean(x**2, axis=1)))
    second = jnp.exp(jnp.mean(jnp.cos(c * x), axis=1))
    return -1.0 * (first - second + a + jnp.e)


def branin_product(x: jax.Array) -> jax.Array:
    """The quick-start 'Branin' product function
    (experiments/_synthetic_function.py:24-26); on [-2, 3]^2 its maximum is
    10.6043 at x = (-1.0254, -1.0254) (tutorial 00 markdown)."""
    x = jnp.atleast_2d(x)
    num = (jnp.sin(x) + jnp.cos(3 * x) / 2.0) ** 2
    den = (x / 2.0) ** 2 + 0.3
    return jnp.prod(num / den, axis=1)


def rosenbrock(x: jax.Array) -> jax.Array:
    """Negated mean Rosenbrock (experiments/_synthetic_function.py:28-36).
    Maximum 0 at x = 1."""
    x = jnp.atleast_2d(x)
    terms = 100.0 * (x[:, 1:] - x[:, :-1] ** 2) ** 2 + (x[:, :-1] - 1.0) ** 2
    return -jnp.mean(terms, axis=1)


_HART6_ALPHA = np.array([1.0, 1.2, 3.0, 3.2])
_HART6_A = np.array([
    [10.0, 3.0, 17.0, 3.5, 1.7, 8.0],
    [0.05, 10.0, 17.0, 0.1, 8.0, 14.0],
    [3.0, 3.5, 1.7, 10.0, 17.0, 8.0],
    [17.0, 8.0, 0.05, 10.0, 0.1, 14.0],
])
_HART6_P = 1e-4 * np.array([
    [1312.0, 1696.0, 5569.0, 124.0, 8283.0, 5886.0],
    [2329.0, 4135.0, 8307.0, 3736.0, 1004.0, 9991.0],
    [2348.0, 1451.0, 3522.0, 2883.0, 3047.0, 6650.0],
    [4047.0, 8828.0, 8732.0, 5743.0, 1091.0, 381.0],
])


def hartmann6(x: jax.Array) -> jax.Array:
    """Negated Hartmann-6 on [0,1]^6; max 3.32237 (tutorial 03/04)."""
    x = jnp.atleast_2d(x)
    inner = jnp.sum(
        _HART6_A[None] * (x[:, None, :] - _HART6_P[None]) ** 2, axis=2)
    return jnp.sum(_HART6_ALPHA[None] * jnp.exp(-inner), axis=1)


_SHEKEL_BETA = 0.1 * np.array([1.0, 2.0, 2.0, 4.0, 4.0, 6.0, 3.0, 7.0, 5.0,
                                5.0])
_SHEKEL_C = np.array([
    [4.0, 1.0, 8.0, 6.0, 3.0, 2.0, 5.0, 8.0, 6.0, 7.0],
    [4.0, 1.0, 8.0, 6.0, 7.0, 9.0, 3.0, 1.0, 2.0, 3.6],
    [4.0, 1.0, 8.0, 6.0, 3.0, 2.0, 5.0, 8.0, 6.0, 7.0],
    [4.0, 1.0, 8.0, 6.0, 7.0, 9.0, 3.0, 1.0, 2.0, 3.6],
])


def shekel(x: jax.Array) -> jax.Array:
    """Negated Shekel m=10 on [0,10]^4; max 10.5364 at (4,4,4,4)."""
    x = jnp.atleast_2d(x)
    d2 = jnp.sum((x[:, :, None] - _SHEKEL_C[None]) ** 2, axis=1)  # (n, 10)
    return jnp.sum(1.0 / (d2 + _SHEKEL_BETA[None]), axis=1)


def setup_branin(seed: int = 0):
    """Quick-start setup (tutorial 00): Uniform prior on [-2,3]^2 with the
    product-Branin objective (reference tutorials 00/01/07/08 all use
    bounds = [[-2,-2],[3,3]]; the recorded baseline trajectory — 10.6043 in
    5 batches — is on this domain). `seed` scrambles the prior's Sobol
    stream so multi-seed acceptance runs vary the initial design."""
    from ..priors.continuous import Uniform

    bounds = jnp.array([[-2.0, -2.0], [3.0, 3.0]])
    return Uniform(bounds, seed=seed), branin_product


def setup_ackley():
    """experiments/_ackley.py:5-31: 3 continuous dims on [-1,1] + 20 binary."""
    from ..priors.discrete import MixedBinaryPrior

    bounds = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    prior = MixedBinaryPrior(3, 20, bounds, continous_first=True)
    return prior, ackley


def setup_hartmann(seed: int = 0):
    """experiments/_hartmann.py: 6 continuous dims on [0,1]."""
    from ..priors.continuous import Uniform

    bounds = jnp.vstack([jnp.zeros(6), jnp.ones(6)])
    return Uniform(bounds, seed=seed), hartmann6


def setup_shekel(seed: int = 0):
    """experiments/_shekel.py: 4 continuous dims on [0,10]."""
    from ..priors.continuous import Uniform

    bounds = jnp.vstack([jnp.zeros(4), 10.0 * jnp.ones(4)])
    return Uniform(bounds, seed=seed), shekel


def setup_rosenbrock():
    """experiments/_rosenbrock.py: 1 continuous dim on [-4,4] + 6 categorical
    dims with 4 categories each (values -2,-1,1,2)."""
    from ..priors.discrete import MixedCategoricalPrior

    bounds = jnp.array([[-4.0], [4.0]])
    cats = [[-2.0, -1.0, 1.0, 2.0]] * 6
    prior = MixedCategoricalPrior(1, 6, cats, bounds, continous_first=True)
    return prior, rosenbrock
