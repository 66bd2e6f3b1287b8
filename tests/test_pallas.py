"""Pallas kernel correctness (interpret mode on the CPU mesh)."""
import numpy as np
import jax
import jax.numpy as jnp

from sober_tpu.ops import (tanimoto_gram, rbf_gram, tanimoto_gram_pallas,
                           rbf_gram_pallas)


def test_tanimoto_pallas_matches_xla():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2, (70, 256)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (130, 256)), jnp.float32)
    want = tanimoto_gram({"outputscale": jnp.float32(1.0)}, x, y)
    got = tanimoto_gram_pallas(x, y, tile_m=64, tile_n=64)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_rbf_pallas_matches_xla():
    rng = np.random.default_rng(1)
    p = {"lengthscale": jnp.float32(0.7), "outputscale": jnp.float32(1.3)}
    x = jnp.asarray(rng.uniform(-1, 1, (50, 5)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, (90, 5)), jnp.float32)
    want = rbf_gram(p, x, y)
    got = rbf_gram_pallas(p, x, y, tile_m=64, tile_n=64)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-5)
