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


def test_tanimoto_bf16_pass_exact_vs_float64_oracle():
    """The default tanimoto_gram runs ONE bf16 MXU pass with fp32
    accumulation; for 0/1 fingerprints this is bit-exact (every product is
    0 or 1 in bf16, counts < 2^24). Checked against a float64 numpy oracle
    at realistic sparsity and the full 2048-bit width."""
    rng = np.random.default_rng(2)
    x = (rng.random((40, 2048)) < 0.025).astype(np.float64)
    y = (rng.random((100, 2048)) < 0.025).astype(np.float64)
    xy = x @ y.T
    denom = x.sum(1)[:, None] + y.sum(1)[None, :] - xy
    want = xy / np.maximum(denom, 1e-20)
    got = np.asarray(tanimoto_gram(
        {"outputscale": jnp.float32(1.0)},
        jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)))
    # intersection counts must be exactly integral -> fp32 division only
    assert np.abs(got - want).max() < 1e-6


def test_rbf_pallas_matches_xla():
    rng = np.random.default_rng(1)
    p = {"lengthscale": jnp.float32(0.7), "outputscale": jnp.float32(1.3)}
    x = jnp.asarray(rng.uniform(-1, 1, (50, 5)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, (90, 5)), jnp.float32)
    want = rbf_gram(p, x, y)
    got = rbf_gram_pallas(p, x, y, tile_m=64, tile_n=64)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-5)
