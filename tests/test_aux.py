"""Tests for auxiliary subsystems: checkpoint/resume, tracing, config."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sober_tpu.utils.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    save_loop_state,
    load_loop_state,
)
from sober_tpu.utils.timing import Tracer
from sober_tpu.config import settings, set_settings


class TestCheckpoint:
    def test_pytree_roundtrip(self, tmp_path):
        from sober_tpu.gp.exact import GPConfig, init_params

        params = init_params(GPConfig(), 3)
        path = str(tmp_path / "ck")
        save_checkpoint(path, params, metadata={"iter": 7})
        loaded, meta = load_checkpoint(path, params)
        assert meta == {"iter": 7}
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
            assert np.allclose(np.asarray(a), np.asarray(b))

    def test_loop_state_roundtrip(self, tmp_path):
        key = jax.random.key(42)
        x = jnp.arange(12.0).reshape(6, 2)
        y = jnp.arange(6.0)
        path = str(tmp_path / "loop")
        save_loop_state(path, x, y, key, extra={"task": "branin"})
        state, meta = load_loop_state(path)
        assert np.allclose(np.asarray(state["x_all"]), np.asarray(x))
        assert np.allclose(np.asarray(state["y_all"]), np.asarray(y))
        assert meta["task"] == "branin"
        # resumed key produces identical randomness
        a = jax.random.uniform(state["key"], (3,))
        b = jax.random.uniform(key, (3,))
        assert np.allclose(np.asarray(a), np.asarray(b))


class TestTracer:
    def test_spans_accumulate(self):
        tr = Tracer()
        with tr.span("gp_fit"):
            pass
        with tr.span("recombination"):
            pass
        with tr.span("recombination"):
            pass
        s = tr.summary()
        assert s["gp_fit"]["count"] == 1
        assert s["recombination"]["count"] == 2
        assert "recombination" in tr.report()


class TestConfig:
    def test_set_settings_roundtrip(self):
        old = settings()
        try:
            s = set_settings(chunk_limit=12345)
            assert settings().chunk_limit == 12345
        finally:
            set_settings(chunk_limit=old.chunk_limit)
