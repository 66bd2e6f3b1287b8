"""GP posterior parity against a handwritten NumPy oracle.

SURVEY.md §4: with the BoTorch/GPyTorch reference unavailable in this image,
the numerical anchor is the closed-form GP equations evaluated in float64
NumPy — predictions and predictive covariances must match within fp32
tolerance for FIXED hyperparameters.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from sober_tpu.gp.exact import (
    GPConfig,
    GPParams,
    build_state,
    predict,
    predictive_covariance,
    _inv_softplus,
    _inv_interval,
)


def _oracle(x, y, xq, ls, os_, noise):
    """float64 closed-form GP posterior."""
    def k(a, b):
        d2 = ((a[:, None, :] - b[None, :, :]) / ls) ** 2
        return os_ * np.exp(-0.5 * d2.sum(-1))

    kxx = k(x, x) + noise * np.eye(len(x))
    kinv = np.linalg.inv(kxx)
    kqx = k(xq, x)
    mean = kqx @ kinv @ y
    cov = k(xq, xq) - kqx @ kinv @ kqx.T
    return mean, cov


@pytest.fixture(scope="module")
def fixed_state():
    rng = np.random.default_rng(0)
    x = rng.uniform(-2, 2, (25, 2))
    y = np.sin(x[:, 0]) * np.cos(x[:, 1])
    ls, os_, noise = 0.8, 1.5, 1e-4
    cfg = GPConfig(noise_lo=1e-5, noise_hi=1e-3, standardize_y=False)
    params = GPParams(
        raw_lengthscale=jnp.asarray(_inv_softplus(ls), jnp.float32),
        raw_outputscale=jnp.asarray(_inv_softplus(os_), jnp.float32),
        raw_noise=jnp.asarray(_inv_interval(noise, 1e-5, 1e-3), jnp.float32),
    )
    state = build_state(params, jnp.asarray(x, jnp.float32),
                        jnp.asarray(y, jnp.float32), cfg)
    return state, x, y, ls, os_, noise


def test_posterior_mean_var_match_oracle(fixed_state):
    state, x, y, ls, os_, noise = fixed_state
    rng = np.random.default_rng(1)
    xq = rng.uniform(-2, 2, (15, 2))
    mean_o, cov_o = _oracle(x, y, xq, ls, os_, noise)
    mean, var = predict(state, jnp.asarray(xq, jnp.float32),
                        include_noise=False)
    assert np.allclose(np.asarray(mean), mean_o, atol=2e-4)
    # fp32 + the relative jitter floor (utils/linalg.py) shift variance ~5e-4
    assert np.allclose(np.asarray(var), np.diag(cov_o), atol=1e-3)


def test_predictive_covariance_matches_oracle(fixed_state):
    state, x, y, ls, os_, noise = fixed_state
    rng = np.random.default_rng(2)
    xa = rng.uniform(-2, 2, (8, 2))
    xb = rng.uniform(-2, 2, (6, 2))

    def k(a, b):
        d2 = ((a[:, None, :] - b[None, :, :]) / ls) ** 2
        return os_ * np.exp(-0.5 * d2.sum(-1))

    kxx = k(x, x) + noise * np.eye(len(x))
    kinv = np.linalg.inv(kxx)
    cov_o = k(xa, xb) - k(xa, x) @ kinv @ k(x, xb)
    cov = predictive_covariance(state, jnp.asarray(xa, jnp.float32),
                                jnp.asarray(xb, jnp.float32))
    assert np.allclose(np.asarray(cov), cov_o, atol=2e-4)
