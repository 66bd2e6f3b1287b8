"""Direct tests for the multi-output GP (gp/multitask.py) — the inverse-
model surrogate replacing the reference's KroneckerMultiTaskGP
(SOBER/_inverse_modelling.py:159-172). Previously only exercised
indirectly through the InverseModel flow test."""
import jax
import jax.numpy as jnp
import numpy as np

from sober_tpu.gp.exact import GPConfig, fit_gp, predict
from sober_tpu.gp.multitask import (
    fit_multitask_gp,
    predict_multitask,
    sample_multitask,
)


def _data(n=64, d=2, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
    f1 = jnp.sin(3 * x[:, 0])
    f2 = jnp.cos(2 * x[:, 1]) + 0.5 * x[:, 0]
    noise = jnp.asarray(rng.normal(size=(n, 2)) * 0.05, jnp.float32)
    y = jnp.stack([f1, f2], axis=1) + noise
    return x, y


def test_fit_and_predict_shapes_and_fidelity():
    x, y = _data()
    mt = fit_multitask_gp(x, y)
    assert mt.n_tasks == 2
    mu, var = predict_multitask(mt, x)
    assert mu.shape == (64, 2) and var.shape == (64, 2)
    assert bool(jnp.all(var > 0))
    # in-sample fit quality: each output within noise-scale
    resid = np.abs(np.asarray(mu - y))
    assert resid.mean() < 0.15, resid.mean()


def test_matches_independent_single_output_fits():
    """The vmapped batched fit must reproduce per-task fit_gp fits (same
    config, adam path) to numerical tolerance."""
    x, y = _data(seed=1)
    cfg = GPConfig(ard=False, noise_lo=1e-6, noise_hi=1.0,
                   standardize_y=True, use_priors=False, fit_iters=100)
    mt = fit_multitask_gp(x, y, cfg)
    mu_mt, var_mt = predict_multitask(mt, x[:16])
    for t in range(2):
        st = fit_gp(x, y[:, t], cfg, optimiser="adam")
        mu1, var1 = predict(st, x[:16])
        mu1 = mu1 * st.y_std + st.y_mean
        var1 = var1 * st.y_std**2
        assert np.allclose(np.asarray(mu_mt[:, t]), np.asarray(mu1),
                           atol=5e-3), t
        assert np.allclose(np.asarray(var_mt[:, t]), np.asarray(var1),
                           rtol=0.05, atol=1e-5), t


def test_sample_multitask_statistics():
    x, y = _data(seed=2)
    mt = fit_multitask_gp(x, y)
    xq = x[:8]
    s = sample_multitask(mt, jax.random.key(0), xq, 4000)
    assert s.shape == (4000, 8, 2)
    mu, var = predict_multitask(mt, xq)
    assert np.abs(np.asarray(s.mean(0) - mu)).max() < 0.05
    assert np.allclose(np.asarray(s.var(0)), np.asarray(var),
                       rtol=0.2, atol=1e-3)
