import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sober_tpu.utils import (
    cleansing_weights,
    check_weights,
    weighted_resampling,
    deweighted_resampling,
    jitter_cholesky,
    make_psd,
    mvn_logpdf,
    safe_mvn_prob,
    sobol_engine,
    sobol_sample,
    KeyRing,
)


class TestCleansingWeights:
    def test_normalizes(self):
        w = cleansing_weights(jnp.array([1.0, 3.0, 0.0, 4.0]))
        assert np.isclose(float(w.sum()), 1.0)
        assert float(w[2]) == 0.0

    def test_negative_and_nan_inf(self):
        w = cleansing_weights(jnp.array([-1.0, jnp.nan, jnp.inf, -jnp.inf, 2.0]))
        w = np.asarray(w)
        assert (w >= 0).all()
        assert np.isclose(w.sum(), 1.0)
        assert w[0] == 0.0 and w[3] == 0.0   # negative / -inf -> 0
        assert w[1] > 0 and w[2] > 0          # nan / +inf -> eps (tiny positive)

    def test_all_zero_becomes_uniform(self):
        w = cleansing_weights(jnp.zeros(4))
        assert np.allclose(np.asarray(w), 0.25)

    def test_jittable(self):
        f = jax.jit(cleansing_weights)
        w = f(jnp.array([1.0, 2.0, 3.0]))
        assert np.isclose(float(w.sum()), 1.0)


class TestCheckWeights:
    def test_degenerate(self):
        assert not bool(check_weights(jnp.zeros(10)))
        assert not bool(check_weights(jnp.ones(10) * 0.1))  # 1 unique < 5
        assert bool(check_weights(jnp.arange(10.0) + 1))


class TestResampling:
    def test_weighted_resampling_distribution(self):
        key = jax.random.key(0)
        w = jnp.array([0.0, 0.0, 0.5, 0.5] + [0.0] * 12)
        idx = weighted_resampling(key, w, 2)
        assert set(np.asarray(idx).tolist()) == {2, 3}

    def test_fill_when_few_positive(self):
        key = jax.random.key(1)
        w = jnp.array([1.0] + [0.0] * 9)
        idx = np.asarray(weighted_resampling(key, w, 4))
        assert 0 in idx
        assert len(set(idx.tolist())) == 4  # no replacement

    def test_deweighted_prefers_small(self):
        key = jax.random.key(2)
        w = jnp.array([100.0, 1.0, 1.0, 1.0])
        counts = np.zeros(4)
        for i in range(50):
            idx = deweighted_resampling(jax.random.fold_in(key, i), w, 1)
            counts[int(idx[0])] += 1
        assert counts[0] < 10  # big-weight entry rarely chosen


class TestLinalg:
    def test_jitter_cholesky_psd(self):
        a = jnp.array([[2.0, 1.0], [1.0, 2.0]])
        L, j = jitter_cholesky(a)
        assert np.allclose(np.asarray(L @ L.T), np.asarray(a), atol=1e-4)
        # only the relative fp32 floor jitter is applied to healthy matrices
        assert float(j) <= 1e-5

    def test_jitter_cholesky_repairs_indefinite(self):
        a = jnp.array([[1.0, 2.0], [2.0, 1.0]])  # eigenvalues 3, -1
        L, j = jitter_cholesky(a)
        assert np.all(np.isfinite(np.asarray(L)))
        assert float(j) > 0

    def test_make_psd_idempotent_on_psd(self):
        a = jnp.array([[2.0, 0.5], [0.5, 1.0]])
        assert np.allclose(np.asarray(make_psd(a)), np.asarray(a), atol=1e-6)

    def test_mvn_logpdf_matches_scipy(self):
        from scipy.stats import multivariate_normal

        rng = np.random.default_rng(0)
        d = 3
        A = rng.normal(size=(d, d))
        cov = A @ A.T + np.eye(d)
        mean = rng.normal(size=d)
        x = rng.normal(size=(7, d))
        L = np.linalg.cholesky(cov)
        got = np.asarray(mvn_logpdf(jnp.asarray(x, jnp.float32),
                                    jnp.asarray(mean, jnp.float32),
                                    jnp.asarray(L, jnp.float32)))
        want = multivariate_normal(mean, cov).logpdf(x)
        assert np.allclose(got, want, atol=1e-3)

    def test_safe_mvn_prob(self):
        cov = jnp.eye(2)
        x = jnp.zeros((1, 2))
        p = safe_mvn_prob(jnp.zeros(2), cov, x)
        assert np.isclose(float(p[0]), 1 / (2 * np.pi), atol=1e-5)


class TestSobol:
    def test_matches_scipy(self):
        from scipy.stats import qmc

        eng = qmc.Sobol(4, scramble=True, seed=42)
        want = eng.random(16)
        state = sobol_engine(4, seed=42)
        got = np.asarray(sobol_sample(state, 0, 16))
        assert np.allclose(got, want, atol=1e-7)

    def test_offset_continuation(self):
        state = sobol_engine(3, seed=7)
        a = np.asarray(sobol_sample(state, 0, 32))
        b = np.asarray(sobol_sample(state, 16, 16))
        assert np.allclose(a[16:], b)

    def test_uniformity(self):
        state = sobol_engine(2, seed=1)
        x = np.asarray(sobol_sample(state, 0, 1024))
        assert np.all(x >= 0) and np.all(x < 1)
        assert np.abs(x.mean() - 0.5) < 0.01

    def test_jittable(self):
        state = sobol_engine(2, seed=3)
        f = jax.jit(lambda s: sobol_sample(s, 0, 8))
        x = np.asarray(f(state))
        assert x.shape == (8, 2)


def test_keyring():
    kr = KeyRing(0)
    k1, k2 = kr.next(), kr.next()
    assert not np.array_equal(jax.random.key_data(k1), jax.random.key_data(k2))
