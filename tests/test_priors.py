import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sober_tpu.priors import (
    Uniform,
    Gaussian,
    TruncatedGaussian,
    BinaryPrior,
    CategoricalPrior,
    MixedBinaryPrior,
    MixedCategoricalPrior,
    DatasetPrior,
    WeightedKernelDensityEstimation,
)

KEY = jax.random.key(0)


class TestUniform:
    def setup_method(self, _):
        self.prior = Uniform(jnp.array([[-2.0, 0.0], [2.0, 1.0]]))

    def test_sample_in_bounds(self):
        x = np.asarray(self.prior.sample(KEY, 256))
        assert x.shape == (256, 2)
        assert (x[:, 0] >= -2).all() and (x[:, 0] <= 2).all()
        assert (x[:, 1] >= 0).all() and (x[:, 1] <= 1).all()

    def test_qmc_low_discrepancy(self):
        x = np.asarray(self.prior.sample(KEY, 1024))
        assert abs(x[:, 0].mean()) < 0.05
        assert abs(x[:, 1].mean() - 0.5) < 0.02

    def test_pdf(self):
        p = self.prior.pdf(jnp.array([[0.0, 0.5], [3.0, 0.5]]))
        assert np.isclose(float(p[0]), 1.0 / 4.0)
        assert float(p[1]) == 0.0

    def test_sequence_advances(self):
        a = np.asarray(self.prior.sample(KEY, 16))
        b = np.asarray(self.prior.sample(KEY, 16))
        assert not np.allclose(a, b)


class TestGaussian:
    def test_moments_and_pdf(self):
        mu = jnp.array([1.0, -1.0])
        cov = jnp.array([[2.0, 0.5], [0.5, 1.0]])
        prior = Gaussian(mu, cov)
        x = np.asarray(prior.sample(KEY, 20000))
        assert np.allclose(x.mean(0), [1, -1], atol=0.05)
        assert np.allclose(np.cov(x.T), np.asarray(cov), atol=0.1)
        from scipy.stats import multivariate_normal

        pts = np.asarray(prior.sample(jax.random.key(1), 5))
        want = multivariate_normal(np.asarray(mu), np.asarray(cov)).pdf(pts)
        got = np.asarray(prior.pdf(jnp.asarray(pts)))
        assert np.allclose(got, want, rtol=1e-3)


class TestTruncatedGaussian:
    def test_samples_inside(self):
        mu = jnp.zeros(2)
        cov = jnp.eye(2) * 4.0
        bounds = jnp.array([[-1.0, -1.0], [1.0, 1.0]])
        prior = TruncatedGaussian(mu, cov, bounds)
        x = np.asarray(prior.sample(KEY, 2000))
        assert (np.abs(x) <= 1.0 + 1e-6).all()

    def test_pdf_normalization(self):
        mu = jnp.zeros(1)
        cov = jnp.eye(1)
        bounds = jnp.array([[-1.0], [1.0]])
        prior = TruncatedGaussian(mu, cov, bounds)
        # integrate pdf over [-1, 1] by trapezoid
        xs = jnp.linspace(-0.999, 0.999, 2001).reshape(-1, 1)
        p = np.asarray(prior.pdf(xs))
        integral = np.trapezoid(p, np.asarray(xs[:, 0]))
        assert abs(integral - 1.0) < 0.02
        assert float(prior.pdf(jnp.array([[1.5]]))[0]) == 0.0


class TestBinary:
    def test_sample_and_pdf(self):
        prior = BinaryPrior(4, probs=jnp.array([0.9, 0.1, 0.5, 0.5]))
        x = np.asarray(prior.sample(KEY, 5000))
        assert set(np.unique(x)).issubset({0.0, 1.0})
        assert abs(x[:, 0].mean() - 0.9) < 0.03
        p = float(prior.pdf(jnp.array([[1.0, 0.0, 1.0, 0.0]]))[0])
        assert np.isclose(p, 0.9 * 0.9 * 0.5 * 0.5, rtol=1e-4)


class TestCategorical:
    def test_ragged_categories(self):
        prior = CategoricalPrior([[0.0, 1.0, 2.0], [10.0, 20.0]])
        vals, idx = prior.sample_both(KEY, 4000)
        vals, idx = np.asarray(vals), np.asarray(idx)
        assert set(np.unique(vals[:, 0])).issubset({0.0, 1.0, 2.0})
        assert set(np.unique(vals[:, 1])).issubset({10.0, 20.0})
        assert idx.max() <= 2
        # uniform over valid categories
        assert abs((vals[:, 1] == 10.0).mean() - 0.5) < 0.05

    def test_pdf(self):
        prior = CategoricalPrior([[0.0, 1.0, 2.0], [10.0, 20.0]])
        p = float(prior.pdf(jnp.array([[1.0, 10.0]]))[0])
        assert np.isclose(p, (1 / 3) * (1 / 2), rtol=1e-4)


class TestMixed:
    def test_mixed_binary(self):
        bounds = jnp.array([[-1.0], [1.0]])
        prior = MixedBinaryPrior(1, 3, bounds)
        x = np.asarray(prior.sample(KEY, 100))
        assert x.shape == (100, 4)
        assert (np.abs(x[:, 0]) <= 1).all()
        assert set(np.unique(x[:, 1:])).issubset({0.0, 1.0})
        p = np.asarray(prior.pdf(jnp.asarray(x)))
        assert np.allclose(p, 0.5 * 0.125, rtol=1e-3)

    def test_mixed_categorical_sample_both(self):
        bounds = jnp.array([[0.0], [1.0]])
        prior = MixedCategoricalPrior(1, 2, [[5.0, 6.0], [7.0, 8.0]], bounds)
        vals, with_idx = prior.sample_both(KEY, 50)
        vals, with_idx = np.asarray(vals), np.asarray(with_idx)
        assert vals.shape == (50, 3)
        assert set(np.unique(vals[:, 1])).issubset({5.0, 6.0})
        assert set(np.unique(with_idx[:, 1])).issubset({0.0, 1.0})


class TestDataset:
    def test_query_consumes(self):
        feats = jnp.arange(20.0).reshape(10, 2)
        targets = jnp.arange(10.0)
        prior = DatasetPrior(feats, targets)
        y = prior.query(jnp.array([3, 5]))
        assert np.allclose(np.asarray(y), [3.0, 5.0])
        assert prior.n_available == 8
        assert not prior.available[3] and not prior.available[5]

    def test_sample_consumes(self):
        prior = DatasetPrior(jnp.ones((10, 2)), jnp.arange(10.0))
        x, y = prior.sample(KEY, 4)
        assert x.shape == (4, 2)
        assert prior.n_available == 6


class TestWKDE:
    def test_pdf_integrates_to_one(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(500, 1)), jnp.float32)
        w = jnp.ones(500)
        kde = WeightedKernelDensityEstimation(x, w, 1, n_kde=256)
        xs = jnp.linspace(-6, 6, 4001).reshape(-1, 1)
        p = np.asarray(kde.pdf(xs))
        assert abs(np.trapezoid(p, np.asarray(xs[:, 0])) - 1.0) < 0.02

    def test_matches_scipy_gaussian_kde(self):
        from scipy.stats import gaussian_kde

        rng = np.random.default_rng(1)
        data = rng.normal(size=(300, 2)).astype(np.float32)
        w = rng.uniform(0.5, 1.5, 300).astype(np.float32)
        kde = WeightedKernelDensityEstimation(
            jnp.asarray(data), jnp.asarray(w), 2, n_kde=300)
        # compare against scipy built from the SAME (component, weight) pairs
        ref = gaussian_kde(np.asarray(kde.x_obs).T,
                           weights=np.asarray(kde.weights))
        pts = rng.normal(size=(20, 2)).astype(np.float32)
        got = np.asarray(kde.pdf(jnp.asarray(pts)))
        want = ref(pts.T)
        assert np.allclose(got, want, rtol=0.02, atol=1e-4)

    def test_sample_respects_bounds(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.uniform(-1, 1, size=(200, 2)), jnp.float32)
        w = jnp.asarray(rng.uniform(0, 1, 200), jnp.float32)
        bounds = jnp.array([[-1.0, -1.0], [1.0, 1.0]])
        kde = WeightedKernelDensityEstimation(x, w, 2, bounds=bounds)
        s = np.asarray(kde.sample(KEY, 1000))
        assert (np.abs(s) <= 1.0 + 1e-6).all()

    def test_weighted_mode_shift(self):
        """Heavily weighting right-side points shifts the density."""
        x = jnp.asarray(np.linspace(-1, 1, 100).reshape(-1, 1), jnp.float32)
        w = jnp.asarray(np.linspace(0.01, 1.0, 100) ** 4, jnp.float32)
        kde = WeightedKernelDensityEstimation(x, w, 1, n_kde=100)
        p_left = float(kde.pdf(jnp.array([[-0.8]]))[0])
        p_right = float(kde.pdf(jnp.array([[0.8]]))[0])
        assert p_right > p_left
