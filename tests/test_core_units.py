"""Unit tests for sampler internals, prior updates, and the fused path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sober_tpu import Sober
from sober_tpu.core.prior_update import (
    bernoulli_mle,
    categorical_mle,
    update_binary_prior,
    update_continuous_prior,
)
from sober_tpu.core.sampler import EmpiricalSampler, MixtureSampler
from sober_tpu.core.pi import PI
from sober_tpu.core.rckernel import RecombinationKernel
from sober_tpu.core.fused import fused_acquisition
from sober_tpu.gp import fit_gp, posterior_max_mean
from sober_tpu.priors import (
    Uniform,
    BinaryPrior,
    DatasetPrior,
    WeightedKernelDensityEstimation,
)
from sober_tpu.tasks import setup_branin
from sober_tpu.utils.prng import KeyRing

KEY = jax.random.key(0)


class TestPriorUpdates:
    def test_bernoulli_mle_closed_form(self):
        x = jnp.array([[1.0, 0.0], [1.0, 1.0], [1.0, 0.0], [0.0, 0.0]])
        w = jnp.array([0.25, 0.25, 0.25, 0.25])
        p = np.asarray(bernoulli_mle(w, x))
        assert np.allclose(p, [0.75, 0.25], atol=1e-5)

    def test_bernoulli_mle_weighted(self):
        x = jnp.array([[1.0], [0.0]])
        w = jnp.array([0.9, 0.1])
        assert np.isclose(float(bernoulli_mle(w, x)[0]), 0.9, atol=1e-5)

    def test_categorical_mle(self):
        idx = jnp.array([[0], [1], [1], [2]])
        w = jnp.full((4,), 0.25)
        p = np.asarray(categorical_mle(w, idx, 1, 3))[0]
        assert np.allclose(p, [0.25, 0.5, 0.25], atol=2e-3)

    def test_update_binary_prior_clamped(self):
        prior = BinaryPrior(2)
        new = update_binary_prior(jnp.array([1.0]), jnp.array([[1.0, 0.0]]),
                                  prior)
        p = np.asarray(new.probs)
        assert p[0] <= 0.999 and p[1] >= 0.001  # boundary clamp

    def test_update_continuous_prior_is_wkde(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (100, 2)), jnp.float32)
        w = jnp.asarray(rng.uniform(0, 1, 100), jnp.float32)
        base = Uniform(jnp.array([[-1.0, -1.0], [1.0, 1.0]]))
        new = update_continuous_prior(x, w, base, 2)
        assert isinstance(new, WeightedKernelDensityEstimation)
        assert new.bounds is not None


def _sober_on_branin(n_init=40, seed=0):
    keys = KeyRing(seed)
    prior, fn = setup_branin()
    x = prior.sample(keys.next(), n_init)
    y = fn(x)
    model = fit_gp(x, y)
    return Sober(prior, model, seed=seed), prior, model


class TestSamplerInternals:
    def test_sampling_shapes_and_invariants(self):
        sober, prior, model = _sober_on_branin()
        x_cand, w = sober.sampling(512)
        assert x_cand.shape == (512, 2)
        assert np.isclose(float(w.sum()), 1.0, atol=1e-4)
        assert (np.asarray(w) >= 0).all()

    def test_recursive_sampling_fixed_size(self):
        sober, *_ = _sober_on_branin()
        x, w = sober.recursive_sampling(256, n_repeat=3)
        assert x.shape == (256, 2)
        assert np.isclose(float(w.sum()), 1.0, atol=1e-4)

    def test_initialise_prior_restores_uniform(self):
        sober, prior, model = _sober_on_branin()
        sober.next_batch(512, 64, 8)  # learns a WKDE proposal
        assert isinstance(sober.prior, WeightedKernelDensityEstimation)
        sober.initialise_prior()
        assert isinstance(sober.prior, Uniform)

    def test_dataset_pipeline(self):
        rng = np.random.default_rng(1)
        feats = jnp.asarray(rng.integers(0, 2, (400, 32)), jnp.float32)
        targets = jnp.asarray(rng.normal(size=400), jnp.float32)
        ds = DatasetPrior(feats, targets)
        x0, y0 = ds.sample(KEY, 30)
        model = fit_gp(x0, y0)
        sober = Sober(ds, model)
        idx, xb = sober.next_batch(128, 48, 8)
        idx = np.asarray(idx)
        assert xb.shape == (8, 32)
        assert (idx >= 0).all() and (idx < 400).all()
        # returned indices map to the global dataset rows
        assert np.allclose(np.asarray(ds.features)[idx], np.asarray(xb))


class TestMixtureSampler:
    def test_mixture_pdf_and_sample(self):
        sober, prior, model = _sober_on_branin()
        sober.next_batch(512, 64, 8)  # learn WKDE
        mix = MixtureSampler(prior, sober, ratio_wkde=0.5)
        s = mix.sample(KEY, 100)
        assert s.shape == (100, 2)
        pdf = mix.pdf(s)
        assert (np.asarray(pdf) >= 0).all()
        # mixture pdf between the components' pdfs
        p_prior = np.asarray(prior.pdf(s))
        p_wkde = np.asarray(sober.prior.pdf(s))
        want = 0.5 * p_prior + 0.5 * p_wkde
        assert np.allclose(np.asarray(pdf), want, rtol=1e-4)


class TestFusedPath:
    def test_fused_matches_pipeline_weights(self):
        sober, prior, model = _sober_on_branin()
        keys = KeyRing(7)
        x_cand = prior.sample(keys.next(), 1024)
        x_nys = x_cand[:64]
        pdf = prior.pdf(x_cand)
        eta = posterior_max_mean(model)
        idx, w, weights = fused_acquisition(model, eta, x_cand, x_nys, pdf,
                                            16)
        assert idx.shape == (16,)
        assert np.isclose(float(w.sum()), 1.0, atol=1e-3)
        # pool weights match PI/prior computation
        pi = PI(model)
        from sober_tpu.utils.weights import cleansing_weights

        want = cleansing_weights(pi(x_cand) / pdf)
        assert np.allclose(np.asarray(weights), np.asarray(want), atol=1e-5)


class TestReferenceParityEdges:
    def test_ts_sampler_not_implemented(self):
        """PI 'ts' branch raises, as the reference's does (SOBER/_pi.py:51)."""
        _, prior, model = _sober_on_branin()
        with pytest.raises(NotImplementedError):
            PI(model, label="ts")

    def test_kernel_mode_prior_kernel(self):
        sober, prior, model = _sober_on_branin()
        k = RecombinationKernel(model, mode="kernel")
        x = prior.sample(KEY, 8)
        got = np.asarray(k(x, x))
        want = np.asarray(model.kernel.gram(x, x))
        assert np.allclose(got, want, atol=1e-5)

    def test_invalid_kernel_mode_raises(self):
        _, _, model = _sober_on_branin()
        with pytest.raises(ValueError):
            RecombinationKernel(model, mode="nonsense")

    def test_dataset_without_pruning(self):
        rng = np.random.default_rng(2)
        feats = jnp.asarray(rng.integers(0, 2, (200, 16)), jnp.float32)
        targets = jnp.asarray(rng.normal(size=200), jnp.float32)
        ds = DatasetPrior(feats, targets)
        x0, y0 = ds.sample(KEY, 20)
        model = fit_gp(x0, y0)
        sober = Sober(ds, model, dataset_pruning=False)
        idx, xb = sober.next_batch(128, 48, 8)
        assert xb.shape == (8, 16)

    def test_return_weights_mode(self):
        sober, prior, model = _sober_on_branin()
        w, xb = sober.next_batch(512, 64, 8, return_weights=True)
        assert w.shape == (8,)
        assert abs(float(w.sum()) - 1.0) < 1e-3


class TestProtocolHelpers:
    def test_resolve_rc(self):
        """Single home of the rc stable-callable resolution (CLAUDE.md
        jit-cache rules): protocol objects split into (apply, tree); bare
        callables resolve to (None, None) unless a closure fallback is
        requested."""
        from sober_tpu.core.rckernel import resolve_rc

        sober, prior, model = _sober_on_branin()
        rk = RecombinationKernel(model)
        apply_fn, tree = resolve_rc(rk)
        assert apply_fn is rk.rc_apply and tree is model
        assert resolve_rc(None) == (None, None)
        bare = lambda x: jnp.sum(x, axis=-1)
        assert resolve_rc(bare) == (None, None)
        wrapped, tree2 = resolve_rc(bare, fallback_to_closure=True)
        assert tree2 is None
        x = jnp.ones((3, 2))
        assert np.allclose(np.asarray(wrapped(None, x)),
                           np.asarray(bare(x)))

    def test_wkde_from_params_matches_fitted(self):
        """from_params wraps an on-device params pytree without refitting
        and must behave identically to the fitted object (the fused
        pipelines rebuild proposals through it)."""
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(128, 2)), jnp.float32)
        w = jnp.asarray(rng.uniform(0.1, 1.0, 128), jnp.float32)
        bounds = jnp.asarray([[-3.0, -3.0], [3.0, 3.0]], jnp.float32)
        kde = WeightedKernelDensityEstimation(x, w, 2, bounds=bounds,
                                              n_kde=128)
        clone = WeightedKernelDensityEstimation.from_params(
            kde._params, kde.n_dims, kde.bounds, kde.n_kde)
        q = jnp.asarray(rng.normal(size=(16, 2)), jnp.float32)
        assert np.array_equal(np.asarray(kde.pdf(q)),
                              np.asarray(clone.pdf(q)))
        s1 = clone.sample(KEY, 32)
        s2 = kde.sample(KEY, 32)
        assert np.array_equal(np.asarray(s1), np.asarray(s2))
