"""Tests for the batch-BO baseline zoo and pathwise GP sampling."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sober_tpu.gp import fit_gp, predict
from sober_tpu.gp.sampling import (
    decoupled_sampler,
    joint_posterior_samples,
    make_rff_basis,
)
from sober_tpu.priors import Uniform
from sober_tpu.benchmarks import (
    thompson_sampling,
    decoupled_thompson_sampling,
    dpp_ts,
    gibbon,
    hallucination,
    local_penalisation,
    TurboState,
    update_turbo_state,
    turbo,
    sober_ts,
    expected_improvement,
    maximize_acqf,
)

KEY = jax.random.key(0)


def _fitted(n=40, seed=0, kernel="rbf"):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-2, 2, (n, 2)), jnp.float32)
    y = -jnp.sum(x**2, axis=1) + 0.01 * jnp.asarray(
        rng.normal(size=n), jnp.float32)
    return (fit_gp(x, y, kernel_name=kernel),
            Uniform(jnp.array([[-2.0, -2.0], [2.0, 2.0]])))


ALL_SPECTRAL = ["rbf", "matern12", "matern32", "matern52"]


class TestSampling:
    @pytest.mark.parametrize("kernel", ALL_SPECTRAL)
    def test_rff_approximates_kernel(self, kernel):
        """E[phi(x) phi(y)^T] -> k(x, y) for every kernel with a registered
        spectral density (reference basis_functions.py:48). Matern tails are
        heavier (t-distributed frequencies), so the MC error bar is wider
        than RBF's at the same basis count."""
        model, _ = _fitted(kernel=kernel)
        n_basis = 4096 if kernel == "rbf" else 32768
        basis = make_rff_basis(KEY, model, num_basis=n_basis)
        x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (30, 2)),
                        jnp.float32)
        phi = basis(x)
        k_approx = np.asarray(phi @ phi.T)
        k_true = np.asarray(model.kernel.gram(x, x))
        rel = np.abs(k_approx - k_true).max() / k_true.max()
        assert rel < (0.05 if kernel == "rbf" else 0.10), (kernel, rel)

    @pytest.mark.parametrize("kernel", ALL_SPECTRAL)
    def test_pathwise_matches_posterior(self, kernel):
        model, _ = _fitted(kernel=kernel)
        paths = decoupled_sampler(KEY, model, 512, num_basis=2048)
        xq = jnp.array([[0.5, 0.5], [1.5, -1.0]])
        y = np.asarray(paths(xq))
        mu, var = predict(model, xq, include_noise=False)
        sd = np.sqrt(np.asarray(var))
        assert np.allclose(y.mean(0), np.asarray(mu), atol=0.15), kernel
        assert np.allclose(y.std(0), sd, atol=0.15), kernel

    def test_unknown_kernel_raises(self):
        model, _ = _fitted()
        bad = model._replace(kernel=model.kernel.__class__(
            "tanimoto", {"outputscale": jnp.float32(1.0)}))
        with pytest.raises(ValueError, match="spectral density"):
            make_rff_basis(KEY, bad, num_basis=64)

    def test_joint_samples_stats(self):
        model, _ = _fitted()
        xq = jnp.array([[0.3, -0.4], [1.0, 1.0]])
        y = np.asarray(joint_posterior_samples(KEY, model, xq, 2000))
        mu, var = predict(model, xq, include_noise=False)
        assert np.allclose(y.mean(0), np.asarray(mu), atol=0.1)


class TestAcqf:
    def test_ei_nonneg_and_peaked(self):
        model, prior = _fitted()
        x = prior.sample(KEY, 100)
        ei = np.asarray(expected_improvement(model, jnp.max(model.y), x))
        assert (ei >= -1e-6).all()

    def test_maximize_acqf_in_bounds(self):
        model, prior = _fitted()
        out = maximize_acqf(KEY, lambda x: -jnp.sum(x**2, axis=1),
                            prior.bounds, q=2, raw_samples=128)
        out = np.asarray(out)
        assert out.shape == (2, 2)
        assert (np.abs(out) <= 2.0 + 1e-5).all()
        assert np.abs(out).max() < 0.5  # found the center


class TestBaselines:
    def test_each_returns_valid_batch(self):
        model, prior = _fitted()

        def set_model(x, y):
            return fit_gp(x, y)

        batches = {
            "ts": thompson_sampling(KEY, model, prior, 256, 4),
            "dts": decoupled_thompson_sampling(KEY, model, prior, 256, 4,
                                               num_basis=512),
            "dpp": dpp_ts(KEY, model, prior, 256, 4, n_mcmc=10),
            "gibbon": gibbon(KEY, model, prior, 256, 4),
            "lp": local_penalisation(KEY, model, prior, 3),
            "sober_ts": sober_ts(KEY, model, prior, 4, n_cand_super=512,
                                 n_cand=256, n_nys=32),
        }
        for name, xb in batches.items():
            xb = np.asarray(xb)
            assert xb.shape[1] == 2, name
            assert np.isfinite(xb).all(), name
            assert (np.abs(xb) <= 2.0 + 1e-4).all(), name
            # batch entries distinct
            assert len(np.unique(xb.round(5), axis=0)) > 1, name

    def test_dpp_ts_mcmc_increases_diversity(self):
        """The Metropolis chain samples the TSxDPP mixture
        (snippet_dppts.py:58-87): across seeds, the MCMC-refined batch's
        DPP log-det must on average beat the raw independent-TS batch's,
        and the lambda/first_ts variants of the paper's Appendix E.2 must
        run."""
        from sober_tpu.benchmarks.batch_bo import _dpp_logdet_jit

        model, prior = _fitted()
        gains = []
        for seed in range(6):
            key = jax.random.key(seed)
            raw = dpp_ts(key, model, prior, 256, 4, n_mcmc=0)
            ref = dpp_ts(key, model, prior, 256, 4, n_mcmc=40)
            ld0 = float(_dpp_logdet_jit(model, raw, 1.0, "mult"))
            ld1 = float(_dpp_logdet_jit(model, ref, 1.0, "mult"))
            gains.append(ld1 - ld0)
        assert np.mean(gains) > 0.0, gains

        xb_pow = dpp_ts(KEY, model, prior, 256, 4, n_mcmc=5,
                        dpp_lambda=2.0, lambda_mode="pow")
        assert np.isfinite(np.asarray(xb_pow)).all()
        xb_alt = dpp_ts(KEY, model, prior, 256, 4, n_mcmc=5, first_ts=True)
        assert np.isfinite(np.asarray(xb_alt)).all()

    def test_hallucination(self):
        model, prior = _fitted()
        xb = hallucination(KEY, model, lambda x, y: fit_gp(x, y), prior, 3)
        assert np.asarray(xb).shape == (3, 2)

    def test_turbo_state_machine(self):
        st = TurboState(dim=2, batch_size=4)
        st = update_turbo_state(st, jnp.array([1.0]))
        # first update only initializes best_value (-inf + inf = nan in the
        # improvement test — matching benchmarks/_batch_bo.py:214)
        assert st.best_value == 1.0
        st = update_turbo_state(st, jnp.array([2.0]))
        assert st.success_counter == 1
        for _ in range(st.failure_tolerance):
            st = update_turbo_state(st, jnp.array([0.0]))
        assert st.length < 0.8  # shrank

    def test_turbo_batch(self):
        model, prior = _fitted()
        st = TurboState(dim=2, batch_size=4)
        xb = np.asarray(turbo(KEY, st, model, prior, 4))
        assert xb.shape == (4, 2)
        assert (np.abs(xb) <= 2.0 + 1e-4).all()
