"""Tests for the warped-GP (BASQ) and fully-Bayesian-GP model families."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sober_tpu.gp.warped import ScaleMmltGP, PIBQ
from sober_tpu.gp.fbgp import (
    FitboGP,
    RBFHyperPrior,
    fitbo_mll,
    sampling_hypers,
    quadrature_distillation,
    FullyBayesianGP,
    FBGPAcquisitionFunction,
    PIFBGP,
)

KEY = jax.random.key(0)


def _loglik_data(n=30, seed=0):
    """A 1-d Gaussian log-likelihood surface."""
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-3, 3, (n, 1)), jnp.float32)
    loglik = -0.5 * (x[:, 0] / 0.7) ** 2  # peak at 0
    return x, loglik


class TestScaleMmlt:
    def test_warp_roundtrip(self):
        x, ll = _loglik_data()
        m = ScaleMmltGP(x, ll)
        g = m.unwarp_from_h_to_g(m.warp_from_g_to_h(jnp.array([0.3, 1.5])))
        assert np.allclose(np.asarray(g), [0.3, 1.5], atol=1e-6)

    def test_gspace_predict_recovers_likelihood(self):
        x, ll = _loglik_data(60)
        m = ScaleMmltGP(x, ll)
        mu_g, var_g = m.gspace_predict(x)
        want = np.exp(np.asarray(ll) - float(m.beta))
        got = np.asarray(mu_g)
        assert np.corrcoef(got, want)[0, 1] > 0.99

    def test_gspace_kernel_psd_diag(self):
        x, ll = _loglik_data(40)
        m = ScaleMmltGP(x, ll)
        xq = jnp.linspace(-2, 2, 16).reshape(-1, 1)
        k = np.asarray(m.gspace_kernel(xq, xq))
        assert np.allclose(k, k.T, atol=1e-5)
        assert np.linalg.eigvalsh(k).min() > -1e-4

    def test_pi_bq(self):
        x, ll = _loglik_data(40)
        m = ScaleMmltGP(x, ll)
        pi = PIBQ(m)
        vals = np.asarray(pi(jnp.linspace(-2, 2, 32).reshape(-1, 1)))
        assert (vals >= 0).all() and (vals <= 1).all()

    def test_update_appends(self):
        x, ll = _loglik_data(20)
        m = ScaleMmltGP(x, ll)
        m.update(x[:5] + 0.01, ll[:5])
        assert m.model.x.shape[0] == 25
        assert m.y_log.shape[0] == 25


class TestBASQEvidence:
    def test_gaussian_evidence(self):
        """Evidence of N(x;0,0.7^2) likelihood under U(-3,3) prior:
        Z = (1/6) * integral exp(-x^2/0.98) dx = sqrt(2pi)*0.7/6."""
        from sober_tpu import Sober
        from sober_tpu.apps.basq import BASQ
        from sober_tpu.priors import Uniform
        from sober_tpu.utils.prng import KeyRing

        keys = KeyRing(0)
        prior = Uniform(jnp.array([[-3.0], [3.0]]))
        x = prior.sample(keys.next(), 100)
        loglik = -0.5 * (x[:, 0] / 0.7) ** 2
        model = ScaleMmltGP(x, loglik)
        sober = Sober(prior, model)
        # build a learned proposal so MixtureSampler works
        sober.next_batch(512, 64, 8)
        basq = BASQ(prior, model, sober, verbose=False)
        elml, avlml = basq.quadrature(2048, 128, 32)
        truth = np.log(np.sqrt(2 * np.pi) * 0.7 / 6.0)
        assert abs(elml - truth) < 0.15

        # posterior machinery
        samples = basq.sampling_posterior(200)
        assert samples.shape == (200, 1)
        assert abs(float(samples.mean())) < 0.3  # posterior centered at 0
        map_est = basq.MAP(500)
        assert abs(float(map_est[0])) < 0.5

    def test_huge_loglik_no_overflow(self):
        """Regression (ADVICE r1): beta = max log-lik > 88 used to overflow
        exp(beta) in fp32, zeroing posterior() and degenerating SIR to
        uniform. Log-space evidence keeps the posterior machinery working."""
        from sober_tpu import Sober
        from sober_tpu.apps.basq import BASQ
        from sober_tpu.priors import Uniform
        from sober_tpu.utils.prng import KeyRing

        keys = KeyRing(0)
        prior = Uniform(jnp.array([[-3.0], [3.0]]))
        x = prior.sample(keys.next(), 100)
        loglik = 500.0 - 0.5 * (x[:, 0] / 0.7) ** 2  # beta ~ 500
        model = ScaleMmltGP(x, loglik)
        sober = Sober(prior, model)
        sober.next_batch(512, 64, 8)
        basq = BASQ(prior, model, sober, verbose=False)
        elml, avlml = basq.quadrature(2048, 128, 32)
        truth = 500.0 + np.log(np.sqrt(2 * np.pi) * 0.7 / 6.0)
        assert np.isfinite(elml) and abs(elml - truth) < 0.5
        samples = basq.sampling_posterior(200)
        # posterior concentrated near 0, NOT uniform over [-3,3]
        assert abs(float(samples.mean())) < 0.3
        assert float(jnp.std(samples)) < 1.5
        map_est = basq.MAP(500)
        assert abs(float(map_est[0])) < 0.5


class TestFitbo:
    def test_predict_matches_observations(self):
        x, ll = _loglik_data(50)
        y = jnp.exp(ll)  # likelihood values (non-negative)
        m = FitboGP(x, y)
        mu, var = m.predict(x)
        assert np.corrcoef(np.asarray(mu), np.asarray(y))[0, 1] > 0.99

    def test_all_negative_observations(self):
        # regression (ADVICE r1, high): alpha < 0 made padded rows warp to
        # sqrt(negative) = NaN, poisoning the masked MLL and all predictions
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (10, 3)), jnp.float32)
        y = jnp.asarray(-1.0 - rng.uniform(0, 5, 10), jnp.float32)
        m = FitboGP(x, y, fit_iters=20)
        assert float(m.alpha) < 0
        mu, var = m.predict(x)
        assert np.all(np.isfinite(np.asarray(mu)))
        assert np.all(np.isfinite(np.asarray(var)))

    def test_wsabil_vs_wsabim(self):
        x, ll = _loglik_data(30)
        y = jnp.exp(ll)
        ml = FitboGP(x, y, label="wsabil")
        mm = FitboGP(x, y, label="wsabim")
        xq = jnp.linspace(-2, 2, 8).reshape(-1, 1)
        mu_l, _ = ml.predict(xq)
        mu_m, _ = mm.predict(xq)
        assert np.all(np.isfinite(np.asarray(mu_l)))
        assert np.all(np.isfinite(np.asarray(mu_m)))


class TestFBGP:
    def setup_method(self, _):
        x, ll = _loglik_data(25, seed=3)
        self.y = jnp.exp(ll)
        self.gp = FitboGP(x, self.y)

    def test_fitbo_mll_finite_and_discriminative(self):
        x = self.gp.model.x  # bucket-padded buffer
        theta_good = jnp.log(jnp.array([0.1, 1e-6, 1.0, 1.0]))
        val = fitbo_mll(theta_good, x, self.gp.fobs_padded, self.gp.alpha,
                        self.gp.model.mask)
        assert np.isfinite(float(val))

    def test_sampling_hypers_vmapped(self):
        hp = RBFHyperPrior()
        hypers, lmls = sampling_hypers(self.gp, hp, n_hypers=64, key=KEY)
        assert hypers.shape == (65, 4)
        assert lmls.shape == (65,)
        assert np.isfinite(np.asarray(lmls)).all()
        # eta column must exceed max observation
        assert (np.asarray(hypers[:, 0]) > float(self.y.max()) - 1e-5).all()

    def test_distillation_and_marginal_predict(self):
        hp = RBFHyperPrior()
        hypers, lmls = sampling_hypers(self.gp, hp, n_hypers=200, key=KEY)
        w_qd, theta_qd = quadrature_distillation(hypers, lmls, n_nys=32,
                                                 n_qd=16)
        assert (np.asarray(w_qd) >= 0).all()
        assert abs(float(w_qd.sum()) - 1.0) < 1e-3

        fbgp = FullyBayesianGP(self.gp, w_qd, theta_qd)
        xq = jnp.linspace(-2, 2, 10).reshape(-1, 1)
        mu_b, var_b = fbgp.batch_predict(xq)
        assert mu_b.shape == (16, 10)
        assert (np.asarray(var_b) >= 0).all()
        mu, var = fbgp.marginal_predict(xq)
        assert np.isfinite(np.asarray(mu)).all()
        assert (np.asarray(var) >= -1e-5).all()

        cov = np.asarray(fbgp.marginal_predictive_covariance(xq, xq))
        assert np.allclose(cov, cov.T, atol=1e-4)

    def test_fbgp_refit_one_program(self):
        """fbgp_refit (the whole hyper pipeline as one XLA program) must
        produce a FullyBayesianGP equivalent to the staged calls: valid
        distilled quadrature, finite marginal predictions, and a posterior
        that agrees with a staged build to quadrature-compression noise."""
        from sober_tpu.gp.fbgp import fbgp_refit

        hp = RBFHyperPrior()
        fused = fbgp_refit(self.gp, hp, n_hypers=200, n_nys=32, n_qd=16,
                           key=KEY)
        assert fused.Theta_qd.shape == (16, 4)
        assert (np.asarray(fused.w_qd) >= 0).all()
        assert abs(float(fused.w_qd.sum()) - 1.0) < 1e-3
        assert np.isfinite(np.asarray(fused._cache.alpha)).all()

        xq = jnp.linspace(-2, 2, 10).reshape(-1, 1)
        mu_f, var_f = fused.marginal_predict(xq)
        assert np.isfinite(np.asarray(mu_f)).all()
        assert (np.asarray(var_f) >= -1e-5).all()

        hypers, lmls = sampling_hypers(self.gp, hp, n_hypers=200, key=KEY)
        w_qd, theta_qd = quadrature_distillation(hypers, lmls, n_nys=32,
                                                 n_qd=16)
        staged = FullyBayesianGP(self.gp, w_qd, theta_qd)
        mu_s, _ = staged.marginal_predict(xq)

        # ground truth: the UNDISTILLED 201-chain posterior. The FITBO
        # hyperposterior is ultra-concentrated here (ESS ~ 2), so this is
        # the regression guard for the distillation dropping the dominant
        # hypersample (the top-pinned Nystrom set in _nystrom_with_top);
        # fused vs staged directly is the wrong comparison — they draw
        # DIFFERENT hypersample sets from different PRNG streams.
        w_full = jnp.exp(lmls - jnp.max(lmls))
        w_full = w_full / jnp.sum(w_full)
        full = FullyBayesianGP(self.gp, w_full, hypers)
        mu_full, _ = full.marginal_predict(xq)
        assert np.allclose(np.asarray(mu_s), np.asarray(mu_full), atol=0.25)
        assert np.allclose(np.asarray(mu_f), np.asarray(mu_full), atol=0.25)

    def test_acquisitions_and_pi(self):
        hp = RBFHyperPrior()
        hypers, lmls = sampling_hypers(self.gp, hp, n_hypers=100, key=KEY)
        w_qd, theta_qd = quadrature_distillation(hypers, lmls, n_nys=32,
                                                 n_qd=12)
        fbgp = FullyBayesianGP(self.gp, w_qd, theta_qd)
        xq = jnp.linspace(-2, 2, 20).reshape(-1, 1)
        for label in FBGPAcquisitionFunction.LABELS:
            af = FBGPAcquisitionFunction(fbgp, label)(xq)
            assert af.shape == (20,), label
            assert np.isfinite(np.asarray(af)).all(), label
        ei = FBGPAcquisitionFunction(fbgp, "EI")(xq)
        assert (np.asarray(ei) >= -1e-6).all()
        pi = PIFBGP(fbgp)
        vals = np.asarray(pi(xq))
        assert (vals >= 0).all() and (vals <= 1 + 1e-6).all()

    def test_ard_base_model_end_to_end(self):
        """VERDICT r2 Weak #3: sampling_hypers crashed on an ARD (d,)
        lengthscale. The theta layout is now (eta_raw, noise, ls-block, os)
        with an n_ls-wide ls block; the whole FBGP pipeline must run."""
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.uniform(-2, 2, (20, 2)), jnp.float32)
        y = jnp.exp(-0.5 * (x[:, 0] ** 2 + (x[:, 1] / 0.5) ** 2))
        gp = FitboGP(x, y, ard=True)
        assert gp.model.kernel.params["lengthscale"].shape == (2,)
        hp = RBFHyperPrior(n_ls=2)
        hypers, lmls = sampling_hypers(gp, hp, n_hypers=64, key=KEY)
        assert hypers.shape == (65, 5)
        assert np.isfinite(np.asarray(lmls)).all()
        w_qd, theta_qd = quadrature_distillation(hypers, lmls, n_nys=24,
                                                 n_qd=10)
        fbgp = FullyBayesianGP(gp, w_qd, theta_qd)
        xq = jnp.asarray(rng.uniform(-2, 2, (12, 2)), jnp.float32)
        mu, var = fbgp.marginal_predict(xq)
        assert np.isfinite(np.asarray(mu)).all()
        assert (np.asarray(var) >= -1e-5).all()
        for label in ("EI", "UCB"):
            af = FBGPAcquisitionFunction(fbgp, label)(xq)
            assert np.isfinite(np.asarray(af)).all(), label

    def test_ard_hyperprior_mismatch_raises(self):
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.uniform(-2, 2, (15, 3)), jnp.float32)
        y = jnp.exp(-0.5 * jnp.sum(x**2, axis=1))
        gp = FitboGP(x, y, ard=True)
        with pytest.raises(ValueError, match="n_ls"):
            sampling_hypers(gp, RBFHyperPrior(), n_hypers=8, key=KEY)

    def test_fbgp_with_sober(self):
        from sober_tpu import Sober
        from sober_tpu.priors import Uniform

        hp = RBFHyperPrior()
        hypers, lmls = sampling_hypers(self.gp, hp, n_hypers=100, key=KEY)
        w_qd, theta_qd = quadrature_distillation(hypers, lmls, n_nys=32,
                                                 n_qd=12)
        fbgp = FullyBayesianGP(self.gp, w_qd, theta_qd)
        prior = Uniform(jnp.array([[-3.0], [3.0]]))
        sober = Sober(prior, fbgp)
        assert sober.fbgp
        xb = sober.next_batch(512, 64, 8)
        assert xb.shape == (8, 1)
        # with an FBGP acquisition as calc_obj
        af = FBGPAcquisitionFunction(fbgp, "UCB")
        xb2 = sober.next_batch(512, 64, 8, calc_obj=af)
        assert xb2.shape == (8, 1)
        # Sober.step would refit a plain exact GP, silently dropping the
        # fully-Bayesian marginalization — it must refuse FBGP models
        with pytest.raises(TypeError, match="exact GP"):
            sober.step(self.gp.model.x, self.gp.Y_unwarp, 512, 64, 8)


class TestFixedJitterAnchor:
    """ADVICE r4: _fixed_jitter_cholesky drops the escalation rescue for
    every LML-sweep lane, the row-0 MAP anchor included. Pin the intended
    fallback: a lane whose factorization blows up scores EPS_LML (not NaN)
    and simply drops out of the hyperposterior."""

    def test_failing_anchor_lane_maps_to_eps_lml(self):
        from sober_tpu.gp.fbgp import EPS_LML, _fitbo_mll_sweep

        n, d = 24, 2
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
        fobs = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
        eta = jnp.float32(float(fobs.max()))
        # anchor theta overflows the Gram in fp32 (outputscale e^90 = inf
        # -> NaN Cholesky); the remaining lanes are sane
        thetas = jnp.asarray(
            np.vstack([[0.0, -4.0, 0.0, 90.0],
                       np.tile([0.0, -4.0, 0.0, 0.0], (3, 1))]),
            jnp.float32)
        lmls = np.asarray(_fitbo_mll_sweep(thetas, x, fobs, eta, None))
        assert lmls[0] == EPS_LML
        assert np.isfinite(lmls[1:]).all() and (lmls[1:] > EPS_LML).all()
        # downstream hyperposterior weights stay NaN-free; the dead anchor
        # carries zero mass
        w = np.exp(lmls - lmls.max())
        assert np.isfinite(w).all() and w[0] == 0.0

    def test_near_singular_duplicated_rows_no_nan(self):
        # identical inputs + inconsistent targets + ~zero noise: the
        # fixed-jitter factorization must either survive or fall cleanly
        # to EPS_LML — never emit NaN into the sweep
        from sober_tpu.gp.fbgp import EPS_LML

        x = jnp.zeros((32, 2), jnp.float32)
        fobs = jnp.asarray(np.linspace(-1.0, -2.0, 32), jnp.float32)
        eta = jnp.float32(-0.5)
        theta = jnp.asarray(np.log([1e-3, 1e-12, 1.0, 1.0]), jnp.float32)
        v = float(fitbo_mll(theta, x, fobs, eta))
        assert not np.isnan(v)
        assert v == EPS_LML or np.isfinite(v)

    def test_nystrom_with_top_degenerate_n1(self):
        # ADVICE r4: n_nys=1 used to slice [-0:] == ALL rows, inflating
        # the Nystrom set to N+1 and changing compiled shapes downstream
        from sober_tpu.gp.fbgp import _nystrom_with_top

        rng = np.random.default_rng(1)
        hs = jnp.asarray(rng.normal(size=(40, 4)), jnp.float32)
        w = jnp.asarray(rng.uniform(0.1, 1.0, (40,)), jnp.float32)
        w = w / w.sum()
        out = _nystrom_with_top(jax.random.key(0), hs, w, 1)
        assert out.shape == (1, 4)
        out8 = _nystrom_with_top(jax.random.key(0), hs, w, 8)
        assert out8.shape == (8, 4)
