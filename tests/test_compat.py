"""Migration surface: every reference public name importable from
sober_tpu.compat, and the torch-OO adapter classes behave."""
import jax.numpy as jnp
import numpy as np
import pytest

from sober_tpu import compat

# every public name of the reference package (SOBER/), per SURVEY.md §2
REFERENCE_NAMES = [
    "BASQ", "ScaleMmltGP", "SOBERUCB", "BoTorchLCBSC", "ParabolicMean",
    "BOLFIModel", "FBGPAcquisitionFunction", "FitboGP", "sampling_hypers",
    "quadrature_distillation", "FullyBayesianGP", "RBFHyperPrior",
    "ScaleVanillaGP", "TanimotoGP", "batch_tanimoto_sim", "TanimotoKernel",
    "BitKernel", "ExpectationPropagation", "train_GP", "train_GP_with_Adam",
    "train_GP_with_BFGS", "update_gp", "predict", "predict_mean",
    "get_cov_cache", "predictive_covariance", "set_gp", "InverseModel",
    "Kernel", "PI_BQ", "PI_FBGP", "PI", "TruncatedGaussian",
    "CategoricalPrior", "Uniform", "BinaryPrior", "MixedBinaryPrior",
    "MixedCategoricalPrior", "DatasetPrior", "Gaussian", "CategoricalMLE",
    "update_binary_prior", "update_categorical_prior",
    "update_continuous_prior", "update_mixed_prior", "BernoulliMLE",
    "recombination", "ker_svd_sparsify", "RecombinationSampler",
    "MixtureSampler", "EmpiricalSampler", "setting_parameters", "Sober",
    "SoberWrapper", "TruncatedMVN", "TensorManager", "SafeTensorOperator",
    "Utils", "KMeans", "WeightsStabiliser",
    "WeightedKernelDensityEstimation", "multivariate_normal_cdf",
]


@pytest.mark.parametrize("name", REFERENCE_NAMES)
def test_reference_name_available(name):
    assert getattr(compat, name) is not None


def test_tensor_manager():
    tm = compat.TensorManager(seed=3)
    assert tm.ones(4, 2).shape == (4, 2)
    assert tm.zeros(4).shape == (4,)
    r = tm.rand(3, 16)
    assert r.shape == (16, 3) and float(r.min()) >= 0 and float(r.max()) < 1
    perm = np.sort(np.asarray(tm.randperm(7)))
    assert (perm == np.arange(7)).all()
    idx = tm.multinomial(jnp.asarray([0.0, 0.0, 1.0, 1.0]), 2)
    assert set(np.asarray(idx).tolist()) == {2, 3}
    assert tm.numpy(tm.tensor([1.0, 2.0])).tolist() == [1.0, 2.0]


def test_safe_tensor_operator():
    op = compat.Utils()
    y = op.remove_anomalies(jnp.asarray([1.0, jnp.nan, jnp.inf]))
    assert bool(jnp.isfinite(y).all())
    bad = jnp.asarray([[1.0, 2.0], [2.0, 1.0]])  # indefinite
    assert not op.is_psd(bad)
    assert op.is_psd(op.make_cov_psd(bad))
    p = op.safe_mvn_prob(jnp.zeros(2), jnp.eye(2), jnp.zeros((3, 2)))
    assert np.allclose(np.asarray(p), 1 / (2 * np.pi), atol=1e-5)


def test_weights_stabiliser():
    ws = compat.WeightsStabiliser(thresh=2, seed=1)
    w = ws.cleansing_weights(jnp.asarray([1.0, -2.0, jnp.nan, 3.0]))
    assert abs(float(w.sum()) - 1.0) < 1e-6 and bool((w >= 0).all())
    assert ws.check_weights(jnp.asarray([0.2, 0.8]))
    assert not ws.check_weights(jnp.asarray([0.0, 0.0]))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(64, 2)),
                    jnp.float32)
    c = ws.kmeans_resampling(x, n_clusters=4)
    assert c.shape == (4, 2)


def test_mle_adapters():
    rng = np.random.default_rng(0)
    xb = jnp.asarray((rng.random((256, 3)) < [0.2, 0.5, 0.9]), jnp.float32)
    w = jnp.ones(256) / 256
    p = compat.BernoulliMLE(w, xb).optimize()
    assert np.allclose(np.asarray(p), [0.2, 0.5, 0.9], atol=0.08)
    idx = jnp.asarray(rng.integers(0, 3, (256, 2)))
    pc = compat.CategoricalMLE(w, idx, 2, 4).optimize()
    assert pc.shape == (2, 4)
    assert np.allclose(np.asarray(pc[:, :3]), 1 / 3, atol=0.1)


def test_gp_aliases_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (32, 2)), jnp.float32)
    y = jnp.sin(3 * x[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=32),
                                                 jnp.float32)
    state0 = compat.set_gp(x, y, fit_iters=5)
    mu0, _ = compat.predict(state0, x[:4])
    state = compat.train_GP_with_Adam(x, y, fit_iters=5)
    cache, kxx = compat.get_cov_cache(state)
    assert cache.shape == kxx.shape == (32, 32)
    mu, var = compat.predict(state, x[:4])
    assert mu.shape == (4,) and bool((var > 0).all())
    assert mu0.shape == (4,)


def test_ker_svd_sparsify():
    rng = np.random.default_rng(1)
    pt = jnp.asarray(rng.uniform(-1, 1, (24, 2)), jnp.float32)

    def kern(a, b):
        d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        return jnp.exp(-0.5 * d2)

    s_vals, u = compat.ker_svd_sparsify(pt, 5, kern)
    assert s_vals.shape == (5,) and u.shape == (5, 24)
    # descending eigenvalues, orthonormal rows
    assert bool((s_vals[:-1] >= s_vals[1:]).all())
    assert np.allclose(np.asarray(u @ u.T), np.eye(5), atol=1e-4)


SECOND_TIER = [
    "BasePrior", "mvn_box_prob", "Phi", "hyperrectangle_integration",
    "LogMarginalLikelihood", "lnPhi", "lnNormalProb", "device_manager",
    "dtype_manager", "default_postprocess_script", "BOLFIKernel",
    "rc_kernel_svd", "Tchernychova_Lyons_CAR", "Mod_Tchernychova_Lyons",
]


@pytest.mark.parametrize("name", SECOND_TIER)
def test_second_tier_name_available(name):
    assert getattr(compat, name) is not None


def test_ln_normal_prob_accuracy():
    """lnNormalProb must match scipy in both tails and the bulk."""
    from scipy.stats import norm

    cases = [(-1.0, 1.0), (3.0, 5.0), (-6.0, -4.0), (8.0, 12.0),
             (-0.5, 9.0)]
    for a, b in cases:
        # tail-safe float64 oracle: P(a<Z<b) = sf(a) - sf(b) (cdf(b)-cdf(a)
        # catastrophically cancels for deep positive tails)
        want = np.log(norm.sf(a) - norm.sf(b))
        got = float(compat.lnNormalProb(a, b))
        assert abs(got - want) < 5e-4, (a, b, got, want)


def test_tchernychova_lyons_car():
    """One CAR pass reduces to <= n_feat+1 support points preserving the
    augmented moments."""
    rng = np.random.default_rng(0)
    n, d = 40, 3
    x = rng.normal(size=(n, d))
    mu = rng.uniform(0.1, 1, n)
    mu /= mu.sum()
    mu_new = np.asarray(compat.Tchernychova_Lyons_CAR(x, mu), np.float64)
    assert (mu_new >= 0).all()
    assert np.count_nonzero(mu_new > 1e-10) <= d + 1
    assert abs(mu_new.sum() - 1.0) < 1e-4
    want = mu @ x
    got = mu_new @ x
    assert np.abs(got - want).max() < 1e-3, (got, want)


def test_mod_tchernychova_lyons_precomputed_basis():
    """The tree on a PRECOMPUTED spectral basis (reference signature:
    SOBER/_rchq.py:51): returns positive weights + their pool indices in
    the reference's (w_star, idx_star) order, matching the test-function
    moments of the input measure."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1, 1, (400, 2)), jnp.float32)
    pt = x[:32]
    mu = jnp.asarray(rng.uniform(0.1, 1, 400), jnp.float32)
    mu = mu / mu.sum()

    def kern(a, b):
        d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        return jnp.exp(-0.5 * d2)

    _, u = compat.ker_svd_sparsify(pt, 7, kern)
    w, idx = compat.Mod_Tchernychova_Lyons(x, u, pt, kern, mu=mu)
    w = np.asarray(w, np.float64)
    idx = np.asarray(idx)
    assert len(w) <= 8 and (w > 0).all()
    assert abs(w.sum() - 1.0) < 1e-3
    phi = np.asarray(u @ kern(pt, x), np.float64)
    want = phi @ np.asarray(mu, np.float64)
    got = phi[:, idx] @ w
    assert np.abs(got - want).max() < 5e-3, (got, want)


def test_rc_kernel_svd_alias():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, (512, 2)), jnp.float32)

    def kern(a, b):
        d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        return jnp.exp(-0.5 * d2)

    idx, w = compat.rc_kernel_svd(x, x[:32], 8, kern)
    assert idx.shape == (8,) and bool((w >= 0).all())
    assert abs(float(w.sum()) - 1.0) < 1e-3
