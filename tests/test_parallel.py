"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sober_tpu.gp import fit_gp, posterior_max_mean, predictive_covariance
from sober_tpu.core.pi import lfi
from sober_tpu.parallel import (
    make_mesh,
    shard_candidates,
    sharded_pi_weights,
    sharded_nystrom_features,
    sharded_barycenter_sums,
    sharded_fbgp_batch_predict,
)
from sober_tpu.utils.weights import cleansing_weights

KEY = jax.random.key(0)


def _fitted(n=32, d=2, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
    y = jnp.sin(3 * x[:, 0]) + 0.01 * jnp.asarray(rng.normal(size=n),
                                                  jnp.float32)
    return fit_gp(x, y)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8, axis_names=("cand",))


class TestShardedPaths:
    def test_pi_weights_match_single_device(self, mesh):
        state = _fitted()
        eta = posterior_max_mean(state)
        rng = np.random.default_rng(1)
        x_cand = jnp.asarray(rng.uniform(-1, 1, (512, 2)), jnp.float32)
        pdf = jnp.full((512,), 0.25)
        want = cleansing_weights(lfi(state, eta, x_cand) / pdf)
        got = sharded_pi_weights(mesh, state, eta,
                                 shard_candidates(mesh, x_cand), pdf)
        # sharded evaluation reorders fp32 reductions; the posterior-variance
        # cancellation near training points amplifies that to ~1e-3 in pi
        assert np.allclose(np.asarray(got), np.asarray(want), atol=3e-3)
        assert abs(float(got.sum()) - 1.0) < 1e-4

    def test_nystrom_features_match(self, mesh):
        state = _fitted()
        rng = np.random.default_rng(2)
        x_cand = jnp.asarray(rng.uniform(-1, 1, (256, 2)), jnp.float32)
        x_nys = x_cand[:32]
        u = jnp.asarray(rng.normal(size=(7, 32)), jnp.float32)
        want = u @ predictive_covariance(state, x_nys, x_cand)
        got = sharded_nystrom_features(mesh, state, u, x_nys,
                                       shard_candidates(mesh, x_cand))
        assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    def test_barycenter_sums_match(self, mesh):
        rng = np.random.default_rng(3)
        n, t, g = 256, 5, 16
        phi = jnp.asarray(rng.normal(size=(t, n)), jnp.float32)
        w = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
        gid = jnp.asarray(rng.integers(0, g, n), jnp.int32)
        want = jax.ops.segment_sum((phi * w[None]).T, gid, num_segments=g)
        got = sharded_barycenter_sums(mesh, phi, w, gid, g)
        assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    def test_fbgp_hyper_sharding(self):
        from sober_tpu.gp import (FitboGP, RBFHyperPrior, sampling_hypers,
                                  quadrature_distillation, FullyBayesianGP)

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.uniform(-2, 2, (20, 1)), jnp.float32)
        y = jnp.exp(-0.5 * x[:, 0] ** 2)
        gp = FitboGP(x, y)
        hypers, lmls = sampling_hypers(gp, RBFHyperPrior(), n_hypers=64,
                                       key=KEY)
        w_qd, theta_qd = quadrature_distillation(hypers, lmls, n_nys=24,
                                                 n_qd=8)
        fbgp = FullyBayesianGP(gp, w_qd, theta_qd)
        hyper_mesh = make_mesh(8, axis_names=("hyper",))
        xq = jnp.linspace(-1, 1, 6).reshape(-1, 1)
        mu_s, var_s = sharded_fbgp_batch_predict(hyper_mesh, fbgp, xq)
        mu, var = fbgp.marginal_predict(xq)
        assert np.allclose(np.asarray(mu_s), np.asarray(mu), atol=1e-4)
        assert np.allclose(np.asarray(var_s), np.asarray(var), atol=1e-4)
