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
    sharded_recombination,
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

    def test_sharded_recombination_end_to_end(self, mesh):
        """VERDICT r1 #10: full sharded recombination round — the
        (n_test, n_rec) strip never materializes replicated. Checks:
        (a) the sharded result is bit-consistent with the SAME blockwise
            algorithm executed single-device (shard-local trees + merge);
        (b) quadrature invariants hold at the single-device tolerance:
            w >= 0, sum w = 1, and moment matching Phi @ scatter(w) =
            Phi @ mu;
        (c) the moments agree with the plain single-device recombination's
            moments (both match mu's, so they match each other)."""
        from sober_tpu.core.rchq import local_reduce, recombination
        from sober_tpu.core.rckernel import RecombinationKernel
        from sober_tpu.utils.linalg import make_psd

        state = _fitted(n=48, d=3, seed=7)
        rng = np.random.default_rng(8)
        n_rec, n_nys, batch = 16384, 128, 16   # 200k-shaped, scaled for CPU
        x_cand = jnp.asarray(rng.uniform(-1, 1, (n_rec, 3)), jnp.float32)
        x_nys = jnp.asarray(rng.uniform(-1, 1, (n_nys, 3)), jnp.float32)
        w0 = jnp.asarray(rng.uniform(0, 1, n_rec), jnp.float32)
        w0 = w0 / w0.sum()
        kernel = RecombinationKernel(state, mode="predictive_covariance")

        idx_s, w_s = sharded_recombination(
            mesh, kernel, shard_candidates(mesh, x_cand), x_nys, w0, batch)

        # (a) same algorithm single-device: per-block local trees + merge
        n_test = batch - 1
        k_nys = make_psd(kernel(x_nys, x_nys))
        _, eigvecs = jnp.linalg.eigh(k_nys)
        u = eigvecs[:, -n_test:].T
        phi = u @ kernel(x_nys, x_cand)
        phi = phi / jnp.maximum(jnp.max(jnp.abs(phi)), 1e-30)
        blk = n_rec // 8
        idxs, ws, phis = [], [], []
        for s in range(8):
            sl = slice(s * blk, (s + 1) * blk)
            i_loc, w_loc = local_reduce(phi[:, sl], w0[sl], batch)
            idxs.append(i_loc + s * blk)
            ws.append(w_loc)
            phis.append(phi[:, sl][:, i_loc])
        idx_all = jnp.concatenate(idxs)
        w_all = jnp.concatenate(ws)
        phi_all = jnp.concatenate(phis, axis=1)
        i_fin, w_fin = local_reduce(phi_all, w_all, batch)
        idx_ref, w_ref = idx_all[i_fin], w_fin
        assert np.array_equal(np.asarray(idx_s), np.asarray(idx_ref))
        assert np.allclose(np.asarray(w_s), np.asarray(w_ref), atol=1e-6)

        # (b) quadrature invariants at the single-device tolerance
        assert (np.asarray(w_s) >= 0).all()
        assert abs(float(w_s.sum()) - 1.0) < 1e-4
        want_moments = phi @ w0
        got_moments = phi[:, idx_s] @ w_s
        scale = np.abs(np.asarray(want_moments)).max() + 1e-12
        assert np.abs(np.asarray(got_moments - want_moments)).max() \
            < 3e-4 * max(scale, 1.0)

        # (c) agrees with the plain single-device recombination's moments
        idx_1, w_1 = recombination(x_cand, x_nys, batch, kernel,
                                   init_weights=w0)
        ref_moments = phi[:, idx_1] @ w_1
        assert np.abs(np.asarray(got_moments - ref_moments)).max() \
            < 6e-4 * max(scale, 1.0)

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


class TestShardedAcquisition:
    def test_matches_two_call_composition(self):
        """sharded_acquisition (one shard_map program) must agree with the
        sharded_pi_weights -> sharded_recombination composition and satisfy
        the quadrature invariants."""
        from sober_tpu.core.rckernel import RecombinationKernel
        from sober_tpu.gp import posterior_max_mean
        from sober_tpu.parallel import (
            make_mesh, shard_candidates, sharded_acquisition,
            sharded_pi_weights, sharded_recombination)

        mesh = make_mesh(8, axis_names=("cand",))
        state = _fitted(n=48, d=3, seed=3)
        eta = posterior_max_mean(state)
        rng = np.random.default_rng(4)
        n_rec, n_nys, batch = 4096, 64, 8
        x_cand = jnp.asarray(rng.uniform(-1, 1, (n_rec, 3)), jnp.float32)
        x_nys = x_cand[:n_nys]
        prior_pdf = jnp.full((n_rec,), 1.0 / 8.0)
        x_sh = shard_candidates(mesh, x_cand)

        idx, w, weights = sharded_acquisition(
            mesh, state, eta, x_sh, x_nys, prior_pdf, batch)
        assert idx.shape == (batch,) and w.shape == (batch,)
        assert bool(jnp.all(w >= 0))
        assert abs(float(w.sum()) - 1.0) < 1e-3
        assert abs(float(weights.sum()) - 1.0) < 1e-3

        w_ref = sharded_pi_weights(mesh, state, eta, x_sh, prior_pdf)
        assert np.allclose(np.asarray(weights), np.asarray(w_ref), atol=1e-6)
        rk = RecombinationKernel(state, mode="predictive_covariance")
        idx_ref, w_quad_ref = sharded_recombination(
            mesh, rk, x_sh, x_nys, w_ref, batch)
        assert np.array_equal(np.asarray(idx), np.asarray(idx_ref))
        assert np.allclose(np.asarray(w), np.asarray(w_quad_ref), atol=1e-5)
