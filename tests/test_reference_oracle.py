"""Differential tests against the reference implementation as oracle.

SURVEY.md §4 calls for "seeded end-to-end parity runs ... with the reference
runnable on CPU as the numerical oracle". These tests import the reference
submodules directly from /root/reference (read-only) and compare:

  * RCHQ: quadrature quality (moment-matching error against the candidate
    measure, evaluated on an independently computed float64 eigenbasis) of
    our recombination vs the reference's on identical inputs,
  * KMeans: exact centroid parity (both use deterministic first-K init),
  * WeightsStabiliser: cleansing/check semantics on adversarial inputs,
  * TruncatedMVN: Gibbs moments vs the reference's Botev minimax-tilting
    sampler on a correlated tail box.

The reference package __init__ is broken under numpy>=2 (`from numpy import
Inf` in mvnorm/integration.py), so submodules are loaded through a stub
package without executing SOBER/__init__.py. Only the torch/scipy-backed
modules that import cleanly are used (_settings, _utils, _weights, _rchq,
_tmvn). Skipped entirely when /root/reference is absent.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference/SOBER"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference checkout not available")


def _load_ref(name: str):
    """Load SOBER.<name> from the reference without running its __init__."""
    if "SOBER" not in sys.modules:
        pkg = types.ModuleType("SOBER")
        pkg.__path__ = [REF_ROOT]
        sys.modules["SOBER"] = pkg
    full = f"SOBER.{name}"
    if full in sys.modules:
        return sys.modules[full]
    spec = importlib.util.spec_from_file_location(
        full, os.path.join(REF_ROOT, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def torch():
    import torch as _torch

    return _torch


def _rbf_np(x, y, ls, os_):
    d2 = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    return os_ * np.exp(-0.5 * d2 / ls**2)


class TestRCHQOracle:
    @pytest.mark.parametrize("n_rec,n_nys,batch", [(512, 32, 4),
                                                   (2048, 64, 16),
                                                   (4096, 128, 32),
                                                   (8192, 96, 64)])
    def test_moment_matching_vs_reference(self, torch, n_rec, n_nys, batch):
        """Same candidates, same kernel, same initial weights: our
        recombination's moment-matching error (on an independent float64
        eigenbasis) must be no worse than the reference's."""
        ref_rchq = _load_ref("_rchq")

        rng = np.random.default_rng(0)
        d, ls, os_ = 3, 0.7, 1.3
        x = rng.uniform(-1, 1, (n_rec, d))
        x_nys = x[:n_nys]
        mu = rng.uniform(0, 1, n_rec)
        mu = mu / mu.sum()

        # --- reference (torch, float64)
        xt = torch.tensor(x, dtype=torch.float64)

        def kern_t(a, b):
            d2 = torch.cdist(a, b) ** 2
            return os_ * torch.exp(-0.5 * d2 / ls**2)

        idx_ref, w_ref = ref_rchq.recombination(
            xt, xt[:n_nys], batch, kern_t, torch.device("cpu"),
            torch.float64,
            init_weights=torch.tensor(mu, dtype=torch.float64))
        idx_ref = idx_ref.numpy()
        w_ref = w_ref.numpy()

        # --- ours (jax, fp32 compute)
        import jax.numpy as jnp

        from sober_tpu.core.rchq import recombination

        def kern_j(a, b):
            d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
            return os_ * jnp.exp(-0.5 * d2 / ls**2)

        idx_j, w_j = recombination(
            jnp.asarray(x, jnp.float32), jnp.asarray(x_nys, jnp.float32),
            batch, kern_j, init_weights=jnp.asarray(mu, jnp.float32))
        idx_j = np.asarray(idx_j)
        w_j = np.asarray(w_j, np.float64)

        # shared float64 eigenbasis of the Nystrom Gram (independent of
        # either implementation's internals)
        k_nys = _rbf_np(x_nys, x_nys, ls, os_)
        eigval, eigvec = np.linalg.eigh(k_nys)
        u = eigvec[:, -(batch - 1):].T                      # (batch-1, n_nys)
        phi = u @ _rbf_np(x_nys, x, ls, os_)                # (batch-1, n_rec)
        want = phi @ mu
        scale = np.abs(want).max() + 1e-12

        err_ref = np.abs(phi[:, idx_ref] @ w_ref - want).max() / scale
        err_ours = np.abs(phi[:, idx_j] @ w_j - want).max() / scale

        # both are valid quadratures...
        for w, err, who in [(w_ref, err_ref, "ref"), (w_j, err_ours, "ours")]:
            assert (w >= -1e-9).all(), who
            assert abs(w.sum() - 1.0) < 1e-3, who
        # ...and ours matches moments at least as well (fp32 vs the
        # reference's float64, hence the small slack)
        assert err_ours <= max(err_ref * 1.5, 5e-5), (err_ours, err_ref)

    def test_sparsity_parity(self, torch):
        """Both return exactly `batch` support points with positive mass
        concentrated the same way (non-negative, normalized)."""
        ref_rchq = _load_ref("_rchq")
        rng = np.random.default_rng(3)
        x = rng.uniform(-1, 1, (1024, 2))
        xt = torch.tensor(x, dtype=torch.float64)

        def kern_t(a, b):
            return torch.exp(-0.5 * torch.cdist(a, b) ** 2)

        idx_ref, w_ref = ref_rchq.recombination(
            xt, xt[:32], 8, kern_t, torch.device("cpu"), torch.float64)

        import jax.numpy as jnp

        from sober_tpu.core.rchq import recombination

        def kern_j(a, b):
            d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
            return jnp.exp(-0.5 * d2)

        idx_j, w_j = recombination(
            jnp.asarray(x, jnp.float32), jnp.asarray(x[:32], jnp.float32),
            8, kern_j)
        assert len(np.unique(np.asarray(idx_j))) == len(idx_ref.numpy()) == 8
        assert np.count_nonzero(np.asarray(w_j) > 1e-9) >= \
            np.count_nonzero(w_ref.numpy() > 1e-9) - 1


class TestWeightsOracle:
    CASES = [
        np.array([0.5, 0.3, 0.2]),
        np.array([1.0, -2.0, np.nan, np.inf, 3.0]),
        np.array([0.0, 0.0, 0.0]),
        np.array([1e-40, 1e-40, 1.0]),
    ]

    @pytest.mark.parametrize("case", range(len(CASES)))
    def test_cleansing_weights(self, torch, case):
        ref_w = _load_ref("_weights")
        w_np = self.CASES[case]
        ref = ref_w.WeightsStabiliser()
        got_ref = ref.cleansing_weights(
            torch.tensor(w_np, dtype=torch.float64)).numpy()

        import jax.numpy as jnp

        from sober_tpu.utils.weights import cleansing_weights

        got = np.asarray(cleansing_weights(
            jnp.asarray(w_np, jnp.float32)), np.float64)
        # same invariants; all-zero input falls back to uniform both sides
        assert abs(got.sum() - 1.0) < 1e-6
        assert (got >= 0).all()
        if np.isfinite(got_ref).all() and got_ref.sum() > 0:
            assert np.allclose(got, got_ref, atol=1e-5), (got, got_ref)

    def test_check_weights(self, torch):
        ref_w = _load_ref("_weights")
        ref = ref_w.WeightsStabiliser(thresh=3)

        import jax.numpy as jnp

        from sober_tpu.utils.weights import check_weights

        for w_np, expect in [
            (np.array([0.1, 0.2, 0.3, 0.4]), True),
            (np.array([0.0, 0.0, 0.0, 0.0]), False),
            (np.array([0.25, 0.25, 0.25, 0.25]), False),  # 1 unique < 3
        ]:
            got_ref = bool(ref.check_weights(
                torch.tensor(w_np, dtype=torch.float64)))
            got = bool(check_weights(jnp.asarray(w_np, jnp.float32),
                                     thresh=3))
            assert got == got_ref == expect, (w_np, got, got_ref)

    def test_kmeans_exact_parity(self, torch):
        """Deterministic first-K init + Lloyd iterations: centroids must
        match the reference's bit-for-bit up to fp32."""
        ref_w = _load_ref("_weights")
        rng = np.random.default_rng(5)
        x = rng.normal(size=(256, 4))
        _, c_ref = ref_w.KMeans(torch.tensor(x, dtype=torch.float64),
                                K=10, Niter=10)

        import jax.numpy as jnp

        from sober_tpu.ops.kmeans import kmeans

        _, c = kmeans(jnp.asarray(x, jnp.float32), 10, 10)
        assert np.allclose(np.asarray(c), c_ref.numpy(), atol=1e-4)


class TestTMVNOracle:
    def test_tail_box_moments_vs_botev(self):
        """Correlated tail box at rho=0.8: our Gibbs sampler's moments must
        match the reference's Botev minimax-tilting sampler (exact-by-
        construction in the tail)."""
        ref_tmvn = _load_ref("_tmvn")
        d = 3
        rho = 0.8
        cov = np.full((d, d), rho) + (1 - rho) * np.eye(d)
        mu = np.zeros(d)
        lb = np.full(d, 1.5)
        ub = np.full(d, 4.0)

        import torch as _torch

        as_t = lambda a: _torch.tensor(a, dtype=_torch.float64)  # noqa: E731
        ref = ref_tmvn.TruncatedMVN(as_t(mu), as_t(cov),
                                    (as_t(lb), as_t(ub)), seed=0)
        s_ref = np.asarray(ref.sample(20000))
        if s_ref.shape[0] == d:          # (d, n) -> (n, d)
            s_ref = s_ref.T
        assert s_ref.shape == (20000, d)

        import jax

        from sober_tpu.priors.tmvn import TruncatedMVN

        ours = TruncatedMVN(mu, cov, (lb, ub))
        s = np.asarray(ours.sample(jax.random.key(0), 20000))
        assert ((s > lb - 1e-6) & (s < ub + 1e-6)).all()

        se_mean = s_ref.std(0).max() / np.sqrt(len(s_ref)) * 8 + 0.02
        assert np.abs(s.mean(0) - s_ref.mean(0)).max() < se_mean, \
            (s.mean(0), s_ref.mean(0))
        assert np.abs(s.std(0) - s_ref.std(0)).max() < 0.05, \
            (s.std(0), s_ref.std(0))
        # cross-correlation under truncation
        c_ours = np.corrcoef(s.T)[0, 1]
        c_ref = np.corrcoef(s_ref.T)[0, 1]
        assert abs(c_ours - c_ref) < 0.1, (c_ours, c_ref)

    def test_tilting_mode_vs_botev(self):
        """Same rho=0.8 tail box through our tilting exactness mode
        (VERDICT r3 item #7): both samplers are iid minimax-tilting
        accept-reject, so moments must agree within Monte-Carlo error —
        tighter than the Gibbs bar above — and the acceptance rate must
        be in the high regime Botev's saddle point guarantees."""
        ref_tmvn = _load_ref("_tmvn")
        d = 3
        rho = 0.8
        cov = np.full((d, d), rho) + (1 - rho) * np.eye(d)
        mu = np.zeros(d)
        lb = np.full(d, 1.5)
        ub = np.full(d, 4.0)

        import torch as _torch

        as_t = lambda a: _torch.tensor(a, dtype=_torch.float64)  # noqa: E731
        ref = ref_tmvn.TruncatedMVN(as_t(mu), as_t(cov),
                                    (as_t(lb), as_t(ub)), seed=0)
        s_ref = np.asarray(ref.sample(20000))
        if s_ref.shape[0] == d:
            s_ref = s_ref.T

        import jax

        from sober_tpu.priors.tmvn import TruncatedMVN

        ours = TruncatedMVN(mu, cov, (lb, ub), method="tilting")
        s = np.asarray(ours.sample(jax.random.key(0), 20000))
        assert ((s > lb - 1e-6) & (s < ub + 1e-6)).all()
        assert ours.last_accept_rate > 0.5

        se = s_ref.std(0).max() / np.sqrt(len(s_ref))
        assert np.abs(s.mean(0) - s_ref.mean(0)).max() < 6 * se, \
            (s.mean(0), s_ref.mean(0))
        assert np.abs(s.std(0) - s_ref.std(0)).max() < 0.02, \
            (s.std(0), s_ref.std(0))
        assert abs(np.corrcoef(s.T)[0, 1]
                   - np.corrcoef(s_ref.T)[0, 1]) < 0.05


class TestTMVNExtremeOracle:
    @pytest.mark.slow
    @pytest.mark.parametrize("d,rho,lo,hi", [
        (10, 0.95, 3.0, 6.0),   # deep correlated tail, moderate dim
        (15, 0.90, 2.0, 5.0),   # higher dim
        (2, 0.99, 4.0, 8.0),    # near-singular correlation, very deep tail
    ])
    def test_extreme_regimes_vs_botev(self, torch, d, rho, lo, hi):
        """Regimes where naive Gibbs mixing collapses (VERDICT r1 Missing
        #5): the spectral-radius auto burn-in must keep moments matched to
        the reference's minimax-tilting sampler."""
        ref_tmvn = _load_ref("_tmvn")
        cov = np.full((d, d), rho) + (1 - rho) * np.eye(d)
        mu = np.zeros(d)
        lb = np.full(d, lo)
        ub = np.full(d, hi)
        as_t = lambda a: torch.tensor(a, dtype=torch.float64)  # noqa: E731
        ref = ref_tmvn.TruncatedMVN(as_t(mu), as_t(cov),
                                    (as_t(lb), as_t(ub)), seed=0)
        s_ref = np.asarray(ref.sample(8000))
        if s_ref.shape[0] == d:
            s_ref = s_ref.T

        import jax

        from sober_tpu.priors.tmvn import TruncatedMVN

        ours = TruncatedMVN(mu, cov, (lb, ub))
        s = np.asarray(ours.sample(jax.random.key(0), 8000))
        assert ((s > lb - 1e-6) & (s < ub + 1e-6)).all()
        assert np.abs(s.mean(0) - s_ref.mean(0)).max() < 0.04, \
            (s.mean(0), s_ref.mean(0))
        assert np.abs(s.std(0) - s_ref.std(0)).max() < 0.03, \
            (s.std(0), s_ref.std(0))
        assert abs(np.corrcoef(s.T)[0, 1]
                   - np.corrcoef(s_ref.T)[0, 1]) < 0.06
