import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sober_tpu.core.rchq import recombination
from sober_tpu.ops import make_kernel


def _pool(n=1000, d=2, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-1, 1, size=(n, d)), jnp.float32)


def _kernel_fn():
    k = make_kernel("rbf", lengthscale=0.5, outputscale=1.0)
    return lambda x, y: k.gram(x, y)


class TestRecombination:
    def test_basic_invariants(self):
        x = _pool(1000)
        kern = _kernel_fn()
        idx, w = recombination(x, x[:64], 16, kern)
        w = np.asarray(w)
        assert w.shape == (16,)
        assert (w >= 0).all()
        assert np.isclose(w.sum(), 1.0, atol=1e-4)
        assert (np.asarray(idx) >= 0).all() and (np.asarray(idx) < 1000).all()

    def test_moment_matching(self):
        """The defining property: the sparse measure matches the pool measure
        on the Nystrom test-function span."""
        n, s = 800, 16
        x = _pool(n, seed=1)
        kern = _kernel_fn()
        x_nys = x[:100]
        idx, w = recombination(x, x_nys, s, kern)

        # reconstruct the same test functions
        from sober_tpu.utils.linalg import make_psd

        k_nys = make_psd(kern(x_nys, x_nys))
        _, vecs = jnp.linalg.eigh(k_nys)
        u = vecs[:, -(s - 1):].T
        phi = np.asarray(u @ kern(x_nys, x))  # (s-1, n)

        mu = np.full(n, 1.0 / n)
        want = phi @ mu
        got = phi[:, np.asarray(idx)] @ np.asarray(w)
        assert np.abs(got - want).max() < 5e-3

    def test_weighted_input_moment_matching(self):
        n, s = 600, 12
        x = _pool(n, seed=2)
        rng = np.random.default_rng(3)
        mu0 = rng.uniform(0, 1, n).astype(np.float32)
        mu0[rng.choice(n, 200, replace=False)] = 0.0  # zeros, like cleansed w
        mu0 /= mu0.sum()
        kern = _kernel_fn()
        x_nys = x[:80]
        idx, w = recombination(x, x_nys, s, kern,
                               init_weights=jnp.asarray(mu0))
        from sober_tpu.utils.linalg import make_psd

        k_nys = make_psd(kern(x_nys, x_nys))
        _, vecs = jnp.linalg.eigh(k_nys)
        u = vecs[:, -(s - 1):].T
        phi = np.asarray(u @ kern(x_nys, x))
        want = phi @ mu0
        got = phi[:, np.asarray(idx)] @ np.asarray(w)
        assert np.abs(got - want).max() < 5e-3
        # selected points must come from the support of mu0
        sel = np.asarray(idx)[np.asarray(w) > 0]
        assert (mu0[sel] > 0).all()

    def test_quadrature_accuracy_vs_random(self):
        """Kernel quadrature should integrate a smooth function much better
        than batch_size random points."""
        n, s = 2000, 24
        x = _pool(n, d=2, seed=4)
        kern = _kernel_fn()
        idx, w = recombination(x, x[:128], s, kern)

        f = lambda pts: np.sin(3 * pts[:, 0]) * np.cos(2 * pts[:, 1])
        truth = f(np.asarray(x)).mean()
        quad = float(f(np.asarray(x)[np.asarray(idx)]) @ np.asarray(w))

        rng = np.random.default_rng(0)
        rand_errs = []
        for _ in range(20):
            sub = rng.choice(n, s, replace=False)
            rand_errs.append(abs(f(np.asarray(x)[sub]).mean() - truth))
        assert abs(quad - truth) < np.median(rand_errs)

    def test_small_pool(self):
        """Pool smaller than one barycenter block: single CAR stage."""
        x = _pool(30, seed=5)
        kern = _kernel_fn()
        idx, w = recombination(x, x[:20], 8, kern)
        w = np.asarray(w)
        assert np.isclose(w.sum(), 1.0, atol=1e-4)
        assert (w >= 0).all()

    def test_with_objective(self):
        """calc_obj biases selection toward high-objective points while
        keeping the quadrature constraints."""
        n, s = 1000, 16
        x = _pool(n, seed=6)
        kern = _kernel_fn()
        obj = lambda pts: pts[:, 0]  # prefer large x0

        idx_o, w_o = recombination(x, x[:64], s, kern, calc_obj=obj)
        idx_p, w_p = recombination(x, x[:64], s, kern)

        assert np.isclose(np.asarray(w_o).sum(), 1.0, atol=1e-3)
        assert (np.asarray(w_o) >= 0).all()
        mean_obj_with = float(np.asarray(x)[np.asarray(idx_o), 0] @ np.asarray(w_o))
        mean_obj_wo = float(np.asarray(x)[np.asarray(idx_p), 0] @ np.asarray(w_p))
        # weighted mean of x0 is a matched moment; compare unweighted means
        assert np.asarray(x)[np.asarray(idx_o), 0].mean() >= \
            np.asarray(x)[np.asarray(idx_p), 0].mean() - 0.2

    def test_jit_and_shapes_static(self):
        x = _pool(512, seed=7)
        kern = _kernel_fn()
        f = jax.jit(lambda p, ny: recombination(p, ny, 8, kern))
        idx, w = f(x, x[:32])
        assert idx.shape == (8,)
