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

    def test_sparse_support_returns_distinct_indices(self):
        """Fewer support points than num_pts: dummy survivors must be
        backfilled with DISTINCT pool indices (weight 0), never repeats —
        dataset callers consume the indices for row removal and a repeated
        index double-processes a row."""
        n, s = 24, 17
        x = _pool(n, seed=7)
        kern = _kernel_fn()
        mu0 = np.zeros(n, np.float32)
        mu0[:6] = 1.0 / 6.0  # support on only 6 of 24 points
        idx, w = recombination(x, x, s, kern, init_weights=jnp.asarray(mu0))
        idx, w = np.asarray(idx), np.asarray(w)
        assert (idx >= 0).all() and (idx < n).all()
        assert len(set(idx.tolist())) == s, idx
        assert np.isclose(w.sum(), 1.0, atol=1e-4)
        # the zero-weight backfills must not disturb the quadrature: all
        # mass sits on the original support
        assert set(idx[w > 1e-6].tolist()) <= set(range(6))

    def test_pool_smaller_than_batch_stays_in_range(self):
        """Pool genuinely smaller than num_pts: distinctness is impossible,
        but indices must stay in range and duplicates carry zero weight."""
        n, s = 10, 17
        x = _pool(n, seed=8)
        x_nys = _pool(32, seed=9)
        kern = _kernel_fn()
        idx, w = recombination(x, x_nys, s, kern)
        idx, w = np.asarray(idx), np.asarray(w)
        assert (idx >= 0).all() and (idx < n).all()
        assert np.isclose(w.sum(), 1.0, atol=1e-4)
        seen = set()
        for i, wi in zip(idx.tolist(), w.tolist()):
            if i in seen:
                assert wi == 0.0, (i, wi)
            seen.add(i)

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


class TestNystromBasis:
    def test_exact_path_small_gram(self):
        """Grams below the randomized-path threshold return the exact top
        eigenvectors (up to sign)."""
        from sober_tpu.core.rchq import nystrom_basis

        x = _pool(128, d=3, seed=8)
        kern = _kernel_fn()
        k = jnp.asarray(kern(x, x))
        u = np.asarray(nystrom_basis(k, 16))               # (16, 128)
        _, vecs = np.linalg.eigh(np.asarray(k))
        want = vecs[:, -16:].T
        align = np.abs(np.sum(u * want, axis=1))           # |<u_i, v_i>|
        assert align.min() > 1 - 1e-4

    def test_randomized_path_energy_and_orthonormality(self):
        """Large Grams use randomized subspace iteration; the captured
        Rayleigh energy must be within 2% of the exact top-n_test energy and
        the returned test functions orthonormal."""
        from sober_tpu.core.rchq import nystrom_basis

        x = _pool(512, d=6, seed=9)
        kern = _kernel_fn()
        k = jnp.asarray(kern(x, x))
        n_test = 100
        u = nystrom_basis(k, n_test)                       # randomized path
        assert u.shape == (n_test, 512)
        gram_u = np.asarray(u @ u.T)
        assert np.abs(gram_u - np.eye(n_test)).max() < 1e-4
        got_energy = float(np.trace(np.asarray(u @ k @ u.T)))
        eigs = np.linalg.eigvalsh(np.asarray(k))
        want_energy = float(eigs[-n_test:].sum())
        assert got_energy > 0.98 * want_energy

    def test_adversarial_rank_deficient_gram(self):
        """A rank-k Gram whose column space is exactly orthogonal to the OLD
        fixed probe (normal(key(17))) must still capture >= 99% of the top-k
        Rayleigh energy: the probe key is now derived from the Gram content,
        so no single fixed probe can be adversarially avoided. With the old
        fixed probe, k @ omega == 0 here and the basis is unrecoverable."""
        from sober_tpu.core.rchq import nystrom_basis

        n_nys, n_test = 512, 100
        n_sub = n_test + 32
        omega_old = np.asarray(jax.random.normal(
            jax.random.key(17), (n_nys, n_sub), jnp.float32))
        # orthonormal basis of the complement of span(omega_old)
        q_probe, _ = np.linalg.qr(omega_old)               # (n_nys, n_sub)
        proj = np.eye(n_nys) - q_probe @ q_probe.T
        rng = np.random.default_rng(3)
        v_raw = proj @ rng.standard_normal((n_nys, n_test))
        v, _ = np.linalg.qr(v_raw)                         # (n_nys, n_test)
        lam = np.linspace(1.0, 2.0, n_test)
        k = jnp.asarray((v * lam) @ v.T, jnp.float32)      # rank n_test, ⟂ old probe
        u = nystrom_basis(k, n_test)
        got_energy = float(np.trace(np.asarray(u @ k @ u.T)))
        want_energy = float(lam.sum())
        assert got_energy > 0.99 * want_energy

    def test_recombination_moment_matching_on_randomized_basis(self):
        """End to end through the randomized path (n_nys >= 384): moment
        matching on the span actually used stays machine-exact."""
        from sober_tpu.core.rchq import nystrom_basis
        from sober_tpu.utils.linalg import symmetrize

        n, s = 4000, 32
        x = _pool(n, d=4, seed=10)
        kern = _kernel_fn()
        x_nys = x[:512]
        idx, w = recombination(x, x_nys, s, kern)
        assert np.isclose(np.asarray(w).sum(), 1.0, atol=1e-4)

        k_nys = symmetrize(jnp.nan_to_num(kern(x_nys, x_nys)))
        u = nystrom_basis(k_nys, s - 1)                    # deterministic key
        phi = np.asarray(u @ kern(x_nys, x))
        phi = phi / max(np.abs(phi).max(), 1e-30)
        want = phi @ np.full(n, 1.0 / n)
        got = phi[:, np.asarray(idx)] @ np.asarray(w)
        assert np.abs(got - want).max() < 5e-3
