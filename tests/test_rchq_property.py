"""Property / fuzz tests for the recombination core across edge configs.

The QR-complement CAR (core/rchq.py:_caratheodory) must uphold, for every
shape regime and weight pattern the tree can encounter:

  * non-negativity and unit mass of the returned quadrature weights,
  * exactly <= num_pts support points, all drawn from supp(init_weights),
  * moment matching against the candidate measure in the Nystrom test basis.

Regimes covered: pool sizes straddling the tree's power-of-two round
boundaries (including n_pool <= 2*num_pts, i.e. zero halving rounds),
heavily-sparse cleansed weights, a single positive weight, rank-deficient
(nearly degenerate) kernels, and constant features.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from sober_tpu.core.rchq import recombination
from sober_tpu.utils.linalg import symmetrize


def _rbf(ls=0.5):
    def kern(a, b):
        d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        return jnp.exp(-0.5 * d2 / ls**2)

    return kern


def _moment_err(x, x_nys, idx, w, mu0, kern, n_test):
    k_nys = symmetrize(kern(x_nys, x_nys))
    _, vecs = jnp.linalg.eigh(k_nys)
    u = vecs[:, -n_test:].T
    phi = np.asarray(u @ kern(x_nys, x))
    want = phi @ mu0
    got = phi[:, np.asarray(idx)] @ np.asarray(w, np.float64)
    scale = max(np.abs(want).max(), 1.0)
    return np.abs(got - want).max() / scale


def _check(x, x_nys, num_pts, kern, mu0):
    idx, w = recombination(jnp.asarray(x, jnp.float32),
                           jnp.asarray(x_nys, jnp.float32), num_pts, kern,
                           init_weights=jnp.asarray(mu0, jnp.float32))
    idx = np.asarray(idx)
    w = np.asarray(w)
    assert (w >= 0).all()
    assert abs(w.sum() - 1.0) < 2e-3
    sel = idx[w > 1e-12]
    assert len(np.unique(sel)) == len(sel)
    assert (mu0[sel] > 0).all(), "support must come from supp(init_weights)"
    return _moment_err(x, x_nys, idx, w, mu0, kern, num_pts - 1)


@pytest.mark.parametrize("n_pool", [33, 64, 65, 127, 128, 257, 1000, 1024])
def test_pool_sizes_straddle_tree_boundaries(n_pool):
    """num_pts=8 -> m=16 barycenters; pool sizes around powers of two hit
    every padding pattern (including the no-rounds n_pool <= m case)."""
    rng = np.random.default_rng(n_pool)
    x = rng.uniform(-1, 1, (n_pool, 2))
    mu0 = rng.uniform(0, 1, n_pool)
    mu0 /= mu0.sum()
    err = _check(x, x[: min(32, n_pool)], 8, _rbf(), mu0)
    assert err < 5e-3, err


@pytest.mark.parametrize("frac_zero", [0.5, 0.9, 0.99])
def test_sparse_cleansed_weights(frac_zero):
    """Heavily-cleansed weights (mostly zeros) must not corrupt moments or
    leak mass onto zero-weight candidates."""
    rng = np.random.default_rng(7)
    n = 800
    x = rng.uniform(-1, 1, (n, 3))
    mu0 = rng.uniform(0, 1, n)
    mu0[rng.choice(n, int(frac_zero * n), replace=False)] = 0.0
    mu0 /= mu0.sum()
    err = _check(x, x[:64], 12, _rbf(), mu0)
    assert err < 5e-3, err


def test_single_positive_weight():
    """Degenerate measure: all mass on one point — the quadrature must
    return that point with weight 1."""
    rng = np.random.default_rng(9)
    n = 300
    x = rng.uniform(-1, 1, (n, 2))
    mu0 = np.zeros(n)
    mu0[137] = 1.0
    idx, w = recombination(jnp.asarray(x, jnp.float32),
                           jnp.asarray(x[:32], jnp.float32), 6, _rbf(),
                           init_weights=jnp.asarray(mu0, jnp.float32))
    idx = np.asarray(idx)
    w = np.asarray(w)
    assert abs(w.sum() - 1.0) < 1e-4
    top = idx[np.argmax(w)]
    assert top == 137
    assert w.max() > 0.999


def test_rank_deficient_kernel():
    """Nearly-degenerate kernel (huge lengthscale -> Gram ~ ones): the
    global-phi normalization + QR complement must still produce a valid
    quadrature (mass conservation is the only meaningful moment here)."""
    rng = np.random.default_rng(11)
    n = 500
    x = rng.uniform(-1, 1, (n, 2))
    mu0 = rng.uniform(0, 1, n)
    mu0 /= mu0.sum()
    idx, w = recombination(jnp.asarray(x, jnp.float32),
                           jnp.asarray(x[:48], jnp.float32), 10, _rbf(ls=50.0),
                           init_weights=jnp.asarray(mu0, jnp.float32))
    w = np.asarray(w)
    assert (w >= 0).all()
    assert abs(w.sum() - 1.0) < 2e-3


@pytest.mark.parametrize("n_masked", [0, 3])
def test_caratheodory_branch_invariants(n_masked):
    """Direct check of _caratheodory's two null-basis branches.

    n_masked=0 exercises the all-active fast path (complement columns used
    directly, eigh split skipped via lax.cond); n_masked>0 exercises the
    eigh-split path. Both must eliminate down to <= p support points while
    preserving x.T @ mu exactly (mass row included) and leaving masked rows
    at zero.
    """
    from sober_tpu.core.rchq import _caratheodory

    rng = np.random.default_rng(21 + n_masked)
    m, n_feat = 16, 7
    feats = rng.uniform(-1, 1, (n_feat, m))
    mask = np.ones(m)
    mu = rng.uniform(0.1, 1.0, m)
    if n_masked:
        mask[-n_masked:] = 0.0
        mu[-n_masked:] = 0.0
    mu /= mu.sum()
    x = jnp.asarray(np.concatenate([feats, mask[None, :]]).T, jnp.float32)
    p = n_feat + 1
    mu_out = np.asarray(_caratheodory(
        x, jnp.asarray(mu, jnp.float32), m - p, jnp.asarray(mask, jnp.float32)))

    assert (mu_out >= 0).all()
    assert (mu_out[mask == 0] == 0).all()
    assert (mu_out > 0).sum() <= p
    want = np.asarray(x).T @ mu
    got = np.asarray(x).T @ mu_out
    assert np.abs(got - want).max() < 5e-6, (got, want)


def test_linear_kernel_exact_mean_matching():
    """With a linear kernel the test functions are linear, so the selected
    quadrature must preserve the weighted MEAN of the candidates almost
    exactly — an interpretable end-to-end moment check."""
    rng = np.random.default_rng(13)
    n, d = 1200, 4
    x = rng.uniform(-1, 1, (n, d))
    mu0 = rng.uniform(0, 1, n)
    mu0 /= mu0.sum()

    def kern(a, b):
        return a @ b.T + 1.0

    idx, w = recombination(jnp.asarray(x, jnp.float32),
                           jnp.asarray(x[:64], jnp.float32), d + 2, kern,
                           init_weights=jnp.asarray(mu0, jnp.float32))
    want = mu0 @ x
    got = np.asarray(w, np.float64) @ x[np.asarray(idx)]
    assert np.abs(got - want).max() < 2e-3, (got, want)
