"""Pallas kernel correctness (interpret mode on the CPU mesh)."""
import numpy as np
import jax
import jax.numpy as jnp

from sober_tpu.ops import (tanimoto_gram, rbf_gram, tanimoto_gram_pallas,
                           rbf_gram_pallas)


def test_tanimoto_pallas_matches_xla():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2, (70, 256)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (130, 256)), jnp.float32)
    want = tanimoto_gram({"outputscale": jnp.float32(1.0)}, x, y)
    got = tanimoto_gram_pallas(x, y, tile_m=64, tile_n=64)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_tanimoto_bf16_pass_exact_vs_float64_oracle():
    """The default tanimoto_gram runs ONE bf16 MXU pass with fp32
    accumulation; for 0/1 fingerprints this is bit-exact (every product is
    0 or 1 in bf16, counts < 2^24). Checked against a float64 numpy oracle
    at realistic sparsity and the full 2048-bit width."""
    rng = np.random.default_rng(2)
    x = (rng.random((40, 2048)) < 0.025).astype(np.float64)
    y = (rng.random((100, 2048)) < 0.025).astype(np.float64)
    xy = x @ y.T
    denom = x.sum(1)[:, None] + y.sum(1)[None, :] - xy
    want = xy / np.maximum(denom, 1e-20)
    got = np.asarray(tanimoto_gram(
        {"outputscale": jnp.float32(1.0)},
        jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)))
    # intersection counts must be exactly integral -> fp32 division only
    assert np.abs(got - want).max() < 1e-6


def test_rbf_pallas_matches_xla():
    rng = np.random.default_rng(1)
    p = {"lengthscale": jnp.float32(0.7), "outputscale": jnp.float32(1.3)}
    x = jnp.asarray(rng.uniform(-1, 1, (50, 5)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, (90, 5)), jnp.float32)
    want = rbf_gram(p, x, y)
    got = rbf_gram_pallas(p, x, y, tile_m=64, tile_n=64)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-5)


# ----------------------------------------------------------------------------
# Caratheodory elimination kernel (ops/pallas_car.py)
# ----------------------------------------------------------------------------

def _car_null_basis(x, mu, row_mask, n_elim):
    """The two-stage null-basis construction of core/rchq.py:_caratheodory,
    reproduced so the kernel can be exercised in isolation."""
    m, p = x.shape
    active0 = jnp.logical_and(mu > 0, row_mask > 0).astype(x.dtype)
    xm = x * active0[:, None]
    q_full, _ = jnp.linalg.qr(xm, mode="complete")
    n0 = q_full[:, p:]
    inact = 1.0 - active0
    d_gram = (n0 * inact[:, None]).T @ n0
    lam, c_vecs = jnp.linalg.eigh(0.5 * (d_gram + d_gram.T))
    n_take = min(n_elim, m - p)
    big_n = n0 @ c_vecs[:, :n_take]
    big_n = big_n * (lam[:n_take] <= 1e-6)[None, :].astype(big_n.dtype)
    return big_n, n_take, active0


def test_car_pallas_kernel_invariants():
    """Kernel-level check (interpret mode): the elimination preserves the
    constraint moments x_active^T mu and zeroes out >= n_elim weights."""
    from sober_tpu.ops.pallas_car import car_eliminate_pallas

    rng = np.random.default_rng(7)
    m, p = 64, 17
    x = jnp.asarray(rng.normal(size=(m, p)), jnp.float32)
    mu = rng.uniform(0.1, 1.0, m).astype(np.float32)
    mask = np.ones(m, np.float32)
    mask[-5:] = 0.0          # padding rows
    mu[-5:] = 0.0
    mu = jnp.asarray(mu / mu.sum())
    mask = jnp.asarray(mask)

    big_n, n_take, active0 = _car_null_basis(x, mu, mask, m - p)
    mu2, elim = car_eliminate_pallas(mu, big_n, mask, n_take, interpret=True)
    mu2 = mu2 * (1.0 - elim) * active0

    mu2_np, mu_np = np.asarray(mu2), np.asarray(mu)
    assert (mu2_np >= 0).all()
    assert (mu2_np[-5:] == 0).all()                       # padding stays empty
    # directions with support on inactive rows are zeroed by the eigh
    # split and skipped; only the surviving columns eliminate
    n_usable = int(np.sum(np.abs(np.asarray(big_n)).max(axis=0) > 0))
    assert (mu2_np == 0).sum() >= (mu_np == 0).sum() + n_usable - 2
    want = np.asarray(x).T @ mu_np
    got = np.asarray(x).T @ mu2_np
    assert np.abs(got - want).max() < 1e-4


def test_car_pallas_end_to_end_matches_xla_loop(monkeypatch):
    """Route recombination's elimination through the pallas kernel (interpret
    mode, CPU) and compare against the XLA fori_loop path: same selected
    support, same weights, same moment error."""
    from sober_tpu.core import rchq
    from sober_tpu.ops import pallas_car

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(-1, 1, (1000, 3)), jnp.float32)
    from sober_tpu.ops import make_kernel
    k = make_kernel("rbf", lengthscale=0.5, outputscale=1.0)
    kern = lambda a, b: k.gram(a, b)

    idx_ref, w_ref = rchq.recombination(x, x[:64], 16, kern)

    orig = pallas_car.car_eliminate_pallas
    monkeypatch.setattr(rchq, "_use_pallas_car", lambda: True)
    monkeypatch.setattr(
        pallas_car, "car_eliminate_pallas",
        lambda mu, n, m, t: orig(mu, n, m, t, interpret=True))
    jax.clear_caches()   # the backend gate is evaluated at trace time
    try:
        idx_p, w_p = rchq.recombination(x, x[:64], 16, kern)
    finally:
        jax.clear_caches()  # drop the pallas-routed executables again

    ref = {(int(i), round(float(w), 5))
           for i, w in zip(np.asarray(idx_ref), np.asarray(w_ref))
           if w > 0}
    got = {(int(i), round(float(w), 5))
           for i, w in zip(np.asarray(idx_p), np.asarray(w_p))
           if w > 0}
    assert got == ref


# ----------------------------------------------------------------------------
# Blocked batched Cholesky inverse / quadform (ops/blocked_chol.py) — the
# TPU production path of the FBGP LML sweep; pure JAX, so it runs (and is
# checked) on the CPU backend directly.
# ----------------------------------------------------------------------------

def _random_psd_batch(rng, b, n, rank=16):
    a = rng.standard_normal((b, n, rank)).astype(np.float32)
    return a @ a.transpose(0, 2, 1) + 0.5 * np.eye(n, dtype=np.float32)


def test_cholesky_inverse_blocked_parity():
    from jax.scipy.linalg import solve_triangular
    from sober_tpu.ops.blocked_chol import cholesky_inverse_blocked

    rng = np.random.default_rng(0)
    for b, n, p in [(5, 7, 4), (3, 37, 16)]:  # n not a multiple of p
        A = _random_psd_batch(rng, b, n)
        out = np.asarray(cholesky_inverse_blocked(jnp.asarray(A), p=p))
        L = np.linalg.cholesky(A)
        ref = np.stack([
            np.asarray(solve_triangular(L[i], jnp.eye(n), lower=True))
            for i in range(b)])
        assert np.abs(out - ref).max() < 2e-5
        # strictly lower-triangular output (padding sliced away)
        assert np.abs(np.triu(out, 1)).max() == 0.0


def test_cholesky_quadform_blocked_parity():
    from sober_tpu.ops.blocked_chol import cholesky_quadform_blocked

    rng = np.random.default_rng(1)
    b, n = 6, 37
    A = _random_psd_batch(rng, b, n)
    rhs = rng.standard_normal((b, n)).astype(np.float32)
    w, ld = cholesky_quadform_blocked(
        jnp.asarray(A), jnp.asarray(rhs), p=8)
    L = np.linalg.cholesky(A)
    quad_ref = np.einsum(
        "bi,bi->b", rhs, np.stack([np.linalg.solve(A[i], rhs[i])
                                   for i in range(b)]))
    logdet_ref = 2.0 * np.log(np.diagonal(L, axis1=1, axis2=2)).sum(1)
    assert np.allclose(np.sum(np.asarray(w)**2, 1), quad_ref, rtol=1e-4)
    assert np.allclose(2.0 * np.sum(np.asarray(ld), 1), logdet_ref,
                       rtol=1e-4, atol=1e-4)


def test_cholesky_blocked_nonpd_propagates_nonfinite():
    """A non-PD instance must poison ONLY its own lane (the sweep's
    isfinite guard maps it to EPS_LML), matching jnp.linalg.cholesky."""
    from sober_tpu.ops.blocked_chol import cholesky_quadform_blocked

    rng = np.random.default_rng(3)
    A = _random_psd_batch(rng, 3, 12)
    A[1] = -np.eye(12, dtype=np.float32)  # negative definite lane
    rhs = rng.standard_normal((3, 12)).astype(np.float32)
    w, ld = cholesky_quadform_blocked(jnp.asarray(A), jnp.asarray(rhs), p=4)
    w, ld = np.asarray(w), np.asarray(ld)
    assert not np.isfinite(np.sum(w[1]**2) + np.sum(ld[1]))
    assert np.isfinite(w[[0, 2]]).all() and np.isfinite(ld[[0, 2]]).all()


def test_fitbo_mll_batch_blocked_path_matches_vmap():
    """The batched-matmul sweep (TPU production path, forced on here)
    must reproduce jax.vmap(fitbo_mll) — same jitter, same masking, same
    EPS_LML guard."""
    from sober_tpu.gp.fbgp import EPS_LML, fitbo_mll_batch

    rng = np.random.default_rng(2)
    n, d, t = 24, 3, 7
    x = jnp.asarray(rng.uniform(0, 1, (n, d)), jnp.float32)
    fobs = jnp.asarray(rng.standard_normal(n), jnp.float32)
    eta = jnp.float32(fobs.min() - 0.1)
    thetas = jnp.asarray(
        rng.normal(-1.0, 0.7, (t, 4)), jnp.float32)  # (eta,noise,ls,os)
    mask = jnp.asarray((np.arange(n) < n - 5), jnp.float32)

    for m in (None, mask):
        want = np.asarray(fitbo_mll_batch(thetas, x, fobs, eta, m,
                                          use_blocked=False))
        got = np.asarray(fitbo_mll_batch(thetas, x, fobs, eta, m,
                                         use_blocked=True))
        assert np.all(np.isfinite(got))
        assert np.allclose(got, want, rtol=2e-3, atol=2e-3), (got, want)
    assert EPS_LML < -1e4  # guard value stays a sentinel
