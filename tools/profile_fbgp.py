"""Stage profile of the fused FBGP hyper pipeline (gp.fbgp.fbgp_refit).

Times each stage of fbgp_refit_traced at the bench config (n_obs=100 ->
bucket 128, n_hypers=1000, n_nys=100, n_qd=50) with the chained-eval
harness (CLAUDE.md "Measurement through the dev tunnel"): K dependent
evals inside ONE jitted program, fetch a scalar, subtract the tunnel
round-trip measured with a tiny program. `jax.block_until_ready` does not
actually block through the axon tunnel, so naive per-call timing is
meaningless here.

Stages (matching fbgp_refit_traced, gp/fbgp.py):
  1. draw+lml_sweep   hyperprior draw + 1001-theta vmapped FITBO LML
  2. surrogate_fit    exp-warped hyper-surrogate MAP fit on the
                      _SURROGATE_FIT_N-row subset (production shape)
  3. distillation     Nystrom-with-top subset + RCHQ recombination to n_qd
  4. chain_caches     50 x Cholesky(128) conditioning caches
  5. full             the whole fused program

Run on the real TPU: python tools/profile_fbgp.py [K]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

N_OBS, D = 100, 3
N_HYPERS, N_NYS, N_QD = 1000, 100, 50
K = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def timed(fn, *args, n=7):
    out = fn(*args)
    s = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # sync fetch
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        s += float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), s


def main():
    from sober_tpu.gp.fbgp import (FitboGP, RBFHyperPrior, _SURROGATE_FIT_N,
                                   _VBQ_CFG, _chain_cache, _nystrom_with_top,
                                   fbgp_refit_traced, fitbo_mll,
                                   fitbo_mll_batch, _theta_map_of)
    from sober_tpu.gp.exact import fit_params, materialize
    from sober_tpu.core.rchq import _recombination_impl
    from sober_tpu.utils.linalg import remove_anomalies
    from sober_tpu.utils.weights import cleansing_weights

    rng = np.random.default_rng(0)
    x_raw = jnp.asarray(rng.uniform(-1, 1, (N_OBS, D)), jnp.float32)
    ll = -0.5 * jnp.sum((x_raw / 0.6) ** 2, axis=1)
    model = FitboGP(x_raw, jnp.exp(ll))
    hp = RBFHyperPrior()
    theta_map = _theta_map_of(model, hp)
    x = model.model.x
    fobs = model.fobs_padded
    mask = model.model.mask
    eta = model.alpha
    k_sample, k_nys = jax.random.split(jax.random.key(0))

    # round-trip cost: tiny program, same fetch pattern
    @jax.jit
    def tiny(a):
        return a + 1.0

    rt, _ = timed(tiny, jnp.zeros(()))
    print(f"tunnel round-trip ~{rt*1e3:.1f} ms")

    # materialize intermediate stage inputs once (host side)
    dim = hp.hypermu.shape[0]
    z = jax.random.normal(k_sample, (N_HYPERS, dim))
    samples = jnp.vstack([
        jnp.concatenate([jnp.array([-10.0]), jnp.log(theta_map)])[None, :],
        hp.hypermu[None, :] + z * hp.hyperstd[None, :],
    ])
    # production parity (r5): the sweep is fitbo_mll_batch, which routes
    # the two inner factorizations to the blocked MXU Cholesky on TPU
    # (ops/blocked_chol.py) and falls back to vmap(fitbo_mll) on CPU
    def sweep(s, x_, f_, e_, m_):
        return fitbo_mll_batch(s, x_, f_, e_, m_)

    lmls = sweep(samples, x, fobs, eta, mask)
    big = jnp.exp(samples)
    hypersamples = jnp.concatenate([eta + big[:, :1], big[:, 1:]], axis=1)
    weights0 = cleansing_weights(jnp.exp(lmls - jnp.max(lmls)))
    hyper_nys = _nystrom_with_top(k_nys, hypersamples, weights0, N_NYS)
    # production parity (ADVICE r4): the surrogate MAP fit sees only the
    # first _SURROGATE_FIT_N hypersamples, renormalized within the subset —
    # same targets fbgp_refit_traced fits on
    n_fit = min(_SURROGATE_FIT_N, N_HYPERS + 1)
    y_fit0 = remove_anomalies(lmls)[:n_fit]
    y_exp0 = jnp.exp(y_fit0 - jnp.max(y_fit0))
    params_fit = fit_params(hypersamples[:n_fit], y_exp0, _VBQ_CFG,
                            optimiser="lbfgs")
    kernel_fit, _ = materialize(params_fit, _VBQ_CFG)
    idx_qd, w_qd = _recombination_impl(hypersamples, hyper_nys, N_QD,
                                       kernel_fit.gram,
                                       init_weights=weights0)
    theta_qd = hypersamples[idx_qd]

    # --- stage programs, each chained K times via fori_loop (one compiled
    # body instead of a K-times-unrolled pipeline: the unrolled version of
    # full_fused took >15 min to compile through the tunnel) ----------------
    def chained(body):
        @jax.jit
        def run(arg):
            return jax.lax.fori_loop(
                0, K, lambda i, acc: acc + body(arg, acc * 1e-20),
                jnp.zeros(()))
        return run

    def body_sweep(eta0, eps):
        e = eta0 + eps
        z = jax.random.normal(k_sample, (N_HYPERS, dim))
        s = jnp.vstack([
            jnp.concatenate(
                [jnp.array([-10.0]), jnp.log(theta_map)])[None, :],
            hp.hypermu[None, :] + z * hp.hyperstd[None, :],
        ])
        return jnp.sum(sweep(s, x, fobs, e, mask))

    # --- LML-sweep sub-stages (where do the 50 ms go?) ---------------------
    # NOTE: these cumulative rows decompose the vmap(fitbo_mll) VARIANT of
    # the sweep (the CPU fallback / pre-r5 production path); the blocked
    # TPU path's internal split is documented in ops/blocked_chol.py. The
    # draw+lml_sweep row above times whichever path production takes.
    from sober_tpu.gp.fbgp import _rbf_gram_xx, _fixed_jitter_cholesky
    from jax.scipy.linalg import cho_solve, solve_triangular

    def _sweep_sub(upto):
        def body(eta0, eps):
            e = eta0 + eps

            def one(tl):
                big = jnp.exp(tl)
                eta_h = e + big[0]
                noise, ls, os_ = big[1], big[2:-1], big[-1]
                gobs = jnp.sign(eta_h) * jnp.sqrt(
                    jnp.maximum(2.0 * (eta_h - fobs), 0.0)) * mask
                kxx = _rbf_gram_xx(x, ls, os_)
                mm = mask[:, None] * mask[None, :]
                kxx = kxx * mm
                kn = kxx + big[1] * jnp.diag(mask) + jnp.diag(1.0 - mask)
                if upto == "gram":
                    return jnp.sum(kn)
                chol = _fixed_jitter_cholesky(kn)
                if upto == "chol":
                    return jnp.sum(jnp.log(jnp.abs(jnp.diagonal(chol))))
                alpha = cho_solve((chol, True), gobs)
                mu = kxx @ alpha
                v = solve_triangular(chol, kxx, lower=True)
                cov = kxx - v.T @ v + big[1] * jnp.diag(mask)
                if upto == "covg":
                    return jnp.sum(mu) + jnp.sum(jnp.diagonal(cov))
                cov_f = mu[:, None] * cov * mu[None, :] + 0.5 * cov**2
                cov_f = cov_f * mm + jnp.diag(1.0 - mask)
                chol_f = _fixed_jitter_cholesky(cov_f)
                return jnp.sum(jnp.log(jnp.abs(jnp.diagonal(chol_f))))

            return jnp.sum(jax.vmap(one)(samples))
        return body

    def body_fit(y0, eps):
        # production shape: Cholesky(n_fit) subset fit, not Cholesky(1001)
        ye = y0 * (1.0 + eps)
        p = fit_params(hypersamples[:n_fit], ye, _VBQ_CFG,
                       optimiser="lbfgs")
        return jnp.sum(p.raw_lengthscale) + jnp.sum(p.raw_outputscale)

    def body_distill(w0, eps):
        w = w0 * (1.0 + eps)
        w = w / jnp.sum(w)
        h_nys = _nystrom_with_top(k_nys, hypersamples, w, N_NYS)
        idx, wq = _recombination_impl(hypersamples, h_nys,
                                      N_QD, kernel_fit.gram,
                                      init_weights=w)
        return jnp.sum(wq)

    def body_chains(f0, eps):
        fe = f0 + eps
        chol, alpha = jax.vmap(
            _chain_cache, in_axes=(0, None, None, None))(
                theta_qd, x, fe, mask)
        return jnp.sum(alpha)

    def body_full(eta0, eps):
        e = eta0 + eps
        w, t, c, a = fbgp_refit_traced(
            x, fobs, mask, e, theta_map, hp.hypermu, hp.hyperstd,
            k_sample, k_nys, n_hypers=N_HYPERS, n_nys=N_NYS, n_qd=N_QD,
            cfg=_VBQ_CFG)
        return jnp.sum(a)

    stage_sweep = chained(body_sweep)
    stage_fit = chained(body_fit)
    stage_distill = chained(body_distill)
    stage_chains = chained(body_chains)
    stage_full = chained(body_full)

    rows = [
        ("draw+lml_sweep", stage_sweep, eta),
        ("sweep[gram]", chained(_sweep_sub("gram")), eta),
        ("sweep[+chol]", chained(_sweep_sub("chol")), eta),
        ("sweep[+cov_g]", chained(_sweep_sub("covg")), eta),
        ("sweep[+chol_f]", chained(_sweep_sub("cholf")), eta),
        ("surrogate_fit", stage_fit, y_exp0),
        ("distillation", stage_distill, weights0),
        ("chain_caches", stage_chains, fobs),
        ("full_fused", stage_full, eta),
    ]
    only = [a for a in sys.argv[2:]]
    if only:
        rows = [r for r in rows if any(o in r[0] for o in only)]
    print(f"chained K={K} evals per program; per-eval ms below")
    total = 0.0
    for name, fn, arg in rows:
        t, _ = timed(fn, arg)
        per = (t - rt) / K * 1e3
        # sweep[...] rows are cumulative sub-stages of draw+lml_sweep —
        # diagnostics, not additive stages
        if name != "full_fused" and not name.startswith("sweep["):
            total += per
        print(f"{name:>16}: {per:8.2f} ms/eval   (program {t*1e3:.1f} ms)")
    print(f"{'sum of stages':>16}: {total:8.2f} ms")


if __name__ == "__main__":
    main()
