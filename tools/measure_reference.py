"""Measure the torch reference at the bench configs (VERDICT r4 #3).

bench.py's vs_baseline previously divided by the reference's 4.898 s
notebook iteration recorded at a LIGHTER config (20k candidates, batch
30). This harness times the reference ON THIS BOX at the exact bench
configs so BENCH ratios are like-for-like, and writes one JSON line per
metric to docs/reference_measured.jsonl.

What runs verbatim vs what is a stand-in (gpytorch/botorch are NOT
installed here, so the reference's GP layer cannot execute):

  * kernel recombination — the reference's own
    /root/reference/SOBER/_rchq.py:recombination, loaded from the
    read-only checkout (same stub-package loader as
    tests/test_reference_oracle.py), at the exact candidate/Nystrom/
    batch shapes of each bench row.
  * pi sweep + predictive-covariance kernel — plain-torch
    implementations of the reference's exact math
    (Phi((mu-eta)/sigma), SOBER/_pi.py:20-38; Kxy - KxX W KXy with the
    Woodbury cache W = (K+noise I)^-1, SOBER/_gp.py:255-305), WITHOUT
    gpytorch's module/lazy-tensor overhead — strictly FAVORABLE to the
    reference, so the resulting ratios are lower bounds.
  * Tanimoto similarity — the reference's batch_tanimoto_sim function
    body (SOBER/_drug_modelling.py:15-25), extracted at runtime from the
    source file (the module itself imports gpytorch and cannot load).
  * FBGP LML sweep — the reference's per-hypersample PYTHON LOOP
    structure (SOBER/FBGP/_fully_Bayesian_gp.py:179-203) with the FITBO
    mll math in plain torch per iteration (again generous: no gpytorch
    model rebuild per theta).
  * GP hyperparameter refit — NOT measured (gpytorch absent); the bench
    rows it would join are therefore reference-favorable by its omission.

All reference math runs in torch.float64, the reference's default dtype
(SOBER/_settings.py:8), on CPU (the only backend torch has here, and the
reference's recorded environment).

Run: python tools/measure_reference.py [row ...]   (default: all rows)
"""
import importlib.util
import json
import os
import sys
import time
import types

import numpy as np
import torch

REF_ROOT = "/root/reference/SOBER"
OUT = os.path.join(os.path.dirname(__file__), "..", "docs",
                   "reference_measured.jsonl")
DTYPE = torch.float64         # reference default (SOBER/_settings.py:8)
DEVICE = torch.device("cpu")


def _load_ref(name: str):
    """Load SOBER.<name> without executing the broken package __init__
    (same loader as tests/test_reference_oracle.py)."""
    if "SOBER" not in sys.modules:
        pkg = types.ModuleType("SOBER")
        pkg.__path__ = [REF_ROOT]
        sys.modules["SOBER"] = pkg
    full = f"SOBER.{name}"
    if full in sys.modules:
        return sys.modules[full]
    spec = importlib.util.spec_from_file_location(
        full, os.path.join(REF_ROOT, name.replace(".", "/") + ".py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


def _extract_tanimoto():
    """Execute ONLY batch_tanimoto_sim from the reference source (the
    module imports gpytorch at top level and cannot be loaded whole)."""
    src = open(os.path.join(REF_ROOT, "_drug_modelling.py")).read()
    start = src.index("def batch_tanimoto_sim")
    # the next top-level block is `class BitDistance`, not a def
    end = min(i for i in (src.find("\ndef ", start + 1),
                          src.find("\nclass ", start + 1)) if i != -1)
    ns = {"torch": torch}
    exec(compile(src[start:end], "_drug_modelling.py", "exec"), ns)
    return ns["batch_tanimoto_sim"]


# -- plain-torch stand-ins for the gpytorch layer (reference math) ----------

def _rbf(x, y, ls, os_):
    d2 = torch.cdist(x / ls, y / ls) ** 2
    return os_ * torch.exp(-0.5 * d2)


class TorchGP:
    """Woodbury-cache GP predict/predictive_covariance in plain torch —
    the math of SOBER/_gp.py:212-305 without gpytorch overhead."""

    def __init__(self, x, y, ls=1.0, os_=1.0, noise=1e-4, gram=None):
        self.x, self.y = x, y
        self.ls, self.os_, self.noise = ls, os_, noise
        self.gram = gram or (lambda a, b: _rbf(a, b, ls, os_))
        k = self.gram(x, x) + noise * torch.eye(len(x), dtype=DTYPE)
        self.w_inv = torch.cholesky_inverse(
            torch.linalg.cholesky(k))                   # K_n^-1
        self.alpha = self.w_inv @ y

    def predict(self, q):
        kqx = self.gram(q, self.x)
        mu = kqx @ self.alpha
        var = self.os_ - torch.sum((kqx @ self.w_inv) * kqx, dim=1) \
            + self.noise
        return mu, torch.clamp(var, min=1e-12)

    def predictive_covariance(self, a, b):
        kab = self.gram(a, b)
        return kab - self.gram(a, self.x) @ self.w_inv @ self.gram(self.x, b)


def _pi_weights(gp, x_cand, eta):
    mu, var = gp.predict(x_cand)
    z = (mu - eta) / torch.sqrt(var)
    w = torch.special.ndtr(z)
    w = torch.clamp(w, min=0.0)
    return w / w.sum()


def _median_time(fn, n=3):
    fn()  # warmup
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _emit(metric, value, note):
    row = {"metric": metric, "value": round(value, 4), "unit": "s",
           "note": note}
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def _acquisition_row(metric, n_cand, n_nys, batch, d, n_obs=500,
                     binary=False):
    """pi sweep + Nystrom + reference recombination at a bench config
    (the GP refit stage is omitted — gpytorch absent; see module doc)."""
    rchq = _load_ref("_rchq")
    g = torch.Generator().manual_seed(0)
    if binary:
        x_obs = (torch.rand((n_obs, d), generator=g, dtype=DTYPE) < 0.5
                 ).to(DTYPE)
        x_cand = (torch.rand((n_cand, d), generator=g, dtype=DTYPE) < 0.5
                  ).to(DTYPE)
        ls = np.sqrt(d) / 2
    else:
        x_obs = torch.rand((n_obs, d), generator=g, dtype=DTYPE) * 2 - 1
        x_cand = torch.rand((n_cand, d), generator=g, dtype=DTYPE) * 2 - 1
        ls = 1.0
    y = torch.sin(3 * x_obs[:, 0]) + 0.1 * torch.randn(
        (n_obs,), generator=g, dtype=DTYPE)
    gp = TorchGP(x_obs, y, ls=ls)
    eta = gp.predict(x_obs)[0].max()

    def iteration():
        w = _pi_weights(gp, x_cand, eta)
        x_nys = x_cand[:n_nys]
        idx, w_rchq = rchq.recombination(
            x_cand, x_nys, batch, gp.predictive_covariance, DEVICE, DTYPE,
            init_weights=w)
        return idx

    value = _median_time(iteration)
    _emit(metric, value,
          "reference _rchq.recombination verbatim + plain-torch pi/"
          "predictive-cov (gpytorch refit stage omitted)")


def row_65k():
    _acquisition_row("ref_iteration_65k_batch200", 65536, 512, 200, 10)


def row_200k():
    _acquisition_row("ref_iteration_200k_batch100", 200000, 500, 100, 4)


def row_ising():
    _acquisition_row("ref_iteration_200k_ising_d24", 200000, 500, 100, 24,
                     binary=True)


def row_dataset(n_total=133303, n_bits=2048, n_obs=512, n_rec=2000,
                n_nys=500, batch=100):
    rchq = _load_ref("_rchq")
    tanimoto = _extract_tanimoto()
    rng = np.random.default_rng(0)
    feats = torch.asarray(
        (rng.random((n_total, n_bits)) < 0.025).astype(np.float64))
    y = torch.randn((n_obs,), dtype=DTYPE)
    x_obs = feats[:n_obs]
    gram = lambda a, b: tanimoto(a, b)
    gp = TorchGP(x_obs, y, noise=1e-3, gram=gram)
    eta = gp.predict(x_obs)[0].max()

    def iteration():
        # pi over the WHOLE dataset (sampling_datasets,
        # SOBER/_sampler.py:351-382) + top-k pruning + recombination
        w_all = _pi_weights(gp, feats, eta)
        w_top, idx = torch.topk(w_all, n_rec)
        x_cand = feats[idx]
        w = w_top / w_top.sum()
        i_rchq, w_rchq = rchq.recombination(
            x_cand, x_cand[:n_nys], batch, gp.predictive_covariance,
            DEVICE, DTYPE, init_weights=w)
        return i_rchq

    value = _median_time(iteration)
    _emit("ref_dataset_iteration_133k_2048", value,
          "reference batch_tanimoto_sim + _rchq.recombination verbatim; "
          "plain-torch Woodbury predict")


def row_fbgp(n_obs=100, d=3, n_hypers=1000):
    """The reference's FBGP hypersample sweep STRUCTURE: a Python loop over
    1001 thetas, each conditioning a fresh GP (one n x n Cholesky) and
    scoring the FITBO-warped mll (SOBER/FBGP/_fully_Bayesian_gp.py:179-203)
    — in plain torch (no gpytorch model rebuild per theta: generous)."""
    g = torch.Generator().manual_seed(0)
    x = torch.rand((n_obs, d), generator=g, dtype=DTYPE) * 2 - 1
    fobs = torch.exp(-0.5 * torch.sum((x / 0.6) ** 2, dim=1))
    eta = fobs.max()
    hypermu = torch.tensor([-2.0, 0.1, 0.1, 0.4], dtype=DTYPE)
    hyperstd = torch.tensor([0.7, 1.0, 0.7, 0.7], dtype=DTYPE)
    thetas = hypermu + hyperstd * torch.randn(
        (n_hypers + 1, 4), generator=g, dtype=DTYPE)

    def mll_one(tl):
        big = torch.exp(tl)
        eta_h = eta + big[0]
        noise, ls, os_ = big[1], big[2], big[3]
        gobs = torch.sign(eta_h) * torch.sqrt(
            torch.clamp(2.0 * (eta_h - fobs), min=0.0))
        kxx = _rbf(x, x, ls, os_)
        kn = kxx + (noise + 1e-6) * torch.eye(n_obs, dtype=DTYPE)
        chol = torch.linalg.cholesky(kn)
        alpha = torch.cholesky_solve(gobs[:, None], chol)[:, 0]
        mu_g = kxx @ alpha
        v = torch.linalg.solve_triangular(chol, kxx, upper=False)
        cov_g = kxx - v.T @ v + noise * torch.eye(n_obs, dtype=DTYPE)
        var_g = torch.diagonal(cov_g)
        mu_f = eta_h - 0.5 * (mu_g**2 + var_g)
        cov_f = mu_g[:, None] * cov_g * mu_g[None, :] + 0.5 * cov_g**2
        cov_f = cov_f + 1e-8 * torch.eye(n_obs, dtype=DTYPE)
        diff = fobs - mu_f
        chol_f = torch.linalg.cholesky(cov_f)
        w = torch.linalg.solve_triangular(
            chol_f, diff[:, None], upper=False)[:, 0]
        return (-0.5 * torch.sum(w**2)
                - torch.sum(torch.log(torch.diagonal(chol_f)))
                - 0.5 * n_obs * np.log(2 * np.pi)) / n_obs

    def sweep():
        out = []
        for i in range(n_hypers + 1):   # the reference's Python loop
            try:
                out.append(float(mll_one(thetas[i])))
            except Exception:
                out.append(-1e30)       # bare-except fallback, as reference
        return out

    value = _median_time(sweep, n=3)
    _emit("ref_fbgp_hyper_sweep_1000", value,
          "reference loop structure (per-theta Cholesky in Python loop), "
          "plain torch per iteration (no gpytorch rebuild: generous)")


def row_fbgp_full(n_obs=100, d=3, n_hypers=1000, n_nys_qd=100, n_qd=50,
                  n_rec=8192, n_nys=256, batch=50):
    """The reference's ENTIRE fully-Bayesian BO iteration at the exact
    bench_fbgp_step config (bench.py): the 1001-theta LML Python loop
    (FBGP/_fully_Bayesian_gp.py:179-203), quadrature distillation via the
    reference's recombination (:205-245), the 50-chain marginal predict
    over the candidate pool (:291-340 — a Python loop of per-chain
    predicts), and batch recombination under the marginal predictive
    covariance (:354-370). GENEROUS in two ways: per-chain conditioning
    caches are hoisted out of the predict calls (the reference rebuilds
    the gpytorch model via reset_GP inside every fitbo_predict), and no
    gpytorch module overhead anywhere."""
    rchq = _load_ref("_rchq")
    g = torch.Generator().manual_seed(0)
    x = torch.rand((n_obs, d), generator=g, dtype=DTYPE) * 2 - 1
    fobs = torch.exp(-0.5 * torch.sum((x / 0.6) ** 2, dim=1))
    eta = fobs.max()
    hypermu = torch.tensor([-2.0, 0.1, 0.1, 0.4], dtype=DTYPE)
    hyperstd = torch.tensor([0.7, 1.0, 0.7, 0.7], dtype=DTYPE)
    thetas = hypermu + hyperstd * torch.randn(
        (n_hypers + 1, 4), generator=g, dtype=DTYPE)
    x_cand = torch.rand((n_rec, d), generator=g, dtype=DTYPE) * 2 - 1
    eye = torch.eye(n_obs, dtype=DTYPE)

    def mll_one(tl):
        big = torch.exp(tl)
        eta_h = eta + big[0]
        noise, ls, os_ = big[1], big[2], big[3]
        gobs = torch.sign(eta_h) * torch.sqrt(
            torch.clamp(2.0 * (eta_h - fobs), min=0.0))
        kxx = _rbf(x, x, ls, os_)
        kn = kxx + (noise + 1e-6) * eye
        chol = torch.linalg.cholesky(kn)
        alpha = torch.cholesky_solve(gobs[:, None], chol)[:, 0]
        mu_g = kxx @ alpha
        v = torch.linalg.solve_triangular(chol, kxx, upper=False)
        cov_g = kxx - v.T @ v + noise * eye
        var_g = torch.diagonal(cov_g)
        mu_f = eta_h - 0.5 * (mu_g**2 + var_g)
        cov_f = mu_g[:, None] * cov_g * mu_g[None, :] + 0.5 * cov_g**2
        cov_f = cov_f + 1e-8 * eye
        diff = fobs - mu_f
        chol_f = torch.linalg.cholesky(cov_f)
        w = torch.linalg.solve_triangular(
            chol_f, diff[:, None], upper=False)[:, 0]
        return (-0.5 * torch.sum(w**2)
                - torch.sum(torch.log(torch.diagonal(chol_f)))
                - 0.5 * n_obs * np.log(2 * np.pi)) / n_obs

    class Chain:
        """One distilled hypersample's conditioned FITBO GP; the cache is
        built ONCE here where the reference re-conditions per predict."""

        def __init__(self, theta):
            self.eta_h, self.noise, self.ls, self.os_ = (
                float(theta[0]), float(theta[1]), float(theta[2]),
                float(theta[3]))
            gobs = np.sign(self.eta_h) * torch.sqrt(
                torch.clamp(2.0 * (self.eta_h - fobs), min=0.0))
            k = _rbf(x, x, self.ls, self.os_) + (self.noise + 1e-6) * eye
            self.w_inv = torch.cholesky_inverse(torch.linalg.cholesky(k))
            self.alpha = self.w_inv @ gobs

        def predict_f(self, q):
            kqx = _rbf(q, x, self.ls, self.os_)
            mu_g = kqx @ self.alpha
            var_g = torch.clamp(
                self.os_ - torch.sum((kqx @ self.w_inv) * kqx, dim=1)
                + self.noise, min=0.0)
            mu_f = self.eta_h - 0.5 * (mu_g**2 + var_g)
            var_f = mu_g**2 * var_g + 0.5 * var_g**2
            return mu_f, var_f

    def iteration():
        # 1. hyperposterior sweep: the reference's Python loop
        lmls = []
        for i in range(n_hypers + 1):
            try:
                lmls.append(float(mll_one(thetas[i])))
            except Exception:
                lmls.append(-1e30)
        lmls_t = torch.tensor(lmls, dtype=DTYPE)
        w_hyper = torch.softmax(lmls_t - lmls_t.max(), dim=0)
        # 2. quadrature distillation over hypersample space
        #    (FBGP/_fully_Bayesian_gp.py:205-245)
        hyper_kernel = lambda a, b: _rbf(a, b, 1.0, 1.0)
        idx_qd, w_qd = rchq.recombination(
            thetas, thetas[:n_nys_qd], n_qd, hyper_kernel, DEVICE, DTYPE,
            init_weights=w_hyper)
        big = torch.exp(thetas[idx_qd])
        theta_qd = torch.cat([eta + big[:, :1], big[:, 1:]], dim=1)
        chains = [Chain(t) for t in theta_qd]
        # 3. PI over the pool under the marginal predict (the 50-chain
        #    Python loop of batch_predict)
        mus, vars_ = zip(*(c.predict_f(x_cand) for c in chains))
        mu_b, var_b = torch.stack(mus), torch.stack(vars_)
        mu_m = w_qd @ mu_b
        var_m = torch.clamp(
            w_qd @ (var_b + mu_b**2) - mu_m**2, min=1e-12)
        z = (mu_m - eta) / torch.sqrt(var_m)
        w = torch.clamp(torch.special.ndtr(z), min=0.0)
        w = w / w.sum()

        # 4. batch recombination under marginal_predictive_covariance
        #    (:354-370): each kernel call loops the 50 chains on BOTH sides
        wq2 = 1.0 / (1.0 - float(torch.sum(w_qd**2)))

        def marg_cov(a, b):
            # the reference's recombination calls kernels with a batched
            # 3-D second argument (samp[_idx_tmp], _rchq.py:124) and
            # expects (g, m, s) — flatten, compute, reshape back
            a2 = a.reshape(-1, a.shape[-1])
            b2 = b.reshape(-1, b.shape[-1])
            mu_a = torch.stack([c.predict_f(a2)[0] for c in chains])
            mu_bb = torch.stack([c.predict_f(b2)[0] for c in chains])
            ea, eb = w_qd @ mu_a, w_qd @ mu_bb
            cov = wq2 * ((w_qd[:, None] * (mu_a - ea[None, :])).T
                         @ (mu_bb - eb[None, :]))
            if b.dim() == 3:
                g, s, _ = b.shape
                cov = cov.reshape(a2.shape[0], g, s).permute(1, 0, 2)
            return cov

        i_rchq, w_rchq = rchq.recombination(
            x_cand, x_cand[:n_nys], batch, marg_cov, DEVICE, DTYPE,
            init_weights=w)
        return i_rchq

    value = _median_time(iteration, n=3)
    _emit("ref_fbgp_full_iteration_1000hypers", value,
          "reference FBGP iteration structure: 1001-theta Python LML loop "
          "+ reference recombination distillation + 50-chain marginal "
          "predict/cov loops + batch recombination (chain conditioning "
          "hoisted + no gpytorch rebuild: generous)")


ROWS = {"65k": row_65k, "200k": row_200k, "ising": row_ising,
        "dataset": row_dataset, "fbgp": row_fbgp,
        "fbgp_full": row_fbgp_full}


def main():
    names = sys.argv[1:] or list(ROWS)
    torch.set_num_threads(os.cpu_count() or 1)
    for name in names:
        print(f"=== {name}", flush=True)
        t0 = time.monotonic()
        try:
            ROWS[name]()
        except Exception as e:
            print(f"[{name}] FAILED: {e!r}", flush=True)
        print(f"=== {name} done in {time.monotonic()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
