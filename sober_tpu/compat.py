"""Reference-name compatibility layer for users migrating from ma921/SOBER.

Every public name of the reference package maps to a sober_tpu equivalent,
so ``from sober_tpu.compat import <reference name>`` works for the full
surface of ``from SOBER.<module> import <name>``. Three kinds of mapping:

1. **Same name, same role** — re-exported directly (``Sober``, ``BASQ``,
   ``recombination``, the prior zoo, ``TruncatedMVN``,
   ``multivariate_normal_cdf``, ...).
2. **Renamed** — aliased (``PI_BQ`` -> ``PIBQ``, ``TanimotoGP`` ->
   ``fit_tanimoto_gp``, ``update_gp`` -> ``fit_gp``, ``BOLFIModel`` ->
   ``make_bolfi_model``, ``setting_parameters`` -> ``set_settings``).
3. **Torch-OO surface over a functional core** — thin adapter classes
   (``TensorManager``, ``SafeTensorOperator``/``Utils``,
   ``WeightsStabiliser``, ``BernoulliMLE``, ``CategoricalMLE``) exposing the
   reference method names (SOBER/_utils.py:20-199, _weights.py:4-97,
   _prior_update.py:33-229) backed by sober_tpu's pure functions. These
   adapters carry an explicit PRNG ``KeyRing`` where the reference relied on
   torch's global seed.

The idiomatic API (explicit keys, GPState pytrees, jitted pure functions)
remains the primary surface; this module exists so reference code can be
moved over mechanically and then modernised incrementally. See
docs/PARITY.md for the full component matrix.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# 1. same-name re-exports -----------------------------------------------------
from . import set_settings, setting_parameters, settings, Sober  # noqa: F401
from .apps.basq import BASQ  # noqa: F401
from .apps.bolfi import SOBERUCB, BoTorchLCBSC, make_bolfi_model  # noqa: F401
from .apps.ep import ExpectationPropagation  # noqa: F401
from .apps.inverse import InverseModel  # noqa: F401
from .core.pi import PI  # noqa: F401
from .core.prior_update import (  # noqa: F401
    bernoulli_mle,
    categorical_mle,
    update_binary_prior,
    update_categorical_prior,
    update_continuous_prior,
    update_mixed_prior,
)
from .core.rchq import recombination, local_reduce  # noqa: F401
from .core.rckernel import RecombinationKernel as Kernel  # noqa: F401
from .core.sampler import (  # noqa: F401
    EmpiricalSampler,
    MixtureSampler,
    RecombinationSampler,
)
from .gp.exact import (  # noqa: F401
    GPConfig,
    GPState,
    build_state,
    fit_gp,
    fit_gp_padded,
    predict,
    predict_mean,
    predictive_covariance,
)
from .gp.fbgp import (  # noqa: F401
    FBGPAcquisitionFunction,
    FitboGP,
    FullyBayesianGP,
    RBFHyperPrior,
    ScaleVanillaGP,
    quadrature_distillation,
    sampling_hypers,
)
from .gp.tanimoto import batch_tanimoto_sim, fit_tanimoto_gp  # noqa: F401
from .gp.warped import ScaleMmltGP  # noqa: F401
from .ops.kernels import tanimoto_gram  # noqa: F401
from .priors.continuous import Gaussian, TruncatedGaussian, Uniform  # noqa: F401
from .priors.dataset import DatasetPrior  # noqa: F401
from .priors.discrete import (  # noqa: F401
    BinaryPrior,
    CategoricalPrior,
    MixedBinaryPrior,
    MixedCategoricalPrior,
)
from .priors.mvn_cdf import multivariate_normal_cdf  # noqa: F401
from .priors.tmvn import TruncatedMVN  # noqa: F401
from .priors.wkde import WeightedKernelDensityEstimation  # noqa: F401
from .utils.linalg import (
    make_psd,
    remove_anomalies,
    safe_mvn_prob,
)
from .utils.prng import KeyRing
from .utils.weights import (
    check_weights,
    cleansing_weights,
    deweighted_resampling,
    weighted_resampling,
)
from .utils.sobol import sobol_engine, sobol_sample
from .ops.kmeans import kmeans, kmeans_resampling


# 2. renamed aliases ----------------------------------------------------------
from .gp.warped import PIBQ as PI_BQ  # noqa: F401  (SOBER/_pi.py:109)
from .gp.fbgp import PIFBGP as PI_FBGP  # noqa: F401  (SOBER/_pi.py:58)

#: reference update_gp / train_GP (SOBER/_gp.py:128-209): the one-call MAP
#: fit. ``optimiser`` selects the ladder rung explicitly instead of the
#: reference's try/except fallback.
update_gp = fit_gp
train_GP = fit_gp


def train_GP_with_Adam(x, y, cfg=None, **kw):
    """SOBER/_gp.py:128-155 — Adam-only fit rung."""
    return fit_gp(x, y, cfg, optimiser="adam", **kw)


def train_GP_with_BFGS(x, y, cfg=None, **kw):
    """SOBER/_gp.py:96-126 — L-BFGS fit rung (with best-iterate tracking;
    the reference's version NameErrors into Adam, SURVEY.md §2 bitrot)."""
    return fit_gp(x, y, cfg, optimiser="lbfgs", **kw)


def set_gp(x, y, cfg=None, **cfg_kwargs):
    """SOBER/_gp.py:34-70 — construct an (unfitted) GP around data. The
    functional core has no mutable model object; this returns a GPState at
    the initial hyperparameters (call ``fit_gp`` / ``update_gp`` to fit)."""
    from .gp.exact import init_params

    if cfg is None:
        cfg = GPConfig(**cfg_kwargs)
    return build_state(init_params(cfg, x.shape[1]), x, y, cfg)


def get_cov_cache(state: GPState):
    """SOBER/_gp.py:255-278 — the Woodbury covariance cache. The rebuild's
    cache IS the Cholesky factor held on GPState; returned here in the
    reference's (cache, Kxx) order."""
    return state.chol, state.kernel.gram(state.x, state.x)


#: reference TanimotoGP (SOBER/_drug_modelling.py:103-113): a fitted GP over
#: fingerprints. The constructor-equivalent is the fit itself.
TanimotoGP = fit_tanimoto_gp
#: reference TanimotoKernel.forward (SOBER/_drug_modelling.py:86-101)
TanimotoKernel = tanimoto_gram
BitKernel = tanimoto_gram
#: reference BOLFIModel (SOBER/BOLFI/_gpytorch_bolfi_model.py:341-460):
#: SingleTaskGP with learned parabolic mean -> make_bolfi_model
BOLFIModel = make_bolfi_model


def ParabolicMean(x, y):
    """SOBER/BOLFI/_gpytorch_bolfi_model.py:16-165 — the per-dimension
    quadratic mean, seeded by a least-squares parabolic fit. Returns the
    fitted (a, b, c) coefficient arrays used by make_bolfi_model."""
    from .apps.bolfi import _parabolic_fit

    return _parabolic_fit(np.asarray(x), np.asarray(y))


def ker_svd_sparsify(pt, s, kernel):
    """SOBER/_rchq.py:34-39 — Nystrom spectral basis: top-``s`` eigenpairs
    of the (PSD-repaired) Gram over the Nystrom points. Returns (S, U) with
    U row-major test functions, like the reference."""
    mat = make_psd(kernel(pt, pt))
    eigvals, eigvecs = jnp.linalg.eigh(mat)
    return eigvals[-s:][::-1], eigvecs[:, -s:][:, ::-1].T


def KMeans(x, K: int = 10, Niter: int = 10):
    """SOBER/_weights.py:100-125 — Lloyd's algorithm; returns (labels,
    centroids)."""
    return kmeans(x, K, Niter)


# 3. adapter classes over the functional core ---------------------------------
class TensorManager:
    """SOBER/_utils.py:20-78 adapter: device/dtype-standardised array
    factory with QMC ``rand``. Explicit-PRNG: carries a KeyRing instead of
    torch's global seed. Arrays are float32 jax arrays (the package-level
    matmul-precision policy keeps fp32 exact where the reference used
    float64; see sober_tpu/__init__.py)."""

    def __init__(self, seed: int = 0, dtype=jnp.float32):
        self.dtype = dtype
        self.keys = KeyRing(seed)

    def standardise_tensor(self, x):
        return jnp.asarray(x, self.dtype)

    standardise_device = standardise_tensor

    def ones(self, n_samples, n_dims=None):
        shape = (n_samples,) if n_dims is None else (n_samples, n_dims)
        return jnp.ones(shape, self.dtype)

    def zeros(self, n_samples, n_dims=None):
        shape = (n_samples,) if n_dims is None else (n_samples, n_dims)
        return jnp.zeros(shape, self.dtype)

    def rand(self, n_dims, n_samples, qmc: bool = True):
        if qmc:
            seed = int(jax.random.bits(self.keys.next(), dtype=jnp.uint32))
            state = sobol_engine(n_dims, seed)
            return sobol_sample(state, 0, n_samples).astype(self.dtype)
        return jax.random.uniform(self.keys.next(), (n_samples, n_dims),
                                  self.dtype)

    def arange(self, length):
        return jnp.arange(length)

    def null(self):
        return jnp.zeros((0,), self.dtype)

    def tensor(self, x):
        return jnp.asarray(x, self.dtype)

    def randperm(self, length):
        return jax.random.permutation(self.keys.next(), length)

    def multinomial(self, weights, n):
        return weighted_resampling(self.keys.next(), jnp.asarray(weights), n)

    def numpy(self, x):
        return np.asarray(x)

    def is_cuda(self):
        return jax.default_backend() == "tpu"


class SafeTensorOperator(TensorManager):
    """SOBER/_utils.py:81-194 adapter: anomaly scrubbing, PSD repair,
    chunk-safe batched MVN pdf."""

    def remove_anomalies(self, y):
        return remove_anomalies(jnp.asarray(y))

    def is_psd(self, mat):
        L = jnp.linalg.cholesky(jnp.asarray(mat))
        return bool(jnp.all(jnp.isfinite(L)))

    def make_cov_psd(self, mat):
        return make_psd(jnp.asarray(mat))

    def safe_mvn_prob(self, mean, cov, x):
        return safe_mvn_prob(jnp.asarray(mean), jnp.asarray(cov),
                             jnp.asarray(x))


class Utils(SafeTensorOperator):
    """SOBER/_utils.py:197-199 — alias of SafeTensorOperator."""


class WeightsStabiliser(TensorManager):
    """SOBER/_weights.py:4-97 adapter over the functional weights engine."""

    def __init__(self, eps: float | None = None, thresh: int = 5,
                 seed: int = 0):
        super().__init__(seed)
        self.eps = eps
        self.thresh = thresh

    def cleansing_weights(self, weights):
        return cleansing_weights(jnp.asarray(weights), eps=self.eps)

    def check_weights(self, weights):
        return bool(check_weights(jnp.asarray(weights), thresh=self.thresh))

    def weighted_resampling(self, weights, n):
        return weighted_resampling(self.keys.next(), jnp.asarray(weights), n)

    def deweighted_resampling(self, weights, n):
        return deweighted_resampling(self.keys.next(), jnp.asarray(weights),
                                     n)

    def kmeans_resampling(self, x, n_clusters: int = 100):
        return kmeans_resampling(jnp.asarray(x), n_clusters)


class BernoulliMLE:
    """SOBER/_prior_update.py:33-122 adapter. The reference runs 5x4 LBFGS
    steps on a sigmoid-transformed likelihood; the weighted Bernoulli MLE
    has the closed form p_d = sum w_i x_id / sum w_i, which the rebuild
    computes exactly (core/prior_update.py)."""

    def __init__(self, weights, x_binary):
        self.weights = jnp.asarray(weights)
        self.x = jnp.asarray(x_binary)

    def optimize(self):
        return bernoulli_mle(self.weights, self.x)

    train = optimize


class CategoricalMLE:
    """SOBER/_prior_update.py:124-229 adapter — closed-form weighted
    categorical MLE (see BernoulliMLE)."""

    def __init__(self, weights, idx, n_dims: int, c_max: int):
        self.weights = jnp.asarray(weights)
        self.idx = jnp.asarray(idx)
        self.n_dims = int(n_dims)
        self.c_max = int(c_max)

    def optimize(self):
        return categorical_mle(self.weights, self.idx, self.n_dims,
                               self.c_max)

    train = optimize


# second-tier reference names (helpers users may import directly) ------------
from .priors.base import BasePrior  # noqa: F401,E402
from .priors.mvn_cdf import mvn_box_prob  # noqa: E402
from .ops.kernels import make_kernel as _make_kernel  # noqa: E402

#: SOBER/mvnorm/Phi.py:82 — Phi(value, loc, cov) = MVN CDF
Phi = multivariate_normal_cdf
#: SOBER/mvnorm/integration.py:37 — box probabilities P(lb < X < ub)
hyperrectangle_integration = mvn_box_prob
#: SOBER/FBGP/_fully_Bayesian_gp.py:93 — per-hypersample warped MLL (ours is
#: the vmapped scalar function, not a per-theta object)
from .gp.fbgp import fitbo_mll as LogMarginalLikelihood  # noqa: E402


def lnPhi(x):
    """SOBER/_tmvn.py:426 — log of the N(0,1) upper tail, roundoff-safe
    (the reference uses scaled erfcx; log_ndtr is jax's equivalent
    tail-accurate primitive)."""
    return jax.scipy.special.log_ndtr(-jnp.asarray(x))


def lnNormalProb(a, b):
    """SOBER/_tmvn.py:402 — ln P(a < Z < b) for Z~N(0,1), accurate in both
    tails (vectorized where the reference branches on index masks)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    pa_hi, pb_hi = lnPhi(a), lnPhi(b)             # upper tails (a > 0 case)
    hi = pa_hi + jnp.log1p(-jnp.exp(pb_hi - pa_hi))
    pa_lo, pb_lo = lnPhi(-a), lnPhi(-b)           # lower tails (b < 0 case)
    lo = pb_lo + jnp.log1p(-jnp.exp(pa_lo - pb_lo))
    mid = jnp.log1p(-jnp.exp(pa_lo) - jnp.exp(pb_hi))  # straddling zero
    return jnp.where(a > 0, hi, jnp.where(b < 0, lo, mid))


def device_manager(device=None):
    """SOBER/_settings.py-style device resolution (accelerator if present)."""
    return jax.devices()[0] if device is None else device


def dtype_manager(dtype=None):
    """Default compute dtype (fp32 with highest matmul precision — the
    package policy replacing the reference's float64 default)."""
    return jnp.float32 if dtype is None else dtype


def default_postprocess_script(values):
    """SOBER/_drug_modelling.py:12 — identity postprocess hook."""
    return values


def BOLFIKernel(n_dims: int | None = None, ard: bool = False):
    """SOBER/BOLFI/_gpytorch_bolfi_model.py:167-176 — the Gamma-hyperprior
    RBF kernel spec (hyperpriors are applied at fit time via GPConfig)."""
    return _make_kernel("rbf", n_dims=n_dims, ard=ard)


def rc_kernel_svd(samp, pt, s, kernel, mu=None, calc_obj=None):
    """SOBER/_rchq.py:42-48 — Nystrom basis + measure reduction; returns
    (idx, w) like the reference."""
    return recombination(samp, pt, s, kernel, init_weights=mu,
                         calc_obj=calc_obj)


def Mod_Tchernychova_Lyons(samp, U_svd, pt_nys, kernel, tm=None, mu=None,
                           calc_obj=None, DEBUG=False):
    """SOBER/_rchq.py:51-221 — the recombination halving tree on a
    PRECOMPUTED spectral basis: reduce the weighted pool `samp` to at most
    n+1 support points matching the n test functions U_svd @ k(pt_nys, .).
    Returns (w_star, idx_star) — positive weights only, reference order.

    `tm` (the reference's TensorManager) and DEBUG are accepted and ignored;
    JAX arrays carry their own device/dtype.
    """
    samp = jnp.asarray(samp, jnp.float32)
    u = jnp.asarray(U_svd, jnp.float32)
    n_pool = samp.shape[0]
    w0 = (jnp.ones((n_pool,), jnp.float32) / n_pool if mu is None
          else jnp.asarray(mu, jnp.float32))
    phi = u @ kernel(jnp.asarray(pt_nys, jnp.float32), samp)
    obj = None if calc_obj is None else -jnp.asarray(calc_obj(samp),
                                                     jnp.float32)
    res = local_reduce(phi, w0, u.shape[0] + 1, obj=obj)
    w = np.asarray(res.w)
    idx = np.asarray(res.idx)
    keep = w > 0
    return jnp.asarray(w[keep]), jnp.asarray(idx[keep])


def Tchernychova_Lyons_CAR(x, mu):
    """SOBER/_rchq.py:224-270 — one Caratheodory elimination pass: reduce
    the weighted configuration (x (N, n), mu (N,)) to <= n+1 support points
    preserving the augmented moments [1 | x]^T mu. Returns the updated
    weight vector (the reference also returns its debug sums)."""
    from .core.rchq import _caratheodory

    x = jnp.asarray(x, jnp.float32)
    mu = jnp.asarray(mu, jnp.float32)
    n_pts, n_feat = x.shape
    ones = jnp.ones((n_pts, 1), x.dtype)
    x_car = jnp.concatenate([x, ones], axis=1)       # mass column included
    n_elim = max(n_pts - (n_feat + 1), 0)
    return _caratheodory(x_car, mu, n_elim, jnp.ones(n_pts, x.dtype))


__all__ = [
    # same-name
    "set_settings", "setting_parameters", "settings", "Sober", "BASQ",
    "SOBERUCB", "BoTorchLCBSC", "make_bolfi_model", "ExpectationPropagation",
    "InverseModel", "PI", "bernoulli_mle", "categorical_mle",
    "update_binary_prior", "update_categorical_prior",
    "update_continuous_prior", "update_mixed_prior", "recombination",
    "local_reduce", "Kernel", "EmpiricalSampler", "MixtureSampler",
    "RecombinationSampler", "GPConfig", "GPState", "build_state", "fit_gp",
    "fit_gp_padded", "predict", "predict_mean", "predictive_covariance",
    "FBGPAcquisitionFunction", "FitboGP", "FullyBayesianGP", "RBFHyperPrior",
    "ScaleVanillaGP", "quadrature_distillation", "sampling_hypers",
    "batch_tanimoto_sim", "fit_tanimoto_gp", "ScaleMmltGP", "tanimoto_gram",
    "Gaussian", "TruncatedGaussian", "Uniform", "DatasetPrior", "BinaryPrior",
    "CategoricalPrior", "MixedBinaryPrior", "MixedCategoricalPrior",
    "multivariate_normal_cdf", "TruncatedMVN",
    "WeightedKernelDensityEstimation", "SoberWrapper",
    # renamed
    "PI_BQ", "PI_FBGP", "update_gp", "train_GP", "train_GP_with_Adam",
    "train_GP_with_BFGS", "set_gp", "get_cov_cache", "TanimotoGP",
    "TanimotoKernel", "BitKernel", "BOLFIModel", "ParabolicMean",
    "ker_svd_sparsify", "KMeans",
    # adapters
    "TensorManager", "SafeTensorOperator", "Utils", "WeightsStabiliser",
    "BernoulliMLE", "CategoricalMLE",
    # second-tier helpers
    "BasePrior", "mvn_box_prob", "Phi", "hyperrectangle_integration",
    "LogMarginalLikelihood", "lnPhi", "lnNormalProb", "device_manager",
    "dtype_manager", "default_postprocess_script", "BOLFIKernel",
    "rc_kernel_svd", "Tchernychova_Lyons_CAR", "Mod_Tchernychova_Lyons",
]


def __getattr__(name):
    if name == "SoberWrapper":
        from .apps.wrapper import SoberWrapper

        return SoberWrapper
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
