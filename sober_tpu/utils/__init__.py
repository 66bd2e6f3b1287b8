from .prng import KeyRing
from .linalg import (
    remove_anomalies,
    symmetrize,
    jitter_cholesky,
    make_psd,
    solve_psd,
    mvn_logpdf,
    safe_mvn_prob,
)
from .weights import (
    cleansing_weights,
    check_weights,
    weighted_resampling,
    deweighted_resampling,
)
from .sobol import SobolState, sobol_engine, sobol_sample

__all__ = [
    "KeyRing",
    "remove_anomalies",
    "symmetrize",
    "jitter_cholesky",
    "make_psd",
    "solve_psd",
    "mvn_logpdf",
    "safe_mvn_prob",
    "cleansing_weights",
    "check_weights",
    "weighted_resampling",
    "deweighted_resampling",
    "SobolState",
    "sobol_engine",
    "sobol_sample",
]
