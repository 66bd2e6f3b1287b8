from .exact import (
    GPConfig,
    GPParams,
    GPState,
    init_params,
    neg_mll,
    fit_params,
    build_state,
    fit_gp,
    fit_gp_padded,
    pad_observations,
    predict,
    predict_raw,
    predict_mean,
    predictive_covariance,
    posterior_max_mean,
    polish_posterior_mean,
    mean_value,
    raw_params_from_state,
)
from .warped import ScaleMmltGP, PIBQ
from .fbgp import (
    FitboGP,
    RBFHyperPrior,
    ScaleVanillaGP,
    fitbo_mll,
    sampling_hypers,
    quadrature_distillation,
    fbgp_refit,
    FullyBayesianGP,
    FBGPAcquisitionFunction,
    PIFBGP,
)
from .tanimoto import batch_tanimoto_sim, fit_tanimoto_gp
from .multitask import (
    MultiTaskGPState,
    fit_multitask_gp,
    predict_multitask,
    sample_multitask,
)

__all__ = [
    "GPConfig", "GPParams", "GPState", "init_params", "neg_mll",
    "fit_params", "build_state", "fit_gp", "fit_gp_padded", "pad_observations", "predict", "predict_raw",
    "predict_mean", "predictive_covariance", "posterior_max_mean", "polish_posterior_mean",
    "mean_value",
    "raw_params_from_state",
    "ScaleMmltGP", "PIBQ",
    "FitboGP", "RBFHyperPrior", "ScaleVanillaGP", "fitbo_mll",
    "sampling_hypers", "quadrature_distillation", "fbgp_refit", "FullyBayesianGP",
    "FBGPAcquisitionFunction", "PIFBGP",
    "batch_tanimoto_sim", "fit_tanimoto_gp",
    "MultiTaskGPState", "fit_multitask_gp", "predict_multitask",
    "sample_multitask",
]
