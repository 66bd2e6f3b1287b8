from .rchq import recombination, RecombinationResult
from .pi import PI, lfi
from .rckernel import RecombinationKernel
from .sampler import EmpiricalSampler, RecombinationSampler, MixtureSampler
from .sober import Sober
from .prior_update import (
    update_binary_prior,
    update_categorical_prior,
    update_continuous_prior,
    update_mixed_prior,
    bernoulli_mle,
    categorical_mle,
)

__all__ = [
    "recombination",
    "RecombinationResult",
    "PI",
    "lfi",
    "RecombinationKernel",
    "EmpiricalSampler",
    "RecombinationSampler",
    "MixtureSampler",
    "Sober",
    "update_binary_prior",
    "update_categorical_prior",
    "update_continuous_prior",
    "update_mixed_prior",
    "bernoulli_mle",
    "categorical_mle",
]
