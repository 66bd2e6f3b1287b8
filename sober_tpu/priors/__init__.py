from .base import BasePrior
from .continuous import Uniform, Gaussian, TruncatedGaussian
from .discrete import (
    BinaryPrior,
    CategoricalPrior,
    MixedBinaryPrior,
    MixedCategoricalPrior,
)
from .dataset import DatasetPrior
from .wkde import WeightedKernelDensityEstimation

__all__ = [
    "BasePrior",
    "Uniform",
    "Gaussian",
    "TruncatedGaussian",
    "BinaryPrior",
    "CategoricalPrior",
    "MixedBinaryPrior",
    "MixedCategoricalPrior",
    "DatasetPrior",
    "WeightedKernelDensityEstimation",
]
