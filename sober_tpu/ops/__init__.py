from .kernels import (
    Kernel,
    KERNELS,
    make_kernel,
    sqdist,
    rbf_gram,
    matern12_gram,
    matern32_gram,
    matern52_gram,
    linear_gram,
    tanimoto_gram,
)
from .kmeans import kmeans, kmeans_resampling

__all__ = [
    "Kernel",
    "KERNELS",
    "make_kernel",
    "sqdist",
    "rbf_gram",
    "matern12_gram",
    "matern32_gram",
    "matern52_gram",
    "linear_gram",
    "tanimoto_gram",
    "kmeans",
    "kmeans_resampling",
]
