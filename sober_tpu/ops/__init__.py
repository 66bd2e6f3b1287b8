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

from .pallas_kernels import tanimoto_gram_pallas, rbf_gram_pallas  # noqa: E402

__all__ += ["tanimoto_gram_pallas", "rbf_gram_pallas"]
