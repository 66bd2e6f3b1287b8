"""sober-tpu: TPU-native batch Bayesian optimization / quadrature framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of ma921/SOBER
(batch BO via kernel recombination, batch Bayesian quadrature, SBI, fully
Bayesian GPs, arbitrary domains/kernels/acquisitions).

Package exports mirror SOBER/__init__.py:1-6 (setting_parameters, Sober,
SoberWrapper, TensorManager -> set_settings, Sober, SoberWrapper, utils).
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Quadrature weights, GP posteriors, and Caratheodory eliminations are
# precision-critical: TPU's default bf16 matmul passes measurably degrade
# batch selection (verified: same seed converges to the global optimum at
# fp32 but stalls in a local peak at default precision). fp32 throughput on
# the MXU is still far above the <1s/iteration target.
if _os.environ.get("SOBER_TPU_MATMUL_PRECISION", "highest") != "default":
    _jax.config.update(
        "jax_default_matmul_precision",
        _os.environ.get("SOBER_TPU_MATMUL_PRECISION", "highest"))

from .config import Settings, settings, set_settings
from .core.sober import Sober
from .utils.prng import KeyRing


def __getattr__(name):
    # lazy import: SoberWrapper pulls in the full apps stack
    if name == "SoberWrapper":
        from .apps.wrapper import SoberWrapper

        return SoberWrapper
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


# reference exports (SOBER/__init__.py:1-6): setting_parameters ->
# set_settings, TensorManager -> KeyRing/Settings
setting_parameters = set_settings

__all__ = ["Settings", "settings", "set_settings", "setting_parameters",
           "Sober", "SoberWrapper", "KeyRing", "__version__"]
