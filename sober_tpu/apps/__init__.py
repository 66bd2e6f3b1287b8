from .basq import BASQ
from .bolfi import make_bolfi_model, SOBERUCB, BoTorchLCBSC
from .wrapper import SoberWrapper

__all__ = ["BASQ", "make_bolfi_model", "SOBERUCB", "BoTorchLCBSC",
           "SoberWrapper"]
