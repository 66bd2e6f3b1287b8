from .synthetic import (
    ackley,
    branin_product,
    rosenbrock,
    hartmann6,
    shekel,
    setup_branin,
    setup_ackley,
    setup_hartmann,
    setup_shekel,
    setup_rosenbrock,
)
from .discrete import (
    PestControl,
    MaxSAT,
    Ising,
    setup_pest,
    setup_maxsat,
    setup_ising,
)
from .drug import (
    create_malaria_dataset,
    create_solvent_dataset,
    setup_malaria,
    setup_solvent,
)
from .ecm import CanonicalECMTwoRCs, setup_ecm_two
from .svm import SVMFeatureSelection, setup_svm

__all__ = [
    "ackley", "branin_product", "rosenbrock", "hartmann6", "shekel",
    "setup_branin", "setup_ackley", "setup_hartmann", "setup_shekel",
    "setup_rosenbrock",
    "PestControl", "MaxSAT", "Ising", "setup_pest", "setup_maxsat",
    "setup_ising",
    "create_malaria_dataset", "create_solvent_dataset", "setup_malaria",
    "setup_solvent",
    "CanonicalECMTwoRCs", "setup_ecm_two",
    "SVMFeatureSelection", "setup_svm",
]
