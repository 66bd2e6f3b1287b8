from .mesh import make_mesh, shard_candidates, replicate
from .sharded import (
    sharded_pi_weights,
    sharded_nystrom_features,
    sharded_barycenter_sums,
    sharded_recombination,
    sharded_acquisition,
    sharded_fbgp_batch_predict,
)

__all__ = [
    "make_mesh",
    "shard_candidates",
    "replicate",
    "sharded_pi_weights",
    "sharded_nystrom_features",
    "sharded_barycenter_sums",
    "sharded_recombination",
    "sharded_acquisition",
    "sharded_fbgp_batch_predict",
]
