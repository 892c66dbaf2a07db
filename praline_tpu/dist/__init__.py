"""Distribution: device meshes, pair-space sharding, collectives."""

from .allpairs import sharded_wavefront_dp
from .mesh import (
    PAIR_AXIS,
    initialize_distributed,
    make_pair_mesh,
    pair_sharding,
    replicated,
)

__all__ = [
    "PAIR_AXIS",
    "initialize_distributed",
    "make_pair_mesh",
    "pair_sharding",
    "replicated",
    "sharded_wavefront_dp",
]
