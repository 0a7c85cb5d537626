"""SPMD mesh + sharding helpers (data-parallel first-class)."""

from .mesh import batch_sharding, make_mesh, replicated, shard_batch, shard_step
from .multihost import (
    initialize_distributed,
    is_distributed,
    local_batch_size,
    make_global_batch,
)
