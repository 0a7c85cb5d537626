"""SPMD mesh + sharding helpers (data-parallel first-class)."""

from .mesh import batch_sharding, make_mesh, replicated, shard_batch, shard_step
