"""SPMD parallelism: mesh/data-parallel helpers (first-class), tensor
parallelism, spatial conv partitioning, GPipe pipelining, multi-host.

See docs/PARALLELISM.md for the design and when each regime pays."""

from .mesh import batch_sharding, make_mesh, replicated, shard_batch, shard_step
from .pipeline import pipeline_apply, stage_shapes
from .tensor import (
    head_tp_spec,
    shard_step_tp,
    spatial_image_sharding,
    tp_state_shardings,
)
from .multihost import (
    initialize_distributed,
    is_distributed,
    local_batch_size,
    make_global_batch,
)
