"""SPMD parallelism: mesh/data-parallel helpers (first-class), tensor
parallelism, spatial conv partitioning, GPipe pipelining, multi-host.

See docs/PARALLELISM.md for the design and when each regime pays."""

from .mesh import batch_sharding, make_mesh, replicated, shard_batch, shard_step
from .pipeline import (
    StageParamsMeta,
    pack_stage_params,
    pipeline_apply,
    shard_stage_params,
    stage_shapes,
    unpack_stage_params,
)
from .tensor import (
    head_tp_spec,
    shard_step_tp,
    spatial_image_sharding,
    tp_state_shardings,
)
from .multihost import (
    assert_same_across_processes,
    initialize_distributed,
    is_distributed,
    local_batch_size,
    make_global_batch,
)
