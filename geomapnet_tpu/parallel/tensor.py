"""Tensor-parallel head sharding + spatial conv partitioning (2-D meshes).

The reference is single-GPU (/root/repo/SURVEY.md §2.8); data parallelism is
the first-class scaling strategy for these small CNNs (see :mod:`.mesh`). A
second mesh axis is still genuinely useful on TPU pods, and this module makes
it real rather than merely expressible:

- **Tensor parallelism (Megatron-style) for the PoseNet head MLP.** The head
  is ``fc_feat: trunk_dim -> feat_dim`` then two regression heads
  ``feat_dim -> 3``. ``fc_feat`` is column-parallel (output features sharded
  over the ``model`` axis, bias sharded alike), the elementwise relu/dropout
  run on the sharded activations with no communication, and the heads are
  row-parallel (input dim sharded) so XLA's SPMD partitioner inserts exactly
  one psum over the ``model`` axis at the head outputs. Nothing in the model
  code changes — the shardings are attached to the *param leaves* and GSPMD
  propagates them through the computation.
- **Spatial partitioning for the conv trunk.** Convolutions shard cleanly
  over image height: each device holds a horizontal band and XLA inserts the
  halo exchanges for the kernel overlap. This is the conv-appropriate analog
  of sequence parallelism — it scales a *single large image / small batch*
  workload where data parallelism has nothing left to split.

Both compose with the batch axis on a ``('data', 'model')`` mesh and are
validated against single-device results in ``tests/test_tensor_parallel.py``
and exercised by the driver's ``dryrun_multichip``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import batch_sharding, replicated

__all__ = [
    "head_tp_spec",
    "tp_state_shardings",
    "shard_step_tp",
    "spatial_image_sharding",
]

# Megatron column/row layout for the PoseNet head MLP, keyed by the trailing
# (module, param) path of the leaf. Rank is checked so the same rule applies
# to the params tree and to optimizer-moment trees that mirror it.
_HEAD_RULES: dict[tuple[str, str], tuple[int, P]] = {
    ("fc_feat", "kernel"): (2, P(None, "model")),   # column-parallel
    ("fc_feat", "bias"): (1, P("model")),
    ("fc_xyz", "kernel"): (2, P("model", None)),    # row-parallel
    ("fc_wpqr", "kernel"): (2, P("model", None)),
}


def _key_str(k) -> str:
    for attr in ("key", "name", "idx"):
        if hasattr(k, attr):
            return str(getattr(k, attr))
    return str(k)


def head_tp_spec(path, leaf) -> P:
    """PartitionSpec for one leaf under head tensor parallelism.

    ``path`` is a jax tree path (DictKey/GetAttrKey/SequenceKey entries);
    only its trailing ``(module, param)`` names matter, so the rule applies
    uniformly to ``params`` and to adam's ``mu``/``nu`` shadows of it.
    Everything not in the head MLP stays replicated.
    """
    names = tuple(_key_str(k) for k in path)
    rank_spec = _HEAD_RULES.get(names[-2:]) if len(names) >= 2 else None
    if rank_spec is not None:
        rank, spec = rank_spec
        if getattr(leaf, "ndim", None) == rank:
            return spec
    return P()


def tp_state_shardings(state: Any, mesh: Mesh,
                       rule: Callable = head_tp_spec) -> Any:
    """NamedSharding pytree for a TrainState under head tensor parallelism.

    Validates that the sharded head dims divide the ``model`` axis before
    handing XLA an impossible layout (its own error is an opaque sharding
    failure).
    """
    mp = mesh.shape["model"]

    def to_sharding(path, leaf):
        spec = rule(path, leaf)
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            size = np.prod([mesh.shape[a] for a in
                            (axis if isinstance(axis, tuple) else (axis,))])
            if leaf.shape[dim] % size:
                names = "/".join(_key_str(k) for k in path)
                raise ValueError(
                    f"tensor-parallel dim {dim} of {names} has size "
                    f"{leaf.shape[dim]}, not divisible by the {size}-device "
                    f"'{axis}' mesh axis (feat_dim must be a multiple of "
                    f"the model-parallel degree {mp})"
                )
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, state)


def shard_step_tp(
    step_fn: Callable,
    mesh: Mesh,
    state_sharding: Any,
    n_batch_args: int = 2,
    n_replicated_args: int = 0,
    donate_state: bool = True,
) -> Callable:
    """jit a step over a 2-D ('data', 'model') mesh.

    Same argument convention as :func:`.mesh.shard_step` but with an explicit
    (possibly tensor-parallel) sharding pytree for the single state argument.
    Batch arrays shard over 'data' only; the 'model' axis parallelism comes
    from the param shardings, propagated by GSPMD. The output state keeps the
    input layout so steps chain without resharding.
    """
    data = batch_sharding(mesh)
    rep = replicated(mesh)
    in_shardings = (
        (state_sharding,)
        + (data,) * n_batch_args
        + (rep,) * n_replicated_args
    )
    return jax.jit(
        step_fn,
        in_shardings=in_shardings,
        out_shardings=(state_sharding, rep),
        donate_argnums=(0,) if donate_state else (),
    )


def spatial_image_sharding(mesh: Mesh, ndim: int = 5,
                           h_dim: int = 2) -> NamedSharding:
    """Shard image batches over ('data' x height-over-'model').

    For ``(N, T, H, W, C)`` tuples (``ndim=5, h_dim=2``) or ``(N, H, W, C)``
    frames (``ndim=4, h_dim=1``): batch over the data axis, image height in
    bands over the model axis. XLA partitions every conv spatially and
    inserts halo exchanges for the kernel overlap — no model changes.
    """
    spec = [None] * ndim
    spec[0] = "data"
    spec[h_dim] = "model"
    return NamedSharding(mesh, P(*spec))
