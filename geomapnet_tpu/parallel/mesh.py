"""Device-mesh construction and data-parallel sharding for train/eval steps.

The reference is single-GPU (/root/repo/SURVEY.md §2.8: no DDP/NCCL anywhere;
the only device knob is ``$CUDA_VISIBLE_DEVICES``). The TPU-native scaling
story is SPMD over a ``jax.sharding.Mesh``:

- a 1-D ``('data',)`` mesh is the first-class strategy for these small CNNs
  (batch-sharded activations, replicated params; XLA inserts the gradient
  all-reduce over ICI — the NCCL-equivalent layer is the compiler);
- the helpers are mesh-shape-agnostic, so wider meshes (e.g. ``('data',
  'model')``) remain expressible for future model families.

``shard_step`` wraps a pure step function in ``jax.jit`` with explicit
in/out shardings: state replicated, batch split along the mesh's data axis.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_step",
    "shard_batch",
]


def make_mesh(
    devices: Sequence[jax.Device] | None = None,
    axis_names: tuple[str, ...] = ("data",),
    shape: tuple[int, ...] | None = None,
) -> Mesh:
    """Build a mesh over all (or the given) devices; 1-D data mesh by default.

    For multi-axis meshes pass ``shape`` (one extent per axis name; a single
    -1 is inferred), e.g. ``make_mesh(axis_names=("data", "model"),
    shape=(4, 2))``. Axis order follows ICI locality on real pods: the
    trailing (fastest-varying) axis groups adjacent devices, so put the
    highest-traffic axis (model/tensor) last.
    """
    if devices is None:
        devices = jax.devices()
    devs = np.asarray(devices)
    if shape is None:
        if len(axis_names) != 1:
            raise ValueError(
                f"mesh with axes {axis_names} needs an explicit shape"
            )
        shape = (-1,)
    if len(shape) != len(axis_names):
        raise ValueError(f"shape {shape} does not match axes {axis_names}")
    try:
        devs = devs.reshape(shape)
    except ValueError:
        raise ValueError(
            f"cannot arrange {devs.size} devices into a {shape} "
            f"{axis_names} mesh"
        ) from None
    return Mesh(devs, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch) dim along ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (for params / train state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place host arrays on the mesh, batch-dim sharded along ``axis``.

    Raises a clear error when the batch doesn't divide over the mesh (XLA's
    own message for this is an opaque sharding failure)."""
    sh = batch_sharding(mesh, axis)
    n = mesh.shape[axis]

    def put(x):
        if x.shape[0] % n:
            raise ValueError(
                f"batch dim {x.shape[0]} is not divisible by the "
                f"{n}-device '{axis}' mesh axis; pick a (per-host) batch "
                f"size that is a multiple of {n}"
            )
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)


def shard_step(
    step_fn: Callable,
    mesh: Mesh,
    n_batch_args: int = 2,
    n_state_args: int = 1,
    n_replicated_args: int = 0,
    donate_state: bool = True,
) -> Callable:
    """jit a step function over the mesh with data-parallel shardings.

    Argument convention: ``step_fn(state..., batch_arrays..., extras...)`` —
    the first ``n_state_args`` are replicated (and donated, so the params
    buffer is reused in place), the next ``n_batch_args`` are sharded on the
    leading dim, the remaining ``n_replicated_args`` (e.g. rng keys) are
    replicated.
    """
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    in_shardings = (
        (rep,) * n_state_args + (data,) * n_batch_args + (rep,) * n_replicated_args
    )
    return jax.jit(
        step_fn,
        in_shardings=in_shardings,
        donate_argnums=tuple(range(n_state_args)) if donate_state else (),
    )
