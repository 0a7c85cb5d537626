"""GPipe-style pipeline parallelism over a 'stage' mesh axis.

Completes the parallelism matrix next to data parallelism (:mod:`.mesh`),
tensor parallelism and spatial partitioning (:mod:`.tensor`). The reference
is single-GPU (/root/repo/SURVEY.md §2.8); pipelining is how a model whose
*weights* exceed one device scales on TPU pods when pure DP cannot.

Design (idiomatic JAX SPMD, no per-device programs):

- the model is split into S stage functions; each device of the ``stage``
  mesh axis owns one stage;
- one ``shard_map`` program runs on every device, selecting its stage with
  ``lax.switch`` on ``lax.axis_index`` — heterogeneous stages under SPMD;
- a ``lax.scan`` over ``M + S - 1`` ticks implements the GPipe schedule:
  at tick ``t`` stage ``s`` processes microbatch ``t - s``, and activations
  hop to the right neighbor via ``lax.ppermute`` (one ICI hop per tick);
- stage activations have different shapes, so they travel in a fixed-size
  float32 buffer (pad to the largest stage boundary — the SPMD payload must
  be shape-uniform). Devices compute every tick; out-of-range ticks operate
  on zero/garbage buffers and their results are masked out, trading a little
  bubble compute for a collective-only, compiler-schedulable loop.

Weight memory actually shards across stages: each stage's params flatten
into one row of an ``(S, max_stage_size)`` float32 buffer placed with
``PartitionSpec('stage')`` (:func:`shard_stage_params`), so every device
holds ~1/S of the weights — and, because the packed buffer is what training
updates, grads and optimizer state shard the same way. Stages with
heterogeneous pytrees work because each device unflattens only its own row
using its stage's static metadata. ``stage_params`` (replicated operands)
remains available for small models where replication is simpler.

A ``data_axis`` composes dp x pp on a 2-D mesh: microbatches shard over the
data axis while weights shard over the stage axis; batch-grad psums over
data fall out of the shard_map transpose.

The pipeline is differentiable: pass the weights via ``stage_params`` /
``packed_params`` and ``jax.grad`` flows through the schedule (``ppermute``
transposes to the inverted permutation), with gradient equality against
sequential execution pinned in the tests. Exactness of the forward is
validated against unpipelined execution in ``tests/test_pipeline.py``,
including a real PoseNet split (trunk | head).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # moved out of experimental in newer jax
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = [
    "pipeline_apply",
    "stage_shapes",
    "pack_stage_params",
    "unpack_stage_params",
    "shard_stage_params",
    "StageParamsMeta",
]


class StageParamsMeta(NamedTuple):
    """Static metadata to unflatten one packed-buffer row per stage."""

    treedefs: tuple  # one jax treedef per stage
    leaf_specs: tuple  # per stage: tuple of (shape, dtype) in flatten order
    sizes: tuple  # per stage: flat f32 element count
    max_size: int


def pack_stage_params(stage_params: Sequence) -> tuple[jnp.ndarray, StageParamsMeta]:
    """Flatten per-stage pytrees into an (S, max_size) f32 buffer + metadata.

    Rows are zero-padded to the largest stage. The pack/unpack round-trip is
    exact for f32 and bf16 leaves (bf16 -> f32 -> bf16 is lossless), and is
    pure jnp, so autodiff flows through it.
    """
    treedefs, leaf_specs, sizes, flats = [], [], [], []
    for p in stage_params:
        leaves, treedef = jax.tree.flatten(p)
        treedefs.append(treedef)
        leaf_specs.append(tuple((tuple(l.shape), jnp.asarray(l).dtype)
                                for l in leaves))
        flat = (
            jnp.concatenate([jnp.ravel(jnp.asarray(l)).astype(jnp.float32)
                             for l in leaves])
            if leaves else jnp.zeros((0,), jnp.float32)
        )
        sizes.append(flat.size)
        flats.append(flat)
    max_size = max(1, max(sizes))
    buf = jnp.stack([jnp.pad(f, (0, max_size - f.size)) for f in flats])
    return buf, StageParamsMeta(tuple(treedefs), tuple(leaf_specs),
                                tuple(sizes), max_size)


def _unpack_row(row: jnp.ndarray, meta: StageParamsMeta, i: int):
    """Rebuild stage ``i``'s pytree from its (max_size,) buffer row."""
    leaves, off = [], 0
    for shape, dtype in meta.leaf_specs[i]:
        n = int(np.prod(shape))
        leaves.append(row[off:off + n].reshape(shape).astype(dtype))
        off += n
    return jax.tree.unflatten(meta.treedefs[i], leaves)


def unpack_stage_params(buf, meta: StageParamsMeta) -> list:
    """Inverse of :func:`pack_stage_params` (checkpointing / inspection)."""
    return [_unpack_row(buf[i], meta, i) for i in range(len(meta.sizes))]


def shard_stage_params(
    stage_params: Sequence, mesh: Mesh, axis: str = "stage",
) -> tuple[jax.Array, StageParamsMeta]:
    """Pack per-stage params and PLACE each row on its stage's devices.

    The returned buffer is a sharded ``jax.Array`` (``PartitionSpec(axis)``):
    per-device weight bytes are ``max_size * 4`` instead of the replicated
    ``sum(sizes) * 4`` — the memory-scaling half of pipeline parallelism.
    Train on the buffer directly (it is a plain array: optax/grads/momenta
    inherit the same 1/S sharding); unpack for checkpointing.
    """
    buf, meta = pack_stage_params(stage_params)
    buf = jax.device_put(buf, NamedSharding(mesh, P(axis)))
    return buf, meta


def stage_shapes(stage_fns: Sequence[Callable], x_struct):
    """Abstractly evaluate the chain: per-stage (input, output) structs."""
    shapes = []
    cur = x_struct
    for fn in stage_fns:
        out = jax.eval_shape(fn, cur)
        shapes.append((cur, out))
        cur = out
    return shapes


def pipeline_apply(
    stage_fns: Sequence[Callable],
    mesh: Mesh,
    x: jnp.ndarray,
    n_microbatches: int,
    axis: str = "stage",
    stage_params: Sequence | None = None,
    packed_params: tuple | None = None,
    params_meta: StageParamsMeta | None = None,
    data_axis: str | None = None,
) -> jnp.ndarray:
    """Apply ``stage_fns[0] ∘ ... ∘ stage_fns[-1]`` pipelined over ``axis``.

    :param stage_fns: one jax-traceable function per device of ``axis``;
        each maps a single-array activation to the next. Without
        parameters it may close over its weights (inference); to
        DIFFERENTIATE through the pipeline pass the weights via
        ``stage_params``/``packed_params`` and write stages as
        ``fn(params_i, a)`` — values captured by closure become shard_map
        constants whose cotangents are not accumulated correctly across
        devices, while explicit operands are (grad-equality vs sequential
        execution is pinned in tests/test_pipeline.py::TestPipelineTraining).
    :param x: full batch for stage 0; leading dim must divide into
        ``n_microbatches``
    :param stage_params: per-stage parameter pytrees, REPLICATED to every
        device (simple, right for small models)
    :param packed_params: the ``(S, max_size)`` buffer from
        :func:`pack_stage_params`/:func:`shard_stage_params`, sharded
        ``P(axis)`` — each device holds (and differentiates) only its own
        stage's weights; requires ``params_meta``
    :param data_axis: optional second mesh axis for dp x pp: microbatches
        shard over it (``micro`` per-device rows become ``micro/n_data``),
        weights stay per-stage
    :returns: the final stage's output for the full batch, exactly equal
        (modulo f32 buffer transport) to sequential composition
    """
    n_stages = mesh.shape[axis]
    if len(stage_fns) != n_stages:
        raise ValueError(
            f"{len(stage_fns)} stage functions for a {n_stages}-device "
            f"'{axis}' mesh axis"
        )
    if packed_params is not None and params_meta is None:
        raise ValueError("packed_params requires params_meta")
    if packed_params is not None and stage_params is not None:
        raise ValueError("pass stage_params OR packed_params, not both")
    n_micro = n_microbatches
    if x.shape[0] % n_micro:
        raise ValueError(
            f"batch {x.shape[0]} is not divisible into {n_micro} microbatches"
        )
    micro = x.shape[0] // n_micro
    if data_axis is not None and micro % mesh.shape[data_axis]:
        raise ValueError(
            f"microbatch rows {micro} not divisible by data axis "
            f"'{data_axis}' size {mesh.shape[data_axis]}"
        )
    xm = x.reshape((n_micro, micro) + x.shape[1:])

    if stage_params is not None and len(stage_params) != len(stage_fns):
        raise ValueError(
            f"{len(stage_params)} stage_params for {len(stage_fns)} stages"
        )

    def bind(i):
        if stage_params is not None:
            return lambda a: stage_fns[i](stage_params[i], a)
        if packed_params is not None:
            # shape-only binding for eval_shape: unpack from a zero row
            zero = jnp.zeros((params_meta.max_size,), jnp.float32)
            return lambda a: stage_fns[i](_unpack_row(zero, params_meta, i), a)
        return stage_fns[i]

    micro_rows = micro if data_axis is None else micro // mesh.shape[data_axis]
    shapes = stage_shapes(
        [bind(i) for i in range(n_stages)],
        jax.ShapeDtypeStruct((micro_rows,) + x.shape[1:], x.dtype),
    )
    out_struct = shapes[-1][1]
    buf_elems = max(
        int(np.prod(s.shape)) for pair in shapes for s in pair
    )

    def flatten(a):
        v = a.reshape(-1).astype(jnp.float32)
        return jnp.pad(v, (0, buf_elems - v.size))

    def unflatten(buf, struct):
        n = int(np.prod(struct.shape))
        return buf[:n].reshape(struct.shape).astype(struct.dtype)

    last = n_stages - 1
    packed = packed_params is not None

    def per_device(xm_loc, *ws):
        # Cast every operand to device-varying over the axes it does not
        # already vary on, HERE, outside all control flow. An unvarying
        # value first used inside a lax.switch branch transposes to a psum
        # INSIDE the conditional — a collective only some devices reach
        # (deadlock / garbage gradients). Casting up front puts that psum at
        # this point instead, where every device executes it.
        # (tests/test_pipeline.py::TestPipelineTraining pins grad equality.)
        # Varying status going in: xm is invarying over `axis` (and varying
        # over `data_axis` when sharded); packed params vary over `axis`
        # but not `data_axis`; replicated stage_params vary over nothing.
        pcast = getattr(jax.lax, "pcast", None)

        def vary(v, axes):
            return pcast(v, tuple(axes), to="varying") if (pcast and axes) \
                else v

        both = (axis,) + ((data_axis,) if data_axis else ())
        xm_loc = vary(xm_loc, (axis,))
        if packed:
            ws = (vary(ws[0], (data_axis,) if data_axis else ()),)
        else:
            ws = jax.tree.map(lambda v: vary(v, both), ws)

        def make_branch(i):
            in_struct = shapes[i][0]

            def run(buf):
                a = unflatten(buf, in_struct)
                if packed:
                    p_i = _unpack_row(ws[0][0], params_meta, i)
                    y = stage_fns[i](p_i, a)
                elif ws:
                    y = stage_fns[i](ws[i], a)
                else:
                    y = stage_fns[i](a)
                return flatten(y)

            return run

        branches = [make_branch(i) for i in range(n_stages)]
        s = jax.lax.axis_index(axis)
        # initial carries are constants; mark them device-varying so the
        # scan carry type matches the per-stage values they become (a no-op
        # on jax versions without varying-manual-axis tracking)
        outputs = vary(
            jnp.zeros((n_micro,) + out_struct.shape, out_struct.dtype), both
        )
        recv = vary(jnp.zeros((buf_elems,), jnp.float32), both)

        def tick(carry, t):
            recv, outputs = carry
            x_t = jax.lax.dynamic_index_in_dim(
                xm_loc, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False
            )
            my_in = jnp.where(s == 0, flatten(x_t), recv)
            out_flat = jax.lax.switch(s, branches, my_in)
            recv_next = (
                jax.lax.ppermute(
                    out_flat, axis, [(i, i + 1) for i in range(last)]
                )
                if last > 0
                else out_flat
            )
            m = jnp.clip(t - last, 0, n_micro - 1)
            valid = (s == last) & (t >= last)
            current = jax.lax.dynamic_index_in_dim(
                outputs, m, 0, keepdims=False
            )
            y = unflatten(out_flat, out_struct)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(valid, y, current), m, 0
            )
            return (recv_next, outputs), None

        (_, outputs), _ = jax.lax.scan(
            tick, (recv, outputs), jnp.arange(n_micro + last)
        )
        # the last stage holds the real outputs; everyone else contributes
        # their untouched zero buffers
        return jax.lax.psum(outputs, axis)

    if packed:
        extra = (packed_params,)
        extra_specs = (P(axis),)
    elif stage_params is not None:
        extra = tuple(stage_params)
        extra_specs = (P(),) * len(extra)
    else:
        extra, extra_specs = (), ()
    xm_spec = P(None, data_axis) if data_axis else P()
    out_spec = P(None, data_axis) if data_axis else P()
    out = shard_map(
        per_device, mesh=mesh,
        in_specs=(xm_spec,) + extra_specs, out_specs=out_spec,
    )(xm, *extra)
    return out.reshape((n_micro * micro,) + out_struct.shape[1:])
