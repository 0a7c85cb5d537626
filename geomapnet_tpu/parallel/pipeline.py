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

Current scope: all operands (batch and every stage's params) are
replicated to each stage device (``in_specs=P()``), so this implementation
demonstrates/overlaps the *schedule* (compute + activation hops) but does
not yet shard weight MEMORY across stages — per-stage weight placement is
the noted next step if a trunk ever outgrows one device's HBM (ROADMAP).

The pipeline is differentiable: pass the weights via ``stage_params`` and
``jax.grad`` flows through the schedule (``ppermute`` transposes to the
inverted permutation), with gradient equality against sequential execution
pinned in the tests. Exactness of the forward is validated against
unpipelined execution in ``tests/test_pipeline.py``, including a real
PoseNet split (trunk | head).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # moved out of experimental in newer jax
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ["pipeline_apply", "stage_shapes"]


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
) -> jnp.ndarray:
    """Apply ``stage_fns[0] ∘ ... ∘ stage_fns[-1]`` pipelined over ``axis``.

    :param stage_fns: one jax-traceable function per device of ``axis``;
        each maps a single-array activation to the next. Without
        ``stage_params`` it may close over its weights (inference); to
        DIFFERENTIATE through the pipeline pass the weights via
        ``stage_params`` and write stages as ``fn(params_i, a)`` — values
        captured by closure become shard_map constants whose cotangents are
        not accumulated correctly across devices, while explicit operands
        are (grad-equality vs sequential execution is pinned in
        tests/test_pipeline.py::TestPipelineTraining).
    :param x: full batch for stage 0; leading dim must divide into
        ``n_microbatches``
    :param stage_params: optional per-stage parameter pytrees, passed to
        ``stage_fns[i]`` as its first argument
    :returns: the final stage's output for the full batch, exactly equal
        (modulo f32 buffer transport) to sequential composition
    """
    n_stages = mesh.shape[axis]
    if len(stage_fns) != n_stages:
        raise ValueError(
            f"{len(stage_fns)} stage functions for a {n_stages}-device "
            f"'{axis}' mesh axis"
        )
    n_micro = n_microbatches
    if x.shape[0] % n_micro:
        raise ValueError(
            f"batch {x.shape[0]} is not divisible into {n_micro} microbatches"
        )
    micro = x.shape[0] // n_micro
    xm = x.reshape((n_micro, micro) + x.shape[1:])

    if stage_params is not None and len(stage_params) != len(stage_fns):
        raise ValueError(
            f"{len(stage_params)} stage_params for {len(stage_fns)} stages"
        )
    bound = (
        stage_fns
        if stage_params is None
        else [
            (lambda a, f=f, p=p: f(p, a))
            for f, p in zip(stage_fns, stage_params)
        ]
    )
    shapes = stage_shapes(
        bound, jax.ShapeDtypeStruct((micro,) + x.shape[1:], x.dtype)
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

    def per_device(xm_rep, *ws):
        # Cast every replicated operand to device-varying HERE, outside all
        # control flow. An unvarying value first used inside a lax.switch
        # branch transposes to a psum INSIDE the conditional — a collective
        # only some devices reach (deadlock / garbage gradients). Casting
        # up front puts that psum at this point instead, where every device
        # executes it. (tests/test_pipeline.py::TestPipelineTraining pins
        # gradient equality.)
        pcast = getattr(jax.lax, "pcast", None)
        if pcast is not None:
            xm_rep, ws = jax.tree.map(
                lambda v: pcast(v, (axis,), to="varying"), (xm_rep, ws)
            )

        def make_branch(i):
            in_struct = shapes[i][0]

            def run(buf):
                a = unflatten(buf, in_struct)
                y = stage_fns[i](ws[i], a) if ws else stage_fns[i](a)
                return flatten(y)

            return run

        branches = [make_branch(i) for i in range(n_stages)]
        s = jax.lax.axis_index(axis)
        # initial carries are constants; mark them device-varying so the
        # scan carry type matches the per-stage values they become (a no-op
        # on jax versions without varying-manual-axis tracking)
        def pvary(v):
            pcast = getattr(jax.lax, "pcast", None)
            return pcast(v, (axis,), to="varying") if pcast else v

        outputs = pvary(
            jnp.zeros((n_micro,) + out_struct.shape, out_struct.dtype)
        )
        recv = pvary(jnp.zeros((buf_elems,), jnp.float32))

        def tick(carry, t):
            recv, outputs = carry
            x_t = jax.lax.dynamic_index_in_dim(
                xm_rep, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False
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

    extra = tuple(stage_params) if stage_params is not None else ()
    out = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(),) * (1 + len(extra)), out_specs=P(),
    )(xm, *extra)
    return out.reshape((n_micro * micro,) + out_struct.shape[1:])
