"""Multi-host (DCN) scale-out: process init + global-batch assembly.

The reference is single-process (/root/repo/SURVEY.md §2.8). Scaling a TPU
pod slice spans multiple host processes, each seeing a local subset of
devices; the SPMD program is identical on every host. Two pieces make the
data-parallel loop multi-host-clean:

- :func:`initialize_distributed` — one-call `jax.distributed` setup (no-op
  for single-process runs, driven by env vars under standard TPU launchers);
- :func:`make_global_batch` — assemble a globally-sharded `jax.Array` from
  each process's *local* loader output via
  ``jax.make_array_from_process_local_data``, so every host feeds only its
  own devices and no batch data crosses DCN.

Pair with :class:`geomapnet_tpu.data.Loader`'s ``process_index`` /
``process_count``: every process draws the same seeded permutation and takes
a disjoint strided slice, so the concatenation of local batches is exactly
the global batch.
"""

from __future__ import annotations

from typing import Any

import jax

from .mesh import batch_sharding

__all__ = [
    "initialize_distributed",
    "is_distributed",
    "make_global_batch",
    "local_batch_size",
    "assert_same_across_processes",
]

_initialized = False


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> tuple[int, int]:
    """Initialize `jax.distributed` once; returns (process_index, count).

    MUST run before any other JAX call (the XLA backend cannot be
    re-initialized) — so this queries nothing from jax before calling
    ``jax.distributed.initialize``. With no arguments it relies on the TPU
    launcher environment (the standard path on Cloud TPU pods) and degrades
    to single-process with a warning when no coordinator is configured;
    with explicit arguments a failure raises (an explicitly requested
    multi-process setup must never silently become independent runs).
    """
    global _initialized
    if _initialized:
        return jax.process_index(), jax.process_count()
    explicit = coordinator_address is not None or num_processes is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
    except Exception as e:
        if explicit:
            raise
        import warnings

        warnings.warn(
            f"jax.distributed.initialize() failed ({e!r}); continuing "
            "single-process. On a pod, call initialize_distributed() before "
            "any other JAX API use."
        )
    return jax.process_index(), jax.process_count()


def is_distributed() -> bool:
    """True when more than one host process participates."""
    return jax.process_count() > 1


def local_batch_size(global_batch: int) -> int:
    """Per-process share of a global batch: each process loads
    ``global_batch / process_count`` samples of every global batch."""
    count = jax.process_count()
    if global_batch % count:
        raise ValueError(
            f"global batch {global_batch} not divisible by process count {count}"
        )
    return global_batch // count


def assert_same_across_processes(values, name: str = "values") -> None:
    """Assert a small host array is identical on every process.

    Single-process: free. Multi-process: one ``process_allgather`` collective
    — call once per epoch, not per batch. Guards invariants the SPMD math
    silently assumes (e.g. every process pads its val tail identically:
    weighted val-loss averaging in ``Trainer.validate`` multiplies the local
    pad by ``process_count``, which skews the loss if any process disagrees).
    """
    if jax.process_count() == 1:
        return
    import numpy as np
    from jax.experimental import multihost_utils

    local = np.atleast_1d(np.asarray(values))
    gathered = multihost_utils.process_allgather(local)
    if not (gathered == gathered[0]).all():
        raise AssertionError(
            f"multi-host invariant violated: {name} differ across processes "
            f"(process 0 saw {gathered[0]!r}; full gather {gathered!r})"
        )


def make_global_batch(batch: Any, mesh: jax.sharding.Mesh, axis: str = "data") -> Any:
    """Assemble local host arrays into globally-sharded `jax.Array`s.

    Single-process: equivalent to :func:`geomapnet_tpu.parallel.shard_batch`.
    Multi-process: each process passes its local slice; the result is a
    global array whose leading dim is ``process_count * local_batch``,
    sharded over the mesh's data axis with every shard resident on the
    process that produced it.
    """
    sharding = batch_sharding(mesh, axis)

    def _to_global(x):
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(_to_global, batch)
