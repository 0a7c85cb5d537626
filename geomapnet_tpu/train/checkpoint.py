"""Checkpointing: orbax save/restore of the full TrainState + epoch.

Reference parity: ``Trainer.save_checkpoint`` / restore
(/root/reference/common/train.py:161-204) saved
``{epoch, model_state_dict, optim_state_dict, criterion_state_dict}`` as
``epoch_{:03d}.pth.tar``; here the whole :class:`TrainState` pytree (model +
criterion params, BN stats, optimizer state, step) checkpoints atomically via
orbax, named ``epoch_{:03d}`` under the experiment logdir.

The reference's prefix-tolerant ``load_state_dict``
(/root/reference/common/train.py:22-53) — needed because MapNet wraps PoseNet
params under a ``mapnet.`` prefix — becomes :func:`adapt_model_params`, which
re-nests a params tree across the PoseNet <-> MapNet('posenet' submodule)
boundary. ``resume_optim=False`` restores model weights only (fresh optimizer
and epoch), matching /root/reference/scripts/train.py:41-42 semantics.
Torch-format reference checkpoints import via
:mod:`geomapnet_tpu.models.torch_import` instead.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "latest_checkpoint",
    "adapt_model_params",
]


def save_checkpoint(logdir: str | Path, epoch: int, state: Any) -> Path:
    """Write ``logdir/epoch_{epoch:03d}`` containing the TrainState + epoch.

    Multi-host: orbax's save is a collective (it runs a cross-process sync
    barrier), so EVERY process must call it. The train state is replicated,
    but before the first sharded step its leaves are host-local
    single-device arrays, which orbax refuses to serialize multi-process —
    so leaves are first re-assembled as fully-replicated global arrays.
    """
    path = Path(logdir).absolute() / f"epoch_{epoch:03d}"
    if jax.process_count() > 1:
        # the state is replicated, so process 0 alone writes a host copy;
        # the checkpointer is scoped to {0} so its internal sync barrier
        # doesn't wait on ranks that never call save, and an explicit
        # all-rank barrier afterwards keeps epochs aligned
        from jax.experimental import multihost_utils

        if jax.process_index() == 0:
            host_state = jax.tree.map(np.asarray, state)
            ckpt = ocp.StandardCheckpointer(
                multiprocessing_options=ocp.options.MultiprocessingOptions(
                    primary_host=0, active_processes={0},
                )
            )
            ckpt.save(path, {"epoch": np.asarray(epoch), "state": host_state},
                      force=True)
            ckpt.wait_until_finished()
        multihost_utils.sync_global_devices(f"save_checkpoint_{path.name}")
        return path
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, {"epoch": np.asarray(epoch), "state": state}, force=True)
    ckpt.wait_until_finished()
    return path


def latest_checkpoint(logdir: str | Path) -> Path | None:
    """Most recent ``epoch_*`` checkpoint in a logdir, or None."""
    paths = sorted(
        Path(logdir).glob("epoch_*"),
        key=lambda p: int(re.sub(r"\D", "", p.name) or -1),
    )
    return paths[-1] if paths else None


def restore_checkpoint(path: str | Path, state: Any) -> tuple[int, Any]:
    """Restore (epoch, TrainState) using ``state`` as the structure template."""
    ckpt = ocp.StandardCheckpointer()
    template = {"epoch": np.asarray(0), "state": state}
    restored = ckpt.restore(Path(path).absolute(), template)
    return int(restored["epoch"]), restored["state"]


def adapt_model_params(params: Any, target: Any) -> Any:
    """Re-nest model params across the PoseNet <-> MapNet boundary.

    MapNet's tree is ``{"posenet": <posenet tree>}``; PoseNet's is the bare
    tree. If the roots differ by exactly that wrapper, insert/strip it; if the
    structures already line up, return ``params`` unchanged; otherwise raise.
    """
    p_keys = set(params.keys())
    t_keys = set(target.keys())
    if p_keys == t_keys:
        return params
    if t_keys == {"posenet"}:
        return {"posenet": adapt_model_params(params, target["posenet"])}
    if p_keys == {"posenet"}:
        return adapt_model_params(params["posenet"], target)
    raise KeyError(
        f"cannot reconcile param trees: {sorted(p_keys)} vs {sorted(t_keys)}"
    )


def load_model_params(path: str | Path, state: Any) -> Any:
    """Restore just the model params from a checkpoint into ``state``.

    Used for fine-tuning workflows (e.g. MapNet++ from a MapNet checkpoint,
    /root/reference/README.md:198-210): optimizer state, criterion params and
    epoch stay fresh. Handles the PoseNet <-> MapNet nesting difference.
    """
    ckpt = ocp.StandardCheckpointer()
    # restore with relaxed structure, then adapt
    raw = ckpt.restore(Path(path).absolute())
    model_params = raw["state"]["params"]["model"]
    adapted = adapt_model_params(model_params, state.params["model"])
    batch_stats = raw["state"].get("batch_stats", state.batch_stats)
    try:
        batch_stats = adapt_model_params(batch_stats, state.batch_stats)
    except (KeyError, AttributeError):
        batch_stats = state.batch_stats
    new_params = dict(state.params)
    new_params["model"] = jax.tree.map(lambda x: x, adapted)
    return state.replace(params=new_params, batch_stats=batch_stats)
