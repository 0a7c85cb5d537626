"""Train state pytree and jit-compiled train/eval step builders.

The reference's mutable ``Trainer`` + ``step_feedfwd``
(/root/reference/common/train.py:64-363) becomes a functional core: one
immutable :class:`TrainState` pytree and pure ``train_step`` / ``eval_step``
functions that jit (and shard, see :mod:`geomapnet_tpu.parallel`) as single
XLA programs — forward, loss (including the VO terms), backward, clip,
optimizer update and BN-stat update all fuse into one device launch per batch.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

__all__ = ["TrainState", "create_train_state", "make_train_step", "make_eval_step"]


class TrainState(struct.PyTreeNode):
    """Everything that evolves during training, as one pytree.

    ``params`` = ``{"model": flax params, "criterion": loss weights}`` —
    the criterion weights ride in the same tree so "learn beta/gamma"
    (/root/reference/scripts/train.py:104-112) is just gradient flow.
    """

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(
    model,
    criterion,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    sample_input: jnp.ndarray,
) -> TrainState:
    """Initialize model + criterion params and optimizer state."""
    variables = model.init(rng, sample_input, train=False)
    params = {
        "model": variables["params"],
        "criterion": criterion.init_params(),
    }
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def make_train_step(
    model, criterion, tx: optax.GradientTransformation
) -> Callable:
    """Build the pure train step: (state, images, targets, rng) -> (state, loss).

    Equivalent of ``step_feedfwd(train=True)``
    (/root/reference/common/train.py:322-363) — but traced once and compiled.
    """

    def train_step(state: TrainState, images, targets, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params["model"], "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            loss = criterion(params["criterion"], out, targets)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1,
                params=params,
                batch_stats=new_stats,
                opt_state=opt_state,
            ),
            loss,
        )

    return train_step


def make_eval_step(model, criterion=None) -> Callable:
    """Build the pure eval step: (state, images, targets) -> (loss, outputs).

    Equivalent of ``step_feedfwd(train=False)``
    (/root/reference/common/train.py:322-363). With ``criterion=None`` it is
    pure inference and the loss is 0.
    """

    def eval_step(state: TrainState, images, targets=None):
        out = model.apply(
            {"params": state.params["model"], "batch_stats": state.batch_stats},
            images,
            train=False,
        )
        if criterion is None or targets is None:
            return jnp.zeros(()), out
        return criterion(state.params["criterion"], out, targets), out

    return eval_step
