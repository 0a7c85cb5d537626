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
    """Initialize model + criterion params and optimizer state.

    ``model.init`` runs under one jit: eagerly it dispatches hundreds of
    tiny per-layer initializer programs (each paying a compile + device
    round trip — ~2 min of startup on a remote TPU), fused here into a
    single cached compilation.
    """
    variables = jax.jit(
        lambda r, x: model.init(r, x, train=False)
    )(rng, sample_input)
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
    model, criterion, tx: optax.GradientTransformation, preprocess=None,
    remat: bool = False, accum_steps: int = 1,
) -> Callable:
    """Build the pure train step: (state, images, targets, rng) -> (state, loss).

    Equivalent of ``step_feedfwd(train=True)``
    (/root/reference/common/train.py:322-363) — but traced once and compiled.

    :param preprocess: optional device-side image function (e.g. a
        :func:`geomapnet_tpu.ops.image.make_device_pipeline`) fused into the
        step, letting the host ship raw uint8 batches (4x less transfer than
        normalized float32).
    :param remat: rematerialize the forward in the backward pass
        (``jax.checkpoint`` around the model apply): trades recompute FLOPs
        for activation HBM, enabling batch sizes past the memory knee.
    :param accum_steps: gradient accumulation — split each batch into this
        many microbatches, run them through a ``lax.scan`` (one resident
        activation set at a time), average the grads, apply ONE optimizer
        update. Effective batch = the full array handed to the step; HBM
        high-water = one microbatch. The batch dim must divide evenly (and,
        when data-parallel, each microbatch must still divide the mesh's
        data axis). BN statistics advance per microbatch (the usual
        grad-accum semantics); losses are per-batch means, so averaged
        microbatch grads equal the full-batch grads aside from BN.
    """

    def train_step(state: TrainState, images, targets, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)

        def apply_fn(model_params, batch_stats, x, drng):
            return model.apply(
                {"params": model_params, "batch_stats": batch_stats},
                x,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": drng},
            )

        if remat:
            apply_fn = jax.checkpoint(apply_fn)

        def grads_of(params, batch_stats, imgs, tgts, drng):
            # preprocess runs here, per (micro)batch, so with accumulation
            # the full batch is only ever resident in its raw (uint8)
            # transfer form — the documented HBM contract
            if preprocess is not None:
                imgs = preprocess(imgs)

            def loss_fn(p):
                out, mutated = apply_fn(p["model"], batch_stats, imgs, drng)
                loss = criterion(p["criterion"], out, tgts)
                return loss, mutated["batch_stats"]

            return jax.value_and_grad(loss_fn, has_aux=True)(params)

        if accum_steps == 1:
            (loss, new_stats), grads = grads_of(
                state.params, state.batch_stats, images, targets,
                dropout_rng,
            )
        else:
            batch = images.shape[0]
            if batch % accum_steps:
                raise ValueError(
                    f"batch {batch} is not divisible into "
                    f"{accum_steps} accumulation microbatches"
                )
            micro = batch // accum_steps
            imgs = images.reshape((accum_steps, micro) + images.shape[1:])
            tgts = targets.reshape((accum_steps, micro) + targets.shape[1:])

            def body(carry, xs):
                stats, grad_sum, loss_sum = carry
                im, tg, k = xs
                (loss_k, stats), grads_k = grads_of(
                    state.params, stats, im, tg,
                    jax.random.fold_in(dropout_rng, k),
                )
                grad_sum = jax.tree.map(jnp.add, grad_sum, grads_k)
                return (stats, grad_sum, loss_sum + loss_k), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (new_stats, grad_sum, loss_sum), _ = jax.lax.scan(
                body,
                (state.batch_stats, zeros, jnp.zeros(())),
                (imgs, tgts, jnp.arange(accum_steps)),
            )
            grads = jax.tree.map(lambda g: g / accum_steps, grad_sum)
            loss = loss_sum / accum_steps

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


def make_eval_step(model, criterion=None, preprocess=None,
                   stochastic: bool = False,
                   fold_tuples: int | None = None) -> Callable:
    """Build the pure eval step: (state, images, targets[, rng]) -> (loss, outputs).

    Equivalent of ``step_feedfwd(train=False)``
    (/root/reference/common/train.py:322-363). With ``criterion=None`` it is
    pure inference and the loss is 0. ``preprocess`` fuses a device-side
    image pipeline ahead of the model (raw uint8 in).

    ``stochastic=True`` keeps dropout active with BN in inference mode —
    the reference's ungated ``F.dropout`` quirk (/root/reference/models/
    posenet.py:68-69), whose published eval numbers include it. The step then
    takes a required ``rng`` argument.

    ``fold_tuples=T`` (MapNet-style models only) additionally accepts
    T-FOLDED 4D batches, (B*T, H, W, C): the shared-weight PoseNet runs on
    the folded axis directly and the poses fold back to (B, T, d). The
    producer shipping folded batches spares the program the full-batch
    relayout XLA inserts to bitcast the 5D parameter (measured +2%,
    scripts/bench_input_layout.py); results are bit-identical (MapNet is
    exactly this fold, models/posenet.py:126-132). 5D batches still take the
    normal path, so one step serves both the loader and device-cache flows.

    ``fold_tuples`` and ``stochastic`` are mutually exclusive: the folded
    branch applies the posenet submodule directly, so flax folds the dropout
    rng at a different module path ('Dropout' vs 'posenet/Dropout') and the
    stochastic draws would silently differ from the 5D path.
    """
    sub = getattr(model, "posenet", None)
    if fold_tuples is not None and sub is None:
        raise ValueError("fold_tuples needs a MapNet-style model "
                         "with a .posenet submodule")
    if fold_tuples is not None and stochastic:
        raise ValueError(
            "fold_tuples is incompatible with stochastic eval: the folded "
            "apply folds the dropout rng at a different module path than "
            "the 5D path, so the draws would differ between the two")

    def eval_step(state: TrainState, images, targets=None, rng=None):
        if preprocess is not None:
            images = preprocess(images)
        kwargs = {}
        if stochastic:
            kwargs = {"stochastic": True, "rngs": {"dropout": rng}}
        if fold_tuples is not None and images.ndim == 4:
            out = sub.apply(
                {"params": state.params["model"]["posenet"],
                 "batch_stats": state.batch_stats["posenet"]},
                images,
                train=False,
                **kwargs,
            )
            out = out.reshape(-1, fold_tuples, out.shape[-1])
        else:
            out = model.apply(
                {"params": state.params["model"],
                 "batch_stats": state.batch_stats},
                images,
                train=False,
                **kwargs,
            )
        if criterion is None or targets is None:
            return jnp.zeros(()), out
        return criterion(state.params["criterion"], out, targets), out

    return eval_step
