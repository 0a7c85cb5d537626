"""Optimizer factory (optax) matching the reference's torch.optim semantics.

Reference parity: /root/reference/common/optimizer.py. Differences in update
rules between torch and optax are reconciled explicitly:

- weight decay is *coupled* (added to the gradient before the moment
  estimates), as torch SGD/Adam/RMSprop do — so ``add_decayed_weights`` runs
  before the scaling transform, not after;
- the multi-step SGD decay (``adjust_lr`` per epoch,
  /root/reference/common/optimizer.py:28-43) becomes a step-indexed optax
  schedule built from ``steps_per_epoch``;
- torch clips gradients of the *model* parameters only, not the criterion's
  learnable loss weights (/root/reference/common/train.py:357-358) — the clip
  transform is masked accordingly;
- criterion weights that are not learnable get zero gradients via
  ``stop_gradient`` in the loss; they are additionally masked out of weight
  decay (torch never hands them to the optimizer at all in that case).

The params pytree convention throughout the framework is
``{"model": <flax params>, "criterion": {"sax": ..., ...}}``.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import optax

__all__ = ["make_lr_schedule", "make_optimizer"]


def make_lr_schedule(
    method: str,
    base_lr: float,
    steps_per_epoch: int,
    lr_decay: float | None = None,
    lr_stepvalues: Sequence[int] | None = None,
) -> Callable[[int], float]:
    """Learning-rate schedule over optimizer steps.

    Only SGD decays (multi-step, per-epoch boundaries); adam/rmsprop hold the
    base lr constant, matching ``Optimizer.adjust_lr``
    (/root/reference/common/optimizer.py:28-43).
    """
    if method != "sgd" or not lr_stepvalues or not lr_decay:
        return optax.constant_schedule(base_lr)
    boundaries = {
        int(e) * steps_per_epoch: lr_decay for e in sorted(lr_stepvalues)
    }
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def _model_only_mask(params: Any) -> Any:
    return {
        "model": jax.tree.map(lambda _: True, params["model"]),
        "criterion": jax.tree.map(lambda _: False, params["criterion"]),
    }


def make_optimizer(
    method: str,
    base_lr: float,
    weight_decay: float = 0.0,
    steps_per_epoch: int = 1,
    max_grad_norm: float = 0.0,
    momentum: float = 0.0,
    lr_decay: float | None = None,
    lr_stepvalues: Sequence[int] | None = None,
    decay_criterion_params: bool = True,
    return_schedule: bool = False,
    **unused,
) -> optax.GradientTransformation:
    """Build the optax chain for ``{"model", "criterion"}`` param trees.

    :param method: 'sgd' | 'adam' | 'rmsprop'
    :param decay_criterion_params: apply weight decay to the learnable loss
        weights (torch does when they are in the param list,
        /root/reference/scripts/train.py:104-112)
    :param return_schedule: also return the lr schedule *actually inside the
        chain* as ``(tx, schedule)`` — the single source of truth for lr
        logging (a separately-built schedule can silently drift from what
        the optimizer applies)
    """
    schedule = make_lr_schedule(
        method, base_lr, steps_per_epoch, lr_decay, lr_stepvalues
    )

    chain = []
    if max_grad_norm and max_grad_norm > 0:
        chain.append(
            optax.masked(optax.clip_by_global_norm(max_grad_norm), _model_only_mask)
        )
    if weight_decay:
        if decay_criterion_params:
            chain.append(optax.add_decayed_weights(weight_decay))
        else:
            chain.append(
                optax.masked(
                    optax.add_decayed_weights(weight_decay), _model_only_mask
                )
            )

    if method == "sgd":
        if momentum:
            chain.append(optax.trace(decay=momentum, nesterov=False))
    elif method == "adam":
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    elif method == "rmsprop":
        chain.append(optax.scale_by_rms(decay=0.99, eps=1e-8))
    else:
        raise ValueError(f"unknown optimizer method: {method}")

    chain.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*chain)
    return (tx, schedule) if return_schedule else tx
