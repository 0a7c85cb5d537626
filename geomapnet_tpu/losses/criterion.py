"""Uncertainty-weighted pose-regression criteria as pure jnp functions.

Reference parity: /root/reference/common/criterion.py. The learnable
homoscedastic-uncertainty weights (sax/saq "beta", srx/srq "gamma") are
ordinary leaves of the criterion-params pytree; "learnable" is expressed by
``stop_gradient`` gating rather than torch's ``requires_grad``, so the whole
loss stays a pure function of ``(criterion_params, pred, targ)`` and jits into
the train step (the VO terms fuse with the model's backward pass — nothing
runs on the host).

Each criterion is a small frozen config object with ``init_params()`` and
``__call__``; all tensor math is vectorized over (N, T).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ..geometry.vo import vos_logq, vos_simple

__all__ = [
    "l1_loss",
    "quaternion_loss",
    "PoseNetCriterion",
    "MapNetCriterion",
    "MapNetOnlineCriterion",
]


def l1_loss(pred: jnp.ndarray, targ: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error over all elements (torch nn.L1Loss default)."""
    return jnp.mean(jnp.abs(pred - targ))


def quaternion_loss(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Huynh quaternion distance ``1 - <q1, q2>^2``, averaged.

    Reference parity: QuaternionLoss (/root/reference/common/criterion.py:15-31).
    """
    return jnp.mean(1.0 - jnp.sum(q1 * q2, axis=-1) ** 2)


def _maybe_stop(x: jnp.ndarray, learn: bool) -> jnp.ndarray:
    return x if learn else jax.lax.stop_gradient(x)


def _weighted_pair(
    s_t: jnp.ndarray,
    s_q: jnp.ndarray,
    pred: jnp.ndarray,
    targ: jnp.ndarray,
    t_loss_fn: Callable,
    q_loss_fn: Callable,
    t_dims: int = 3,
) -> jnp.ndarray:
    """exp(-s_t)*L_t + s_t + exp(-s_q)*L_q + s_q over a (..., 6) pose block."""
    lt = t_loss_fn(pred[..., :t_dims], targ[..., :t_dims])
    lq = q_loss_fn(pred[..., 3:], targ[..., 3:])
    return jnp.exp(-s_t) * lt + s_t + jnp.exp(-s_q) * lq + s_q


@dataclasses.dataclass(frozen=True)
class PoseNetCriterion:
    """Single-frame absolute pose loss with learnable beta.

    Reference parity: /root/reference/common/criterion.py:33-52.
    """

    sax: float = 0.0
    saq: float = 0.0
    learn_beta: bool = False
    t_loss_fn: Callable = l1_loss
    q_loss_fn: Callable = l1_loss

    def init_params(self) -> dict:
        return {
            "sax": jnp.asarray(self.sax, jnp.float32),
            "saq": jnp.asarray(self.saq, jnp.float32),
        }

    def __call__(self, cparams: dict, pred: jnp.ndarray, targ: jnp.ndarray):
        """pred, targ: (N, 6) -> scalar loss."""
        sax = _maybe_stop(cparams["sax"], self.learn_beta)
        saq = _maybe_stop(cparams["saq"], self.learn_beta)
        return _weighted_pair(sax, saq, pred, targ, self.t_loss_fn, self.q_loss_fn)


@dataclasses.dataclass(frozen=True)
class MapNetCriterion:
    """Absolute + relative (VO) tuple loss — Eq. 2 of the MapNet paper.

    Reference parity: /root/reference/common/criterion.py:54-109. The VO term
    uses naive pose-vector subtraction (``calc_vos_simple``).
    """

    sax: float = 0.0
    saq: float = 0.0
    srx: float = 0.0
    srq: float = 0.0
    learn_beta: bool = False
    learn_gamma: bool = False
    t_loss_fn: Callable = l1_loss
    q_loss_fn: Callable = l1_loss

    def init_params(self) -> dict:
        return {
            "sax": jnp.asarray(self.sax, jnp.float32),
            "saq": jnp.asarray(self.saq, jnp.float32),
            "srx": jnp.asarray(self.srx, jnp.float32),
            "srq": jnp.asarray(self.srq, jnp.float32),
        }

    def __call__(self, cparams: dict, pred: jnp.ndarray, targ: jnp.ndarray):
        """pred, targ: (N, T, 6) -> scalar loss."""
        sax = _maybe_stop(cparams["sax"], self.learn_beta)
        saq = _maybe_stop(cparams["saq"], self.learn_beta)
        srx = _maybe_stop(cparams["srx"], self.learn_gamma)
        srq = _maybe_stop(cparams["srq"], self.learn_gamma)

        abs_loss = _weighted_pair(
            sax, saq, pred, targ, self.t_loss_fn, self.q_loss_fn
        )
        vo_loss = _weighted_pair(
            srx, srq, vos_simple(pred), vos_simple(targ),
            self.t_loss_fn, self.q_loss_fn,
        )
        return abs_loss + vo_loss


@dataclasses.dataclass(frozen=True)
class MapNetOnlineCriterion:
    """Semi-supervised MapNet++ loss — Eq. 4 of the paper.

    Reference parity: /root/reference/common/criterion.py:111-184. The batch
    packs a labeled tuple (T frames, GT absolute poses) and an unlabeled tuple
    (T frames whose targets are T-1 measured VOs, or T GPS positions in
    ``gps_mode``). The unlabeled absolute predictions are converted to
    relative poses in-graph via the SE(3) log map.
    """

    sax: float = 0.0
    saq: float = 0.0
    srx: float = 0.0
    srq: float = 0.0
    learn_beta: bool = False
    learn_gamma: bool = False
    gps_mode: bool = False
    t_loss_fn: Callable = l1_loss
    q_loss_fn: Callable = l1_loss

    def init_params(self) -> dict:
        return {
            "sax": jnp.asarray(self.sax, jnp.float32),
            "saq": jnp.asarray(self.saq, jnp.float32),
            "srx": jnp.asarray(self.srx, jnp.float32),
            "srq": jnp.asarray(self.srq, jnp.float32),
        }

    def __call__(self, cparams: dict, pred: jnp.ndarray, targ: jnp.ndarray):
        """pred: (N, 2T, 6); targ: (N, 2T-1, 6) or (N, 2T, 6) in gps_mode."""
        sax = _maybe_stop(cparams["sax"], self.learn_beta)
        saq = _maybe_stop(cparams["saq"], self.learn_beta)
        srx = _maybe_stop(cparams["srx"], self.learn_gamma)
        srq = _maybe_stop(cparams["srq"], self.learn_gamma)

        T = pred.shape[1] // 2
        pred_abs, pred_unlab = pred[:, :T], pred[:, T:]
        targ_abs, targ_vos = targ[:, :T], targ[:, T:]

        abs_loss = _weighted_pair(
            sax, saq, pred_abs, targ_abs, self.t_loss_fn, self.q_loss_fn
        )

        if self.gps_mode:
            # only x, y of the absolute unlabeled predictions vs GPS targets
            vo_loss = (
                jnp.exp(-srx)
                * self.t_loss_fn(pred_unlab[..., :2], targ_vos[..., :2])
                + srx
            )
        else:
            pred_vos = vos_logq(pred_unlab)
            vo_loss = _weighted_pair(
                srx, srq, pred_vos, targ_vos, self.t_loss_fn, self.q_loss_fn
            )
        return abs_loss + vo_loss
