"""SE(3) poses parameterized as translation + quaternion, pure jnp.

Poses are ``(..., 7)`` = ``[t(3), q(4)]`` or ``(..., 6)`` = ``[t(3), logq(3)]``.
All ops are trailing-axis and batch-agnostic (vmap-free broadcasting).

Reference parity: /root/reference/common/pose_utils.py:134-232.
"""

from __future__ import annotations

import jax.numpy as jnp

from .quaternion import (
    qexp,
    qexp_exact,
    qinv,
    qlog,
    qlog_exact,
    qmult,
    rotate_vec_by_q,
)

__all__ = [
    "compose",
    "invert",
    "relative_pose",
    "relative_pose_logq",
    "world_relative_pose",
    "world_relative_pose_logq",
]


def compose(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Compose two poses: apply ``p2`` in the frame of ``p1``. (..., 7)."""
    t1, q1 = p1[..., :3], p1[..., 3:]
    t2, q2 = p2[..., :3], p2[..., 3:]
    q = qmult(q1, q2)
    t = t1 + rotate_vec_by_q(t2, q1)
    return jnp.concatenate([t, q], axis=-1)


def invert(p: jnp.ndarray) -> jnp.ndarray:
    """Invert a pose. (..., 7) -> (..., 7)."""
    t, q = p[..., :3], p[..., 3:]
    q_inv = qinv(q)
    t_inv = -rotate_vec_by_q(t, q_inv)
    return jnp.concatenate([t_inv, q_inv], axis=-1)


def relative_pose(p0: jnp.ndarray, p1: jnp.ndarray) -> jnp.ndarray:
    """Relative pose of ``p1`` expressed in the frame of ``p0`` (t+q form).

    ``calc_vo`` in the reference (/root/reference/common/pose_utils.py:159-165).
    """
    return compose(invert(p0), p1)


def relative_pose_logq(
    p0: jnp.ndarray, p1: jnp.ndarray, exact: bool = False
) -> jnp.ndarray:
    """Relative pose in the p0 frame, log-quaternion in and out. (..., 6).

    ``calc_vo_logq`` (clamped maps) / ``calc_vo_logq_safe`` (exact maps) in the
    reference (/root/reference/common/pose_utils.py:167-179, 219-232).
    """
    exp = qexp_exact if exact else qexp
    log = qlog_exact if exact else qlog
    q0 = exp(p0[..., 3:])
    q1 = exp(p1[..., 3:])
    vo = relative_pose(
        jnp.concatenate([p0[..., :3], q0], axis=-1),
        jnp.concatenate([p1[..., :3], q1], axis=-1),
    )
    return jnp.concatenate([vo[..., :3], log(vo[..., 3:])], axis=-1)


def world_relative_pose(p0: jnp.ndarray, p1: jnp.ndarray) -> jnp.ndarray:
    """Relative pose with the translation left in the world frame. (..., 7).

    ``calc_vo_relative`` in the reference
    (/root/reference/common/pose_utils.py:181-189).
    """
    t = p1[..., :3] - p0[..., :3]
    q = qmult(qinv(p0[..., 3:]), p1[..., 3:])
    return jnp.concatenate([t, q], axis=-1)


def world_relative_pose_logq(
    p0: jnp.ndarray, p1: jnp.ndarray, exact: bool = False
) -> jnp.ndarray:
    """World-frame relative pose, log-quaternion in and out. (..., 6).

    ``calc_vo_relative_logq(_safe)`` in the reference
    (/root/reference/common/pose_utils.py:191-217).
    """
    exp = qexp_exact if exact else qexp
    log = qlog_exact if exact else qlog
    q0 = exp(p0[..., 3:])
    q1 = exp(p1[..., 3:])
    vo = world_relative_pose(
        jnp.concatenate([p0[..., :3], q0], axis=-1),
        jnp.concatenate([p1[..., :3], q1], axis=-1),
    )
    return jnp.concatenate([vo[..., :3], log(vo[..., 3:])], axis=-1)
