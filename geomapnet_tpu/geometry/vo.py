"""Visual-odometry (relative pose) sequence ops, vectorized over the T axis.

The reference builds these with Python loops over frames and list-appends
(/root/reference/common/pose_utils.py:234-304); here every variant is a single
sliced/batched jnp expression so the whole (N, T) block fuses into one XLA
computation — no per-frame dispatch.

Shapes: ``poses`` is ``(..., T, D)``; consecutive variants return
``(..., T-1, D)``, fully-connected variants ``(..., T*(T-1)//2, D)``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .se3 import relative_pose_logq

__all__ = [
    "vos_simple",
    "vos_logq",
    "vos_logq_fc",
    "pair_indices_fc",
]


def vos_simple(poses: jnp.ndarray) -> jnp.ndarray:
    """Frame-to-frame subtraction of pose vectors. (..., T, D) -> (..., T-1, D).

    ``calc_vos_simple`` in the reference (/root/reference/common/
    pose_utils.py:234-246); used by the MapNet training criterion.
    """
    return poses[..., 1:, :] - poses[..., :-1, :]


def vos_logq(poses: jnp.ndarray, exact: bool = False) -> jnp.ndarray:
    """True SE(3) relative poses between consecutive frames, in the earlier
    frame. (..., T, 6) -> (..., T-1, 6).

    ``calc_vos`` (clamped) / ``calc_vos_safe`` (exact) in the reference
    (/root/reference/common/pose_utils.py:248-288).
    """
    return relative_pose_logq(poses[..., :-1, :], poses[..., 1:, :], exact=exact)


def pair_indices_fc(T: int) -> tuple[np.ndarray, np.ndarray]:
    """Static (i, j) index arrays for all pairs i < j, in the reference's
    row-major order (0,1),(0,2),...,(1,2),... (/root/reference/common/
    pose_utils.py:290-304)."""
    i, j = np.triu_indices(T, k=1)
    return i, j


def vos_logq_fc(poses: jnp.ndarray, exact: bool = True) -> jnp.ndarray:
    """Fully-connected relative poses over all frame pairs i < j.

    (..., T, 6) -> (..., T*(T-1)//2, 6). ``calc_vos_safe_fc`` in the reference
    (/root/reference/common/pose_utils.py:290-304); used for RobotCar PGO.
    The pair set is static given T, so this stays jit-compatible.
    """
    T = poses.shape[-2]
    i, j = pair_indices_fc(T)
    return relative_pose_logq(
        jnp.take(poses, i, axis=-2), jnp.take(poses, j, axis=-2), exact=exact
    )
