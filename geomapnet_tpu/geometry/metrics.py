"""Pose-error metrics, vectorized for both numpy (host) and jnp (device).

Reference parity: ``quaternion_angular_error`` / ``log_quaternion_angular_error``
(/root/reference/common/pose_utils.py:358-371) which operate on one pair at a
time; these accept arbitrary batch shapes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .rotations import qexp_np

__all__ = [
    "translation_error",
    "quaternion_angular_error",
    "log_quaternion_angular_error",
    "translation_error_jnp",
    "quaternion_angular_error_jnp",
]


def translation_error(t_pred: np.ndarray, t_gt: np.ndarray) -> np.ndarray:
    """Euclidean distance per pose. (..., 3) x (..., 3) -> (...)."""
    return np.linalg.norm(np.asarray(t_pred) - np.asarray(t_gt), axis=-1)


def quaternion_angular_error(q1: np.ndarray, q2: np.ndarray) -> np.ndarray:
    """Angular error in degrees between unit quaternions. (..., 4) -> (...)."""
    d = np.abs(np.sum(np.asarray(q1) * np.asarray(q2), axis=-1))
    d = np.clip(d, -1.0, 1.0)
    return 2.0 * np.degrees(np.arccos(d))


def log_quaternion_angular_error(lq1: np.ndarray, lq2: np.ndarray) -> np.ndarray:
    """Angular error in degrees between log-quaternions. (..., 3) -> (...)."""
    return quaternion_angular_error(qexp_np(lq1), qexp_np(lq2))


def translation_error_jnp(t_pred: jnp.ndarray, t_gt: jnp.ndarray) -> jnp.ndarray:
    """Device-side translation error. (..., 3) -> (...)."""
    return jnp.linalg.norm(t_pred - t_gt, axis=-1)


def quaternion_angular_error_jnp(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Device-side angular error in degrees. (..., 4) -> (...)."""
    d = jnp.abs(jnp.sum(q1 * q2, axis=-1))
    d = jnp.clip(d, -1.0, 1.0)
    return 2.0 * jnp.degrees(jnp.arccos(d))
