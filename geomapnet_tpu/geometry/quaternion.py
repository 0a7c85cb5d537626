"""Quaternion algebra as pure jnp functions (jit/vmap/grad-safe).

All functions operate on the trailing axis, so any batch shape works:
``q`` is ``(..., 4)`` (scalar-first ``[w, x, y, z]`` Hamilton convention) and
log-quaternions are ``(..., 3)``.

Design notes (TPU-first):
- no data-dependent control flow: singularities (zero rotation, acos domain)
  are handled with clamps / ``jnp.where`` so everything traces once under jit;
- every op is elementwise over the batch, which XLA fuses into the surrounding
  loss computation — there is no reason for a custom kernel here;
- two epsilon regimes are exposed: the *clamped* maps (``qexp``/``qlog`` with
  ``eps=1e-8``, matching the reference's differentiable torch path,
  /root/reference/common/pose_utils.py:73-96) and the *exact* maps
  (``qexp_exact``/``qlog_exact``, matching the reference's numpy "safe" path,
  /root/reference/common/pose_utils.py:307-327) which are what dataset
  preprocessing and PGO use.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "vdot",
    "normalize",
    "qmult",
    "qmult_raw",
    "qinv",
    "qexp",
    "qlog",
    "qexp_exact",
    "qlog_exact",
    "rotate_vec_by_q",
    "hemisphere",
]


def vdot(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """Dot product along the trailing axis. (..., d) x (..., d) -> (...)."""
    return jnp.sum(v1 * v2, axis=-1)


def normalize(x: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """L2-normalize along the trailing axis."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return x / n


def qmult_raw(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product without re-normalization. (..., 4) x (..., 4) -> (..., 4)."""
    w1, v1 = q1[..., :1], q1[..., 1:]
    w2, v2 = q2[..., :1], q2[..., 1:]
    w = w1 * w2 - vdot(v1, v2)[..., None]
    v = w2 * v1 + w1 * v2 + jnp.cross(v1, v2)
    return jnp.concatenate([w, v], axis=-1)


def qmult(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, re-normalized to unit norm.

    Matches the reference's ``qmult`` which normalizes the product
    (/root/reference/common/pose_utils.py:44-62).
    """
    return normalize(qmult_raw(q1, q2))


def qinv(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate of a unit quaternion (its inverse). (..., 4) -> (..., 4)."""
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


def qexp(logq: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Exponential map: (..., 3) log-quaternion -> (..., 4) unit quaternion.

    Clamped formulation matching the reference's differentiable torch path
    (/root/reference/common/pose_utils.py:73-84): the norm is clamped to
    ``eps`` so the gradient at the origin is finite.
    """
    n = jnp.linalg.norm(logq, axis=-1, keepdims=True)
    n = jnp.maximum(n, eps)
    return jnp.concatenate([jnp.cos(n), jnp.sin(n) / n * logq], axis=-1)


def qlog(q: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Log map: (..., 4) unit quaternion -> (..., 3) log-quaternion.

    Clamped formulation matching the reference's differentiable torch path
    (/root/reference/common/pose_utils.py:86-96).
    """
    n = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    n = jnp.maximum(n, eps)
    angle = jnp.arccos(jnp.clip(q[..., :1], -1.0, 1.0))
    return q[..., 1:] * angle / n


def qexp_exact(logq: jnp.ndarray) -> jnp.ndarray:
    """Exponential map via the sinc form, exact at the origin.

    Matches the reference's numpy ``qexp`` (/root/reference/common/
    pose_utils.py:319-327): ``[cos(n), sinc(n/pi) * v]`` where
    ``sinc(n/pi) = sin(n)/n`` with the removable singularity filled in.
    Not differentiable-safe at exactly n=0 for grads of n — use ``qexp``
    inside losses.
    """
    n = jnp.linalg.norm(logq, axis=-1, keepdims=True)
    return jnp.concatenate([jnp.cos(n), jnp.sinc(n / jnp.pi) * logq], axis=-1)


def qlog_exact(q: jnp.ndarray) -> jnp.ndarray:
    """Log map that returns exactly zero for the identity quaternion.

    Matches the reference's numpy ``qlog`` (/root/reference/common/
    pose_utils.py:307-317): zero vector part maps to the zero log-quaternion.
    """
    v = q[..., 1:]
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    angle = jnp.arccos(jnp.clip(q[..., :1], -1.0, 1.0))
    scale = jnp.where(n > 0, angle / jnp.where(n > 0, n, 1.0), 0.0)
    return v * scale


def rotate_vec_by_q(t: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors ``t`` (..., 3) by unit quaternions ``q`` (..., 4).

    t' = t + 2*w*(v x t) + 2*v x (v x t)  — the standard expansion used by the
    reference (/root/reference/common/pose_utils.py:120-132).
    """
    w, v = q[..., :1], q[..., 1:]
    b = jnp.cross(v, t)
    c = 2.0 * jnp.cross(v, b)
    return t + 2.0 * w * b + c


def hemisphere(q: jnp.ndarray) -> jnp.ndarray:
    """Constrain quaternions to the w >= 0 hemisphere (negate when w < 0).

    The reference multiplies by ``sign(w)`` (/root/reference/common/
    pose_utils.py:347) which zeroes the quaternion when w == 0 exactly; we
    keep it unchanged in that measure-zero case instead.
    """
    return jnp.where(q[..., :1] < 0, -q, q)
