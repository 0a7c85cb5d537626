"""Geometry core: quaternion/SE(3) algebra, VO ops, alignment, metrics.

Device math (jit/vmap-safe jnp): :mod:`quaternion`, :mod:`se3`, :mod:`vo`.
Host prep (numpy): :mod:`rotations`, :mod:`process`, :mod:`align`.
Both: :mod:`metrics`.
"""

from .quaternion import (
    hemisphere,
    normalize,
    qexp,
    qexp_exact,
    qinv,
    qlog,
    qlog_exact,
    qmult,
    qmult_raw,
    rotate_vec_by_q,
    vdot,
)
from .se3 import (
    compose,
    invert,
    relative_pose,
    relative_pose_logq,
    world_relative_pose,
    world_relative_pose_logq,
)
from .vo import pair_indices_fc, vos_logq, vos_logq_fc, vos_simple
from .rotations import (
    euler2mat,
    mat2euler,
    mat2quat,
    mat2quat_batch,
    qexp_np,
    qinv_np,
    qlog_np,
    qmult_np,
    quat2mat,
    rotate_vector_np,
)
from .process import process_poses
from .align import (
    align_2d_pts,
    align_2d_pts_noscale,
    align_3d_pts,
    align_3d_pts_noscale,
    align_camera_poses,
    align_pts,
)
from .metrics import (
    log_quaternion_angular_error,
    quaternion_angular_error,
    quaternion_angular_error_jnp,
    translation_error,
    translation_error_jnp,
)
