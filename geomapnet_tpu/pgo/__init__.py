"""Pose-graph optimization: jittable Gauss-Newton (chain + fully-connected)."""

from .pose_graph import (
    chain_pairs,
    gauss_newton_pgo,
    optimize_poses,
    optimize_poses_batch,
)
