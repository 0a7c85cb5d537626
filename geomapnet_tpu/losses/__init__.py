"""Pose-regression loss functions with learnable uncertainty weights."""

from .criterion import (
    MapNetCriterion,
    MapNetOnlineCriterion,
    PoseNetCriterion,
    l1_loss,
    quaternion_loss,
)
