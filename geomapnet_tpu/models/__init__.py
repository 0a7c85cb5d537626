"""Pose-regression models: ResNet trunk, PoseNet/MapNet heads, weight import."""

from .resnet import ResNet, resnet18, resnet34, resnet50
from .posenet import MapNet, PoseNet, nan_grad_guard, posenet_head_apply
from .torch_import import (
    convert_state_dict,
    load_npz,
    load_torch_checkpoint,
    merge_variables,
    save_npz,
)
from .vidloc import VidLoc
