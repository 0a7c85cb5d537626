"""Data layer: frame datasets, tuple samplers, loaders, host transforms."""

from .tuples import TupleSampler
from .cache import CachedScene
from .device_cache import (
    make_sharded_gather,
    upload_frames,
    upload_frames_sharded,
)
from .composite import MF, MFOnline, OnlyPoses
from .loader import Loader
from .synthetic import SyntheticScene, make_split_pair
from .transforms import ImageTransform, Normalize, color_jitter, resize_shorter_side, std_from_stats
from .vo_np import vos_logq_fc_np, vos_logq_np, vos_simple_np
