"""Device-side data ops: fused image preprocessing (resize/normalize),
Bayer demosaic, undistortion."""

from .image import (
    box_halve,
    demosaic,
    demosaic_half,
    make_device_pipeline,
    normalize,
    precompute_undistort_maps,
    resize_bilinear,
    resize_bilinear_matmul,
    resize_shorter_side_shape,
    undistort,
)
from .pallas_image import demosaic_half_normalize
