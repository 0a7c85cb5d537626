"""Flax trunk + weight converter vs a REAL torch ResNet-34 forward.

tests/golden_trunk.py holds pooled features observed from the exact
torchvision graph run in torch (tools/capture_trunk_golden.py) with the
deterministic synthetic weights. This pins conv padding/stride semantics,
BatchNorm eps and running-stat use, and pooling behavior — the whole
numerical contract that importing pretrained ImageNet weights depends on.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import numpy.testing as npt

from geomapnet_tpu.models import resnet34
from geomapnet_tpu.models.torch_import import (
    convert_state_dict,
    merge_variables,
)
from geomapnet_tpu.models.torchvision_layout import (
    synthetic_resnet34_state_dict,
)

sys.path.insert(0, os.path.dirname(__file__))
from golden_trunk import TRUNK_FEATURES


def test_trunk_forward_matches_torch():
    model = resnet34(dtype=jnp.float32)
    n = 2 * 3 * 64 * 96
    x = (np.sin(np.arange(n, dtype=np.float64) * 0.31 + 0.5) * 0.8)
    x = x.reshape(2, 3, 64, 96).astype(np.float32)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x_nhwc)
    imported = convert_state_dict(
        synthetic_resnet34_state_dict(torch_tensors=False), strict=True
    )
    # drop the 'feature_extractor' scoping the converter adds for PoseNet
    imported = {
        coll: tree["feature_extractor"] for coll, tree in imported.items()
    }
    merged = merge_variables(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        imported,
    )
    feats = np.asarray(model.apply(merged, x_nhwc, train=False))
    assert feats.shape == TRUNK_FEATURES.shape == (2, 512)
    npt.assert_allclose(feats, TRUNK_FEATURES, atol=5e-5, rtol=1e-4)


@pytest.mark.slow
def test_resnet50_trunk_forward_matches_torch():
    """Bottleneck graph: Flax resnet50 + converter vs the real torch forward."""
    from geomapnet_tpu.models import resnet50
    from geomapnet_tpu.models.torchvision_layout import (
        synthetic_resnet50_state_dict,
    )
    from golden_trunk import TRUNK50_FEATURES

    model = resnet50(dtype=jnp.float32)
    n = 2 * 3 * 64 * 96
    x = (np.sin(np.arange(n, dtype=np.float64) * 0.31 + 0.5) * 0.8)
    x = x.reshape(2, 3, 64, 96).astype(np.float32)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x_nhwc)
    imported = convert_state_dict(
        synthetic_resnet50_state_dict(torch_tensors=False), strict=True
    )
    imported = {
        coll: tree["feature_extractor"] for coll, tree in imported.items()
    }
    merged = merge_variables(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        imported,
    )
    feats = np.asarray(model.apply(merged, x_nhwc, train=False))
    assert feats.shape == TRUNK50_FEATURES.shape == (2, 2048)
    npt.assert_allclose(feats, TRUNK50_FEATURES, atol=5e-5, rtol=1e-4)
