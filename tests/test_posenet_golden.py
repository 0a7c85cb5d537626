"""Our PoseNet/MapNet vs the reference's actual modules, same weights.

tests/golden_posenet.py holds outputs observed from the REFERENCE
models/posenet.py (run in torch by tools/capture_posenet_golden.py) with the
deterministic synthetic PoseNet state dict. Matching here pins the head
wiring (trunk fc -> relu -> xyz/log-q heads, concat order) and the MapNet
tuple reshape, end to end through convert_state_dict.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import numpy.testing as npt

from geomapnet_tpu.models import MapNet, PoseNet, resnet34
from geomapnet_tpu.models.torch_import import (
    convert_state_dict,
    merge_variables,
)
from geomapnet_tpu.models.torchvision_layout import synthetic_posenet_state_dict

sys.path.insert(0, os.path.dirname(__file__))
from golden_posenet import FEAT_DIM, MAPNET_OUT, POSENET_OUT


def _fixed_input(shape, phase=0.5):
    n = int(np.prod(shape))
    return (np.sin(np.arange(n, dtype=np.float64) * 0.31 + phase) * 0.8
            ).reshape(shape).astype(np.float32)


def _merged_posenet_variables():
    model = PoseNet(feature_extractor=resnet34(dtype=jnp.float32),
                    feat_dim=FEAT_DIM, droprate=0.0)
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    imported = convert_state_dict(
        synthetic_posenet_state_dict(feat_dim=FEAT_DIM, torch_tensors=False),
        strict=True,
    )
    merged = merge_variables(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        imported,
    )
    return model, merged


@pytest.mark.slow
def test_posenet_matches_reference_module():
    model, merged = _merged_posenet_variables()
    x = _fixed_input((2, 3, 64, 96)).transpose(0, 2, 3, 1)  # NCHW -> NHWC
    out = np.asarray(model.apply(merged, jnp.asarray(x), train=False))
    npt.assert_allclose(out, POSENET_OUT, atol=5e-5, rtol=1e-4)


def test_mapnet_matches_reference_module():
    model, merged = _merged_posenet_variables()
    mapnet = MapNet(posenet=PoseNet(
        feature_extractor=resnet34(dtype=jnp.float32),
        feat_dim=FEAT_DIM, droprate=0.0))
    nested = {
        "params": {"posenet": merged["params"]},
        "batch_stats": {"posenet": merged["batch_stats"]},
    }
    xt = _fixed_input((1, 2, 3, 64, 96), phase=1.5)
    xt = jnp.asarray(xt.transpose(0, 1, 3, 4, 2))  # N,T,C,H,W -> N,T,H,W,C
    out = np.asarray(mapnet.apply(nested, xt, train=False))
    npt.assert_allclose(out, MAPNET_OUT, atol=5e-5, rtol=1e-4)
