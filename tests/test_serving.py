"""jax.export serving artifacts: roundtrip, batch polymorphism, fused preprocess."""

import numpy as np
import jax
import jax.numpy as jnp

from geomapnet_tpu.losses import MapNetCriterion
from geomapnet_tpu.models import MapNet, PoseNet, resnet18
from geomapnet_tpu.serving import export_inference, load_inference
from geomapnet_tpu.train import create_train_state, make_optimizer


def _trained_state():
    model = MapNet(posenet=PoseNet(
        feature_extractor=resnet18(), feat_dim=32, droprate=0.0))
    criterion = MapNetCriterion()
    tx = make_optimizer("adam", 1e-3)
    x = jnp.zeros((1, 3, 32, 32, 3))
    state = create_train_state(model, criterion, tx, jax.random.PRNGKey(0), x)
    return model, state


def test_export_roundtrip_matches_flax(tmp_path):
    model, state = _trained_state()
    blob = export_inference(model, state, frame_shape=(3, 32, 32, 3),
                            dtype=jnp.float32)
    path = tmp_path / "mapnet.shlo"
    path.write_bytes(blob)
    infer = load_inference(path)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32, 3))
    ref = model.apply(
        {"params": state.params["model"], "batch_stats": state.batch_stats},
        x, train=False,
    )
    got = infer(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_batch_polymorphism():
    model, state = _trained_state()
    blob = export_inference(model, state, frame_shape=(3, 32, 32, 3),
                            dtype=jnp.float32)
    infer = load_inference(blob)
    for b in (1, 3, 5):
        out = infer(jnp.zeros((b, 3, 32, 32, 3)))
        assert out.shape == (b, 3, 6)


def test_export_with_fused_preprocess():
    from geomapnet_tpu.ops.image import normalize as device_normalize

    model, state = _trained_state()
    mean, std = (0.5,) * 3, (0.25,) * 3

    blob = export_inference(
        model, state, frame_shape=(3, 32, 32, 3), dtype=jnp.uint8,
        preprocess=lambda x: device_normalize(x, mean, std),
    )
    infer = load_inference(blob)
    u8 = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (2, 3, 32, 32, 3)).astype(np.uint8))
    ref = model.apply(
        {"params": state.params["model"], "batch_stats": state.batch_stats},
        device_normalize(u8, mean, std), train=False,
    )
    np.testing.assert_allclose(np.asarray(infer(u8)), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


def test_quantized_export_roundtrip(tmp_path):
    """int8-PTQ artifact: exports, loads, and tracks the float artifact."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from geomapnet_tpu.losses import PoseNetCriterion
    from geomapnet_tpu.models import PoseNet, resnet18
    from geomapnet_tpu.serving import export_inference, load_inference
    from geomapnet_tpu.train import create_train_state, make_optimizer

    model = PoseNet(feature_extractor=resnet18(), feat_dim=32, droprate=0.0)
    state = create_train_state(
        model, PoseNetCriterion(), make_optimizer("adam", 1e-4),
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 48, 3)),
    )
    fblob = export_inference(model, state, (32, 48, 3), dtype=jnp.float32)
    qblob = export_inference(model, state, (32, 48, 3), dtype=jnp.float32,
                             quantize=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 48, 3))
    ref = np.asarray(load_inference(fblob)(x))
    got = np.asarray(load_inference(qblob)(x))
    assert got.shape == ref.shape == (3, 6)
    assert np.abs(got - ref).max() / (np.abs(ref).mean() + 1e-9) < 0.1


def test_fused_requant_export_matches_in_process(tmp_path):
    """The headline serving config (int8 + calibrated scales + fused
    requant) exports, and the artifact reproduces the in-process fused
    forward exactly (same qtree, same arithmetic, weights baked in)."""
    from geomapnet_tpu.models.quant import (
        calibrate_activation_scales,
        mapnet_apply_int8,
        quantize_posenet_variables,
    )

    model, state = _trained_state()
    calib = [np.asarray(jax.random.normal(
        jax.random.PRNGKey(9), (2, 3, 32, 32, 3)))]
    blob = export_inference(
        model, state, frame_shape=(3, 32, 32, 3), dtype=jnp.float32,
        quantize=True, calib_data=calib, quantize_heads=True,
        fuse_requant=True,
    )
    path = tmp_path / "mapnet_int8_fused.shlo"
    path.write_bytes(blob)
    infer = load_inference(path)

    qtree = quantize_posenet_variables(
        {"params": state.params["model"], "batch_stats": state.batch_stats},
        stage_sizes=(2, 2, 2, 2), quantize_heads=True,
    )
    qtree = calibrate_activation_scales(qtree, calib)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32, 3))
    # jitted reference: production always runs the fused forward under jit,
    # and eager bf16 rounds per-op where XLA's fusions keep wider precision
    ref = np.asarray(jax.jit(
        lambda xx: mapnet_apply_int8(qtree, xx, fused=True))(x))
    got = np.asarray(infer(x))
    assert got.shape == (2, 3, 6)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_fused_requant_export_error_contract():
    """fuse_requant demands quantize + calib_data (same contract as the
    eval CLI's --fuse_requant), and a fusable (basic-block) trunk."""
    import pytest

    model, state = _trained_state()
    with pytest.raises(ValueError, match="calib_data"):
        export_inference(model, state, (3, 32, 32, 3), quantize=True,
                         fuse_requant=True)
    with pytest.raises(ValueError, match="calib_data"):
        export_inference(model, state, (3, 32, 32, 3), fold_bn=True,
                         fuse_requant=True)
