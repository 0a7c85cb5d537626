"""The pretrained ImageNet-trunk import path, end to end.

The reference's published accuracy depends on an ImageNet-pretrained
ResNet-34 (/root/reference/scripts/train.py:76). This environment has no
torchvision and no network, so these tests drive the REAL pipeline on a
synthetic state dict with torchvision-resnet34's exact structure
(geomapnet_tpu.models.torchvision_layout): torch state dict ->
convert_state_dict -> save_npz/load_npz -> merge_variables into PoseNet and
MapNet variable trees -> jitted forward. The committed fixture
(tests/fixtures/resnet34_torchvision_keys.json) pins the key set, shapes and
value checksums so layout drift fails loudly.
"""

import hashlib
import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from geomapnet_tpu.models import MapNet, PoseNet, resnet34
from geomapnet_tpu.models.torch_import import (
    convert_state_dict,
    load_npz,
    merge_variables,
    save_npz,
)
from geomapnet_tpu.models.torchvision_layout import (
    resnet34_state_shapes,
    synthetic_resnet34_state_dict,
    validate_trunk_state_dict,
)

FIXTURE = pathlib.Path(__file__).parent / "fixtures/resnet34_torchvision_keys.json"


@pytest.fixture(scope="module")
def torch_sd():
    return synthetic_resnet34_state_dict(torch_tensors=True)


@pytest.fixture(scope="module")
def converted(torch_sd):
    return convert_state_dict(torch_sd, strict=True)


class TestLayoutFixture:
    def test_key_set_and_shapes_match_recorded_fixture(self):
        recorded = json.loads(FIXTURE.read_text())
        shapes = resnet34_state_shapes()
        assert list(recorded) == list(shapes)  # order included
        for key, meta in recorded.items():
            assert tuple(meta["shape"]) == shapes[key], key

    def test_synthetic_values_match_recorded_checksums(self):
        recorded = json.loads(FIXTURE.read_text())
        sd = synthetic_resnet34_state_dict(torch_tensors=False)
        for key, meta in recorded.items():
            digest = hashlib.sha256(
                np.ascontiguousarray(sd[key]).tobytes()
            ).hexdigest()
            assert digest == meta["sha256"], key

    def test_validator_accepts_real_layout(self):
        sd = synthetic_resnet34_state_dict(torch_tensors=False)
        assert validate_trunk_state_dict(sd) == []

    def test_validator_reports_problems(self):
        sd = synthetic_resnet34_state_dict(torch_tensors=False)
        del sd["layer2.0.downsample.0.weight"]
        sd["layer1.0.conv1.weight"] = sd["layer1.0.conv2.weight"][:, :32]
        sd["bogus.weight"] = np.zeros(3, np.float32)
        problems = "\n".join(validate_trunk_state_dict(sd))
        assert "missing key: layer2.0.downsample.0.weight" in problems
        assert "shape mismatch at layer1.0.conv1.weight" in problems
        assert "unexpected key: bogus.weight" in problems


class TestConversion:
    def test_imagenet_fc_is_dropped(self, converted):
        assert "fc_feat" not in converted["params"]
        assert "fc_xyz" not in converted["params"]

    def test_conv1_transposed_oihw_to_hwio(self, torch_sd, converted):
        want = torch_sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
        got = converted["params"]["feature_extractor"]["conv1"]["kernel"]
        npt.assert_array_equal(got, want)

    def test_downsample_projection_mapped(self, torch_sd, converted):
        blk = converted["params"]["feature_extractor"]["layer3_0"]
        want = torch_sd["layer3.0.downsample.0.weight"].numpy().transpose(2, 3, 1, 0)
        npt.assert_array_equal(blk["downsample_conv"]["kernel"], want)
        bn = converted["batch_stats"]["feature_extractor"]["layer3_0"]["downsample_bn"]
        npt.assert_array_equal(
            bn["mean"], torch_sd["layer3.0.downsample.1.running_mean"].numpy()
        )
        npt.assert_array_equal(
            bn["var"], torch_sd["layer3.0.downsample.1.running_var"].numpy()
        )

    def test_npz_roundtrip(self, converted, tmp_path):
        path = tmp_path / "trunk.npz"
        save_npz(path, converted)
        back = load_npz(path)
        flat_a = jax.tree_util.tree_leaves(converted)
        flat_b = jax.tree_util.tree_leaves(back)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            npt.assert_array_equal(a, b)


class TestMergeAndForward:
    """--pretrained_npz semantics: trunk overlaid, heads left at init."""

    @pytest.fixture(scope="class")
    def npz_path(self, tmp_path_factory):
        sd = synthetic_resnet34_state_dict(torch_tensors=True)
        path = tmp_path_factory.mktemp("pre") / "resnet34.npz"
        save_npz(path, convert_state_dict(sd, strict=True))
        return path

    def _check_merge(self, variables, merged, inner=lambda v: v):
        p0, p1 = inner(variables["params"]), inner(merged["params"])
        # trunk conv1 replaced with the imported kernel
        sd = synthetic_resnet34_state_dict(torch_tensors=False)
        want = sd["conv1.weight"].transpose(2, 3, 1, 0)
        npt.assert_allclose(
            np.asarray(p1["feature_extractor"]["conv1"]["kernel"], np.float32),
            want, rtol=1e-6,
        )
        # heads and feat layer keep their initialization
        for head in ("fc_feat", "fc_xyz", "fc_wpqr"):
            npt.assert_array_equal(p1[head]["kernel"], p0[head]["kernel"])
        # batch stats overlaid too
        b1 = inner(merged["batch_stats"])
        npt.assert_allclose(
            np.asarray(b1["feature_extractor"]["bn1"]["mean"], np.float32),
            sd["bn1.running_mean"], rtol=1e-6,
        )

    @pytest.mark.slow
    def test_posenet_merge_and_forward(self, npz_path):
        model = PoseNet(feature_extractor=resnet34(), feat_dim=128, droprate=0.0)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        merged = merge_variables(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            load_npz(npz_path),
        )
        self._check_merge(variables, merged)
        out = model.apply(merged, x, train=False)
        assert out.shape == (1, 6) and bool(jnp.all(jnp.isfinite(out)))

    @pytest.mark.slow
    def test_mapnet_merge_and_forward(self, npz_path):
        model = MapNet(
            posenet=PoseNet(feature_extractor=resnet34(), feat_dim=128, droprate=0.0)
        )
        x = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        inner = {
            "params": variables["params"]["posenet"],
            "batch_stats": variables["batch_stats"]["posenet"],
        }
        merged_inner = merge_variables(inner, load_npz(npz_path))
        merged = {
            "params": {"posenet": merged_inner["params"]},
            "batch_stats": {"posenet": merged_inner["batch_stats"]},
        }
        self._check_merge(
            variables, merged, inner=lambda v: v["posenet"]
        )
        out = model.apply(merged, x, train=False)
        assert out.shape == (1, 2, 6) and bool(jnp.all(jnp.isfinite(out)))
