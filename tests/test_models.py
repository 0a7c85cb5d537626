"""Model tests: shapes, dtypes, dropout determinism, NaN guard, torch import."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geomapnet_tpu.models import (
    MapNet,
    PoseNet,
    convert_state_dict,
    merge_variables,
    nan_grad_guard,
    resnet18,
    resnet34,
)


def tiny_posenet(**kw):
    """ResNet-18 PoseNet for fast CPU tests."""
    return PoseNet(feature_extractor=resnet18(), feat_dim=64, **kw)


@pytest.fixture(scope="module")
def posenet_setup():
    model = tiny_posenet()
    x = jnp.zeros((2, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables, x


class TestPoseNet:
    def test_output_shape(self, posenet_setup):
        model, variables, x = posenet_setup
        out = model.apply(variables, x)
        assert out.shape == (2, 6)
        assert out.dtype == jnp.float32

    def test_param_structure(self, posenet_setup):
        _, variables, _ = posenet_setup
        params = variables["params"]
        assert "feature_extractor" in params
        assert "fc_feat" in params and "fc_xyz" in params and "fc_wpqr" in params
        assert "batch_stats" in variables
        assert params["feature_extractor"]["conv1"]["kernel"].shape == (7, 7, 3, 64)

    def test_eval_deterministic(self, posenet_setup):
        model, variables, x = posenet_setup
        a = model.apply(variables, x, train=False)
        b = model.apply(variables, x, train=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_train_dropout_stochastic(self, posenet_setup):
        model, variables, _ = posenet_setup
        x = jnp.ones((2, 64, 96, 3))
        kw = dict(train=True, mutable=["batch_stats"])
        a, _ = model.apply(variables, x, rngs={"dropout": jax.random.PRNGKey(1)}, **kw)
        b, _ = model.apply(variables, x, rngs={"dropout": jax.random.PRNGKey(2)}, **kw)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_batch_stats_update(self, posenet_setup):
        model, variables, _ = posenet_setup
        x = jnp.ones((2, 64, 96, 3)) * 3.0
        _, mutated = model.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        before = variables["batch_stats"]["feature_extractor"]["bn1"]["mean"]
        after = mutated["batch_stats"]["feature_extractor"]["bn1"]["mean"]
        assert not np.allclose(np.asarray(before), np.asarray(after))

    def test_bfloat16_compute(self):
        model = PoseNet(
            feature_extractor=resnet18(dtype=jnp.bfloat16),
            feat_dim=64, dtype=jnp.bfloat16,
        )
        x = jnp.ones((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.dtype == jnp.float32  # outputs promoted back to f32
        # params stay f32 master copies
        k = variables["params"]["feature_extractor"]["conv1"]["kernel"]
        assert k.dtype == jnp.float32


class TestMapNet:
    def test_tuple_reshape(self):
        model = MapNet(posenet=tiny_posenet())
        x = jnp.zeros((2, 3, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (2, 3, 6)

    def test_shared_weights_match_posenet(self):
        """MapNet on a tuple == PoseNet on the flattened frames."""
        pn = tiny_posenet()
        mn = MapNet(posenet=pn)
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 64, 64, 3))
        variables = mn.init(jax.random.PRNGKey(0), x)
        tuple_out = np.asarray(mn.apply(variables, x))
        flat_out = np.asarray(
            pn.apply({k: v["posenet"] for k, v in variables.items()},
                     x.reshape(6, 64, 64, 3))
        )
        np.testing.assert_allclose(tuple_out.reshape(6, 6), flat_out, atol=1e-6)


class TestNanGuard:
    def test_forward_identity(self):
        x = jnp.array([1.0, 2.0])
        np.testing.assert_array_equal(np.asarray(nan_grad_guard(x)), [1, 2])

    def test_nan_cotangent_zeroed(self):
        def loss(x):
            y = nan_grad_guard(x)
            return jnp.sum(y * jnp.array([1.0, jnp.nan]))

        g = jax.grad(loss)(jnp.array([1.0, 1.0]))
        np.testing.assert_array_equal(np.asarray(g), [1.0, 0.0])


class TestTorchImport:
    def make_fake_state_dict(self, variables, prefix=""):
        """Build a torch-layout state dict matching the tiny model's shapes."""
        rng = np.random.RandomState(0)
        sd = {}
        p = variables["params"]["feature_extractor"]
        sd[prefix + "conv1.weight"] = rng.randn(64, 3, 7, 7).astype(np.float32)
        for leaf, torch_leaf in [("scale", "weight"), ("bias", "bias")]:
            sd[prefix + f"bn1.{torch_leaf}"] = rng.randn(64).astype(np.float32)
        sd[prefix + "bn1.running_mean"] = rng.randn(64).astype(np.float32)
        sd[prefix + "bn1.running_var"] = np.abs(rng.randn(64)).astype(np.float32)
        sd[prefix + "bn1.num_batches_tracked"] = np.array(10)
        # one block with downsample (layer2_0 in resnet18)
        sd[prefix + "layer2.0.downsample.0.weight"] = rng.randn(
            128, 64, 1, 1).astype(np.float32)
        sd[prefix + "layer2.0.downsample.1.weight"] = rng.randn(128).astype(np.float32)
        sd[prefix + "layer2.0.downsample.1.bias"] = rng.randn(128).astype(np.float32)
        sd[prefix + "layer2.0.downsample.1.running_mean"] = rng.randn(128).astype(np.float32)
        sd[prefix + "layer2.0.downsample.1.running_var"] = np.abs(
            rng.randn(128)).astype(np.float32)
        # replaced trunk fc -> fc_feat (feat_dim=64)
        sd[prefix + "fc.weight"] = rng.randn(64, 512).astype(np.float32)
        sd[prefix + "fc.bias"] = rng.randn(64).astype(np.float32)
        return sd

    def test_convert_and_merge(self):
        model = tiny_posenet()
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        sd = self.make_fake_state_dict(variables, prefix="feature_extractor.")
        sd["fc_xyz.weight"] = np.random.randn(3, 64).astype(np.float32)
        sd["fc_xyz.bias"] = np.zeros(3, np.float32)
        conv = convert_state_dict(sd)
        merged = merge_variables(variables, conv)

        fe = merged["params"]["feature_extractor"]
        np.testing.assert_array_equal(
            fe["conv1"]["kernel"], sd["feature_extractor.conv1.weight"].transpose(2, 3, 1, 0)
        )
        np.testing.assert_array_equal(
            fe["bn1"]["scale"], sd["feature_extractor.bn1.weight"]
        )
        np.testing.assert_array_equal(
            merged["batch_stats"]["feature_extractor"]["bn1"]["mean"],
            sd["feature_extractor.bn1.running_mean"],
        )
        np.testing.assert_array_equal(
            fe["layer2_0"]["downsample_conv"]["kernel"],
            sd["feature_extractor.layer2.0.downsample.0.weight"].transpose(2, 3, 1, 0),
        )
        np.testing.assert_array_equal(
            merged["params"]["fc_feat"]["kernel"],
            sd["feature_extractor.fc.weight"].T,
        )
        np.testing.assert_array_equal(
            merged["params"]["fc_xyz"]["kernel"], sd["fc_xyz.weight"].T
        )
        # untouched leaves keep their init values
        np.testing.assert_array_equal(
            merged["params"]["fc_wpqr"]["kernel"],
            variables["params"]["fc_wpqr"]["kernel"],
        )

    def test_mapnet_prefix_stripped(self):
        model = tiny_posenet()
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        sd = self.make_fake_state_dict(variables, prefix="mapnet.feature_extractor.")
        conv = convert_state_dict(sd)
        merged = merge_variables(variables, conv)
        np.testing.assert_array_equal(
            merged["params"]["feature_extractor"]["conv1"]["kernel"],
            sd["mapnet.feature_extractor.conv1.weight"].transpose(2, 3, 1, 0),
        )

    def test_shape_mismatch_raises(self):
        model = tiny_posenet()
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        conv = convert_state_dict({"conv1.weight": np.zeros((8, 3, 7, 7), np.float32)})
        with pytest.raises(ValueError, match="shape mismatch"):
            merge_variables(variables, conv)


class TestResNetTopology:
    def test_resnet34_param_count(self):
        """ResNet-34 trunk must match torchvision's parameter count
        (torchvision resnet34 has 21.798M params incl. the 1000-way fc
        [512*1000+1000 = 513k]; our trunk excludes that fc)."""
        model = resnet34()
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        n = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))
        assert n == 21_797_672 - 513_000


class TestVidLoc:
    """Recurrent baseline (reference models/vidloc.py, CLI-unreachable there;
    first-class here)."""

    def _model(self):
        from geomapnet_tpu.models import VidLoc

        return VidLoc(feature_extractor=resnet18(), hidden_size=16,
                      droprate=0.0)

    def test_forward_shape(self):
        model = self._model()
        x = jnp.zeros((2, 4, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (2, 4, 6)
        assert out.dtype == jnp.float32

    def test_bidirectional_uses_future_frames(self):
        """A change in the last frame must affect the first frame's pose."""
        model = self._model()
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, 4, 32, 32, 3).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        base = model.apply(variables, x)
        x2 = x.at[:, -1].add(1.0)
        out2 = model.apply(variables, x2)
        assert not np.allclose(np.asarray(base[0, 0]), np.asarray(out2[0, 0]))

    @pytest.mark.slow
    def test_trains_with_standard_step(self):
        from geomapnet_tpu.losses import PoseNetCriterion
        from geomapnet_tpu.train import (
            create_train_state,
            make_optimizer,
            make_train_step,
        )

        model = self._model()
        criterion = PoseNetCriterion()
        tx = make_optimizer("adam", 1e-3)
        x = jnp.zeros((2, 3, 32, 32, 3))
        state = create_train_state(model, criterion, tx,
                                   jax.random.PRNGKey(0), x)
        step = jax.jit(make_train_step(model, criterion, tx))
        images = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32, 3))
        targets = jnp.zeros((2, 3, 6))
        losses = []
        for _ in range(5):
            state, loss = step(state, images, targets, jax.random.PRNGKey(2))
            losses.append(float(loss))
        assert losses[-1] < losses[0]


@pytest.mark.slow
def test_resnet50_posenet_forward():
    """Bottleneck trunk plugs into PoseNet like any torchvision trunk does
    in the reference (/root/reference/models/posenet.py:36-46)."""
    import jax
    import jax.numpy as jnp

    from geomapnet_tpu.models import PoseNet, resnet50

    model = PoseNet(feature_extractor=resnet50(), feat_dim=16, droprate=0.0)
    x = jnp.zeros((2, 32, 32, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    # 4x expansion: trunk features are 2048-d
    assert variables["params"]["fc_feat"]["kernel"].shape == (2048, 16)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 6)


def test_build_model_trunk_choice():
    from geomapnet_tpu.cli.builders import build_model
    from geomapnet_tpu.cli.config import ExperimentConfig

    cfg = ExperimentConfig(dropout=0.0)
    model, is_tuple = build_model("mapnet", cfg, trunk="resnet18")
    assert is_tuple
    import pytest

    with pytest.raises(ValueError, match="unknown trunk"):
        build_model("posenet", cfg, trunk="vgg16")


class TestBnBf16Backward:
    """bn_bf16_bwd (VERDICT r4 item 6): forward must be BIT-identical to the
    default BN (same stats, same association), running statistics must
    update identically, and grads may differ only at bf16 rounding scale."""

    def _setup(self, bn_bf16_bwd):
        from geomapnet_tpu.models import resnet18

        model = resnet18(dtype=jnp.bfloat16, bn_bf16_bwd=bn_bf16_bwd)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 48, 3),
                              jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(1), x, train=True)
        return model, variables, x

    def test_forward_and_stats_bit_identical(self):
        model_a, var_a, x = self._setup(False)
        model_b, var_b, _ = self._setup(True)
        ya, sa = model_a.apply(var_a, x, train=True,
                               mutable=["batch_stats"])
        yb, sb = model_b.apply(var_b, x, train=True,
                               mutable=["batch_stats"])
        np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))
        for a, b in zip(jax.tree.leaves(sa), jax.tree.leaves(sb)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_grads_at_bf16_rounding_scale(self):
        model_a, var_a, x = self._setup(False)
        model_b, _, _ = self._setup(True)

        def loss(params, model):
            feats, _ = model.apply(
                {"params": params, "batch_stats": var_a["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(jnp.square(feats.astype(jnp.float32)))

        ga = jax.jit(jax.grad(loss), static_argnums=1)(var_a["params"],
                                                       model_a)
        gb = jax.jit(jax.grad(loss), static_argnums=1)(var_a["params"],
                                                       model_b)
        # bf16 rounding compounds through 18 chained BN backwards: a few %
        # worst-case elementwise, well under 1% on average. The training-level
        # accept/reject gate is the 200-step parity envelope (PERF.md r5),
        # not this unit bound.
        for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            a64 = np.asarray(a, np.float64)
            b64 = np.asarray(b, np.float64)
            denom = np.abs(a64).max() + 1e-12
            assert np.abs(a64 - b64).max() / denom < 8e-2
            assert np.abs(a64 - b64).mean() / denom < 2e-2
