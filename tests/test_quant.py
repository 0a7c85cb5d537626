"""int8 post-training quantization (models/quant.py).

Checks the BN-folding algebra, the quantized forward's fidelity to the float
model (random weights AND a trained model), and that quantization does not
meaningfully degrade pose accuracy on the synthetic scene.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geomapnet_tpu.models import MapNet, PoseNet, resnet18
from geomapnet_tpu.models.quant import (
    calibrate_activation_scales,
    fold_posenet_variables,
    mapnet_apply_folded,
    mapnet_apply_int8,
    posenet_apply_folded,
    posenet_apply_int8,
    quantize_posenet_variables,
)

STAGES = (2, 2, 2, 2)  # resnet18 keeps CPU tests fast


def _posenet(feat_dim=64):
    return PoseNet(feature_extractor=resnet18(dtype=jnp.float32),
                   feat_dim=feat_dim, droprate=0.0)


@pytest.fixture(scope="module")
def float_model():
    model = _posenet()
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    return model, {"params": v["params"], "batch_stats": v["batch_stats"]}


class TestQuantizeTree:
    def test_structure_and_dtypes(self, float_model):
        _, variables = float_model
        q = quantize_posenet_variables(variables, stage_sizes=STAGES)
        trunk = q["trunk"]
        assert trunk["conv1"]["qkernel"].dtype == np.int8
        assert trunk["conv1"]["qkernel"].shape == (7, 7, 3, 64)
        assert trunk["layer2_0"]["downsample"]["qkernel"].shape == (1, 1, 64, 128)
        assert "downsample" not in trunk["layer1_0"]
        assert set(q["heads"]) == {"fc_feat", "fc_xyz", "fc_wpqr"}

    def test_bn_folding_algebra(self, float_model):
        """dequant(qkernel) * conv + affine == BN(conv) for one 1x1 conv."""
        _, variables = float_model
        q = quantize_posenet_variables(variables, stage_sizes=STAGES)
        blk = q["trunk"]["layer2_0"]["downsample"]
        kernel = np.asarray(
            variables["params"]["feature_extractor"]["layer2_0"]
            ["downsample_conv"]["kernel"], np.float32)
        bnp = variables["params"]["feature_extractor"]["layer2_0"]["downsample_bn"]
        bns = variables["batch_stats"]["feature_extractor"]["layer2_0"]["downsample_bn"]

        x = np.random.RandomState(0).randn(2, 4, 4, 64).astype(np.float32)
        z = np.einsum("nhwi,abio->nhwo", x, kernel)  # 1x1 conv
        a = np.asarray(bnp["scale"]) / np.sqrt(np.asarray(bns["var"]) + 1e-5)
        want = a * z + (np.asarray(bnp["bias"]) - a * np.asarray(bns["mean"]))

        x_scale = np.abs(x).max() / 127.0
        qx = np.clip(np.round(x / x_scale), -127, 127)
        acc = np.einsum("nhwi,abio->nhwo", qx, blk["qkernel"].astype(np.float32))
        got = acc * (blk["m"] * x_scale) + blk["b"]
        np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


class TestForwardFidelity:
    def test_posenet_matches_float_model(self, float_model):
        model, variables = float_model
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 96, 3))
        ref = np.asarray(model.apply(variables, x, train=False))
        q = quantize_posenet_variables(variables, stage_sizes=STAGES)
        got = np.asarray(posenet_apply_int8(q, x, dtype=jnp.float32))
        assert got.shape == ref.shape == (4, 6)
        scale = np.abs(ref).mean()
        assert np.abs(got - ref).max() / scale < 0.08

    def test_mapnet_wrapper(self, float_model):
        model, variables = float_model
        mapnet = MapNet(posenet=_posenet())
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 64, 96, 3))
        mv = {"params": {"posenet": variables["params"]},
              "batch_stats": {"posenet": variables["batch_stats"]}}
        ref = np.asarray(mapnet.apply(mv, x, train=False))
        q = quantize_posenet_variables(mv, stage_sizes=STAGES)  # nested tree
        got = np.asarray(mapnet_apply_int8(q, x, dtype=jnp.float32))
        assert got.shape == (2, 3, 6)
        scale = np.abs(ref).mean()
        assert np.abs(got - ref).max() / scale < 0.08


@pytest.mark.slow
class TestAccuracyOnTrainedModel:
    def test_pose_error_degradation_small(self, tmp_path):
        """Train a tiny PoseNet on the synthetic scene, then compare float vs
        int8 median translation error — quantization must not blow it up."""
        from geomapnet_tpu.cli.config import ExperimentConfig
        from geomapnet_tpu.data import SyntheticScene
        from geomapnet_tpu.geometry import translation_error
        from geomapnet_tpu.losses import PoseNetCriterion
        from geomapnet_tpu.train.loop import Trainer

        model = _posenet()
        trainer = Trainer(
            model, PoseNetCriterion(saq=-3.0, learn_beta=True),
            ExperimentConfig(n_epochs=3, batch_size=8, do_val=False, seed=7,
                             snapshot=3, val_freq=10, print_freq=5,
                             opt="adam", lr=2e-3),
            "quant_acc", SyntheticScene(n_frames=32, height=64, width=96),
            None, logdir_root=str(tmp_path), use_mesh=False,
        )
        trainer.train_val()
        variables = {
            "params": trainer.state.params["model"],
            "batch_stats": trainer.state.batch_stats,
        }
        ds = SyntheticScene(n_frames=16, height=64, width=96, train=False)
        imgs = jnp.stack([jnp.asarray(ds.get_image(i)) for i in range(len(ds))])
        targ = np.asarray(ds.poses)

        ref = np.asarray(model.apply(variables, imgs, train=False))
        q = quantize_posenet_variables(variables, stage_sizes=STAGES)
        got = np.asarray(posenet_apply_int8(q, imgs, dtype=jnp.float32))

        err_f = np.median(translation_error(ref[:, :3], targ[:, :3]))
        err_q = np.median(translation_error(got[:, :3], targ[:, :3]))
        # int8 error within 20% (or 0.02 absolute) of the float model's
        assert err_q < max(err_f * 1.2, err_f + 0.02), (err_f, err_q)


@pytest.mark.slow
class TestEvaluateQuantized:
    def test_evaluate_with_quantize_runs_and_matches_float(self):
        from geomapnet_tpu.cli.eval import evaluate
        from geomapnet_tpu.data import MF, SyntheticScene
        from geomapnet_tpu.losses import MapNetCriterion
        from geomapnet_tpu.train import create_train_state, make_optimizer

        model = MapNet(posenet=_posenet())
        ds = MF(SyntheticScene(n_frames=16, height=64, width=96, train=False),
                steps=3, skip=1)
        tx = make_optimizer("adam", 1e-4)
        state = create_train_state(
            model, MapNetCriterion(), tx, jax.random.PRNGKey(0),
            jnp.zeros((1, 3, 64, 96, 3)),
        )
        ref = evaluate(model, state, ds, batch_size=4, progress=False)
        got = evaluate(model, state, ds, batch_size=4, progress=False,
                       quantize=True)
        # untrained nets predict near-constant poses; int8 must land close
        assert abs(got["median_t"] - ref["median_t"]) < \
            max(0.1 * abs(ref["median_t"]), 0.05)


    def test_evaluate_quantized_device_cache_scan_matches(self):
        """int8 PTQ composes with the device-cache epoch scan: the scanned
        gather launch computes what the per-batch loader launch computes."""
        from geomapnet_tpu.cli.eval import evaluate
        from geomapnet_tpu.data import MF, SyntheticScene
        from geomapnet_tpu.losses import MapNetCriterion
        from geomapnet_tpu.train import create_train_state, make_optimizer

        model = MapNet(posenet=_posenet())
        ds = MF(SyntheticScene(n_frames=16, height=64, width=96, train=False),
                steps=3, skip=1)
        tx = make_optimizer("adam", 1e-4)
        state = create_train_state(
            model, MapNetCriterion(), tx, jax.random.PRNGKey(0),
            jnp.zeros((1, 3, 64, 96, 3)),
        )
        base = evaluate(model, state, ds, batch_size=4, progress=False,
                        quantize=True, use_mesh=False)
        dc = evaluate(model, state, ds, batch_size=4, progress=False,
                      quantize=True, device_cache=True, use_mesh=False)
        # scan and per-batch are separately compiled programs; the DYNAMIC
        # activation absmax can differ by an ulp between them, which moves
        # the int8 scale one quantization level (~1% on these outputs) —
        # so the bound is quant-grid-sized, not float-noise-sized
        np.testing.assert_allclose(dc["pred_poses"], base["pred_poses"],
                                   rtol=0, atol=0.03)
        assert abs(dc["median_t"] - base["median_t"]) < 0.02


@pytest.mark.slow
class TestShardedEvaluate:
    """evaluate() runs data-parallel over the virtual 8-device mesh and
    matches the single-device result (float and int8)."""

    def _setup(self):
        from geomapnet_tpu.data import MF, SyntheticScene
        from geomapnet_tpu.losses import MapNetCriterion
        from geomapnet_tpu.train import create_train_state, make_optimizer

        model = MapNet(posenet=_posenet())
        ds = MF(SyntheticScene(n_frames=20, height=64, width=96, train=False),
                steps=3, skip=1)
        state = create_train_state(
            model, MapNetCriterion(), make_optimizer("adam", 1e-4),
            jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 96, 3)),
        )
        return model, state, ds

    @pytest.mark.parametrize("quantize", [False, True], ids=["float", "int8"])
    def test_mesh_matches_single_device(self, quantize):
        from geomapnet_tpu.cli.eval import evaluate

        model, state, ds = self._setup()
        kw = dict(batch_size=8, progress=False, quantize=quantize)
        single = evaluate(model, state, ds, use_mesh=False, **kw)
        sharded = evaluate(model, state, ds, use_mesh=True, **kw)
        np.testing.assert_allclose(
            sharded["pred_poses"], single["pred_poses"], atol=2e-4)
        assert abs(sharded["median_t"] - single["median_t"]) < 1e-3


class TestFoldedFloat:
    """BN folding without quantization (--fold_bn serving path)."""

    def test_folded_matches_float_model_tight(self, float_model):
        """Folding is exact algebra — f32 agreement is near machine eps."""
        model, variables = float_model
        x = jax.random.normal(jax.random.PRNGKey(3), (4, 64, 96, 3))
        ref = np.asarray(model.apply(variables, x, train=False))
        f = fold_posenet_variables(variables, stage_sizes=STAGES)
        got = np.asarray(posenet_apply_folded(f, x, dtype=jnp.float32))
        assert got.shape == ref.shape == (4, 6)
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)

    def test_folded_tree_is_float(self, float_model):
        _, variables = float_model
        f = fold_posenet_variables(variables, stage_sizes=STAGES)
        site = f["trunk"]["layer2_0"]["downsample"]
        assert set(site) == {"kernel", "b"}
        assert site["kernel"].dtype == np.float32

    def test_folded_mapnet_wrapper(self, float_model):
        _, variables = float_model
        mapnet = MapNet(posenet=_posenet())
        mv = {"params": {"posenet": variables["params"]},
              "batch_stats": {"posenet": variables["batch_stats"]}}
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 64, 96, 3))
        ref = np.asarray(mapnet.apply(mv, x, train=False))
        f = fold_posenet_variables(mv, stage_sizes=STAGES)
        got = np.asarray(mapnet_apply_folded(f, x, dtype=jnp.float32))
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)

    def test_evaluate_fold_bn_matches_float(self):
        from geomapnet_tpu.cli.eval import evaluate
        from geomapnet_tpu.data import MF, SyntheticScene
        from geomapnet_tpu.losses import MapNetCriterion
        from geomapnet_tpu.train import create_train_state, make_optimizer

        model = MapNet(posenet=_posenet())
        ds = MF(SyntheticScene(n_frames=16, height=64, width=96, train=False),
                steps=3, skip=1)
        state = create_train_state(
            model, MapNetCriterion(), make_optimizer("adam", 1e-4),
            jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 96, 3)),
        )
        ref = evaluate(model, state, ds, batch_size=4, progress=False,
                       use_mesh=False)
        got = evaluate(model, state, ds, batch_size=4, progress=False,
                       use_mesh=False, fold_bn=True)
        np.testing.assert_allclose(
            got["pred_poses"], ref["pred_poses"], rtol=1e-2, atol=1e-3)


class TestStaticCalibration:
    """Calibrated static activation scales (--calibrate N)."""

    def test_scales_baked_on_every_site(self, float_model):
        _, variables = float_model
        q = quantize_posenet_variables(variables, stage_sizes=STAGES)
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 96, 3))
        qc = calibrate_activation_scales(q, [x], dtype=jnp.float32)
        from geomapnet_tpu.models.quant import _iter_sites

        sites = list(_iter_sites(qc))
        # resnet18: conv1 + 8 basic blocks (2 convs each) + 3 downsamples
        assert len(sites) == 1 + 16 + 3
        assert all("x_scale" in s and s["x_scale"] > 0 for s in sites)
        # the original tree is not mutated
        assert all("x_scale" not in s for s in _iter_sites(q))

    def test_calibrated_int8_head_is_batch_independent(self, float_model):
        """With --calibrate + --quantize_heads the fc_feat activation scale
        is STATIC (baked at calibration like every conv site), so a frame's
        pose no longer depends on its batchmates. The dynamic per-tensor
        head absmax coupled rows in the batch, which (a) paid a full-batch
        reduction per launch and (b) broke bit-equality between
        differently-batched epochs — the frame-dedup eval scan vs the tuple
        scan disagreed by amplified requant flips until this."""
        _, variables = float_model
        q = quantize_posenet_variables(variables, stage_sizes=STAGES,
                                       quantize_heads=True)
        x = jax.random.normal(jax.random.PRNGKey(11), (6, 64, 96, 3))
        qc = calibrate_activation_scales(q, [x[:2]], dtype=jnp.float32)
        assert "x_scale" in qc["heads"]["fc_feat"]
        full = np.asarray(posenet_apply_int8(qc, x, dtype=jnp.float32))
        # same frames, different batch composition/order
        perm = np.array([5, 2, 0, 4, 1, 3])
        shuffled = np.asarray(
            posenet_apply_int8(qc, x[perm], dtype=jnp.float32))
        np.testing.assert_array_equal(full[perm], shuffled)
        # the UNcalibrated tree keeps the dynamic head scale (and the
        # coupling): the original serving contract for --quantize without
        # --calibrate is unchanged
        assert "x_scale" not in q["heads"]["fc_feat"]

    def test_static_matches_dynamic_on_calib_data(self, float_model):
        """On the calibration data itself, static absmax scales equal the
        dynamic per-batch scales, so outputs agree almost exactly."""
        _, variables = float_model
        q = quantize_posenet_variables(variables, stage_sizes=STAGES)
        x = jax.random.normal(jax.random.PRNGKey(6), (4, 64, 96, 3))
        qc = calibrate_activation_scales(q, [x], dtype=jnp.float32)
        dyn = np.asarray(posenet_apply_int8(q, x, dtype=jnp.float32))
        stat = np.asarray(posenet_apply_int8(qc, x, dtype=jnp.float32))
        np.testing.assert_allclose(stat, dyn, rtol=0.02, atol=0.02)

    def test_static_close_to_float_on_fresh_data(self, float_model):
        model, variables = float_model
        q = quantize_posenet_variables(variables, stage_sizes=STAGES)
        calib = [jax.random.normal(jax.random.PRNGKey(7 + i), (4, 64, 96, 3))
                 for i in range(2)]
        qc = calibrate_activation_scales(q, calib, dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(9), (4, 64, 96, 3))
        ref = np.asarray(model.apply(variables, x, train=False))
        got = np.asarray(posenet_apply_int8(qc, x, dtype=jnp.float32))
        scale = np.abs(ref).mean()
        assert np.abs(got - ref).max() / scale < 0.12

    @pytest.mark.slow
    def test_evaluate_calibrated_runs(self):
        from geomapnet_tpu.cli.eval import evaluate
        from geomapnet_tpu.data import MF, SyntheticScene
        from geomapnet_tpu.losses import MapNetCriterion
        from geomapnet_tpu.train import create_train_state, make_optimizer

        model = MapNet(posenet=_posenet())
        ds = MF(SyntheticScene(n_frames=16, height=64, width=96, train=False),
                steps=3, skip=1)
        state = create_train_state(
            model, MapNetCriterion(), make_optimizer("adam", 1e-4),
            jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 96, 3)),
        )
        ref = evaluate(model, state, ds, batch_size=4, progress=False,
                       use_mesh=False, quantize=True)
        got = evaluate(model, state, ds, batch_size=4, progress=False,
                       use_mesh=False, quantize=True, calib_batches=2,
                       quantize_heads=True)
        assert abs(got["median_t"] - ref["median_t"]) < \
            max(0.1 * abs(ref["median_t"]), 0.05)


class TestFusedRequant:
    """int8-dataflow trunk (fused=True): requant in conv epilogues, int8
    inter-site activations. Must track the unfused static path closely —
    the only numerical deltas are f32 (not bf16) dequant links and the
    identity branch's (already-present) input rounding."""

    def test_fused_close_to_unfused_static(self, float_model):
        _, variables = float_model
        q = quantize_posenet_variables(variables, stage_sizes=STAGES)
        x = jax.random.normal(jax.random.PRNGKey(11), (4, 64, 96, 3))
        qc = calibrate_activation_scales(q, [x], dtype=jnp.float32)
        stat = np.asarray(posenet_apply_int8(qc, x, dtype=jnp.float32))
        fused = np.asarray(
            posenet_apply_int8(qc, x, dtype=jnp.float32, fused=True))
        scale = np.abs(stat).mean()
        # the two int8 variants round at different points (the identity
        # branch rides quantized; the block output quantizes once instead
        # of per consumer) — deviations compound to ~6% max over 8 random-
        # weight blocks; fidelity to FLOAT is the contract pinned below
        assert np.abs(fused - stat).max() / scale < 0.10

    def test_fused_close_to_float(self, float_model):
        model, variables = float_model
        q = quantize_posenet_variables(variables, stage_sizes=STAGES,
                                       quantize_heads=True)
        calib = [jax.random.normal(jax.random.PRNGKey(12 + i), (4, 64, 96, 3))
                 for i in range(2)]
        qc = calibrate_activation_scales(q, calib, dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(14), (4, 64, 96, 3))
        ref = np.asarray(model.apply(variables, x, train=False))
        got = np.asarray(
            posenet_apply_int8(qc, x, dtype=jnp.float32, fused=True))
        scale = np.abs(ref).mean()
        assert np.abs(got - ref).max() / scale < 0.12

    def test_fused_mapnet_wrapper(self, float_model):
        _, variables = float_model
        q = quantize_posenet_variables(variables, stage_sizes=STAGES)
        x = jax.random.normal(jax.random.PRNGKey(15), (2, 3, 64, 96, 3))
        qc = calibrate_activation_scales(q, [x], dtype=jnp.float32)
        out = np.asarray(mapnet_apply_int8(qc, x, dtype=jnp.float32,
                                           fused=True))
        assert out.shape == (2, 3, 6)
        flat = np.asarray(posenet_apply_int8(
            qc, jnp.reshape(x, (6, 64, 96, 3)), dtype=jnp.float32,
            fused=True))
        np.testing.assert_array_equal(out.reshape(6, 6), flat)

    def test_fused_requires_static_scales(self, float_model):
        _, variables = float_model
        q = quantize_posenet_variables(variables, stage_sizes=STAGES)
        x = jnp.zeros((1, 64, 96, 3))
        with pytest.raises(ValueError, match="static scales"):
            posenet_apply_int8(q, x, fused=True)  # dynamic tree

    @pytest.mark.slow
    def test_fused_rejects_bottleneck(self):
        from geomapnet_tpu.models import resnet50

        model = PoseNet(feature_extractor=resnet50(dtype=jnp.float32),
                        feat_dim=64, droprate=0.0)
        x = jnp.zeros((1, 64, 96, 3), jnp.float32)
        v = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        q = quantize_posenet_variables(
            {"params": v["params"], "batch_stats": v["batch_stats"]},
            stage_sizes=(3, 4, 6, 3))
        qc = calibrate_activation_scales(q, [x], dtype=jnp.float32)
        with pytest.raises(ValueError, match="basic-block"):
            posenet_apply_int8(qc, x, fused=True)


class TestQuantizedHeads:
    def test_int8_fc_feat_close_to_float(self, float_model):
        model, variables = float_model
        x = jax.random.normal(jax.random.PRNGKey(10), (4, 64, 96, 3))
        ref = np.asarray(model.apply(variables, x, train=False))
        q = quantize_posenet_variables(variables, stage_sizes=STAGES,
                                       quantize_heads=True)
        assert q["heads"]["fc_feat"]["qkernel"].dtype == np.int8
        got = np.asarray(posenet_apply_int8(q, x, dtype=jnp.float32))
        scale = np.abs(ref).mean()
        assert np.abs(got - ref).max() / scale < 0.1


@pytest.mark.slow
class TestBottleneckQuant:
    """int8 PTQ generalizes to resnet50-family Bottleneck trunks."""

    def test_bottleneck_matches_float_model(self):
        from geomapnet_tpu.models import resnet50

        model = PoseNet(feature_extractor=resnet50(dtype=jnp.float32),
                        feat_dim=32, droprate=0.0)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 48, 3))
        v = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        variables = {"params": v["params"], "batch_stats": v["batch_stats"]}
        ref = np.asarray(model.apply(variables, x, train=False))

        q = quantize_posenet_variables(variables)
        trunk = q["trunk"]
        # layer1 opens with a stride-1 projection downsample (64 -> 256)
        assert trunk["layer1_0"]["downsample"]["qkernel"].shape == (1, 1, 64, 256)
        assert trunk["layer1_0"]["conv3"]["qkernel"].shape == (1, 1, 64, 256)

        got = np.asarray(posenet_apply_int8(q, x, dtype=jnp.float32))
        assert got.shape == ref.shape == (2, 6)
        scale = np.abs(ref).mean()
        assert np.abs(got - ref).max() / scale < 0.08

class TestPrequantizedInput:
    """quantize_input_int8: the stem's static-scale int8 input is a
    per-frame constant, so a device cache can store it and feed the fused
    trunk directly — BIT-identically to quantizing after the gather."""

    def _calibrated(self, float_model):
        _, variables = float_model
        q = quantize_posenet_variables(variables, stage_sizes=STAGES,
                                       quantize_heads=True)
        calib = [jax.random.normal(jax.random.PRNGKey(7), (4, 64, 96, 3))]
        return calibrate_activation_scales(q, calib, dtype=jnp.float32)

    def test_bit_identical_to_inline_quantize(self, float_model):
        from geomapnet_tpu.models.quant import quantize_input_int8

        qc = self._calibrated(float_model)
        x = jax.random.normal(jax.random.PRNGKey(9), (4, 64, 96, 3))
        ref = np.asarray(jax.jit(
            lambda xx: posenet_apply_int8(qc, xx, dtype=jnp.float32,
                                          fused=True))(x))
        qx = jax.jit(lambda xx: quantize_input_int8(qc, xx))(x)
        assert qx.dtype == jnp.int8
        got = np.asarray(jax.jit(
            lambda xx: posenet_apply_int8(qc, xx, dtype=jnp.float32,
                                          fused=True))(qx))
        np.testing.assert_array_equal(got, ref)

    def test_error_contracts(self, float_model):
        from geomapnet_tpu.models.quant import quantize_input_int8

        _, variables = float_model
        q = quantize_posenet_variables(variables, stage_sizes=STAGES)
        x = jnp.zeros((2, 64, 96, 3))
        with pytest.raises(ValueError, match="calibrate"):
            quantize_input_int8(q, x)  # no static scales baked
        qc = self._calibrated(float_model)
        qx = quantize_input_int8(qc, x)
        with pytest.raises(ValueError, match="fused"):
            posenet_apply_int8(qc, qx, fused=False)


class TestStemS2D:
    """convert_stem_s2d: the stride-2 7x7 stem as a stride-1 4x4 conv over
    2x2 space-to-depth input — BIT-exact on the int8 path (the int32
    accumulator sums the same products; integer addition is associative)."""

    def _calibrated(self, float_model):
        _, variables = float_model
        q = quantize_posenet_variables(variables, stage_sizes=STAGES,
                                       quantize_heads=True)
        calib = [jax.random.normal(jax.random.PRNGKey(7), (4, 64, 96, 3))]
        return calibrate_activation_scales(q, calib, dtype=jnp.float32)

    def test_bit_exact_even_dims(self, float_model):
        from geomapnet_tpu.models.quant import convert_stem_s2d

        qc = self._calibrated(float_model)
        qs = convert_stem_s2d(qc)
        assert qs["trunk"]["conv1"]["qkernel"].shape == (4, 4, 12, 64)
        x = jax.random.normal(jax.random.PRNGKey(21), (4, 64, 96, 3))
        ref = np.asarray(jax.jit(lambda xx: posenet_apply_int8(
            qc, xx, dtype=jnp.float32, fused=True))(x))
        got = np.asarray(jax.jit(lambda xx: posenet_apply_int8(
            qs, xx, dtype=jnp.float32, fused=True))(x))
        np.testing.assert_array_equal(got, ref)

    def test_bit_exact_odd_width(self, float_model):
        # the flagship input is 256x341 (odd W): S2D pads W high with zero,
        # which is exactly the 7x7 conv's own implicit padding column
        from geomapnet_tpu.models.quant import convert_stem_s2d

        qc = self._calibrated(float_model)
        qs = convert_stem_s2d(qc)
        x = jax.random.normal(jax.random.PRNGKey(22), (2, 64, 95, 3))
        ref = np.asarray(jax.jit(lambda xx: posenet_apply_int8(
            qc, xx, dtype=jnp.float32, fused=True))(x))
        got = np.asarray(jax.jit(lambda xx: posenet_apply_int8(
            qs, xx, dtype=jnp.float32, fused=True))(x))
        np.testing.assert_array_equal(got, ref)

    def test_prequantized_s2d_rows_bit_exact(self, float_model):
        # the serving cache shape: quantize per frame, space-to-depth at
        # upload, feed the 12-channel int8 frames straight to the trunk
        from geomapnet_tpu.models.quant import (convert_stem_s2d,
                                                quantize_input_int8,
                                                space_to_depth_input)

        qc = self._calibrated(float_model)
        qs = convert_stem_s2d(qc)
        x = jax.random.normal(jax.random.PRNGKey(23), (4, 64, 96, 3))
        ref = np.asarray(jax.jit(lambda xx: posenet_apply_int8(
            qc, xx, dtype=jnp.float32, fused=True))(x))
        qx = space_to_depth_input(quantize_input_int8(qc, x))
        assert qx.dtype == jnp.int8 and qx.shape == (4, 32, 48, 12)
        got = np.asarray(jax.jit(lambda xx: posenet_apply_int8(
            qs, xx, dtype=jnp.float32, fused=True))(qx))
        np.testing.assert_array_equal(got, ref)

    def test_error_contracts(self, float_model):
        from geomapnet_tpu.models.quant import convert_stem_s2d

        _, variables = float_model
        folded = fold_posenet_variables(variables, stage_sizes=STAGES)
        with pytest.raises(ValueError, match="int8"):
            convert_stem_s2d(folded)
        qc = self._calibrated(float_model)
        qs = convert_stem_s2d(qc)
        x = jnp.zeros((1, 64, 96, 3))
        with pytest.raises(ValueError, match="fused"):
            posenet_apply_int8(qs, x, fused=False)
        with pytest.raises(ValueError, match="calibrate before"):
            calibrate_activation_scales(qs, [x], dtype=jnp.float32)
        # idempotent: converting twice is a no-op
        qs2 = convert_stem_s2d(qs)
        assert qs2["trunk"]["conv1"]["qkernel"] is qs["trunk"]["conv1"]["qkernel"]


@pytest.mark.slow
def test_evaluate_fused_device_cache_prequant_matches_loader():
    """--fuse_requant + --device_cache: the cache stores the PREQUANTIZED
    int8 stem input as flat rows (quantize_input_int8 at upload); the
    scanned gather epoch must compute what the per-batch loader path
    computes, and a returned buffer must be reusable as-is."""
    from geomapnet_tpu.cli.eval import evaluate
    from geomapnet_tpu.data import MF, SyntheticScene
    from geomapnet_tpu.losses import MapNetCriterion
    from geomapnet_tpu.train import create_train_state, make_optimizer

    model = MapNet(posenet=_posenet())
    ds = MF(SyntheticScene(n_frames=16, height=64, width=96, train=False),
            steps=3, skip=1)
    state = create_train_state(
        model, MapNetCriterion(), make_optimizer("adam", 1e-4),
        jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 96, 3)),
    )
    kw = dict(batch_size=4, progress=False, use_mesh=False, quantize=True,
              calib_batches=1, quantize_heads=True, fuse_requant=True)
    base = evaluate(model, state, ds, **kw)
    dc = evaluate(model, state, ds, device_cache=True, **kw)
    buf = dc["device_frames"]
    assert buf.dtype == jnp.int8 and buf.ndim == 2  # prequantized rows
    # static scales: stem quantization is per-frame elementwise, identical
    # whether it runs at upload or per batch (cross-program f32 preprocess
    # rounding only)
    np.testing.assert_allclose(dc["pred_poses"], base["pred_poses"],
                               rtol=0, atol=0.03)
    reuse = evaluate(model, state, ds, device_cache=buf, **kw)
    np.testing.assert_array_equal(reuse["pred_poses"], dc["pred_poses"])
