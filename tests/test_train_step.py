"""Train/eval step tests: loss decreases, clip masking, lr schedule, sharding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geomapnet_tpu.losses import MapNetCriterion, PoseNetCriterion
from geomapnet_tpu.models import MapNet, PoseNet, resnet18
from geomapnet_tpu.parallel import make_mesh, shard_batch, shard_step
from geomapnet_tpu.train import (
    create_train_state,
    make_eval_step,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
)


def tiny_mapnet():
    return MapNet(
        posenet=PoseNet(feature_extractor=resnet18(), feat_dim=32, droprate=0.0)
    )


@pytest.fixture(scope="module")
def setup():
    model = tiny_mapnet()
    criterion = MapNetCriterion(saq=-3.0, srq=-3.0, learn_beta=True,
                                learn_gamma=True)
    tx = make_optimizer("adam", 1e-3, weight_decay=5e-4)
    x = jnp.zeros((2, 3, 32, 32, 3))
    state = create_train_state(model, criterion, tx, jax.random.PRNGKey(0), x)
    return model, criterion, tx, state


class TestTrainStep:
    @pytest.mark.slow
    def test_loss_decreases(self, setup):
        model, criterion, tx, state = setup
        rng = jax.random.PRNGKey(1)
        images = jax.random.normal(rng, (2, 3, 32, 32, 3))
        targets = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 6)) * 0.1
        step = jax.jit(make_train_step(model, criterion, tx))
        losses = []
        for _ in range(8):
            state, loss = step(state, images, targets, rng)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        assert int(state.step) == 8

    def test_criterion_params_learn(self, setup):
        model, criterion, tx, state = setup
        rng = jax.random.PRNGKey(1)
        images = jax.random.normal(rng, (2, 3, 32, 32, 3))
        targets = jnp.zeros((2, 3, 6))
        step = jax.jit(make_train_step(model, criterion, tx))
        s1, _ = step(state, images, targets, rng)
        assert float(s1.params["criterion"]["sax"]) != 0.0

    @pytest.mark.slow
    def test_remat_step_matches(self, setup):
        """remat=True recomputes the forward in the backward — same math."""
        model, criterion, tx, state = setup
        rng = jax.random.PRNGKey(1)
        images = jax.random.normal(rng, (2, 3, 32, 32, 3))
        targets = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 6)) * 0.1
        step = jax.jit(make_train_step(model, criterion, tx))
        rstep = jax.jit(make_train_step(model, criterion, tx, remat=True))
        s1, l1 = step(state, images, targets, rng)
        s2, l2 = rstep(state, images, targets, rng)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    @pytest.mark.slow
    def test_grad_accum_matches_full_batch(self):
        """accum_steps=2 == one full-batch step when the model has no BN.

        (With BN the statistics legitimately advance per microbatch; a
        BN-free trunk isolates the accumulation math itself.)
        """
        from flax import linen as nn

        class FlatTrunk(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                return nn.Dense(16)(x.reshape((x.shape[0], -1)))

        model = MapNet(posenet=PoseNet(feature_extractor=FlatTrunk(),
                                       feat_dim=8, droprate=0.0))
        criterion = MapNetCriterion(learn_beta=True, learn_gamma=True)
        tx = make_optimizer("adam", 1e-3)
        images = jax.random.normal(jax.random.PRNGKey(3), (4, 3, 8, 8, 3))
        targets = jax.random.normal(jax.random.PRNGKey(4), (4, 3, 6)) * 0.1
        state = create_train_state(model, criterion, tx, jax.random.PRNGKey(0),
                                   images[:1])
        rng = jax.random.PRNGKey(9)

        full = jax.jit(make_train_step(model, criterion, tx))
        acc = jax.jit(make_train_step(model, criterion, tx, accum_steps=2))
        s1, l1 = full(state, images, targets, rng)
        s2, l2 = acc(state, images, targets, rng)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        assert int(s2.step) == 1

    def test_grad_accum_indivisible_raises(self, setup):
        model, criterion, tx, state = setup
        step = make_train_step(model, criterion, tx, accum_steps=3)
        with pytest.raises(ValueError, match="not divisible"):
            step(state, jnp.zeros((4, 3, 32, 32, 3)), jnp.zeros((4, 3, 6)),
                 jax.random.PRNGKey(0))

    @pytest.mark.slow
    def test_grad_accum_with_bn_runs(self, setup):
        model, criterion, tx, state = setup
        step = jax.jit(make_train_step(model, criterion, tx, accum_steps=2))
        images = jax.random.normal(jax.random.PRNGKey(5), (4, 3, 32, 32, 3))
        targets = jnp.zeros((4, 3, 6))
        s, loss = step(state, images, targets, jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))
        # BN stats advanced through both microbatches
        ref = jax.tree.leaves(state.batch_stats)[0]
        got = jax.tree.leaves(s.batch_stats)[0]
        assert not np.allclose(np.asarray(ref), np.asarray(got))

    def test_eval_step_deterministic(self, setup):
        model, criterion, _, state = setup
        images = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 32, 32, 3))
        eval_step = jax.jit(make_eval_step(model, criterion))
        l1, o1 = eval_step(state, images, jnp.zeros((1, 3, 6)))
        l2, o2 = eval_step(state, images, jnp.zeros((1, 3, 6)))
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
        assert float(l1) == float(l2)

    def test_inference_only_eval(self, setup):
        model, _, _, state = setup
        images = jnp.zeros((1, 3, 32, 32, 3))
        eval_step = make_eval_step(model, None)
        loss, out = eval_step(state, images)
        assert float(loss) == 0.0
        assert out.shape == (1, 3, 6)


class TestOptim:
    def test_lr_schedule_sgd_steps(self):
        sched = make_lr_schedule("sgd", 0.1, steps_per_epoch=10,
                                 lr_decay=0.5, lr_stepvalues=[2, 4])
        assert sched(0) == pytest.approx(0.1)
        assert sched(19) == pytest.approx(0.1)
        assert sched(20) == pytest.approx(0.05)   # epoch 2
        assert sched(40) == pytest.approx(0.025)  # epoch 4

    def test_lr_schedule_adam_constant(self):
        sched = make_lr_schedule("adam", 1e-4, 10, 0.5, [2])
        assert sched(0) == sched(1000) == pytest.approx(1e-4)

    def test_clip_masks_criterion(self):
        """Gradient clip applies to model grads only (reference clips
        model.parameters() only, common/train.py:357-358)."""
        tx = make_optimizer("sgd", 1.0, max_grad_norm=1e-6)
        params = {"model": {"w": jnp.ones(3)}, "criterion": {"sax": jnp.zeros(())}}
        grads = {"model": {"w": jnp.ones(3) * 100}, "criterion": {"sax": jnp.ones(())}}
        updates, _ = tx.update(grads, tx.init(params), params)
        assert float(jnp.abs(updates["model"]["w"]).max()) < 1e-5
        assert float(jnp.abs(updates["criterion"]["sax"])) == pytest.approx(1.0)

    def test_coupled_weight_decay_matches_torch_sgd(self):
        """update = lr * (g + wd * p) for plain SGD."""
        tx = make_optimizer("sgd", 0.1, weight_decay=0.01)
        params = {"model": {"w": jnp.ones(2) * 2.0}, "criterion": {}}
        grads = {"model": {"w": jnp.ones(2)}, "criterion": {}}
        updates, _ = tx.update(grads, tx.init(params), params)
        np.testing.assert_allclose(
            np.asarray(updates["model"]["w"]), -0.1 * (1.0 + 0.01 * 2.0),
            rtol=1e-6,
        )

    def test_unknown_method_raises(self):
        with pytest.raises(ValueError):
            make_optimizer("adagrad", 0.1)


class TestSharding:
    def test_data_parallel_train_step(self, setup):
        """Train step over an 8-device mesh == single-device result."""
        model, criterion, tx, state = setup
        mesh = make_mesh()
        assert mesh.devices.size == 8

        images = jax.random.normal(jax.random.PRNGKey(5), (8, 3, 32, 32, 3))
        targets = jax.random.normal(jax.random.PRNGKey(6), (8, 3, 6)) * 0.1
        rng = jax.random.PRNGKey(7)

        step = make_train_step(model, criterion, tx)
        ref_state, ref_loss = jax.jit(step)(state, images, targets, rng)

        sharded = shard_step(step, mesh, n_batch_args=2, n_state_args=1,
                             n_replicated_args=1, donate_state=False)
        sh_images, sh_targets = shard_batch((images, targets), mesh)
        got_state, got_loss = sharded(state, sh_images, sh_targets, rng)

        np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-5)
        ref_w = np.asarray(
            jax.tree.leaves(ref_state.params["model"])[0]
        )
        got_w = np.asarray(jax.tree.leaves(got_state.params["model"])[0])
        np.testing.assert_allclose(got_w, ref_w, atol=1e-5)


class TestDevicePreprocess:
    """The uint8 host -> device-normalize path (4x smaller transfers)."""

    def test_uint8_transform_matches_host_normalize(self):
        from geomapnet_tpu.data.transforms import ImageTransform, Normalize
        from geomapnet_tpu.ops.image import normalize as device_normalize

        img = np.random.RandomState(0).randint(
            0, 256, (32, 48, 3)
        ).astype(np.uint8)
        mean, std = (0.4, 0.45, 0.5), (0.2, 0.25, 0.3)
        host = ImageTransform(resize=None, normalize=Normalize(mean, std))(img)
        u8 = ImageTransform(resize=None, keep_uint8=True)(img)
        assert u8.dtype == np.uint8
        dev = np.asarray(device_normalize(jnp.asarray(u8), mean, std))
        np.testing.assert_allclose(dev, host, atol=1e-5)

    def test_steps_fuse_preprocess(self, setup):
        from geomapnet_tpu.ops.image import normalize as device_normalize

        model, criterion, tx, state = setup
        mean, std = (0.5,) * 3, (0.25,) * 3

        def pre(x):
            return device_normalize(x, mean, std)

        u8 = jnp.asarray(np.random.RandomState(0).randint(
            0, 256, (2, 3, 32, 32, 3)
        ).astype(np.uint8))
        targets = jnp.zeros((2, 3, 6))
        step = jax.jit(make_train_step(model, criterion, tx, preprocess=pre))
        _, loss = step(state, u8, targets, jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))

        _, out_fused = jax.jit(make_eval_step(model, preprocess=pre))(state, u8)
        _, out_ref = jax.jit(make_eval_step(model))(state, pre(u8))
        np.testing.assert_allclose(
            np.asarray(out_fused), np.asarray(out_ref), rtol=1e-4, atol=1e-3
        )

    def test_builders_device_preprocess(self, tmp_path):
        from geomapnet_tpu.cli.builders import (
            build_device_preprocess,
            build_transform,
        )
        from geomapnet_tpu.cli.config import ExperimentConfig

        scene_dir = tmp_path / "7Scenes" / "heads"
        scene_dir.mkdir(parents=True)
        mean = np.array([0.4, 0.45, 0.5])
        var = np.array([0.04, 0.0625, 0.09])
        np.savetxt(scene_dir / "stats.txt", np.stack([mean, var]))

        cfg = ExperimentConfig()
        tf_u8 = build_transform("7Scenes", "heads", cfg, str(tmp_path),
                                train=False, keep_uint8=True)
        tf_f32 = build_transform("7Scenes", "heads", cfg, str(tmp_path),
                                 train=False)
        pre = build_device_preprocess("7Scenes", "heads", str(tmp_path))
        img = np.random.RandomState(1).randint(
            0, 256, (24, 32, 3)
        ).astype(np.uint8)
        fused = np.asarray(pre(jnp.asarray(tf_u8(img))))
        np.testing.assert_allclose(fused, tf_f32(img), atol=1e-5)
        assert build_device_preprocess("synth", "synth", str(tmp_path)) is None


class TestStochasticEval:
    """Reference eval-dropout quirk reproduction (stochastic=True)."""

    def test_stochastic_eval_varies_with_rng(self, setup):
        model, criterion, tx, state = setup
        model_do = MapNet(posenet=PoseNet(
            feature_extractor=resnet18(), feat_dim=32, droprate=0.5))
        x = jnp.zeros((2, 3, 32, 32, 3))
        state_do = create_train_state(
            model_do, criterion, tx, jax.random.PRNGKey(0), x)
        images = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 32, 32, 3))

        step = jax.jit(make_eval_step(model_do, stochastic=True))
        _, a = step(state_do, images, None, jax.random.PRNGKey(1))
        _, b = step(state_do, images, None, jax.random.PRNGKey(2))
        _, a2 = step(state_do, images, None, jax.random.PRNGKey(1))
        assert not np.allclose(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(a2))

        det = jax.jit(make_eval_step(model_do))
        _, d1 = det(state_do, images)
        _, d2 = det(state_do, images)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


class TestFoldTuples:
    """T-folded eval batches (B*T, H, W, C) are bit-identical to 5D ones.

    The eval CLI ships tuple batches folded so the program skips the
    full-batch relayout of the 5D parameter (scripts/bench_input_layout.py);
    MapNet IS this fold (models/posenet.py:126-132), so outputs must match
    exactly, and the same step must still accept 5D (device-cache scans).
    """

    def test_folded_matches_5d(self, setup):
        model, criterion, tx, state = setup
        images = jax.random.normal(jax.random.PRNGKey(5), (2, 3, 32, 32, 3))

        plain = jax.jit(make_eval_step(model))
        folded = jax.jit(make_eval_step(model, fold_tuples=3))
        _, ref = plain(state, images)
        _, out4 = folded(state, images.reshape(-1, 32, 32, 3))
        _, out5 = folded(state, images)
        assert out4.shape == ref.shape
        np.testing.assert_array_equal(np.asarray(out4), np.asarray(ref))
        np.testing.assert_array_equal(np.asarray(out5), np.asarray(ref))

    def test_fold_requires_posenet_submodule(self):
        with pytest.raises(ValueError):
            make_eval_step(PoseNet(feature_extractor=resnet18(),
                                   feat_dim=32), fold_tuples=3)


class TestMeshShapes:
    """Non-default mesh sizes and the clear-error contract for bad batch/
    mesh combinations (real-pod readiness: sub-meshes, odd device counts)."""

    def _run(self, setup, n_dev, batch):
        model, criterion, tx, state = setup
        mesh = make_mesh(jax.devices()[:n_dev])
        images = jax.random.normal(jax.random.PRNGKey(5), (batch, 3, 32, 32, 3))
        targets = jax.random.normal(jax.random.PRNGKey(6), (batch, 3, 6)) * 0.1
        step = shard_step(make_train_step(model, criterion, tx), mesh,
                          n_batch_args=2, n_state_args=1, n_replicated_args=1,
                          donate_state=False)
        sh = shard_batch((images, targets), mesh)
        _, loss = step(state, *sh, jax.random.PRNGKey(7))
        assert np.isfinite(float(loss))

    def test_four_device_submesh(self, setup):
        self._run(setup, n_dev=4, batch=8)

    @pytest.mark.slow
    def test_non_power_of_two_mesh(self, setup):
        self._run(setup, n_dev=3, batch=6)

    def test_indivisible_batch_raises_clear_error(self, setup):
        mesh = make_mesh(jax.devices()[:8])
        images = jnp.zeros((6, 3, 32, 32, 3))
        with pytest.raises(ValueError, match="not divisible by the 8-device"):
            shard_batch(images, mesh)
