"""2-D mesh parallelism: tensor-parallel head, spatial conv partitioning.

Each strategy is validated by equality against the single-device result on
the virtual 8-CPU platform (conftest.py), the same bar as the data-parallel
test in test_train_step.py. The reference has no analog (single-GPU,
/root/repo/SURVEY.md §2.8) — these are new TPU-pod capabilities.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from geomapnet_tpu.losses import MapNetCriterion
from geomapnet_tpu.models import MapNet, PoseNet, resnet18
from geomapnet_tpu.parallel import (
    make_mesh,
    shard_batch,
    shard_step_tp,
    spatial_image_sharding,
    tp_state_shardings,
)
from geomapnet_tpu.train import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)


def tiny_mapnet(feat_dim=32, droprate=0.0):
    return MapNet(
        posenet=PoseNet(feature_extractor=resnet18(), feat_dim=feat_dim,
                        droprate=droprate)
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


class TestMesh2D:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(axis_names=("data", "model"), shape=(4, 2))
        assert mesh.shape == {"data": 4, "model": 2}
        mesh = make_mesh(axis_names=("data", "model"), shape=(-1, 2))
        assert mesh.shape == {"data": 4, "model": 2}

    def test_make_mesh_bad_shape(self):
        with pytest.raises(ValueError, match="cannot arrange 8 devices"):
            make_mesh(axis_names=("data", "model"), shape=(3, 2))
        with pytest.raises(ValueError, match="explicit shape"):
            make_mesh(axis_names=("data", "model"))


class TestHeadTensorParallel:
    def test_specs(self, setup):
        _, _, _, state = setup
        mesh = make_mesh(axis_names=("data", "model"), shape=(4, 2))
        sh = tp_state_shardings(state, mesh)
        head = sh.params["model"]["posenet"]
        assert head["fc_feat"]["kernel"].spec == P(None, "model")
        assert head["fc_feat"]["bias"].spec == P("model")
        assert head["fc_xyz"]["kernel"].spec == P("model", None)
        assert head["fc_xyz"]["bias"].spec == P()
        # trunk + criterion + step counter stay replicated
        assert sh.params["criterion"]["sax"].spec == P()
        assert sh.step.spec == P()
        # adam moments mirror the params layout
        mu = jax.tree.leaves(
            sh.opt_state,
            is_leaf=lambda x: hasattr(x, "spec"),
        )
        assert any(s.spec == P(None, "model") for s in mu)

    @pytest.mark.slow
    def test_indivisible_feat_dim_raises(self):
        model = tiny_mapnet(feat_dim=30)
        criterion = MapNetCriterion()
        tx = make_optimizer("adam", 1e-3)
        state = create_train_state(model, criterion, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 3, 32, 32, 3)))
        mesh = make_mesh(axis_names=("data", "model"), shape=(2, 4))
        with pytest.raises(ValueError, match="not divisible"):
            tp_state_shardings(state, mesh)

    @pytest.mark.slow
    def test_tp_train_step_matches_single_device(self, setup):
        """One dp(4) x tp(2) train step == the unsharded step.

        Loss and gradients are compared directly; updated params are not
        compared elementwise because adam amplifies near-zero gradient ties
        (different psum reduction order flips sign(g), turning an O(1e-8)
        grad difference into a full +-lr update difference) — a property of
        the optimizer, not a sharding bug.
        """
        model, criterion, tx, state = setup
        mesh = make_mesh(axis_names=("data", "model"), shape=(4, 2))

        images = jax.random.normal(jax.random.PRNGKey(5), (8, 3, 32, 32, 3))
        targets = jax.random.normal(jax.random.PRNGKey(6), (8, 3, 6)) * 0.1
        rng = jax.random.PRNGKey(7)

        def loss_fn(params, images, targets):
            out, _ = model.apply(
                {"params": params["model"], "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            return criterion(params["criterion"], out, targets)

        grad_fn = jax.value_and_grad(loss_fn)
        ref_loss, ref_grads = jax.jit(grad_fn)(state.params, images, targets)

        sharding = tp_state_shardings(state, mesh)
        # batch inputs carry their committed data-axis sharding from
        # shard_batch; only the params layout needs pinning here
        tp_grad = jax.jit(grad_fn, in_shardings=(sharding.params, None, None))
        sh_params = jax.device_put(state.params, sharding.params)
        sh_images, sh_targets = shard_batch((images, targets), mesh)
        got_loss, got_grads = tp_grad(sh_params, sh_images, sh_targets)

        np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-5)
        # Sharded reductions reorder f32 sums; conv/BN grads see up to ~0.5%
        # norm-level noise vs the single-device order (identical between pure
        # DP and DP x TP — measured, not a TP artifact). A sharding bug
        # (missing psum, wrong axis) shows up as O(1) relative error.
        for ref_g, got_g in zip(jax.tree.leaves(ref_grads),
                                jax.tree.leaves(got_grads)):
            ref_g, got_g = np.asarray(ref_g), np.asarray(got_g)
            err = np.linalg.norm(got_g - ref_g) / (np.linalg.norm(ref_g) + 1e-9)
            assert err < 1e-2, f"grad relnorm {err}"

        # the full step keeps the head sharded over the model axis
        step = make_train_step(model, criterion, tx)
        tp_step = shard_step_tp(step, mesh, sharding, n_batch_args=2,
                                n_replicated_args=1, donate_state=False)
        got_state, got_loss = tp_step(
            jax.device_put(state, sharding), sh_images, sh_targets, rng
        )
        np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-5)
        out_k = got_state.params["model"]["posenet"]["fc_feat"]["kernel"]
        assert out_k.sharding.spec == P(None, "model")

    def test_tp_steps_chain(self):
        """Output layout == input layout: steps chain without resharding.

        Builds its own state: donation below invalidates the input buffers,
        and ``jax.device_put`` onto the mesh aliases (does not copy) the
        source replica — donating a state derived from the shared module
        fixture would delete the fixture's buffers for later tests.
        """
        model = tiny_mapnet()
        criterion = MapNetCriterion(saq=-3.0, srq=-3.0, learn_beta=True,
                                    learn_gamma=True)
        tx = make_optimizer("adam", 1e-3, weight_decay=5e-4)
        state = create_train_state(model, criterion, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((2, 3, 32, 32, 3)))
        mesh = make_mesh(jax.devices()[:4], ("data", "model"), shape=(2, 2))
        sharding = tp_state_shardings(state, mesh)
        tp_step = shard_step_tp(make_train_step(model, criterion, tx), mesh,
                                sharding, n_batch_args=2, n_replicated_args=1,
                                donate_state=True)
        st = jax.device_put(state, sharding)
        batch = shard_batch(
            (jnp.ones((4, 3, 32, 32, 3)), jnp.zeros((4, 3, 6))), mesh
        )
        rng = jax.random.PRNGKey(0)
        for _ in range(3):
            st, loss = tp_step(st, *batch, rng)
        assert np.isfinite(float(loss))
        assert int(st.step) == 3


class TestSpatialPartitioning:
    def test_spatial_eval_matches_single_device(self, setup):
        """Height-band sharded conv forward == unsharded (halo exchange)."""
        model, _, _, state = setup
        mesh = make_mesh(axis_names=("data", "model"), shape=(2, 4))

        images = jax.random.normal(jax.random.PRNGKey(8), (2, 3, 32, 32, 3))
        step = make_eval_step(model)
        _, ref = jax.jit(step)(state, images)

        sh = spatial_image_sharding(mesh, ndim=5, h_dim=2)
        assert sh.spec == P("data", None, "model", None, None)
        sp_step = jax.jit(step, in_shardings=(None, sh))
        _, got = sp_step(state, jax.device_put(images, sh))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)

    def test_spatial_single_frame_layout(self):
        mesh = make_mesh(axis_names=("data", "model"), shape=(2, 4))
        sh = spatial_image_sharding(mesh, ndim=4, h_dim=1)
        assert sh.spec == P("data", "model", None, None)


class TestTPCheckpoint:
    @pytest.mark.slow
    def test_tp_state_checkpoints_and_reshards(self, tmp_path):
        """A tensor-parallel TrainState saves via orbax (global arrays),
        restores onto a single-device template, and re-shards — so TP
        training is restart-safe like the data-parallel path."""
        from geomapnet_tpu.train.checkpoint import (
            restore_checkpoint,
            save_checkpoint,
        )

        model = tiny_mapnet()
        criterion = MapNetCriterion(saq=-3.0, srq=-3.0, learn_beta=True,
                                    learn_gamma=True)
        tx = make_optimizer("adam", 1e-3, weight_decay=5e-4)
        state = create_train_state(model, criterion, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((2, 3, 32, 32, 3)))
        # 4-device submesh: keeps collective pressure low (a starved virtual
        # mesh can trip XLA's 40 s rendezvous guard on a loaded 1-core CI)
        mesh = make_mesh(jax.devices()[:4], ("data", "model"), shape=(2, 2))
        sharding = tp_state_shardings(state, mesh)
        step = shard_step_tp(make_train_step(model, criterion, tx), mesh,
                             sharding, n_batch_args=2, n_replicated_args=1,
                             donate_state=False)
        batch = shard_batch(
            (jnp.ones((4, 3, 32, 32, 3)), jnp.zeros((4, 3, 6))), mesh
        )
        tp_state, _ = step(jax.device_put(state, sharding), *batch,
                           jax.random.PRNGKey(1))

        path = save_checkpoint(tmp_path, 3, tp_state)
        epoch, restored = restore_checkpoint(path, state)
        assert epoch == 3
        for a, b in zip(jax.tree.leaves(tp_state.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # re-shard and take another step: restart-safe
        resumed = jax.device_put(restored, sharding)
        next_state, loss = step(resumed, *batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(loss))
        assert int(next_state.step) == 2
