"""Trainer loop tests: epoch/val/snapshot structure, logs, resume."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from geomapnet_tpu.cli.config import ExperimentConfig
from geomapnet_tpu.data import MF, SyntheticScene
from geomapnet_tpu.losses import MapNetCriterion
from geomapnet_tpu.models import MapNet, PoseNet, resnet18
from geomapnet_tpu.train.loop import Trainer


def _build(tmp_path, n_epochs=2, use_mesh=False, **kw):
    model = MapNet(posenet=PoseNet(
        feature_extractor=resnet18(), feat_dim=32, droprate=0.0))
    criterion = MapNetCriterion(saq=-3.0, srq=-3.0, learn_beta=True,
                                learn_gamma=True)
    cfg = ExperimentConfig(
        n_epochs=n_epochs, batch_size=8, do_val=True, seed=7, snapshot=1,
        val_freq=1, print_freq=1, opt="adam", lr=2e-3,
    )
    train_ds = MF(SyntheticScene(n_frames=32, height=32, width=48), steps=3,
                  skip=2)
    val_ds = MF(SyntheticScene(n_frames=16, height=32, width=48, train=False),
                steps=3, skip=2)
    return Trainer(
        model, criterion, cfg, "trainer_test", train_ds, val_ds,
        logdir_root=str(tmp_path), use_mesh=use_mesh, **kw,
    )


def test_train_val_artifacts_and_improvement(tmp_path):
    trainer = _build(tmp_path)
    first = trainer.validate(0)
    trainer.train_val()
    last = trainer.validate(99)
    assert last < first

    logdir = tmp_path / "trainer_test"
    assert (logdir / "log.txt").exists()
    lines = [json.loads(l) for l in open(logdir / "metrics.jsonl")]
    kinds = {l["kind"] for l in lines}
    assert kinds == {"train", "val"}
    train_lines = [l for l in lines if l["kind"] == "train"]
    assert {"loss", "lr", "sax", "saq", "srx", "srq"} <= set(train_lines[0])
    # snapshot every epoch + final
    assert (logdir / "epoch_000").exists()
    assert (logdir / "epoch_002").exists()


def test_resume_continues_epoch(tmp_path):
    trainer = _build(tmp_path, n_epochs=1)
    trainer.train_val()
    ckpt = tmp_path / "trainer_test" / "epoch_001"
    assert ckpt.exists()
    resumed = _build(tmp_path, n_epochs=1, checkpoint=str(ckpt),
                     resume_optim=True)
    assert resumed.start_epoch == 1
    # weights actually restored (not fresh init)
    import jax

    a = jax.tree.leaves(trainer.state.params["model"])[0]
    b = jax.tree.leaves(resumed.state.params["model"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_accum_trainer_epoch(tmp_path):
    """One epoch with accum_steps=2: same schedule, loss finite, improves."""
    trainer = _build(tmp_path, n_epochs=2, accum_steps=2)
    first = trainer.validate(0)
    trainer.train_val()
    assert trainer.validate(99) < first


def test_device_cache_trainer_epoch(tmp_path):
    """--device_cache: frames in HBM, steps fed by index gather. Training
    must behave like the loader path (loss improves, artifacts written)."""
    trainer = _build(tmp_path, device_cache=True)
    assert trainer.device_cache
    assert trainer._train_frames.shape == (32, 32, 48, 3)
    first = trainer.validate(0)
    trainer.train_val()
    last = trainer.validate(99)
    assert last < first
    assert (tmp_path / "trainer_test" / "epoch_002").exists()


def test_device_cache_step_matches_loader_step(tmp_path):
    """The gather train step and the image train step are the same
    computation: identical loss on the identical first batch."""
    import jax

    t_img = _build(tmp_path / "a")
    t_dc = _build(tmp_path / "b", device_cache=True)

    # same init (same seed/config), same first batch (shuffle seed shared)
    imgs, poses, _ = next(iter(t_img.train_loader))
    idx, poses_dc, _ = next(iter(t_dc.train_loader))
    np.testing.assert_array_equal(poses, poses_dc)
    # the index batch gathers exactly the frames the loader decoded
    gathered = np.asarray(t_dc._train_frames)[idx]
    np.testing.assert_array_equal(gathered, imgs)

    _, loss_img = t_img._train_step(
        t_img.state, jnp.asarray(imgs), jnp.asarray(poses), t_img.rng)
    _, loss_dc = t_dc._train_step(
        t_dc.state, jnp.asarray(idx), jnp.asarray(poses_dc), t_dc.rng)
    assert float(loss_img) == pytest.approx(float(loss_dc), abs=1e-6)


def test_device_cache_meshed_trainer(tmp_path):
    """device_cache x data-parallel mesh: the frame buffer replicates, idx
    shards on batch; first-step loss matches the single-device gather path."""
    t_one = _build(tmp_path / "one", device_cache=True)
    t_dp = _build(tmp_path / "dp", device_cache=True, use_mesh=True)
    assert t_dp.mesh is not None and t_dp.mesh.devices.size > 1

    idx, poses, _ = next(iter(t_one.train_loader))
    idx2, poses2, _ = next(iter(t_dp.train_loader))
    np.testing.assert_array_equal(idx, idx2)

    _, loss_one = t_one._train_step(
        t_one.state, jnp.asarray(idx), jnp.asarray(poses), t_one.rng)
    b_idx, b_poses = t_dp._put(idx2, poses2)
    _, loss_dp = t_dp._train_step(t_dp.state, b_idx, b_poses, t_dp.rng)
    assert float(loss_one) == pytest.approx(float(loss_dp), rel=1e-4)
