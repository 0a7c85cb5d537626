"""MapNet -> MapNet++ fine-tune workflow, end to end.

The reference's flagship workflow (README.md:198-210, scripts/train.py:86-112)
trains MapNet, then fine-tunes it semi-supervised as MapNet++ from the saved
checkpoint: labeled tuples + unlabeled tuples whose targets are measured VOs
(or GPS positions in gps_mode). This test runs the WHOLE chain on the
synthetic scene: train tiny MapNet -> snapshot -> load_model_params into a
fresh MapNet++ Trainer (MFOnline + MapNetOnlineCriterion) -> fine-tune, for
both the VO and the gps_mode variants.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geomapnet_tpu.cli.config import ExperimentConfig
from geomapnet_tpu.data import MF, MFOnline, SyntheticScene, vos_logq_np
from geomapnet_tpu.losses import MapNetCriterion, MapNetOnlineCriterion
from geomapnet_tpu.models import MapNet, PoseNet, resnet18
from geomapnet_tpu.train.checkpoint import load_model_params
from geomapnet_tpu.train.loop import Trainer

H, W, STEPS = 32, 48, 3

pytestmark = pytest.mark.slow  # full-workflow module; see docs/TESTING.md fast lane


def _model(filter_nans: bool = False):
    # filter_nans mirrors the reference's mapnet++-only filter_hook
    # (scripts/train.py:77-78)
    return MapNet(posenet=PoseNet(
        feature_extractor=resnet18(), feat_dim=32, droprate=0.0,
        filter_nans=filter_nans))


def _cfg(**kw):
    base = dict(n_epochs=2, batch_size=6, do_val=False, seed=7, snapshot=2,
                val_freq=10, print_freq=1, opt="adam", lr=2e-3)
    base.update(kw)
    return ExperimentConfig(**base)


def _train_losses(logdir):
    lines = [json.loads(l) for l in open(logdir / "metrics.jsonl")]
    return [l["loss"] for l in lines if l["kind"] == "train"]


def _online_dataset(gps_mode: bool):
    """MFOnline as cli/builders.py wires it for mapnet++."""
    mf_kwargs = dict(steps=STEPS, skip=2, seed=7)
    train_mf = MF(SyntheticScene(n_frames=24, height=H, width=W), **mf_kwargs)
    unlab = SyntheticScene(n_frames=24, height=H, width=W, train=False,
                           real=True)
    if gps_mode:
        val_mf = MF(unlab, no_duplicates=True, **mf_kwargs)
    else:
        gt = SyntheticScene(n_frames=24, height=H, width=W, train=False,
                            skip_images=True)
        val_mf = MF(unlab, include_vos=True, real=True, no_duplicates=True,
                    gt_dataset=gt, vo_func=vos_logq_np, **mf_kwargs)
    return MFOnline(train_mf, val_mf, gps_mode=gps_mode)


@pytest.fixture(scope="module")
def mapnet_checkpoint(tmp_path_factory):
    """Stage 1: train MapNet and snapshot it."""
    root = tmp_path_factory.mktemp("mapnet")
    train_ds = MF(SyntheticScene(n_frames=24, height=H, width=W),
                  steps=STEPS, skip=2)
    trainer = Trainer(
        _model(),
        MapNetCriterion(saq=-3.0, srq=-3.0, learn_beta=True, learn_gamma=True),
        _cfg(), "mapnet_stage", train_ds, None,
        logdir_root=str(root), use_mesh=False,
    )
    trainer.train_val()
    ckpt = root / "mapnet_stage" / "epoch_002"
    assert ckpt.exists()
    return ckpt


@pytest.mark.parametrize("gps_mode", [False, True], ids=["vo", "gps"])
def test_mapnetpp_finetune_from_checkpoint(mapnet_checkpoint, tmp_path,
                                           gps_mode):
    criterion = MapNetOnlineCriterion(
        saq=-3.0, srq=-3.0, learn_beta=True, learn_gamma=True,
        gps_mode=gps_mode,
    )
    name = f"mapnetpp_{'gps' if gps_mode else 'vo'}"
    # the reference's mapnet++ recipe: NaN-gradient guard on the log-q head
    # and max_grad_norm=5 (configs/mapnet++_*.ini) — without them the VO
    # term's gradients blow up within a few steps (observed here too)
    trainer = Trainer(
        _model(filter_nans=True), criterion,
        _cfg(n_epochs=2, lr=1e-4, max_grad_norm=5.0), name,
        _online_dataset(gps_mode), None,
        logdir_root=str(tmp_path), use_mesh=False,
    )

    fresh_conv1 = np.asarray(
        trainer.state.params["model"]["posenet"]["feature_extractor"]["conv1"]
        ["kernel"]
    )
    trainer.state = load_model_params(mapnet_checkpoint, trainer.state)
    loaded_conv1 = np.asarray(
        trainer.state.params["model"]["posenet"]["feature_extractor"]["conv1"]
        ["kernel"]
    )
    # the checkpoint's trained weights actually landed (different init seeds
    # would also differ, but identical trees would mean the load was a no-op)
    assert not np.allclose(fresh_conv1, loaded_conv1)

    # progress check on a FIXED batch evaluated before/after fine-tuning
    # (per-batch train losses on this 3-batch semi-supervised set are too
    # noisy for epoch-mean comparisons — batches mix different tuples)
    from geomapnet_tpu.data.loader import Loader
    from geomapnet_tpu.train import make_eval_step

    imgs, poses, _ = next(iter(
        Loader(_online_dataset(gps_mode), 6, shuffle=False,
               drop_last=True)
    ))
    imgs, poses = jnp.asarray(imgs), jnp.asarray(poses)
    eval_step = jax.jit(make_eval_step(trainer.model, criterion))
    loss_before = float(eval_step(trainer.state, imgs, poses)[0])

    trainer.train_val()
    losses = _train_losses(tmp_path / name)
    assert losses and np.all(np.isfinite(losses))
    loss_after = float(eval_step(trainer.state, imgs, poses)[0])
    assert loss_after < loss_before
    assert (tmp_path / name / "epoch_002").exists()


def test_posenet_checkpoint_loads_into_mapnet(mapnet_checkpoint, tmp_path):
    """Prefix reconciliation the other way: a MapNet checkpoint restores
    into a bare PoseNet state (the reference's prefix-tolerant loader,
    common/train.py:22-53)."""
    from geomapnet_tpu.losses import PoseNetCriterion

    trainer = Trainer(
        PoseNet(feature_extractor=resnet18(), feat_dim=32, droprate=0.0),
        PoseNetCriterion(saq=-3.0, learn_beta=True),
        _cfg(n_epochs=1), "posenet_from_mapnet",
        SyntheticScene(n_frames=16, height=H, width=W), None,
        logdir_root=str(tmp_path), use_mesh=False,
    )
    before = np.asarray(
        trainer.state.params["model"]["feature_extractor"]["conv1"]["kernel"]
    )
    trainer.state = load_model_params(mapnet_checkpoint, trainer.state)
    after = np.asarray(
        trainer.state.params["model"]["feature_extractor"]["conv1"]["kernel"]
    )
    assert not np.allclose(before, after)


@pytest.mark.parametrize("gps_mode", [False, True], ids=["vo", "gps"])
def test_mapnetpp_device_cache_matches_loader(tmp_path, gps_mode):
    """--device_cache on MapNet++: MFOnline's two frame splits upload as one
    concatenated HBM buffer (frame_sources order), batches become index
    gathers — the gather step computes EXACTLY what the image step computes
    on the identical first batch."""
    def build(root, **kw):
        return Trainer(
            _model(filter_nans=True),
            MapNetOnlineCriterion(saq=-3.0, srq=-3.0, learn_beta=True,
                                  learn_gamma=True, gps_mode=gps_mode),
            _cfg(n_epochs=1, lr=1e-4, max_grad_norm=5.0), "mppdc",
            _online_dataset(gps_mode), None,
            logdir_root=str(root), use_mesh=False, **kw,
        )

    t_img = build(tmp_path / "img")
    t_dc = build(tmp_path / "dc", device_cache=True)
    assert t_dc.device_cache
    # 24 labeled + 24 unlabeled frames, one concatenated buffer
    assert t_dc._train_frames.shape == (48, H, W, 3)

    imgs, poses, _ = next(iter(t_img.train_loader))
    idx, poses_dc, _ = next(iter(t_dc.train_loader))
    np.testing.assert_allclose(poses, poses_dc, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(t_dc._train_frames)[idx], imgs)

    # the jit'd steps donate their state arg — keep the returned states
    t_img.state, loss_img = t_img._train_step(
        t_img.state, jnp.asarray(imgs), jnp.asarray(poses), t_img.rng)
    t_dc.state, loss_dc = t_dc._train_step(
        t_dc.state, jnp.asarray(idx), jnp.asarray(poses_dc), t_dc.rng)
    assert float(loss_img) == pytest.approx(float(loss_dc), abs=1e-6)

    # and the full schedule runs on the gather path
    t_dc.train_val()
    losses = _train_losses(tmp_path / "dc" / "mppdc")
    assert losses and np.all(np.isfinite(losses))


@pytest.mark.slow
def test_mapnetpp_ingest_overlap_matches_serial(tmp_path):
    """--ingest_overlap on MapNet++ (MFOnline, TWO frame sources): a
    FrameRecorder per source stages the warmup epoch's decodes and the
    finalize concatenates in ``frame_sources`` order — the finalized buffer
    and the final weights must match the serial upload-then-train run
    (VERDICT r4 item 5: the single-source restriction is gone)."""
    def build(root, **kw):
        return Trainer(
            _model(filter_nans=True),
            MapNetOnlineCriterion(saq=-3.0, srq=-3.0, learn_beta=True,
                                  learn_gamma=True),
            _cfg(n_epochs=3, lr=1e-4, max_grad_norm=5.0), "mppio",
            _online_dataset(False), None,
            logdir_root=str(root), use_mesh=False, **kw,
        )

    t_serial = build(tmp_path / "serial", device_cache=True)
    t_warm = build(tmp_path / "warm", device_cache=True,
                   ingest_overlap=True)
    assert t_warm._warmup_pending and t_warm._train_frames is None
    assert len(t_warm._recorders) == 2  # one per MFOnline frame source

    t_serial.train_val()
    t_warm.train_val()

    assert not t_warm._warmup_pending
    np.testing.assert_array_equal(np.asarray(t_warm._train_frames),
                                  np.asarray(t_serial._train_frames))
    for a, b in zip(jax.tree.leaves(t_serial.state.params),
                    jax.tree.leaves(t_warm.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)
