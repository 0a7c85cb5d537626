"""End-to-end smoke: train a tiny MapNet on the synthetic scene and verify
evaluation error improves over the untrained model, exercising every layer
(data -> model -> loss -> optimizer -> checkpoint -> batched eval)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geomapnet_tpu.cli.eval import evaluate
from geomapnet_tpu.data import MF, Loader, SyntheticScene
from geomapnet_tpu.losses import MapNetCriterion
from geomapnet_tpu.models import MapNet, PoseNet, resnet18
from geomapnet_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)


@pytest.fixture(scope="module")
def trained():
    model = MapNet(posenet=PoseNet(
        feature_extractor=resnet18(), feat_dim=32, droprate=0.0))
    criterion = MapNetCriterion(saq=-3.0, srq=-3.0, learn_beta=True,
                                learn_gamma=True)
    tx = make_optimizer("adam", 2e-3)

    train_ds = MF(SyntheticScene(n_frames=48, height=32, width=48), steps=3,
                  skip=2)
    loader = Loader(train_ds, batch_size=8, shuffle=True, drop_last=True)
    imgs0, poses0, _ = next(iter(loader))
    state = create_train_state(model, criterion, tx, jax.random.PRNGKey(0),
                               jnp.asarray(imgs0))
    state0 = state
    step = jax.jit(make_train_step(model, criterion, tx))
    rng = jax.random.PRNGKey(1)
    for _ in range(6):  # epochs
        for imgs, poses, _ in loader:
            state, loss = step(state, jnp.asarray(imgs), jnp.asarray(poses),
                               rng)
    return model, state0, state, float(loss)


def test_training_reduces_eval_error(trained):
    model, state0, state, _ = trained
    val = MF(SyntheticScene(n_frames=32, height=32, width=48, train=False),
             steps=3, skip=2)
    before = evaluate(model, state0, val, batch_size=8, progress=False)
    after = evaluate(model, state, val, batch_size=8, progress=False)
    assert after["median_t"] < before["median_t"]
    assert np.isfinite(after["median_q"])


def test_checkpoint_roundtrip(trained, tmp_path):
    model, _, state, _ = trained
    path = save_checkpoint(tmp_path, 7, state)
    epoch, restored = restore_checkpoint(path, state)
    assert epoch == 7
    a = jax.tree.leaves(state.params["model"])[0]
    b = jax.tree.leaves(restored.params["model"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # eval with restored state matches
    val = MF(SyntheticScene(n_frames=16, height=32, width=48, train=False),
             steps=3, skip=2)
    r1 = evaluate(model, state, val, batch_size=8, progress=False)
    r2 = evaluate(model, restored, val, batch_size=8, progress=False)
    assert r1["median_t"] == pytest.approx(r2["median_t"])


def test_pgo_eval_path(trained):
    """--pose_graph equivalent: tuples with VOs, device-batched PGO."""
    from geomapnet_tpu.data import vos_logq_np

    model, _, state, _ = trained
    val = MF(SyntheticScene(n_frames=32, height=32, width=48, train=False),
             steps=3, skip=2, include_vos=True, vo_func=vos_logq_np)
    res = evaluate(model, state, val, batch_size=8, pose_graph=True,
                   pgo_weights=dict(sax=1.0, saq=1.0, srx=0.1, srq=0.1),
                   progress=False)
    assert np.isfinite(res["median_t"])
    assert res["pred_poses"].shape[1] == 7


def test_posenet_single_frame_eval():
    """Non-tuple (PoseNet) eval path: _Single wrapper batch handling."""
    from geomapnet_tpu.losses import PoseNetCriterion
    from geomapnet_tpu.train import create_train_state, make_optimizer

    model = PoseNet(feature_extractor=resnet18(), feat_dim=32, droprate=0.0)
    criterion = PoseNetCriterion()
    tx = make_optimizer("adam", 1e-3)
    ds = SyntheticScene(n_frames=10, height=32, width=48, train=False)
    x0 = jnp.asarray(ds[0][0][None])
    state = create_train_state(model, criterion, tx, jax.random.PRNGKey(0), x0)
    res = evaluate(model, state, ds, batch_size=4, progress=False)
    assert res["pred_poses"].shape == (10, 7)
    assert np.isfinite(res["median_t"]) and np.isfinite(res["median_q"])
