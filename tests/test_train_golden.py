"""Our fused train step vs the reference's OBSERVED training trajectory.

tests/golden_train.py holds per-step losses + final criterion weights from
running the reference's real modules (MapNet(PoseNet) + MapNetCriterion +
torch Adam over model and criterion params) for 4 steps on fixed data
(tools/capture_train_golden.py). Matching trajectories pin forward parity,
criterion value AND gradient parity, torch-Adam semantics (coupled weight
decay ordering, bias correction) and train-mode BatchNorm in one artifact.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import numpy.testing as npt

from geomapnet_tpu.losses import MapNetCriterion
from geomapnet_tpu.models import MapNet, PoseNet, resnet34
from geomapnet_tpu.models.torch_import import (
    convert_state_dict,
    merge_variables,
)
from geomapnet_tpu.models.torchvision_layout import (
    synthetic_posenet_state_dict,
)
from geomapnet_tpu.train import (
    TrainState,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

sys.path.insert(0, os.path.dirname(__file__))
from golden_train import (  # noqa: E402
    CRIT_FINAL,
    EVAL_OUT_AFTER,
    FEAT_DIM,
    LR,
    N_STEPS,
    STEP1_GRADS,
    TRAIN_LOSSES,
    WEIGHT_DECAY,
)

pytestmark = pytest.mark.slow  # full-workflow module; see docs/TESTING.md fast lane


def _fixed_input(shape, phase=0.5):
    n = int(np.prod(shape))
    return (np.sin(np.arange(n, dtype=np.float64) * 0.31 + phase) * 0.8
            ).reshape(shape).astype(np.float32)


def test_training_trajectory_matches_reference():
    model = MapNet(posenet=PoseNet(
        feature_extractor=resnet34(dtype=jnp.float32),
        feat_dim=FEAT_DIM, droprate=0.0))
    x1 = jnp.zeros((1, 3, 64, 96, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x1)
    imported = convert_state_dict(
        synthetic_posenet_state_dict(feat_dim=FEAT_DIM, torch_tensors=False),
        strict=True,
    )
    merged = merge_variables(
        {
            "params": variables["params"]["posenet"],
            "batch_stats": variables["batch_stats"]["posenet"],
        },
        imported,
    )

    criterion = MapNetCriterion(sax=0.0, saq=-3.0, srx=0.0, srq=-3.0,
                                learn_beta=True, learn_gamma=True)
    tx = make_optimizer("adam", LR, weight_decay=WEIGHT_DECAY)
    params = {
        "model": {"posenet": merged["params"]},
        "criterion": criterion.init_params(),
    }
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats={"posenet": merged["batch_stats"]},
        opt_state=tx.init(params),
    )

    # same fixed data as the capture, NCHW -> NHWC
    x = _fixed_input((2, 3, 3, 64, 96), phase=0.9).transpose(0, 1, 3, 4, 2)
    targ = (_fixed_input((2, 3, 6), phase=2.5) * 0.1).astype(np.float32)
    x, targ = jnp.asarray(x), jnp.asarray(targ)

    # step-1 gradients where f32 reduction noise is negligible: the scalar
    # criterion-weight grads and the small head tensors. Exact-semantics
    # check (criterion gradient flow, backward through the heads).
    def loss_fn(p):
        out, _ = model.apply(
            {"params": p["model"], "batch_stats": state.batch_stats},
            x, train=True, mutable=["batch_stats"],
        )
        return criterion(p["criterion"], out, targ)

    grads = jax.jit(jax.grad(loss_fn))(state.params)
    posenet = grads["model"]["posenet"]
    got_grads = {
        "crit.sax": grads["criterion"]["sax"],
        "crit.saq": grads["criterion"]["saq"],
        "crit.srx": grads["criterion"]["srx"],
        "crit.srq": grads["criterion"]["srq"],
        # torch linear weights are (out, in); ours are (in, out)
        "mapnet.fc_xyz.weight": posenet["fc_xyz"]["kernel"].T,
        "mapnet.fc_xyz.bias": posenet["fc_xyz"]["bias"],
        "mapnet.fc_wpqr.weight": posenet["fc_wpqr"]["kernel"].T,
        "mapnet.fc_wpqr.bias": posenet["fc_wpqr"]["bias"],
        "mapnet.feature_extractor.fc.bias": posenet["fc_feat"]["bias"],
    }
    for name, want in STEP1_GRADS.items():
        got = np.asarray(got_grads[name]).reshape(np.asarray(want).shape)
        # scalar criterion grads see almost no f32 noise; head tensor grads
        # are feats^T @ dL/dout and inherit the trunk forward's ~5e-5 noise
        atol = 1e-5 if name.startswith("crit.") else 5e-4
        npt.assert_allclose(got, np.asarray(want), atol=atol, rtol=1e-3,
                            err_msg=name)

    step = jax.jit(make_train_step(model, criterion, tx))
    rng = jax.random.PRNGKey(0)  # droprate=0: unused
    losses = []
    for _ in range(N_STEPS):
        state, loss = step(state, x, targ, rng)
        losses.append(float(loss))

    # per-step losses: step 1 is forward+loss parity (observed 2e-5); later
    # steps accumulate f32 reduction-order noise through Adam's eps-scale
    # divisions (torch CPU vs XLA reduce in different orders), so the bound
    # widens. A semantic difference (wrong decay order, wrong grad) is
    # pinned by the STEP1_GRADS check above, not by this drift envelope.
    npt.assert_allclose(losses[0], TRAIN_LOSSES[0], atol=2e-4)
    npt.assert_allclose(losses, TRAIN_LOSSES, rtol=2e-3, atol=5e-3)

    # the learnable loss weights follow the same path
    for name, want in CRIT_FINAL.items():
        got = float(state.params["criterion"][name])
        npt.assert_allclose(got, want, atol=5e-5, err_msg=name)

    # eval forward AFTER training: exercises the running-stat updates.
    # models.resnet.BatchNorm reproduces torch's unbiased running-var
    # update, so this bound only carries the trajectory's f32 drift.
    eval_step = jax.jit(make_eval_step(model))
    _, out = eval_step(state, x)
    npt.assert_allclose(np.asarray(out), EVAL_OUT_AFTER, atol=2e-3)


def _merged_mapnet_state(criterion, tx, filter_nans=False):
    model = MapNet(posenet=PoseNet(
        feature_extractor=resnet34(dtype=jnp.float32),
        feat_dim=FEAT_DIM, droprate=0.0, filter_nans=filter_nans))
    x1 = jnp.zeros((1, 2, 48, 64, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x1)
    imported = convert_state_dict(
        synthetic_posenet_state_dict(feat_dim=FEAT_DIM, torch_tensors=False),
        strict=True,
    )
    merged = merge_variables(
        {
            "params": variables["params"]["posenet"],
            "batch_stats": variables["batch_stats"]["posenet"],
        },
        imported,
    )
    params = {
        "model": {"posenet": merged["params"]},
        "criterion": criterion.init_params(),
    }
    return model, TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats={"posenet": merged["batch_stats"]},
        opt_state=tx.init(params),
    )


def _run_ours(model, criterion, tx, state, x, targ, n_steps):
    step = jax.jit(make_train_step(model, criterion, tx))
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(n_steps):
        state, loss = step(state, x, targ, rng)
        losses.append(float(loss))
    return losses, state


def test_mapnetpp_online_trajectory_matches_reference():
    """MapNet++ semi-supervised loss: calc_vos-on-predictions gradient flow
    + the NaN-guard identity, against the reference's observed run."""
    from geomapnet_tpu.losses import MapNetOnlineCriterion
    from golden_train import (
        GPS_CRIT_FINAL,
        GPS_LOSSES,
        GPS_STEP1_GRADS,
        ONLINE_CRIT_FINAL,
        ONLINE_LOSSES,
        ONLINE_STEP1_GRADS,
    )

    x = _fixed_input((1, 4, 3, 48, 64), phase=0.3).transpose(0, 1, 3, 4, 2)
    x = jnp.asarray(x)

    # --- VO mode ---
    criterion = MapNetOnlineCriterion(sax=0.0, saq=-3.0, srx=0.0, srq=-3.0,
                                      learn_beta=True, learn_gamma=True)
    tx = make_optimizer("adam", LR, weight_decay=WEIGHT_DECAY)
    model, state = _merged_mapnet_state(criterion, tx, filter_nans=True)
    targ = jnp.asarray((_fixed_input((1, 3, 6), phase=1.1) * 0.1
                        ).astype(np.float32))

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p["model"], "batch_stats": state.batch_stats},
            x, train=True, mutable=["batch_stats"],
        )
        return criterion(p["criterion"], out, targ)

    grads = jax.jit(jax.grad(loss_fn))(state.params)
    for name in ("sax", "saq", "srx", "srq"):
        npt.assert_allclose(
            float(grads["criterion"][name]),
            float(ONLINE_STEP1_GRADS[f"crit.{name}"]),
            atol=1e-5, rtol=1e-3, err_msg=name,
        )
    got_w = np.asarray(grads["model"]["posenet"]["fc_wpqr"]["kernel"]).T
    npt.assert_allclose(got_w, ONLINE_STEP1_GRADS["mapnet.fc_wpqr.weight"],
                        atol=5e-4, rtol=1e-3)

    losses, state = _run_ours(model, criterion, tx, state, x, targ, N_STEPS)
    # the SE(3) log map on near-identity relative predictions is
    # ill-conditioned, so f32 noise amplifies faster here than in the
    # MapNetCriterion trajectory: early steps tight, tail enveloped at 1%
    npt.assert_allclose(losses[0], ONLINE_LOSSES[0], atol=2e-4)
    npt.assert_allclose(losses[:2], ONLINE_LOSSES[:2], atol=1e-3)
    npt.assert_allclose(losses, ONLINE_LOSSES, rtol=1e-2, atol=1e-2)
    for name, want in ONLINE_CRIT_FINAL.items():
        npt.assert_allclose(float(state.params["criterion"][name]), want,
                            atol=2e-4, err_msg=name)

    # --- gps_mode ---
    criterion = MapNetOnlineCriterion(sax=0.0, saq=-3.0, srx=0.0, srq=-3.0,
                                      learn_beta=True, learn_gamma=True,
                                      gps_mode=True)
    tx = make_optimizer("adam", LR, weight_decay=WEIGHT_DECAY)
    model, state = _merged_mapnet_state(criterion, tx, filter_nans=True)
    targ = jnp.asarray((_fixed_input((1, 4, 6), phase=1.7) * 0.1
                        ).astype(np.float32))
    losses, state = _run_ours(model, criterion, tx, state, x, targ, N_STEPS)
    npt.assert_allclose(losses[0], GPS_LOSSES[0], atol=2e-4)
    npt.assert_allclose(losses[:2], GPS_LOSSES[:2], atol=1e-3)
    npt.assert_allclose(losses, GPS_LOSSES, rtol=1e-2, atol=1e-2)
    assert "crit.srq" not in GPS_STEP1_GRADS  # no rotation VO term
    for name, want in GPS_CRIT_FINAL.items():
        if name == "srq":
            continue  # compared below
        npt.assert_allclose(float(state.params["criterion"][name]), want,
                            atol=5e-4, err_msg=name)
    # Documented divergence: srq is learnable but UNUSED in gps_mode. torch
    # skips params whose grad is None (srq stays exactly at init, -3.0);
    # our optimizer still weight-decays every learnable criterion param, so
    # srq creeps by ~lr per step through Adam's sign normalization. The
    # weight is dead in this mode, so the drift is behaviorally inert.
    got_srq = float(state.params["criterion"]["srq"])
    assert abs(GPS_CRIT_FINAL["srq"] - (-3.0)) < 1e-12  # torch: untouched
    assert abs(got_srq - (-3.0)) < N_STEPS * LR * 1.5  # ours: bounded creep


def test_sgd_momentum_trajectory_matches_reference():
    """torch SGD semantics (momentum buffer init = raw first grad, coupled
    weight decay before momentum) against the reference's observed run."""
    from golden_train import SGD_CRIT_FINAL, SGD_LOSSES, SGD_LR, SGD_MOMENTUM

    criterion = MapNetCriterion(sax=0.0, saq=-3.0, srx=0.0, srq=-3.0,
                                learn_beta=True, learn_gamma=True)
    tx = make_optimizer("sgd", SGD_LR, weight_decay=WEIGHT_DECAY,
                        momentum=SGD_MOMENTUM)
    model = MapNet(posenet=PoseNet(
        feature_extractor=resnet34(dtype=jnp.float32),
        feat_dim=FEAT_DIM, droprate=0.0))
    x1 = jnp.zeros((1, 3, 64, 96, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x1)
    imported = convert_state_dict(
        synthetic_posenet_state_dict(feat_dim=FEAT_DIM, torch_tensors=False),
        strict=True,
    )
    merged = merge_variables(
        {
            "params": variables["params"]["posenet"],
            "batch_stats": variables["batch_stats"]["posenet"],
        },
        imported,
    )
    params = {
        "model": {"posenet": merged["params"]},
        "criterion": criterion.init_params(),
    }
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats={"posenet": merged["batch_stats"]},
        opt_state=tx.init(params),
    )

    x = _fixed_input((2, 3, 3, 64, 96), phase=0.9).transpose(0, 1, 3, 4, 2)
    targ = (_fixed_input((2, 3, 6), phase=2.5) * 0.1).astype(np.float32)
    losses, state = _run_ours(model, criterion, tx, state,
                              jnp.asarray(x), jnp.asarray(targ), N_STEPS)
    # SGD applies raw gradients (no Adam normalization), so the ~0.4%
    # norm-level f32 reduction noise between torch-CPU and XLA conv
    # backward enters the params directly and compounds: step 1 is tight
    # (forward parity), the tail is an envelope.
    npt.assert_allclose(losses[0], SGD_LOSSES[0], atol=2e-4)
    npt.assert_allclose(losses[:2], SGD_LOSSES[:2], atol=3e-3)
    npt.assert_allclose(losses, SGD_LOSSES, rtol=5e-2, atol=5e-2)
    for name, want in SGD_CRIT_FINAL.items():
        npt.assert_allclose(float(state.params["criterion"][name]), want,
                            atol=2e-3, err_msg=name)
