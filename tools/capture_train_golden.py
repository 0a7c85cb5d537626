"""Training-trajectory golden: the reference's ACTUAL train step vs ours.

Runs the reference's real modules end to end in torch — MapNet(PoseNet)
(/root/reference/models/posenet.py), MapNetCriterion with learnable
beta/gamma (/root/reference/common/criterion.py:54-109), torch Adam over
model+criterion params exactly as /root/reference/scripts/train.py:104-112
builds it, the ``step_feedfwd`` sequence zero_grad/forward/loss/backward/step
(/root/reference/common/train.py:322-363) — for several steps on fixed data,
and records the loss trajectory + final criterion weights into
tests/golden_train.py.

tests/test_train_golden.py replays the identical setup through our fused
jit train step. Matching trajectories pin, in one artifact: forward parity,
criterion value AND gradient parity (including the learnable-weight grads),
torch-Adam semantics (coupled weight decay ordering, bias correction), and
train-mode BatchNorm batch-stat normalization.

Usage: python tools/capture_train_golden.py  (requires torch; rewrites the
golden module — rerun after any intentional semantics change.)
"""

import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from capture_golden import SCRATCH, setup_scratch  # noqa: E402

setup_scratch()
sys.path.insert(0, str(SCRATCH))

import torch  # noqa: E402

from capture_posenet_golden import (  # noqa: E402
    ResNet34,
    fixed_input,
    load_reference_posenet_module,
)
from geomapnet_tpu.models.torchvision_layout import (  # noqa: E402
    synthetic_posenet_state_dict,
)

FEAT_DIM = 32
N_STEPS = 4
LR = 1e-4
WEIGHT_DECAY = 5e-4
OUT = REPO / "tests/golden_train.py"


def _run_trajectory(model, crit, x, targ, n_steps=N_STEPS,
                    grad_keys=(), opt_factory=None):
    """zero_grad/forward/loss/backward/step for n_steps; returns
    (losses, step1 grads for crit params + grad_keys, final crit params)."""
    params = list(model.parameters()) + list(crit.parameters())
    if opt_factory is None:
        opt_factory = lambda p: torch.optim.Adam(  # noqa: E731
            p, lr=LR, weight_decay=WEIGHT_DECAY)
    opt = opt_factory(params)
    named = dict(model.named_parameters())
    losses, grads1 = [], {}
    for step_i in range(n_steps):
        opt.zero_grad()
        loss = crit(model(x), targ)
        loss.backward()
        if step_i == 0:
            for name, p in crit.named_parameters():
                if p.grad is not None:  # gps_mode: srq is unused
                    grads1[f"crit.{name}"] = np.asarray(p.grad.detach())
            for key in grad_keys:
                grads1[key] = np.asarray(named[key].grad.detach())
        opt.step()
        losses.append(float(loss.detach()))
    final = {n: float(p.detach()) for n, p in crit.named_parameters()}
    return losses, grads1, final


def capture_online(ref, CR):
    """MapNet++ trajectories: MapNetOnlineCriterion, VO and gps modes.

    The reference enables the NaN-grad filter hook for mapnet++
    (/root/reference/scripts/train.py:77-78); data here is finite so the
    hook is an identity, like our nan_grad_guard."""
    def fresh_model():
        pn = ref.PoseNet(feature_extractor=ResNet34(), droprate=0.0,
                         pretrained=False, feat_dim=FEAT_DIM,
                         filter_nans=True)
        pn.load_state_dict(synthetic_posenet_state_dict(feat_dim=FEAT_DIM),
                           strict=True)
        m = ref.MapNet(mapnet=pn)
        m.train()
        return m

    # batch layout: T labeled frames + T unlabeled (composite.py:117-126);
    # targets [T abs || T-1 VOs], or [T abs || T gps] in gps_mode
    x = torch.from_numpy(fixed_input((1, 4, 3, 48, 64), phase=0.3))
    targ_vo = torch.from_numpy(
        (fixed_input((1, 3, 6), phase=1.1) * 0.1).astype(np.float32))
    targ_gps = torch.from_numpy(
        (fixed_input((1, 4, 6), phase=1.7) * 0.1).astype(np.float32))

    crit = CR.MapNetOnlineCriterion(sax=0.0, saq=-3.0, srx=0.0, srq=-3.0,
                                    learn_beta=True, learn_gamma=True)
    vo = _run_trajectory(fresh_model(), crit, x, targ_vo,
                         grad_keys=("mapnet.fc_wpqr.weight",))

    crit_gps = CR.MapNetOnlineCriterion(sax=0.0, saq=-3.0, srx=0.0,
                                        srq=-3.0, learn_beta=True,
                                        learn_gamma=True, gps_mode=True)
    gps = _run_trajectory(fresh_model(), crit_gps, x, targ_gps)
    return vo, gps


def main() -> None:
    from common import criterion as CR

    torch.manual_seed(0)  # nothing stochastic (droprate=0), belt and braces
    ref = load_reference_posenet_module()
    pn = ref.PoseNet(feature_extractor=ResNet34(), droprate=0.0,
                     pretrained=False, feat_dim=FEAT_DIM)
    pn.load_state_dict(synthetic_posenet_state_dict(feat_dim=FEAT_DIM),
                       strict=True)
    model = ref.MapNet(mapnet=pn)
    model.train()

    crit = CR.MapNetCriterion(sax=0.0, saq=-3.0, srx=0.0, srq=-3.0,
                              learn_beta=True, learn_gamma=True)
    # param list exactly as scripts/train.py:104-112: model params plus the
    # learnable criterion weights, one optimizer over all of them
    params = list(model.parameters()) + list(crit.parameters())
    opt = torch.optim.Adam(params, lr=LR, weight_decay=WEIGHT_DECAY)

    x = torch.from_numpy(fixed_input((2, 3, 3, 64, 96), phase=0.9))
    targ = torch.from_numpy(
        (fixed_input((2, 3, 6), phase=2.5) * 0.1).astype(np.float32)
    )

    losses = []
    grads1 = {}
    for step_i in range(N_STEPS):
        opt.zero_grad()
        loss = crit(model(x), targ)
        loss.backward()
        if step_i == 0:
            # first-step gradients where f32 reduction noise is negligible:
            # the scalar criterion-weight grads and the small head tensors.
            # These pin criterion gradient semantics exactly; the loss
            # trajectory then checks the optimizer path with f32-drift
            # tolerances.
            for name, p in crit.named_parameters():
                grads1[f"crit.{name}"] = np.asarray(p.grad.detach())
            named = dict(model.named_parameters())
            for key in (
                "mapnet.fc_xyz.weight", "mapnet.fc_xyz.bias",
                "mapnet.fc_wpqr.weight", "mapnet.fc_wpqr.bias",
                "mapnet.feature_extractor.fc.bias",
            ):
                grads1[key] = np.asarray(named[key].grad.detach())
        opt.step()
        losses.append(float(loss.detach()))

    crit_final = {
        name: float(p.detach()) for name, p in crit.named_parameters()
    }

    model.eval()
    with torch.no_grad():
        out_after = model(x).numpy()

    (on_losses, on_grads1, on_final), (gps_losses, gps_grads1, gps_final) = (
        capture_online(ref, CR)
    )

    # SGD + momentum + coupled weight decay (the reference Optimizer's sgd
    # path, /root/reference/common/optimizer.py:12-27): pins torch momentum
    # buffer init (first step = raw grad) and decay-before-momentum coupling
    pn2 = ref.PoseNet(feature_extractor=ResNet34(), droprate=0.0,
                      pretrained=False, feat_dim=FEAT_DIM)
    pn2.load_state_dict(synthetic_posenet_state_dict(feat_dim=FEAT_DIM),
                        strict=True)
    model2 = ref.MapNet(mapnet=pn2)
    model2.train()
    crit2 = CR.MapNetCriterion(sax=0.0, saq=-3.0, srx=0.0, srq=-3.0,
                               learn_beta=True, learn_gamma=True)
    sgd_losses, _, sgd_final = _run_trajectory(
        model2, crit2, x, targ,
        opt_factory=lambda p: torch.optim.SGD(
            p, lr=1e-3, momentum=0.9, weight_decay=WEIGHT_DECAY),
    )

    def fmt(a):
        body = np.array2string(np.asarray(a, np.float64), separator=", ",
                               precision=17, threshold=10**6,
                               max_line_width=76)
        return "\n".join("    " + ln.strip() for ln in body.splitlines())

    OUT.write_text(
        '"""Training trajectory OBSERVED from the reference implementation.\n'
        "\nGenerated by tools/capture_train_golden.py: the reference's\n"
        "MapNet(PoseNet) + MapNetCriterion(learn beta/gamma) + torch Adam\n"
        "(lr=1e-4, weight_decay=5e-4) run for 4 steps on fixed data with the\n"
        "deterministic synthetic weights.\n"
        '"""\n\nimport numpy as np\n\n'
        f"FEAT_DIM = {FEAT_DIM}\nN_STEPS = {N_STEPS}\n"
        f"LR = {LR}\nWEIGHT_DECAY = {WEIGHT_DECAY}\n\n"
        "TRAIN_LOSSES = np.array(\n" + fmt(losses) + "\n)\n\n"
        "CRIT_FINAL = " + repr(crit_final) + "\n\n"
        "STEP1_GRADS = {\n"
        + "".join(
            f"    {k!r}: np.array(\n{fmt(v)}\n    ),\n"
            for k, v in grads1.items()
        )
        + "}\n\n"
        "EVAL_OUT_AFTER = np.array(\n" + fmt(out_after) + "\n)\n\n"
        "ONLINE_LOSSES = np.array(\n" + fmt(on_losses) + "\n)\n\n"
        "ONLINE_STEP1_GRADS = {\n"
        + "".join(
            f"    {k!r}: np.array(\n{fmt(v)}\n    ),\n"
            for k, v in on_grads1.items()
        )
        + "}\n\n"
        "ONLINE_CRIT_FINAL = " + repr(on_final) + "\n\n"
        "GPS_LOSSES = np.array(\n" + fmt(gps_losses) + "\n)\n\n"
        "GPS_STEP1_GRADS = {\n"
        + "".join(
            f"    {k!r}: np.array(\n{fmt(v)}\n    ),\n"
            for k, v in gps_grads1.items()
        )
        + "}\n\n"
        "GPS_CRIT_FINAL = " + repr(gps_final) + "\n\n"
        "SGD_LR, SGD_MOMENTUM = 1e-3, 0.9\n"
        "SGD_LOSSES = np.array(\n" + fmt(sgd_losses) + "\n)\n\n"
        "SGD_CRIT_FINAL = " + repr(sgd_final) + "\n"
    )
    print(f"wrote {OUT}: losses {losses}")
    print(f"criterion final: {crit_final}")


if __name__ == "__main__":
    main()
