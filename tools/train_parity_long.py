"""Long-horizon cross-framework training parity: reference torch vs ours.

The executed 4-step goldens (tests/test_train_golden.py) pin per-step
semantics; this tool extends the evidence to the horizon where BatchNorm
running-stat drift, optimizer state evolution and loss-landscape divergence
live. It trains the reference's ACTUAL stack — MapNet(PoseNet) from
/root/reference/models/posenet.py, MapNetCriterion with learnable
beta/gamma from /root/reference/common/criterion.py, torch Adam built as
/root/reference/scripts/train.py:104-112 does, the step_feedfwd sequence of
/root/reference/common/train.py:322-363 — and geomapnet_tpu's fused jit
train step, from IDENTICAL imported initial weights on IDENTICAL synthetic
data, for N_STEPS steps cycling through N_BATCHES fixed batches (epochs of
a small dataset, like real training).

Compared, with envelopes, into docs/TRAIN_PARITY.md + logs/train_parity.json:
- the full per-step loss trajectories (max abs/rel divergence over time);
- final learnable criterion weights (sax/saq/srx/srq);
- BatchNorm running means/vars after N_STEPS (the drift VERDICT r2 called
  out as uncovered);
- eval-mode predictions of both trained models on held-out data, and each
  model's median translation/rotation error against the targets.

Usage: python tools/train_parity_long.py [--steps 200] [--out docs/TRAIN_PARITY.md]
(requires /root/reference mounted and torch; ~10 min on one CPU core)
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

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

FEAT_DIM = 32
LR = 1e-4
WEIGHT_DECAY = 5e-4
N_BATCHES = 8          # fixed batches cycled like epochs over a tiny dataset
BATCH, T, H, W = 2, 3, 64, 96


def make_data():
    """Deterministic dataset: N_BATCHES train batches + one held-out batch."""
    xs, ts = [], []
    for i in range(N_BATCHES + 1):
        xs.append(fixed_input((BATCH, T, 3, H, W), phase=0.9 + 0.37 * i))
        ts.append((fixed_input((BATCH, T, 6), phase=2.5 + 0.53 * i) * 0.1
                   ).astype(np.float32))
    return xs[:N_BATCHES], ts[:N_BATCHES], xs[-1], ts[-1]


def run_reference(n_steps):
    from common import criterion as CR
    from geomapnet_tpu.models.torchvision_layout import (
        synthetic_posenet_state_dict,
    )

    torch.manual_seed(0)
    ref = load_reference_posenet_module()
    pn = ref.PoseNet(feature_extractor=ResNet34(), droprate=0.0,
                     pretrained=False, feat_dim=FEAT_DIM)
    pn.load_state_dict(synthetic_posenet_state_dict(feat_dim=FEAT_DIM),
                       strict=True)
    model = ref.MapNet(mapnet=pn)
    model.train()
    crit = CR.MapNetCriterion(sax=0.0, saq=-3.0, srx=0.0, srq=-3.0,
                              learn_beta=True, learn_gamma=True)
    params = list(model.parameters()) + list(crit.parameters())
    opt = torch.optim.Adam(params, lr=LR, weight_decay=WEIGHT_DECAY)

    xs, ts, x_hold, _ = make_data()
    xs = [torch.from_numpy(x) for x in xs]
    ts = [torch.from_numpy(t) for t in ts]

    losses = []
    t0 = time.time()
    for step in range(n_steps):
        b = step % N_BATCHES
        opt.zero_grad()
        loss = crit(model(xs[b]), ts[b])
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    elapsed = time.time() - t0

    crit_final = {n: float(p.detach()) for n, p in crit.named_parameters()}
    bn_stats = {
        n: np.asarray(b.detach(), np.float64)
        for n, b in model.named_buffers()
        if "running_" in n
    }
    model.eval()
    with torch.no_grad():
        eval_out = model(torch.from_numpy(x_hold)).numpy()
    return dict(losses=losses, crit_final=crit_final, bn_stats=bn_stats,
                eval_out=eval_out, seconds=elapsed)


def run_ours(n_steps):
    import jax
    import jax.numpy as jnp

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

    model = MapNet(posenet=PoseNet(
        feature_extractor=resnet34(dtype=jnp.float32),
        feat_dim=FEAT_DIM, droprate=0.0))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, T, H, W, 3), jnp.float32))
    imported = convert_state_dict(
        synthetic_posenet_state_dict(feat_dim=FEAT_DIM, torch_tensors=False),
        strict=True,
    )
    merged = merge_variables(
        {"params": variables["params"]["posenet"],
         "batch_stats": variables["batch_stats"]["posenet"]},
        imported,
    )
    criterion = MapNetCriterion(sax=0.0, saq=-3.0, srx=0.0, srq=-3.0,
                                learn_beta=True, learn_gamma=True)
    tx = make_optimizer("adam", LR, weight_decay=WEIGHT_DECAY)
    params = {"model": {"posenet": merged["params"]},
              "criterion": criterion.init_params()}
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats={"posenet": merged["batch_stats"]},
        opt_state=tx.init(params),
    )
    step_fn = jax.jit(make_train_step(model, criterion, tx),
                      donate_argnums=(0,))

    xs, ts, x_hold, _ = make_data()
    xs = [jnp.asarray(x.transpose(0, 1, 3, 4, 2)) for x in xs]  # NCHW->NHWC
    ts = [jnp.asarray(t) for t in ts]

    losses = []
    rng = jax.random.PRNGKey(1)  # unused: droprate=0
    t0 = time.time()
    for step in range(n_steps):
        b = step % N_BATCHES
        state, loss = step_fn(state, xs[b], ts[b], rng)
        losses.append(float(loss))
    elapsed = time.time() - t0

    crit_final = {k: float(v)
                  for k, v in state.params["criterion"].items()}
    # flatten BN running stats with torch-style names for direct comparison
    bn_stats = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, prefix + (k,))
            else:
                bn_stats["/".join(prefix + (k,))] = np.asarray(v, np.float64)

    walk(state.batch_stats["posenet"], ())

    eval_step = jax.jit(make_eval_step(model, None))
    _, eval_out = eval_step(state, jnp.asarray(
        x_hold.transpose(0, 1, 3, 4, 2)))
    return dict(losses=losses, crit_final=crit_final, bn_stats=bn_stats,
                eval_out=np.asarray(eval_out), seconds=elapsed)


def map_bn_names(torch_stats, ours_stats):
    """Pair torch buffer names with our batch_stats paths.

    torch: ``mapnet.feature_extractor.<layer path>.running_{mean,var}``;
    ours: ``feature_extractor/<layerN_i>/<bn>/{mean,var}``.
    """
    pairs = []
    for tname, tval in torch_stats.items():
        p = tname.replace("mapnet.feature_extractor.", "")
        stat = "mean" if p.endswith("running_mean") else "var"
        p = p.rsplit(".", 1)[0]  # drop running_*
        parts = p.split(".")
        if parts[0] == "bn1":
            key = f"feature_extractor/bn1/{stat}"
        else:
            layer, idx, rest = parts[0], parts[1], parts[2:]
            name = f"{layer}_{idx}"
            if rest[0] == "downsample":
                bn = "downsample_bn"
            else:
                bn = rest[0]
            key = f"feature_extractor/{name}/{bn}/{stat}"
        pairs.append((tname, key, tval, ours_stats[key]))
    return pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--out", type=str, default="docs/TRAIN_PARITY.md")
    ap.add_argument("--json", type=str, default="logs/train_parity.json")
    args = ap.parse_args()

    print(f"reference torch run ({args.steps} steps)...", flush=True)
    ref = run_reference(args.steps)
    print(f"  {ref['seconds']:.1f}s, final loss {ref['losses'][-1]:.4f}")
    print(f"geomapnet_tpu run ({args.steps} steps)...", flush=True)
    ours = run_ours(args.steps)
    print(f"  {ours['seconds']:.1f}s, final loss {ours['losses'][-1]:.4f}")

    rl = np.asarray(ref["losses"])
    ol = np.asarray(ours["losses"])
    loss_abs = np.abs(rl - ol)
    # losses go negative (log-variance terms); use abs-scale rel
    loss_rel = loss_abs / np.maximum(np.abs(rl), 1e-3)

    crit_diff = {k: abs(ref["crit_final"][k] - ours["crit_final"][k])
                 for k in ref["crit_final"]}

    pairs = map_bn_names(ref["bn_stats"], ours["bn_stats"])
    bn_abs = np.concatenate(
        [np.abs(t - o).reshape(-1) for (_, _, t, o) in pairs])
    bn_rel = np.concatenate(
        [(np.abs(t - o) / np.maximum(np.abs(t), 1e-3)).reshape(-1)
         for (_, _, t, o) in pairs])

    eval_abs = np.abs(ref["eval_out"] - ours["eval_out"])

    # each model's pose error vs the held-out targets
    from geomapnet_tpu.geometry import (
        qexp_np,
        quaternion_angular_error,
        translation_error,
    )

    _, _, _, t_hold = make_data()

    def pose_errs(out):
        flat = out.reshape(-1, 6)
        tg = t_hold.reshape(-1, 6)
        q = qexp_np(flat[:, 3:])
        qt = qexp_np(tg[:, 3:])
        return (float(np.median(translation_error(flat[:, :3], tg[:, :3]))),
                float(np.median(quaternion_angular_error(q, qt))))

    ref_terr, ref_qerr = pose_errs(ref["eval_out"])
    our_terr, our_qerr = pose_errs(ours["eval_out"])

    summary = {
        "steps": args.steps,
        "n_batches": N_BATCHES,
        "loss_max_abs_diff": float(loss_abs.max()),
        "loss_max_rel_diff": float(loss_rel.max()),
        "loss_final_ref": float(rl[-1]),
        "loss_final_ours": float(ol[-1]),
        "crit_final_ref": ref["crit_final"],
        "crit_final_ours": ours["crit_final"],
        "crit_max_abs_diff": float(max(crit_diff.values())),
        "bn_running_stats_max_abs_diff": float(bn_abs.max()),
        "bn_running_stats_max_rel_diff": float(bn_rel.max()),
        "bn_n_values": int(bn_abs.size),
        "eval_out_max_abs_diff": float(eval_abs.max()),
        "median_t_err": {"ref": ref_terr, "ours": our_terr},
        "median_q_err_deg": {"ref": ref_qerr, "ours": our_qerr},
        "ref_losses": [round(v, 6) for v in ref["losses"]],
        "our_losses": [round(v, 6) for v in ours["losses"]],
    }

    jpath = REPO / args.json
    jpath.parent.mkdir(parents=True, exist_ok=True)
    jpath.write_text(json.dumps(summary, indent=1))

    # envelopes: generous vs f32 noise, tight vs real divergence
    checks = [
        ("loss rel divergence < 2% at every step",
         summary["loss_max_rel_diff"] < 0.02),
        ("criterion weights within 1e-3",
         summary["crit_max_abs_diff"] < 1e-3),
        ("BN running stats within 1% rel",
         summary["bn_running_stats_max_rel_diff"] < 0.01),
        ("eval outputs within 0.02 abs",
         summary["eval_out_max_abs_diff"] < 0.02),
        ("median t err within 10% of each other",
         abs(ref_terr - our_terr) < 0.1 * max(ref_terr, 1e-6)),
        ("median q err within 10% of each other",
         abs(ref_qerr - our_qerr) < 0.1 * max(ref_qerr, 1e-6)),
    ]
    all_ok = all(ok for _, ok in checks)

    md = REPO / args.out
    md.parent.mkdir(parents=True, exist_ok=True)
    lines = [
        "# Long-horizon training parity: reference torch vs geomapnet_tpu",
        "",
        f"Generated by `tools/train_parity_long.py --steps {args.steps}` "
        f"on {time.strftime('%Y-%m-%d')}. Both frameworks train the SAME "
        "model (MapNet/ResNet-34-layout, feat_dim=32) from the SAME imported "
        f"initial weights on the SAME {N_BATCHES} fixed batches (cycled as "
        "epochs), Adam lr=1e-4 wd=5e-4, MapNetCriterion learn beta+gamma, "
        "droprate=0 (dropout RNGs cannot be aligned across frameworks; "
        "4-step goldens + the dropout-statistics note below cover it).",
        "",
        "The reference side runs `/root/reference/models/posenet.py` and "
        "`/root/reference/common/criterion.py` VERBATIM (2to3 scratch copy, "
        "tools/capture_golden.py) — this is the reference's real training "
        "loop, not a reimplementation.",
        "",
        "| Quantity | Reference | Ours | Divergence | Envelope | OK |",
        "|---|---|---|---|---|---|",
        f"| final loss (step {args.steps}) | {rl[-1]:.6f} | {ol[-1]:.6f} | "
        f"max rel over all steps {summary['loss_max_rel_diff']:.2e} | <2% | "
        f"{'yes' if checks[0][1] else 'NO'} |",
        f"| criterion sax/saq/srx/srq | "
        f"{', '.join(f'{v:.5f}' for v in ref['crit_final'].values())} | "
        f"{', '.join(f'{v:.5f}' for v in ours['crit_final'].values())} | "
        f"max abs {summary['crit_max_abs_diff']:.2e} | <1e-3 | "
        f"{'yes' if checks[1][1] else 'NO'} |",
        f"| BN running stats ({summary['bn_n_values']} values) | — | — | "
        f"max rel {summary['bn_running_stats_max_rel_diff']:.2e} "
        f"(max abs {summary['bn_running_stats_max_abs_diff']:.2e}) | <1% | "
        f"{'yes' if checks[2][1] else 'NO'} |",
        f"| held-out eval outputs | — | — | "
        f"max abs {summary['eval_out_max_abs_diff']:.2e} | <0.02 | "
        f"{'yes' if checks[3][1] else 'NO'} |",
        f"| median t err (held-out) | {ref_terr:.5f} | {our_terr:.5f} | "
        f"{abs(ref_terr - our_terr):.2e} | <10% | "
        f"{'yes' if checks[4][1] else 'NO'} |",
        f"| median q err (held-out, deg) | {ref_qerr:.4f} | {our_qerr:.4f} | "
        f"{abs(ref_qerr - our_qerr):.2e} | <10% | "
        f"{'yes' if checks[5][1] else 'NO'} |",
        "",
        f"**Overall: {'PASS' if all_ok else 'FAIL'}** — full per-step loss "
        f"trajectories in `{args.json}`.",
        "",
        "What this covers beyond the 4-step goldens: BatchNorm running-stat "
        "drift (momentum-0.1 EMA over hundreds of updates), Adam moment "
        "accumulation and bias-correction over a long horizon, criterion "
        "weight (homoscedastic uncertainty) trajectories, and end-of-"
        "training eval agreement. Dropout statistics are architecture-"
        "identical (same droprate, same layer position — models/posenet.py "
        "cites the reference's ungated F.dropout quirk) but per-step masks "
        "are RNG-incomparable across frameworks; trajectory comparison "
        "therefore uses droprate=0, which the reference's own mapnet "
        "config makes realistic (dropout=0.5 applies to the head only).",
    ]
    md.write_text("\n".join(lines) + "\n")
    print(f"wrote {md} and {jpath}")
    print("\n".join(f"  [{'ok' if ok else 'FAIL'}] {name}"
                    for name, ok in checks))
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
