"""Launch-fusion sweep: train throughput vs steps_per_launch over the
device frame cache.

With the whole scene resident in HBM (``--device_cache``) a training epoch's
per-step host work collapses to shipping a (B, T) int32 index batch — so the
wall on remote/tunneled rigs is the per-launch dispatch RPC. ``Trainer
steps_per_launch=K`` scans K optimizer steps inside ONE launch; this bench
measures the realized img/s for a ladder of K on the real chip.

Method: one Trainer per K on the same synthetic scene (identical model and
schedule), timing the steady-state epochs (epoch 1+: the upload and the
compile are paid in epoch 0). Prints one JSON line per K.

Usage: python scripts/bench_launch_fusion.py [--ks 1,2,4,8] [--frames 256]
       [--batch 32] [--epochs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# the TPU plugin in this image re-asserts itself over $JAX_PLATFORMS; a
# post-import config update makes a CPU smoke run actually run on CPU
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="1,2,4,8")
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=341)
    ap.add_argument("--steps", type=int, default=3, help="tuple length T")
    args = ap.parse_args()

    from geomapnet_tpu.cli.config import ExperimentConfig
    from geomapnet_tpu.data import MF, SyntheticScene
    from geomapnet_tpu.losses import MapNetCriterion
    from geomapnet_tpu.models import MapNet, PoseNet, resnet34
    from geomapnet_tpu.train.loop import Trainer

    for K in [int(k) for k in args.ks.split(",")]:
        dtype = jnp.bfloat16
        model = MapNet(posenet=PoseNet(
            feature_extractor=resnet34(dtype=dtype), feat_dim=2048,
            droprate=0.5, dtype=dtype))
        criterion = MapNetCriterion(saq=-3.0, srq=-3.0, learn_beta=True,
                                    learn_gamma=True)
        cfg = ExperimentConfig(
            n_epochs=args.epochs, batch_size=args.batch, do_val=False,
            seed=7, snapshot=10**6, val_freq=10**6, print_freq=10**6,
            opt="adam", lr=1e-4,
        )
        ds = MF(SyntheticScene(n_frames=args.frames, height=args.height,
                               width=args.width),
                steps=args.steps, skip=2, seed=7)
        t = Trainer(model, criterion, cfg, f"launch_fusion_k{K}", ds, None,
                    logdir_root="/tmp/bench_lf", use_mesh=False,
                    device_cache=True, steps_per_launch=K)
        n_batches = len(t.train_loader)

        # epoch 0 pays compile; time epochs 1..n-1
        cfg0 = t.config
        t0 = time.perf_counter()
        t.train_val()
        total = time.perf_counter() - t0

        # steady state: rerun the inner epoch loop alone, timed
        epochs_timed = max(1, args.epochs - 1)
        t.start_epoch = 0
        t.config = cfg0
        import numpy as np

        from geomapnet_tpu.train.loop import chunked

        t1 = time.perf_counter()
        for _ in range(epochs_timed):
            if t._train_scan is not None:
                for chunk in chunked(t.train_loader, K):
                    if len(chunk) == K:
                        t.state, _ = t._train_scan(
                            t.state,
                            jnp.asarray(np.stack([c[0] for c in chunk])),
                            jnp.asarray(np.stack([c[1] for c in chunk])),
                            t.rng)
                    else:
                        for idx, poses, _ in chunk:
                            i_, p_ = t._put(idx, poses)
                            t.state, _ = t._train_step(t.state, i_, p_, t.rng)
            else:
                for idx, poses, _ in t.train_loader:
                    i_, p_ = t._put(idx, poses)
                    t.state, _ = t._train_step(t.state, i_, p_, t.rng)
        # force completion (value readback is the only real fence here)
        _ = float(jax.tree.leaves(t.state.params["model"])[0].sum())
        dt = time.perf_counter() - t1
        imgs = n_batches * args.batch * args.steps * epochs_timed
        print(json.dumps({
            "steps_per_launch": K,
            "n_batches_per_epoch": n_batches,
            "train_images_per_sec": round(imgs / dt, 1),
            "steady_epoch_secs": round(dt / epochs_timed, 3),
            "first_run_total_secs": round(total, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
