"""Train-step throughput sweep on the flagship MapNet (ResNet-34, bf16).

Measures the fully-fused train step (forward + MapNet criterion + backward +
Adam update + BN-stat update in ONE XLA launch) at several batch sizes.
Serialization comes for free: each step consumes the previous step's state,
so the chain executes back-to-back on device; one final loss readback forces
completion (see PERF.md "Measurement methodology" for why
``block_until_ready`` can't be trusted on this tunnel).

Usage: python scripts/bench_train.py [--batches 8,16,32,64] [--iters 20]
Prints one JSON line per batch size.
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

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W, T = 256, 341, 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="8,16,32,64")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--f32", action="store_true", help="float32 compute")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialized backward (jax.checkpoint)")
    ap.add_argument("--bn_bf16_bwd", action="store_true",
                    help="bfloat16 BN backward (forward bit-identical; "
                    "models/resnet.py bn_train_norm_bf16bwd)")
    args = ap.parse_args()

    from geomapnet_tpu.losses import MapNetCriterion
    from geomapnet_tpu.models import MapNet, PoseNet, resnet34
    from geomapnet_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    model = MapNet(posenet=PoseNet(
        feature_extractor=resnet34(dtype=dtype,
                                   bn_bf16_bwd=args.bn_bf16_bwd),
        feat_dim=2048, droprate=0.5,
        dtype=dtype,
    ))
    criterion = MapNetCriterion(saq=-3.0, srq=-3.0, learn_beta=True,
                                learn_gamma=True)
    tx = make_optimizer("adam", 1e-4, weight_decay=5e-4)
    rng = jax.random.PRNGKey(0)

    for bs in [int(b) for b in args.batches.split(",")]:
        images = jax.random.normal(rng, (bs, T, H, W, 3), dtype)
        targets = jax.random.normal(jax.random.PRNGKey(1), (bs, T, 6),
                                    jnp.float32) * 0.1
        state = create_train_state(model, criterion, tx, rng, images[:1])
        step = jax.jit(make_train_step(model, criterion, tx, remat=args.remat),
                       donate_argnums=(0,))
        for _ in range(args.warmup):
            state, loss = step(state, images, targets, rng)
        float(loss)

        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, loss = step(state, images, targets, rng)
        float(loss)  # state chain serializes; this forces completion
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "train_images_per_sec_per_chip",
            "batch_tuples": bs,
            "remat": args.remat,
            "bn_bf16_bwd": args.bn_bf16_bwd,
            "dtype": str(dtype.__name__),
            "value": round(bs * T * args.iters / dt, 1),
            "step_ms": round(1000 * dt / args.iters, 2),
            "unit": "images/sec",
        }))


if __name__ == "__main__":
    main()
