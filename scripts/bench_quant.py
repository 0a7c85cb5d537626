"""int8 vs bf16 eval throughput on the flagship MapNet (ResNet-34).

Same chained-launch methodology as bench.py; prints one JSON line per mode.
Usage: python scripts/bench_quant.py [--batch 128] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import H, W, T, build, time_forward  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    from geomapnet_tpu.models.quant import (
        mapnet_apply_int8,
        quantize_posenet_variables,
    )

    _, variables, fwd = build(jnp.bfloat16)
    x = jax.random.normal(
        jax.random.PRNGKey(42), (args.batch, T, H, W, 3), jnp.bfloat16
    )

    bf16 = time_forward(fwd, variables, x, args.iters, args.warmup)
    print(json.dumps({"mode": "bf16", "batch": args.batch,
                      "images_per_sec": round(bf16, 1)}))

    qtree = quantize_posenet_variables(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    )
    qtree_dev = jax.device_put(qtree)

    def qfwd(_params, _stats, images):
        return mapnet_apply_int8(qtree_dev, images)

    int8 = time_forward(qfwd, variables, x, args.iters, args.warmup)
    print(json.dumps({"mode": "int8", "batch": args.batch,
                      "images_per_sec": round(int8, 1),
                      "speedup_vs_bf16": round(int8 / bf16, 2)}))


if __name__ == "__main__":
    main()
