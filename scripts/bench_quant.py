"""Serving-path throughput ladder on the flagship MapNet (ResNet-34).

Modes: bf16 flax model, BN-folded bf16 (``--fold_bn``), int8 dynamic scales,
int8 static calibrated scales (``--calibrate``), and static + int8 fc_feat
head (``--quantize_heads``). Same chained-launch methodology as bench.py;
prints one JSON line per mode.

Usage: python scripts/bench_quant.py [--batch 128] [--iters 20]
       [--modes bf16,folded,int8,int8_static,int8_static_heads]
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

ALL_MODES = ("bf16", "folded", "int8", "int8_static", "int8_static_heads",
             "int8_fused", "int8_fused_heads")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--modes", type=str, default=",".join(ALL_MODES))
    args = ap.parse_args()
    modes = args.modes.split(",")

    from geomapnet_tpu.models.quant import (
        calibrate_activation_scales,
        fold_posenet_variables,
        mapnet_apply_folded,
        mapnet_apply_int8,
        quantize_posenet_variables,
    )

    _, variables, fwd = build(jnp.bfloat16)
    x = jax.random.normal(
        jax.random.PRNGKey(42), (args.batch, T, H, W, 3), jnp.bfloat16
    )
    vtree = {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}
    results = {}

    def run(mode, f):
        r = time_forward(f, variables, x, args.iters, args.warmup)
        results[mode] = r
        line = {"mode": mode, "batch": args.batch,
                "images_per_sec": round(r, 1)}
        if "bf16" in results and mode != "bf16":
            line["speedup_vs_bf16"] = round(r / results["bf16"], 2)
        print(json.dumps(line), flush=True)

    if "bf16" in modes:
        run("bf16", fwd)

    if "folded" in modes:
        ftree = jax.device_put(fold_posenet_variables(vtree))
        run("folded", lambda p, s, im: mapnet_apply_folded(ftree, im))

    qtree = quantize_posenet_variables(vtree)
    if "int8" in modes:
        qdev = jax.device_put(qtree)
        run("int8", lambda p, s, im: mapnet_apply_int8(qdev, im))

    static_modes = {"int8_static", "int8_static_heads", "int8_fused",
                    "int8_fused_heads"}
    if static_modes & set(modes):
        calib = [jax.random.normal(jax.random.PRNGKey(7), (8, T, H, W, 3),
                                   jnp.bfloat16)]
        qstat = jax.device_put(calibrate_activation_scales(qtree, calib))
        if "int8_static" in modes:
            run("int8_static", lambda p, s, im: mapnet_apply_int8(qstat, im))
        if "int8_fused" in modes:
            # int8 dataflow: requant in conv epilogues, int8 inter-site
            # activations (models/quant.py::_trunk_forward_fused)
            run("int8_fused",
                lambda p, s, im: mapnet_apply_int8(qstat, im, fused=True))
        if "int8_static_heads" in modes or "int8_fused_heads" in modes:
            qh = quantize_posenet_variables(vtree, quantize_heads=True)
            qh = jax.device_put(calibrate_activation_scales(qh, calib))
            if "int8_static_heads" in modes:
                run("int8_static_heads",
                    lambda p, s, im: mapnet_apply_int8(qh, im))
            if "int8_fused_heads" in modes:
                run("int8_fused_heads",
                    lambda p, s, im: mapnet_apply_int8(qh, im, fused=True))


if __name__ == "__main__":
    main()
