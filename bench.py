"""Benchmark: eval images/sec/chip on the flagship MapNet (ResNet-34).

The reference publishes no throughput numbers and hard-codes eval batch size 1
(/root/reference/scripts/eval.py:138-139): each image pays a full Python ->
framework -> device round trip. The baseline here is therefore *that eval
style measured on this same chip* (batch-1, non-overlapped, float32 — the
reference's dtype); the headline metric is the optimized serving path:
batched tuples, jit-fused forward, int8 PTQ trunk on the MXU (models/
quant.py; accuracy bounds pinned in tests/test_quant.py, bf16 comparison in
scripts/bench_quant.py). ``vs_baseline`` is the speedup of the optimized
path over the reference-style path.

Prints exactly one JSON line:
    {"metric": "eval_images_per_sec_per_chip", "value": ..., "unit":
     "images/sec", "vs_baseline": ...}
"""

from __future__ import annotations

import json
import sys
import os
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: first run pays XLA compile (~minutes over the
# TPU tunnel), subsequent runs start hot
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# 7Scenes input geometry: 480x640 -> shortest-side-256 resize -> 256x341
H, W, T = 256, 341, 3
# 384 images per launch. Round-2 sweep (scripts/bench_sweep.py, PERF.md):
# 42 -> 9.1-9.3k img/s, 128 -> 9.67-9.73k (3 reps), 168 -> 9.75k; 128 is the
# knee — bigger batches pay HBM for <1% more.
BATCH_TUPLES = 128
WARMUP, ITERS = 3, 20
# Baseline protocol (pinned since round 1 for cross-round comparability):
# 20 chained batch-1 launches + one readback. The single readback RTT makes
# one rep noisy (vs_baseline swung 11-18x run to run), so take the median
# of several reps. Raising the iteration count instead would redefine the
# baseline as pure batch-1 device throughput — the reference's eval style
# (scripts/eval.py:138-139) is NON-overlapped, so keeping some per-run sync
# cost in the denominator is the honest emulation.
BS1_ITERS, BS1_REPS = 20, 5


def build(dtype):
    from geomapnet_tpu.models import MapNet, PoseNet, resnet34  # noqa: deferred heavy import

    model = MapNet(
        posenet=PoseNet(feature_extractor=resnet34(dtype=dtype),
                        feat_dim=2048, droprate=0.5, dtype=dtype)
    )
    x = jnp.zeros((1, T, H, W, 3), dtype)
    # jitted init: eager init dispatches hundreds of tiny programs (minutes
    # of startup over the TPU tunnel)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    def forward(params, batch_stats, images):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, images, train=False
        )

    return model, variables, jax.jit(forward)


def time_forward(fwd, variables, batch, iters, warmup, in_format=None):
    """Chained-launch throughput: each iteration's input depends on the
    previous output, and completion is forced by one final host readback.

    (On this TPU tunnel neither ``block_until_ready`` nor per-call readback
    gives clean numbers — the former returns early, the latter adds a large
    host round-trip per call. Chaining serializes the launches on device and
    amortizes a single readback over the whole run.)
    """
    params, stats = variables["params"], variables["batch_stats"]

    def step(x, carry):
        out = fwd(params, stats, x + carry.astype(x.dtype) * 1e-12)
        return jnp.sum(out.astype(jnp.float32))

    chained = jax.jit(step, in_shardings=(in_format, None)) \
        if in_format is not None else jax.jit(step)

    carry = jnp.zeros(())
    for _ in range(warmup):
        carry = chained(batch, carry)
    float(carry)  # flush

    carry = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = chained(batch, carry)
    float(carry)  # forces completion of the whole chain
    dt = time.perf_counter() - t0
    per_launch = batch.shape[0] * (batch.shape[1] if batch.ndim == 5 else 1)
    return per_launch * iters / dt


def main():
    rng = jax.random.PRNGKey(42)

    # baseline: reference eval style — float32, batch of ONE tuple per launch
    _, var32, fwd32 = build(jnp.float32)
    x1 = jax.random.normal(rng, (1, T, H, W, 3), jnp.float32)
    baseline = sorted(
        time_forward(fwd32, var32, x1, BS1_ITERS, WARMUP)
        for _ in range(BS1_REPS)
    )[BS1_REPS // 2]

    # optimized serving path: int8 PTQ trunk with CALIBRATED static
    # activation scales + int8 fc_feat head (models/quant.py; eval CLI
    # `--quantize int8 --calibrate N --quantize_heads`), large batched
    # launch. Static scales remove the per-conv activation absmax reduction
    # the dynamic scheme pays — measured 15.1k vs 12.1k img/s (1.54x vs
    # 1.23x over bf16) on this chip, round 3. Accuracy bounds are pinned in
    # tests/test_quant.py; the full mode ladder lives in
    # scripts/bench_quant.py.
    from geomapnet_tpu.models.quant import (
        calibrate_activation_scales,
        posenet_apply_int8,
        quantize_posenet_variables,
    )

    qtree = quantize_posenet_variables(
        {"params": var32["params"], "batch_stats": var32["batch_stats"]},
        quantize_heads=True,
    )
    calib = jax.random.normal(
        jax.random.PRNGKey(7), (8, T, H, W, 3), jnp.bfloat16)
    qtree = jax.device_put(calibrate_activation_scales(qtree, [calib]))

    # Serving layout, round 4 (measured ladder: scripts/bench_input_layout.py):
    # - tuples ship T-FOLDED, (B*T, H, W, 3): the producer emits folded
    #   batches (a free host/numpy view), so the program never pays the
    #   bitcast-enabling full-batch relayout (+2.3%)
    # - FUSED REQUANT: int8 inter-site activations, requant in conv
    #   epilogues (models/quant.py fused=True; +12% on hardware)
    # - entry buffer in the stem conv's preferred LAYOUT (derived via
    #   Layout.AUTO): serving producers (device preprocess / cache gather)
    #   compile with out_shardings to emit it, killing the last input
    #   relayout; the chained harness holds such a buffer fixed (+1%)
    mode = "int8_fused_folded_batch%d" % BATCH_TUPLES

    def qfwd(params, stats, images):
        return posenet_apply_int8(qtree, images, fused=True)

    xf = jax.random.normal(rng, (BATCH_TUPLES * T, H, W, 3), jnp.bfloat16)
    fmt = None
    try:
        from jax._src.layout import Format, Layout

        compiled = jax.jit(
            lambda x: qfwd(None, None, x),
            in_shardings=(Format(Layout.AUTO),),
        ).lower(xf).compile()
        fmt = compiled.input_formats[0][-1]
        # a non-identity is required: a jitted identity short-circuits to an
        # alias and silently ignores out_shardings. The transpose round-trip
        # additionally encodes the TARGET layout into the HLO: the
        # persistent compilation cache does not key on custom output
        # layouts, so a layout-independent body can return a stale
        # executable compiled for a different session's layout (observed:
        # Layout.AUTO picks different layouts across sessions).
        perm = tuple(int(d) for d in fmt.layout.major_to_minor)
        inv = tuple(perm.index(i) for i in range(len(perm)))
        relaid = jax.jit(
            lambda a: jnp.transpose(jnp.transpose(a, perm), inv) * 1,
            out_shardings=fmt,
        )(xf)
        # Belt and braces: only keep the format path if the buffer actually
        # landed in it — otherwise time_forward's in_shardings would raise.
        if relaid.format.layout == fmt.layout:
            xf, mode = relaid, mode + "_fmt"
        else:
            fmt = None
    except Exception:
        fmt = None
    try:
        optimized = time_forward(qfwd, var32, xf, ITERS, WARMUP,
                                 in_format=fmt)
    except Exception:
        if fmt is None:
            raise
        # last-resort: never let the layout fast path sink the bench run
        fmt, mode = None, mode.replace("_fmt", "")
        optimized = time_forward(qfwd, var32, xf, ITERS, WARMUP)

    print(json.dumps({
        "metric": "eval_images_per_sec_per_chip",
        "value": round(optimized, 1),
        "unit": "images/sec",
        "vs_baseline": round(optimized / baseline, 2),
        "mode": mode,
    }))


if __name__ == "__main__":
    sys.exit(main())
