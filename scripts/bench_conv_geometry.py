"""Conv-geometry probe: can a matmul formulation beat XLA's conv lowering
on the ResNet body shapes where measured efficiency is 26-45% of peak?

PERF.md ("the missing MFU is intra-conv geometry") attributes the bf16
ceiling to how the trunk's odd spatial extents (64x86 ... 8x11) tile onto
the MXU inside XLA's convolution. This bench tests the two classic
reformulations that change that geometry WITHOUT changing the math:

- ``im2col``: materialize 3x3 patches (lax.conv_general_dilated_patches)
  and run ONE big (B*H*W, 9C) @ (9C, O) matmul. Costs a 9x activation
  blow-up in HBM; wins if the MXU time saved exceeds the extra traffic.
- ``shift9``: decompose the 3x3 conv into 9 shifted (B*H*W, C) @ (C, O)
  matmuls accumulated in f32 — no patch materialization, pure matmul
  geometry, 9 smaller MXU calls.

Both are verified against the XLA conv to bf16 tolerance before timing.
Timing is the chained-launch pattern from bench.py (the only honest one
through this tunnel). Per shape prints one JSON line with ms/iter and
TFLOP/s for each formulation.

Usage: python scripts/bench_conv_geometry.py [--batch 384] [--iters 10]
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
import numpy as np
from jax import lax

# the TPU plugin in this image re-asserts itself over $JAX_PLATFORMS; a
# post-import config update makes a CPU smoke run actually run on CPU
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# (name, H, W, C) for the 3x3 stages of the 256x341 ResNet-34 trunk
# (C == O in every in-stage block; strided entry blocks are <10% of time)
SHAPES = [
    ("layer1_64x86x64", 64, 86, 64),
    ("layer2_32x43x128", 32, 43, 128),
    ("layer3_16x22x256", 16, 22, 256),
    ("layer4_8x11x512", 8, 11, 512),
]
DN = ("NHWC", "HWIO", "NHWC")


def conv_xla(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=DN,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def conv_im2col(x, w):
    B, H, W, C = x.shape
    O = w.shape[-1]
    # patches feature dim is ordered (C, kh, kw) flattened
    p = lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), "SAME", dimension_numbers=DN)
    wr = jnp.transpose(w, (2, 0, 1, 3)).reshape(9 * C, O)
    out = jnp.dot(p.reshape(B * H * W, 9 * C), wr,
                  preferred_element_type=jnp.float32)
    return out.reshape(B, H, W, O).astype(x.dtype)


def conv_shift9(x, w):
    B, H, W, C = x.shape
    O = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((B * H * W, O), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, W, C))
            acc = acc + jnp.dot(sl.reshape(B * H * W, C), w[dy, dx],
                                preferred_element_type=jnp.float32)
    return acc.reshape(B, H, W, O).astype(x.dtype)


FORMULATIONS = {
    "xla_conv": conv_xla,
    "im2col": conv_im2col,
    "shift9": conv_shift9,
}


def time_fn(fn, x, w, iters, warmup=3):
    """Chained launches, one readback (bench.py pattern)."""

    @jax.jit
    def chained(x_, carry):
        out = fn(x_ + carry.astype(x_.dtype) * 1e-12, w)
        return jnp.sum(out.astype(jnp.float32))

    carry = jnp.zeros(())
    for _ in range(warmup):
        carry = chained(x, carry)
    float(carry)
    carry = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = chained(x, carry)
    float(carry)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)

    rng = jax.random.PRNGKey(0)

    # correctness gate on a small case (f32, CPU-cheap) before timing
    kx, kw = jax.random.split(rng)
    xs = jax.random.normal(kx, (2, 8, 11, 32), jnp.float32)
    ws = jax.random.normal(kw, (3, 3, 32, 32), jnp.float32) * 0.1
    ref = np.asarray(conv_xla(xs, ws))
    for name, fn in FORMULATIONS.items():
        np.testing.assert_allclose(np.asarray(fn(xs, ws)), ref,
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"{name} disagrees with XLA conv")
    print("correctness: all formulations match XLA conv", flush=True)

    for name, H, W, C in SHAPES:
        kx, kw = jax.random.split(jax.random.fold_in(rng, hash(name) % 997))
        x = (jax.random.normal(kx, (args.batch, H, W, C), jnp.float32)
             .astype(dtype))
        w = (jax.random.normal(kw, (3, 3, C, C), jnp.float32) * 0.05
             ).astype(dtype)
        flops = 2 * args.batch * H * W * C * C * 9
        row = {"shape": name, "batch": args.batch, "dtype": str(dtype)}
        for fname, fn in FORMULATIONS.items():
            dt = time_fn(fn, x, w, args.iters)
            row[fname + "_ms"] = round(dt * 1e3, 3)
            row[fname + "_tflops"] = round(flops / dt / 1e12, 1)
        best = min(FORMULATIONS, key=lambda f: row[f + "_ms"])
        row["best"] = best
        row["speedup_vs_xla"] = round(
            row["xla_conv_ms"] / row[best + "_ms"], 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
