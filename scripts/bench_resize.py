"""Compare device resize strategies at the RobotCar pipeline shape.

Candidates (all planar (N, 3, 480, 640) f32 -> (N, 3, 256, 341)):
- jax.image.resize(method='linear', antialias=False)  [current pipeline]
- resize_bilinear_matmul (separable dense matmuls on the MXU)

Plus the full raw pipeline (960x1280 GBRG -> 256x341 normalized) with each.
Chained-launch timing (see PERF.md methodology). Prints one JSON line each.
"""

from __future__ import annotations

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

N = 32
WARMUP, ITERS = 3, 30


def chain_time(fn, x, iters=ITERS, warmup=WARMUP):
    @jax.jit
    def chained(x, carry):
        out = fn(x + carry.astype(x.dtype) * 0)
        return jnp.sum(out.astype(jnp.float32))

    carry = jnp.zeros((), jnp.float32)
    for _ in range(warmup):
        carry = chained(x, carry)
    float(carry)
    carry = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = chained(x, carry)
    float(carry)
    return (time.perf_counter() - t0) / iters


def main():
    from geomapnet_tpu.ops.image import resize_bilinear_matmul

    rng = jax.random.PRNGKey(0)
    img = jax.random.uniform(rng, (N, 3, 480, 640), jnp.float32) * 255

    def xla_resize(x):
        return jax.image.resize(x, (N, 3, 256, 341), method="linear",
                                antialias=False)

    def mxu_resize(x):
        return resize_bilinear_matmul(x, 256, 341)

    for name, fn in [("xla_linear", xla_resize), ("mxu_matmul", mxu_resize)]:
        dt = chain_time(fn, img)
        print(json.dumps({
            "stage": f"resize_{name}",
            "images_per_sec": round(N / dt, 1),
            "ms_per_batch32": round(dt * 1000, 3),
        }))

    # full raw pipeline comparison
    from geomapnet_tpu.ops.pallas_image import demosaic_half_normalize

    raw = jax.random.randint(rng, (N, 960, 1280), 0, 256, jnp.int32).astype(
        jnp.uint8
    )
    mean, std = (0.5, 0.5, 0.5), (0.25, 0.25, 0.25)

    def pipe_xla_resize(x):
        img = demosaic_half_normalize(x, mean, std, dtype=jnp.float32,
                                      planar=True)
        img = jax.image.resize(img, (N, 3, 256, 341), method="linear",
                               antialias=False)
        return jnp.transpose(img, (0, 2, 3, 1)).astype(jnp.bfloat16)

    def pipe_mxu_resize(x):
        img = demosaic_half_normalize(x, mean, std, dtype=jnp.float32,
                                      planar=True)
        img = resize_bilinear_matmul(img, 256, 341)
        return jnp.transpose(img, (0, 2, 3, 1)).astype(jnp.bfloat16)

    for name, fn in [("xla_resize", pipe_xla_resize),
                     ("mxu_resize", pipe_mxu_resize)]:
        dt = chain_time(fn, raw)
        print(json.dumps({
            "stage": f"full_pipeline_{name}",
            "images_per_sec": round(N / dt, 1),
            "ms_per_batch32": round(dt * 1000, 3),
        }))


if __name__ == "__main__":
    main()
