"""Stage share probe: how much of the trunk forward is the 7x7/s2 stem?

The first conv (7x7 stride 2 on 3-channel input) maps poorly to the MXU
(3 input channels vs the 128-wide systolic array). If its share of the
trunk is material, the MLPerf-style space-to-depth rewrite (pixel-shuffle
the image to (H/2, W/2, 12) and run an equivalent 4x4 stride-1 conv over
12 channels) is the next serving optimization.

Chained-launch timing as in bench.py. Prints one JSON line per probe.
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

H, W = 256, 341
N = 384  # images per launch (bench.py's 128 tuples x 3)
ITERS, WARMUP = 20, 3


def chain_time(fn, x, iters=ITERS, warmup=WARMUP):
    @jax.jit
    def chained(x, carry):
        out = fn(x + carry.astype(x.dtype) * 1e-12)
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
    from geomapnet_tpu.models import resnet34

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (N, H, W, 3), jnp.bfloat16)

    trunk = resnet34(dtype=jnp.bfloat16)
    tv = jax.jit(trunk.init)(rng, x[:1])

    t_trunk = chain_time(
        lambda a: trunk.apply(tv, a, train=False), x
    )

    # stem's conv+relu alone (bn affine and the maxpool are excluded, so
    # stem_share slightly UNDERSTATES the full stem cost)
    k = jax.random.normal(rng, (7, 7, 3, 64), jnp.bfloat16) * 0.05

    def stem(a):
        y = jax.lax.conv_general_dilated(
            a, k, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jax.nn.relu(y)

    t_stem = chain_time(stem, x)

    # space-to-depth equivalent shape: (N, H/2, W/2+pad, 12) with 4x4 kernel
    xs = jax.random.normal(rng, (N, H // 2, (W + 1) // 2, 12), jnp.bfloat16)
    ks = jax.random.normal(rng, (4, 4, 12, 64), jnp.bfloat16) * 0.05

    def stem_s2d(a):
        y = jax.lax.conv_general_dilated(
            a, ks, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jax.nn.relu(y)

    t_s2d = chain_time(stem_s2d, xs)

    print(json.dumps({
        "trunk_ms": round(t_trunk * 1e3, 2),
        "stem_ms": round(t_stem * 1e3, 2),
        "stem_share": round(t_stem / t_trunk, 3),
        "s2d_stem_ms": round(t_s2d * 1e3, 2),
        "s2d_speedup": round(t_stem / t_s2d, 2),
        "n_images": N,
    }))


if __name__ == "__main__":
    main()
