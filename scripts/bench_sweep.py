"""Batch-size / XLA-flag sweep for the eval headline (one config per run).

Each configuration must run in a fresh process (XLA flags are read at
backend init), so this script benches exactly ONE config taken from env:
    BENCH_BATCH=42 BENCH_XLA="" python scripts/bench_sweep.py
Prints one JSON line {"batch": N, "flags": "...", "images_per_sec": X}.

Driver loop (results land in PERF.md):
    for b in 32 42 48 64; do BENCH_BATCH=$b python scripts/bench_sweep.py; done
"""

import json
import os
import sys

flags = os.environ.get("BENCH_XLA", "")
if flags:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + flags).strip()

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import H, W, T, WARMUP, build, time_forward  # noqa: E402


def main():
    batch = int(os.environ.get("BENCH_BATCH", "42"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    _, variables, fwd = build(jnp.bfloat16)
    x = jax.random.normal(
        jax.random.PRNGKey(42), (batch, T, H, W, 3), jnp.bfloat16
    )
    ips = time_forward(fwd, variables, x, iters, WARMUP)
    print(json.dumps({
        "batch": batch,
        "flags": flags,
        "images_per_sec": round(ips, 1),
    }))


if __name__ == "__main__":
    main()
