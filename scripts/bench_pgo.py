"""Device PGO throughput: vmapped Gauss-Newton windows/sec on one chip.

The reference solves one scipy pose graph per trajectory window on the host
(/root/reference/scripts/eval.py:177-182, batch size 1). Here all windows
optimize in parallel on device; this measures windows/sec for the two
topologies at the reference's eval shape (steps=7, 10 GN iterations).
Chained-launch timing. Prints one JSON line per config.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

WARMUP, ITERS = 2, 10


def main():
    from geomapnet_tpu.pgo import optimize_poses_batch

    rng = np.random.RandomState(0)
    steps = 7
    for fc, batch in [(False, 256), (False, 1024), (True, 256), (True, 1024)]:
        n_pairs = steps * (steps - 1) // 2 if fc else steps - 1
        q = rng.randn(batch, steps, 4)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        poses = jnp.asarray(
            np.concatenate([rng.randn(batch, steps, 3), q], axis=-1),
            jnp.float32,
        )
        qv = rng.randn(batch, n_pairs, 4)
        qv /= np.linalg.norm(qv, axis=-1, keepdims=True)
        vos = jnp.asarray(
            np.concatenate([rng.randn(batch, n_pairs, 3) * 0.1, qv], axis=-1),
            jnp.float32,
        )

        fn = jax.jit(lambda p, v: optimize_poses_batch(
            p, v, sax=1.0, saq=1.0, srx=20.0, srq=20.0, fc=fc))

        @jax.jit
        def chained(p, v, carry):
            out = fn(p + carry * 0, v)
            return jnp.sum(out)

        carry = jnp.zeros(())
        for _ in range(WARMUP):
            carry = chained(poses, vos, carry)
        float(carry)
        carry = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(ITERS):
            carry = chained(poses, vos, carry)
        float(carry)
        dt = (time.perf_counter() - t0) / ITERS
        print(json.dumps({
            "metric": "pgo_windows_per_sec",
            "topology": "fc" if fc else "chain",
            "batch": batch,
            "value": round(batch / dt, 1),
            "ms_per_batch": round(dt * 1000, 2),
        }))


if __name__ == "__main__":
    main()
