"""On-device HLO-category profile of the headline forward (reproducible).

Reproduces the PERF.md "where does the device time go" attribution: runs the
flagship MapNet forward (bf16 or int8-static) under ``jax.profiler.trace``
and aggregates per-op device time by XLA's ``hlo_category`` (convolution
fusion / output fusion / data formatting / loop fusion / ...).

The trace is parsed directly from the ``.xplane.pb`` (the tensorboard
profile plugin's converter is broken against this image's protobuf; the
raw XSpace proto parses fine with the pure-python implementation — set
``PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python``, done below before the
tensorflow import).

Usage (real chip):
    python scripts/profile_forward.py [--mode bf16|int8_static] [--batch 128]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
os.environ.setdefault("JAX_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import H, W, T, build  # noqa: E402


def aggregate_xspace(trace_dir: str) -> dict[str, dict[str, float]]:
    """Parse the newest .xplane.pb; return {plane: {category: total_ms}}."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*", "*.xplane.pb")))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    out: dict[str, dict[str, float]] = {}
    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        stat_names = {m.id: m.name for m in plane.stat_metadata.values()}
        # category per event-metadata id, from the metadata's own stats
        cat_of: dict[int, str] = {}
        for mid, meta in plane.event_metadata.items():
            for st in meta.stats:
                if stat_names.get(st.metadata_id) == "hlo_category":
                    val = st.str_value or stat_names.get(st.ref_value, "")
                    cat_of[mid] = val
        agg: dict[str, float] = collections.defaultdict(float)
        for line in plane.lines:
            # only the synchronous op timeline: "Async XLA Ops" holds DMA
            # windows that OVERLAP compute and would double-count
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                cat = cat_of.get(ev.metadata_id)
                if cat:
                    agg[cat] += ev.duration_ps / 1e9  # ps -> ms
        if agg:
            out[plane.name] = dict(agg)
    return out


def report(planes, args):
    n_img = args.batch * T * args.iters
    for plane, agg in planes.items():
        # a lax.scan shows up as a 'while' op ENCLOSING its body ops on the
        # same timeline — counting it would double every inner op
        agg = {k: v for k, v in agg.items() if k != "while"}
        total = sum(agg.values())
        print(f"\n{plane}: {total:.1f} ms device time over {args.iters} "
              f"steps ({args.mode}, batch {args.batch}) -> "
              f"{n_img / (total / 1e3):,.0f} img/s of pure device time")
        for cat, ms in sorted(agg.items(), key=lambda kv: -kv[1]):
            print(f"  {cat:40s} {ms:8.2f} ms  {100 * ms / total:5.1f}%")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="bf16",
                    choices=["bf16", "int8_static", "int8_fused", "train",
                             "product"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--trace_dir", default=None)
    args = ap.parse_args()

    model, variables, fwd = build(jnp.bfloat16)
    params, stats = variables["params"], variables["batch_stats"]
    x = jax.random.normal(jax.random.PRNGKey(42),
                          (args.batch, T, H, W, 3), jnp.bfloat16)

    if args.mode == "train":
        # fused train step (fwd+loss+bwd+Adam), loader-style 5D input —
        # the state chain serializes launches on device by construction
        from geomapnet_tpu.losses import MapNetCriterion
        from geomapnet_tpu.train import (
            create_train_state, make_optimizer, make_train_step)

        crit = MapNetCriterion(learn_beta=True, learn_gamma=True)
        tx = make_optimizer("adam", 1e-4, weight_decay=5e-4)
        state = create_train_state(model, crit, tx, jax.random.PRNGKey(0),
                                   x[:1])
        tstep = jax.jit(make_train_step(model, crit, tx))
        targets = jax.random.normal(jax.random.PRNGKey(3),
                                    (args.batch, T, 6), jnp.float32) * 0.1
        rng = jax.random.PRNGKey(1)
        for _ in range(3):
            state, loss = tstep(state, x, targets, rng)
        float(loss)
        trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="fwd_trace_")
        with jax.profiler.trace(trace_dir):
            for _ in range(args.iters):
                state, loss = tstep(state, x, targets, rng)
            float(loss)
        report(aggregate_xspace(trace_dir), args)
        return

    if args.mode == "product":
        # the bench.py headline program: prequantized int8 row cache ->
        # scanned row gathers -> fused-requant int8 trunk, ONE XLA program
        # per epoch (the eval CLI's device-cache scan at its best config) —
        # no activation crosses a program boundary (VERDICT r4 item 3).
        # NOTE: args.iters here means scanned BATCHES inside one epoch.
        import numpy as np

        from bench import (
            N_CACHE_FRAMES, build_preprocess, make_product_cache,
            make_product_epoch)
        from geomapnet_tpu.models.quant import (
            calibrate_activation_scales, quantize_posenet_variables)

        preprocess = build_preprocess()
        qtree = quantize_posenet_variables(
            {"params": params, "batch_stats": stats}, quantize_heads=True)
        calib = jax.jit(preprocess)(jax.random.randint(
            jax.random.PRNGKey(7), (8 * T, H, W, 3), 0, 256, jnp.uint8))
        qtree = jax.device_put(calibrate_activation_scales(qtree, [calib]))
        buf = jax.random.randint(
            jax.random.PRNGKey(11), (N_CACHE_FRAMES, H, W, 3), 0, 256,
            jnp.uint8)
        qtree_s2d, qbuf = make_product_cache(qtree, preprocess, buf)
        nb = args.batch * T
        rng = np.random.RandomState(0)
        idx = jnp.asarray(np.stack(
            [rng.permutation(N_CACHE_FRAMES)[:nb]
             for _ in range(args.iters)]).astype(np.int32))
        j = jax.jit(make_product_epoch(qtree_s2d, batch_tuples=args.batch))
        carry = j(qbuf, idx, jnp.zeros(()))
        float(carry)
        trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="fwd_trace_")
        with jax.profiler.trace(trace_dir):
            carry = j(qbuf, idx, jnp.zeros(()))
            float(carry)
        report(aggregate_xspace(trace_dir), args)
        return

    if args.mode in ("int8_static", "int8_fused"):
        from geomapnet_tpu.models.quant import (
            calibrate_activation_scales, mapnet_apply_int8,
            posenet_apply_int8, quantize_posenet_variables)
        qtree = quantize_posenet_variables(
            {"params": params, "batch_stats": stats},
            quantize_heads=args.mode == "int8_fused")
        qtree = calibrate_activation_scales(qtree, [x[:8]])

        if args.mode == "int8_fused":
            # the bench.py headline path: T-folded input, int8 dataflow
            x = x.reshape(args.batch * T, H, W, 3)

            def step(xx, carry):
                out = posenet_apply_int8(
                    qtree, xx + carry.astype(xx.dtype) * 1e-12, fused=True)
                return jnp.sum(out.astype(jnp.float32))
        else:
            def step(xx, carry):
                out = mapnet_apply_int8(
                    qtree, xx + carry.astype(xx.dtype) * 1e-12)
                return jnp.sum(out.astype(jnp.float32))
    else:
        def step(xx, carry):
            out = fwd(params, stats, xx + carry.astype(xx.dtype) * 1e-12)
            return jnp.sum(out.astype(jnp.float32))

    j = jax.jit(step)
    carry = jnp.zeros(())
    for _ in range(3):
        carry = j(x, carry)
    float(carry)

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="fwd_trace_")
    with jax.profiler.trace(trace_dir):
        carry = jnp.zeros(())
        for _ in range(args.iters):
            carry = j(x, carry)
        float(carry)

    report(aggregate_xspace(trace_dir), args)


if __name__ == "__main__":
    main()
