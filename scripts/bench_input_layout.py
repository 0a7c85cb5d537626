"""Probe: kill the two full-batch input relayouts on the headline forward.

Round-3 profiling (PERF.md) attributed 4.0% of bf16 forward device time to
"data formatting" — two full-batch input copies visible in the compiled HLO:

  %copy.7 = bf16[128,3,256,341,3]{2,3,4,1,0} copy(%images)   # pre-reshape
  %copy.8 = bf16[384,256,341,3]{0,3,2,1}    copy(%bitcast)   # conv layout

The stem conv wants its input in layout {0,3,2,1} (batch minormost — with
C=3 the lanes are fed by N, not channels). Variants, all timed with the
chained-launch harness (bench.time_forward — block_until_ready is unreliable
over this tunnel):

  A. baseline     — MapNet forward, (B, T, H, W, 3) bf16 input (2 copies)
  B. prefolded    — PoseNet forward, (B*T, H, W, 3) bf16 input: the T-fold
                    happens in the producer, XLA loses the bitcast
                    constraint and one copy disappears (1 copy)
  C. auto layout  — variant B compiled with AUTO entry layout for images;
                    the buffer is device_put into the conv's preferred
                    layout once outside timing (0 copies). Valid whenever
                    the producer program (device preprocess / cache gather)
                    is compiled to emit that layout.
  D. fused uint8  — uint8 (B*T, H, W, 3) input + normalize fused into the
                    jit (the real eval path): the relayout rides the uint8
                    side (1 byte/px, not 2) or fuses into the convert.

Each variant reports #full-batch copies in optimized HLO, the surviving
copy shapes, and chained-launch img/s.

Run on the real chip: python scripts/bench_input_layout.py
"""

from __future__ import annotations

import os
import re
import sys

os.environ.setdefault("JAX_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import H, W, T, build  # noqa: E402

B = 128
ITERS, WARMUP = 20, 3


def chained_time(step, x, n_images, jit_kwargs=None):
    """Chained-launch img/s (bench.py methodology; block_until_ready is
    unreliable over this tunnel). ``step(x, carry) -> scalar`` must make the
    input data-depend on the carry so launches serialize on device."""
    import time

    j = jax.jit(step, **(jit_kwargs or {}))
    carry = jnp.zeros(())
    for _ in range(WARMUP):
        carry = j(x, carry)
    float(carry)
    carry = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(ITERS):
        carry = j(x, carry)
    float(carry)
    return n_images * ITERS / (time.perf_counter() - t0)


def big_copies(txt: str) -> list[str]:
    """Full-batch (>= 1M element) copy/transpose ops in optimized HLO."""
    out = []
    for ln in txt.splitlines():
        m = re.search(r"= (\S*)\[([\d,]+)\][^ ]* (?:copy|transpose)\(", ln)
        if not m:
            continue
        elems = 1
        for d in m.group(2).split(","):
            elems *= int(d)
        if elems >= 1_000_000:
            out.append(f"{m.group(1)}[{m.group(2)}]")
    return out


def main():
    dtype = jnp.bfloat16
    model, variables, fwd = build(dtype)
    params, stats = variables["params"], variables["batch_stats"]
    pose = model.posenet

    def fwd_folded(p, s, images):
        return pose.apply({"params": p["posenet"],
                           "batch_stats": s["posenet"]}, images, train=False)

    mean = jnp.array([0.45, 0.45, 0.45], jnp.float32)
    std = jnp.array([0.25, 0.25, 0.25], jnp.float32)

    def fwd_uint8(p, s, raw):
        img = (raw.astype(jnp.float32) / 255.0 - mean) / std
        return fwd_folded(p, s, img.astype(dtype))

    key = jax.random.PRNGKey(42)
    xb = jax.random.normal(key, (B, T, H, W, 3), dtype)
    xf = xb.reshape(B * T, H, W, 3)
    xu = jnp.asarray((xb.reshape(B * T, H, W, 3) * 32 + 128)
                     .astype(jnp.uint8))

    results = {}

    def bf16_step(f):
        def step(x, carry):
            out = f(params, stats, x + carry.astype(x.dtype) * 1e-12)
            return jnp.sum(out.astype(jnp.float32))
        return step

    def uint8_step(f):
        def step(x, carry):
            out = f(params, stats, x + (carry * 1e-12).astype(jnp.uint8))
            return jnp.sum(out.astype(jnp.float32))
        return step

    def hlo(f, x):
        return jax.jit(f).lower(params, stats, x).compile().as_text()

    results["A_baseline_mapnet"] = (
        big_copies(hlo(fwd, xb)), chained_time(bf16_step(fwd), xb, B * T))
    results["B_prefolded"] = (
        big_copies(hlo(fwd_folded, xf)),
        chained_time(bf16_step(fwd_folded), xf, B * T))
    results["D_fused_uint8"] = (
        big_copies(hlo(fwd_uint8, xu)),
        chained_time(uint8_step(fwd_uint8), xu, B * T))

    # C: AUTO entry layout — query the layout XLA wants, device_put into it
    name = "C_auto_layout"
    try:
        try:
            from jax._src.layout import Format, Layout  # jax>=0.5 naming
            auto = Format(Layout.AUTO)
        except Exception:
            from jax.experimental.layout import (
                DeviceLocalLayout as _DLL, Layout as _Fmt)
            auto = _Fmt(_DLL.AUTO)
        jf = jax.jit(fwd_folded, in_shardings=(None, None, auto))
        compiled = jf.lower(params, stats, xf).compile()
        txt = compiled.as_text()
        # input_formats is ((leaf formats...), kwargs); images is the last leaf
        fmt = compiled.input_formats[0][-1]
        # neither device_put nor a jitted IDENTITY honors custom formats
        # (the identity short-circuits to an alias); a non-identity does
        xf_auto = jax.jit(lambda a: a * 1, out_shardings=fmt)(xf)
        # execute with the CONCRETE chosen format (AUTO is compile-time
        # only); the chained add inherits the entry layout (elementwise),
        # so the conv still sees its preferred layout with no copy
        rate = chained_time(bf16_step(fwd_folded), xf_auto, B * T,
                            jit_kwargs={"in_shardings": (fmt, None)})
        results[name] = (big_copies(txt) + [f"entry={fmt}"], rate)
    except Exception as e:  # pragma: no cover - API drift across jax versions
        results[name] = ([f"failed: {e!r}"], 0.0)

    # E: fused uint8 + AUTO entry — does the uint8 entry layout let the
    # convert write the conv layout directly (killing D's bf16 copy)?
    try:
        je = jax.jit(fwd_uint8, in_shardings=(None, None, auto))
        compiled = je.lower(params, stats, xu).compile()
        fmt_u = compiled.input_formats[0][-1]
        xu_auto = jax.jit(lambda a: a * 1, out_shardings=fmt_u)(xu)
        rate = chained_time(uint8_step(fwd_uint8), xu_auto, B * T,
                            jit_kwargs={"in_shardings": (fmt_u, None)})
        results["E_uint8_auto"] = (
            big_copies(compiled.as_text()) + [f"entry={fmt_u}"], rate)
    except Exception as e:  # pragma: no cover
        results["E_uint8_auto"] = ([f"failed: {e!r}"], 0.0)

    # F: the int8 serving headline (static calibrated scales + int8 heads),
    # same ladder: 5D baseline / prefolded / prefolded+AUTO / +fused requant
    from geomapnet_tpu.models.quant import (
        calibrate_activation_scales, mapnet_apply_int8, posenet_apply_int8,
        quantize_posenet_variables)
    qtree = quantize_posenet_variables(
        {"params": params, "batch_stats": stats}, quantize_heads=True)
    calib = jax.random.normal(jax.random.PRNGKey(7), (8, T, H, W, 3),
                              jnp.bfloat16)
    qtree = jax.device_put(calibrate_activation_scales(qtree, [calib]))

    def q_step(apply, **kw):
        def step(x, carry):
            out = apply(qtree, x + carry.astype(x.dtype) * 1e-12, **kw)
            return jnp.sum(out.astype(jnp.float32))
        return step

    def q_hlo(apply, x, **kw):
        return jax.jit(lambda xx: apply(qtree, xx, **kw)).lower(x)\
            .compile().as_text()

    results["F1_int8_mapnet"] = (
        big_copies(q_hlo(mapnet_apply_int8, xb)),
        chained_time(q_step(mapnet_apply_int8), xb, B * T))
    results["F2_int8_prefolded"] = (
        big_copies(q_hlo(posenet_apply_int8, xf)),
        chained_time(q_step(posenet_apply_int8), xf, B * T))
    try:
        jq = jax.jit(lambda xx: posenet_apply_int8(qtree, xx),
                     in_shardings=(auto,))
        compiled = jq.lower(xf).compile()
        fmt_q = compiled.input_formats[0][-1]
        xf_q = jax.jit(lambda a: a * 1, out_shardings=fmt_q)(xf)
        results["F3_int8_auto"] = (
            big_copies(compiled.as_text()) + [f"entry={fmt_q}"],
            chained_time(q_step(posenet_apply_int8), xf_q, B * T,
                         jit_kwargs={"in_shardings": (fmt_q, None)}))
        # F4 derives its OWN entry layout: the fused program's preferred
        # format may differ from F3's, and the reported copy count must come
        # from the same compiled text that gets timed
        jq4 = jax.jit(lambda xx: posenet_apply_int8(qtree, xx, fused=True),
                      in_shardings=(auto,))
        compiled4 = jq4.lower(xf).compile()
        fmt_q4 = compiled4.input_formats[0][-1]
        xf_q4 = jax.jit(lambda a: a * 1, out_shardings=fmt_q4)(xf)
        results["F4_int8_auto_fusedrq"] = (
            big_copies(compiled4.as_text()) + [f"entry={fmt_q4}"],
            chained_time(q_step(posenet_apply_int8, fused=True), xf_q4,
                         B * T, jit_kwargs={"in_shardings": (fmt_q4, None)}))
    except Exception as e:  # pragma: no cover
        results["F3_int8_auto"] = ([f"failed: {e!r}"], 0.0)

    for k, (copies, rate) in results.items():
        print(f"{k:20s} img/s={rate:10,.0f}  big_copies={len([c for c in copies if not c.startswith(('entry=', 'failed'))])}")
        for c in copies:
            print(f"    {c}")


if __name__ == "__main__":
    main()
