"""Product-dataflow ladder: uint8 device cache -> gather -> normalize ->
fused int8 trunk, measured as the eval CLI actually runs it (an epoch
``lax.scan`` over index batches inside ONE launch).

Round-5 motivation: the first product-dataflow bench harness launched one
batch per call and measured 10.2k img/s against 15.5k of pure device time —
the 512 MB cache argument made per-call dispatch expensive, an artifact of
the harness, not the product (cli/eval.py passes the buffer once per EPOCH
scan). This ladder scans K batches per launch and isolates the remaining
device-side costs:

  A  scan, default cache layout          (gather relayout paid per batch)
  B  scan, cache in its AUTO layout      (relayout paid ONCE at upload)
  C  B + contiguous index batches        (gather locality probe)
  D  no-gather control: fixed folded uint8 batch through the same scan
  E  uint8 row cache                     (contiguous-DMA gather)
  F  prequantized int8 row cache         (normalize+quantize at upload)
  G  prequantized 4-D cache
  H  space-to-depth prequant row cache   (stride-1 4x4 stem, bit-exact)
  I  S2D trunk, rearrange in-graph       (isolates stem win vs layout win)

Usage (real chip): python scripts/bench_product_scan.py [--k 16] [--reps 3]
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

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import (  # noqa: E402
    BATCH_TUPLES,
    H,
    N_CACHE_FRAMES,
    T,
    W,
    build,
    build_preprocess,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=16,
                    help="scanned batches per launch")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=BATCH_TUPLES)
    ap.add_argument("--only", default="",
                    help="comma-separated variant letter prefixes to run "
                         "(e.g. 'H,J,K'); empty = the full ladder")
    args = ap.parse_args()
    only = [s.strip() for s in args.only.split(",") if s.strip()]

    from geomapnet_tpu.models.quant import (
        calibrate_activation_scales,
        posenet_apply_int8,
        quantize_posenet_variables,
    )

    _, var32, _ = build(jnp.float32)
    preprocess = build_preprocess()
    qtree = quantize_posenet_variables(
        {"params": var32["params"], "batch_stats": var32["batch_stats"]},
        quantize_heads=True,
    )
    calib = jax.jit(preprocess)(jax.random.randint(
        jax.random.PRNGKey(7), (8 * T, H, W, 3), 0, 256, jnp.uint8))
    qtree = jax.device_put(calibrate_activation_scales(qtree, [calib]))

    nb = args.batch * T
    buf = jax.random.randint(
        jax.random.PRNGKey(11), (N_CACHE_FRAMES, H, W, 3), 0, 256, jnp.uint8)

    def epoch(buf_, idx_batches, carry):
        def body(c, ib):
            x = preprocess(buf_[ib])
            out = posenet_apply_int8(qtree, x, fused=True)
            return c + jnp.sum(out.astype(jnp.float32)) * 1e-12, ()

        c, _ = jax.lax.scan(body, carry, idx_batches)
        return c

    rng = np.random.RandomState(0)
    idx_shuf = np.stack([
        rng.permutation(N_CACHE_FRAMES)[:nb] for _ in range(args.k)
    ]).astype(np.int32)
    idx_seq = (np.arange(args.k)[:, None] * nb
               + np.arange(nb)[None, :]).astype(np.int32) % N_CACHE_FRAMES

    def timed(fn, buf_, idx, label):
        if only and not any(label.startswith(p) for p in only):
            return None
        idx = jnp.asarray(idx)
        carry = jnp.zeros(())
        carry = fn(buf_, idx, carry)
        float(carry)  # warm + flush
        best = 0.0
        for _ in range(args.reps):
            carry = jnp.zeros(())
            t0 = time.perf_counter()
            carry = fn(buf_, idx, carry)
            float(carry)
            dt = time.perf_counter() - t0
            best = max(best, args.k * nb / dt)
        print(json.dumps({"variant": label,
                          "images_per_sec": round(best, 1),
                          "k": args.k, "batch_tuples": args.batch}),
              flush=True)
        return best

    # A: default cache layout
    jA = jax.jit(epoch)
    timed(jA, buf, idx_shuf, "A_scan_default_layout")

    # B: cache in the program's preferred (AUTO) layout — the relayout the
    # per-batch gather would otherwise pay moves to ONE placement at upload
    if not only or any(p in ("B", "C") for p in only):
        # the AUTO-layout .compile() below is expensive over the tunnel, so
        # it only runs when B/C are requested
        try:
            from jax._src.layout import Format, Layout

            auto = Format(Layout.AUTO)
            compiled = jax.jit(epoch, in_shardings=(auto, None, None)).lower(
                buf, jnp.asarray(idx_shuf), jnp.zeros(())).compile()
            fmt = compiled.input_formats[0][0]
            perm = tuple(int(d) for d in fmt.layout.major_to_minor)
            inv = tuple(perm.index(i) for i in range(len(perm)))
            buf_fmt = jax.jit(
                lambda a: jnp.transpose(jnp.transpose(a, perm), inv)
                .astype(jnp.uint8), out_shardings=fmt)(buf)
            if buf_fmt.format.layout == fmt.layout:
                jB = jax.jit(epoch, in_shardings=(fmt, None, None))
                timed(jB, buf_fmt, idx_shuf, f"B_scan_auto_layout_{perm}")
                timed(jB, buf_fmt, idx_seq, "C_auto_layout_contiguous_idx")
            else:
                print(json.dumps({"variant": "B_scan_auto_layout",
                                  "skipped": f"relayout landed "
                                  f"{buf_fmt.format.layout}"}), flush=True)
        except Exception as e:  # pragma: no cover - API drift
            print(json.dumps({"variant": "B_scan_auto_layout",
                              "skipped": repr(e)}), flush=True)

    # D: no-gather control — the same scan over a FIXED folded uint8 batch
    xfix = jax.random.randint(jax.random.PRNGKey(3), (nb, H, W, 3), 0, 256,
                              jnp.uint8)

    def epoch_fix(x_, idx_batches, carry):
        def body(c, ib):
            x = preprocess(x_ + (c * 0).astype(jnp.uint8))
            out = posenet_apply_int8(qtree, x, fused=True)
            return c + jnp.sum(out.astype(jnp.float32)) * 1e-12, ()

        c, _ = jax.lax.scan(body, carry, idx_batches)
        return c

    jD = jax.jit(epoch_fix)
    timed(jD, xfix, idx_shuf, "D_no_gather_control")

    # E: row-contiguous cache — (N, H*W*3) rows gather as pure contiguous
    # DMA (the 4-D frame gather measured ~63 GB/s; C=3 minormost starves
    # the lanes), then a free reshape back to frames
    buf2d = buf.reshape(N_CACHE_FRAMES, H * W * 3)

    def epoch_rows(buf_, idx_batches, carry):
        def body(c, ib):
            x = preprocess(buf_[ib].reshape(nb, H, W, 3))
            out = posenet_apply_int8(qtree, x, fused=True)
            return c + jnp.sum(out.astype(jnp.float32)) * 1e-12, ()

        c, _ = jax.lax.scan(body, carry, idx_batches)
        return c

    timed(jax.jit(epoch_rows), buf2d, idx_shuf, "E_row_cache_gather")

    # F: PREQUANTIZED int8 cache — the stem's static-scale int8 input is a
    # per-frame constant, so the cache stores it directly (same bytes as
    # uint8) and the per-batch normalize+quantize chain disappears,
    # bit-identically (models/quant.py quantize_input_int8)
    from geomapnet_tpu.models.quant import quantize_input_int8

    qbuf = jax.jit(lambda b: quantize_input_int8(qtree, preprocess(b)))(buf)
    qbuf2d = qbuf.reshape(N_CACHE_FRAMES, H * W * 3)

    def epoch_preq(buf_, idx_batches, carry):
        def body(c, ib):
            x = buf_[ib].reshape(nb, H, W, 3)
            out = posenet_apply_int8(qtree, x, fused=True)
            return c + jnp.sum(out.astype(jnp.float32)) * 1e-12, ()

        c, _ = jax.lax.scan(body, carry, idx_batches)
        return c

    timed(jax.jit(epoch_preq), qbuf2d, idx_shuf, "F_prequant_row_cache")

    def epoch_preq4d(buf_, idx_batches, carry):
        def body(c, ib):
            out = posenet_apply_int8(qtree, buf_[ib], fused=True)
            return c + jnp.sum(out.astype(jnp.float32)) * 1e-12, ()

        c, _ = jax.lax.scan(body, carry, idx_batches)
        return c

    timed(jax.jit(epoch_preq4d), qbuf, idx_shuf, "G_prequant_4d_cache")

    # H: SPACE-TO-DEPTH prequantized row cache — the stride-2 7x7 stem runs
    # as a stride-1 4x4 conv over 2x2-blocked 12-channel input (bit-exact:
    # same int32 accumulator, models/quant.py convert_stem_s2d); the cache
    # stores the rearranged frames so no transpose appears in the program
    from geomapnet_tpu.models.quant import (convert_stem_s2d,
                                            space_to_depth_input)

    qtree_s2d = jax.device_put(convert_stem_s2d(qtree))
    h2, w2 = (H + H % 2) // 2, (W + W % 2) // 2
    sbuf = jax.jit(lambda b: space_to_depth_input(
        quantize_input_int8(qtree, preprocess(b))))(buf)
    sbuf2d = sbuf.reshape(N_CACHE_FRAMES, h2 * w2 * 12)

    def epoch_s2d(buf_, idx_batches, carry):
        def body(c, ib):
            x = buf_[ib].reshape(nb, h2, w2, 12)
            out = posenet_apply_int8(qtree_s2d, x, fused=True)
            return c + jnp.sum(out.astype(jnp.float32)) * 1e-12, ()

        c, _ = jax.lax.scan(body, carry, idx_batches)
        return c

    timed(jax.jit(epoch_s2d), sbuf2d, idx_shuf, "H_s2d_prequant_row_cache")

    # I: S2D trunk fed from F's flat cache (rearrange IN-graph) — isolates
    # the stem-conv win from the stored-layout win
    def epoch_s2d_ingraph(buf_, idx_batches, carry):
        def body(c, ib):
            x = buf_[ib].reshape(nb, H, W, 3)
            out = posenet_apply_int8(qtree_s2d, x, fused=True)
            return c + jnp.sum(out.astype(jnp.float32)) * 1e-12, ()

        c, _ = jax.lax.scan(body, carry, idx_batches)
        return c

    timed(jax.jit(epoch_s2d_ingraph), qbuf2d, idx_shuf,
          "I_s2d_ingraph_rearrange")

    # J: H's program with the frame-dedup epoch's REAL access pattern —
    # each row read once, in order (np.unique sorts, and a full-scene
    # eval's unique frames are consecutive; cli/eval.py dedup branch).
    # Isolates how much of the D-vs-H gather cost is the random
    # permutation vs the gather op itself.
    timed(jax.jit(epoch_s2d), sbuf2d, idx_seq, "J_s2d_sequential_idx")

    # K: gather-free slice epoch — when the dedup'd indices ARE consecutive
    # the row gather is a dynamic_slice on the frame axis (start rides the
    # scanned per-batch offsets). Upper bound for a slice fast path.
    def epoch_s2d_slice(buf_, starts, carry):
        def body(c, s):
            x = jax.lax.dynamic_slice_in_dim(buf_, s, nb).reshape(
                nb, h2, w2, 12)
            out = posenet_apply_int8(qtree_s2d, x, fused=True)
            return c + jnp.sum(out.astype(jnp.float32)) * 1e-12, ()

        c, _ = jax.lax.scan(body, carry, starts)
        return c

    starts = ((np.arange(args.k) * nb)
              % max(N_CACHE_FRAMES - nb, 1)).astype(np.int32)
    timed(jax.jit(epoch_s2d_slice), sbuf2d, starts, "K_s2d_slice_epoch")


if __name__ == "__main__":
    main()
