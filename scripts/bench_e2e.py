"""END-TO-END eval throughput: disk -> decode -> transfer -> model -> poses.

The device-only headline (bench.py) times the forward alone; this bench
measures the honest full path on an on-disk 7Scenes-format fixture with
native-resolution 480x640 PNGs, and decomposes it:

- ``decode``   : the C++ batch decoder's decode+resize ceiling (the host is
                 a single core; PNG entropy decode is irreducible host work);
- ``loader``   : MF tuple assembly + Loader batching on top of decode
                 (includes the frame-dedup win: each frame belongs to
                 ``steps`` tuples but is decoded once per batch);
- ``e2e``      : cli.eval's ``evaluate()`` — loader + uint8 transfer +
                 jit forward + readback — images/sec as a user sees it;
- ``pil_decode``: the PIL reference path for contrast (--pil).

Usage: python scripts/bench_e2e.py [--frames 400] [--batch 64] [--pil]
       [--root /tmp/e2e_7s]
First call generates the fixture (~2 min, ~250 MB); reruns reuse it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H0, W0 = 480, 640  # native 7Scenes geometry
RH, RW = 256, 341  # shortest-side-256 resize


def make_fixture(root: Path, n_frames: int) -> Path:
    """7Scenes-format scene with structured (realistically compressible)
    native-resolution frames; reused across runs when sizes match.

    Only the TEST split (seq-02) feeds the eval ladder, so the train
    sequence stays small — big ``--frames`` runs (enough batches/epoch to
    amortize launch dispatch) don't pay double generation/decode."""
    from PIL import Image

    scene = root / "deepslam" / "7Scenes" / "heads"
    marker = root / f".fixture_{n_frames}_{H0}x{W0}"
    if marker.exists():
        return root
    print(f"generating fixture: {n_frames} test frames {H0}x{W0} "
          f"at {root} ...", flush=True)
    yy, xx = np.mgrid[0:H0, 0:W0].astype(np.float32)
    rng = np.random.RandomState(7)
    seq_frames = {"seq-01": min(n_frames, 64), "seq-02": n_frames}
    for s, seq_name in enumerate(("seq-01", "seq-02")):
        seq = scene / seq_name
        seq.mkdir(parents=True, exist_ok=True)
        for i in range(seq_frames[seq_name]):
            # smooth gradients + texture + mild noise: compresses/decodes
            # like a natural indoor image, not like white noise
            ph = 0.13 * i + s
            img = np.stack([
                120 + 60 * np.sin(xx / 37.0 + ph) + 40 * (yy / H0),
                110 + 50 * np.sin(yy / 23.0 - ph) + 30 * (xx / W0),
                100 + 55 * np.sin((xx + yy) / 53.0 + 2 * ph),
            ], axis=-1)
            img += rng.randn(H0, W0, 3) * 6
            Image.fromarray(
                np.clip(img, 0, 255).astype(np.uint8)
            ).save(seq / f"frame-{i:06d}.color.png")
            pose = np.eye(4)
            pose[:3, 3] = [i * 0.02, s * 0.5, np.sin(i * 0.1)]
            np.savetxt(seq / f"frame-{i:06d}.pose.txt", pose)
    (scene / "TrainSplit.txt").write_text("sequence1\n")
    (scene / "TestSplit.txt").write_text("sequence2\n")
    assets = root / "assets" / "7Scenes" / "heads"
    assets.mkdir(parents=True, exist_ok=True)
    np.savetxt(assets / "stats.txt",
               np.array([[0.45, 0.45, 0.46], [0.078, 0.077, 0.072]]))
    # 7Scenes convention: identity translation stats
    np.savetxt(assets / "pose_stats.txt",
               np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]))
    marker.touch()
    return root


def bench_decode(files, n, workers):
    from geomapnet_tpu import native

    files = (files * (n // len(files) + 1))[:n]
    native.decode_batch(files[:8], RH, RW, n_threads=workers)  # warm
    t0 = time.perf_counter()
    batch, ok = native.decode_batch(files, RH, RW, n_threads=workers)
    dt = time.perf_counter() - t0
    assert all(ok)
    return n / dt


def bench_pil_decode(files, n):
    from PIL import Image

    from geomapnet_tpu.data.transforms import resize_shorter_side

    files = (files * (n // len(files) + 1))[:n]
    t0 = time.perf_counter()
    for f in files:
        img = resize_shorter_side(Image.open(f).convert("RGB"), 256)
        np.asarray(img)
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=str, default="/tmp/e2e_7s")
    ap.add_argument("--frames", type=int, default=400)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--decode_n", type=int, default=256)
    ap.add_argument("--pil", action="store_true",
                    help="also time the PIL decode path")
    ap.add_argument("--quantize", action="store_true",
                    help="int8 trunk for the e2e legs")
    ap.add_argument("--calibrate", type=int, default=0, metavar="N",
                    help="with --quantize: bake static activation scales "
                    "from N batches of this dataset")
    ap.add_argument("--quantize_heads", action="store_true",
                    help="with --quantize: int8 fc_feat head matmul")
    ap.add_argument("--no_frame_dedup", action="store_true",
                    help="device stage: force the tuple epoch scan instead "
                    "of the default frame-dedup epoch")
    ap.add_argument("--fuse_requant", action="store_true",
                    help="with --quantize + --calibrate: int8 dataflow "
                    "(the bench.py headline configuration)")
    ap.add_argument("--stages", type=str,
                    default="decode,loader,e2e,cached,device",
                    help="comma-separated subset of the ladder to run")
    args = ap.parse_args()
    stages = set(args.stages.split(","))
    if args.fuse_requant and not (args.quantize and args.calibrate):
        ap.error("--fuse_requant needs --quantize and --calibrate N")

    root = make_fixture(Path(args.root), args.frames)

    from geomapnet_tpu.cli.builders import (
        build_device_preprocess,
        build_frame_dataset,
        build_transform,
    )
    from geomapnet_tpu.cli.config import ExperimentConfig
    from geomapnet_tpu.data import MF, Loader

    config = ExperimentConfig(steps=3, skip=3, seed=7, num_workers=args.workers)
    data_path = str(root / "deepslam" / "7Scenes")
    asset_root = str(root / "assets")

    tf = build_transform("7Scenes", "heads", config, asset_root,
                         train=False, keep_uint8=True)
    frames = build_frame_dataset(
        "7Scenes", "heads", data_path, False, config, transform=tf,
        asset_root=asset_root, native_loader=True,
    )
    files = list(frames.c_imgs)

    qkw = dict(quantize=args.quantize, calib_batches=args.calibrate,
               quantize_heads=args.quantize_heads,
               fuse_requant=args.fuse_requant)
    mode = ("int8" + ("_calib" if args.calibrate else "")
            + ("_heads" if args.quantize_heads else "")
            + ("_fused" if args.fuse_requant else "")
            ) if args.quantize else "bf16"

    # 1) raw decode ceiling
    dec = None
    if "decode" in stages:
        dec = bench_decode(files, args.decode_n, args.workers)
        print(json.dumps({"stage": "decode",
                          "images_per_sec": round(dec, 1)}), flush=True)

    if args.pil:
        pil = bench_pil_decode(files, min(64, args.decode_n))
        print(json.dumps({"stage": "pil_decode",
                          "images_per_sec": round(pil, 1),
                          "native_speedup": round(dec / pil, 2)
                          if dec else None}), flush=True)

    ds = MF(frames, steps=config.steps, skip=config.skip, seed=7)

    # 2) loader drain (no device): tuples/s * steps, with frame dedup
    if "loader" in stages:
        loader = Loader(ds, args.batch, shuffle=False, drop_last=False,
                        num_workers=args.workers)
        n_imgs = 0
        t0 = time.perf_counter()
        for imgs, poses, pad in loader:
            n_imgs += (imgs.shape[0] - pad) * config.steps
        dt = time.perf_counter() - t0
        print(json.dumps({"stage": "loader", "images_per_sec":
                          round(n_imgs / dt, 1),
                          "unique_decodes_per_sec":
                          round(len(frames) / dt, 1)}), flush=True)

    if not stages & {"e2e", "cached", "device"}:
        return

    # 3) full e2e evaluate(): loader -> uint8 transfer -> jit forward ->
    #    readback -> metrics
    from geomapnet_tpu.cli.eval import evaluate
    from geomapnet_tpu.losses import MapNetCriterion
    from geomapnet_tpu.models import MapNet, PoseNet, resnet34
    from geomapnet_tpu.train import create_train_state, make_optimizer

    dtype = jnp.bfloat16
    model = MapNet(posenet=PoseNet(feature_extractor=resnet34(dtype=dtype),
                                   feat_dim=2048, droprate=0.5, dtype=dtype))
    state = create_train_state(
        model, MapNetCriterion(), make_optimizer("adam", 1e-4),
        jax.random.PRNGKey(0), jnp.zeros((1, 3, RH, RW, 3), dtype),
    )
    preprocess = build_device_preprocess("7Scenes", "heads", asset_root,
                                         dtype=dtype)
    if "e2e" in stages:
        # warm the compile outside the timed region
        res = evaluate(model, state, ds, batch_size=args.batch,
                       preprocess=preprocess, progress=False,
                       num_workers=args.workers, **qkw)
        res = evaluate(model, state, ds, batch_size=args.batch,
                       preprocess=preprocess, progress=False,
                       num_workers=args.workers, **qkw)
        rec = {"stage": "e2e",
               "images_per_sec": round(res["images_per_sec"], 1),
               "mode": mode, "batch_tuples": args.batch}
        if dec:
            rec["host_bound_fraction"] = round(
                min(1.0, res["images_per_sec"] / dec), 3)
        print(json.dumps(rec), flush=True)

    # 4) decoded-frame RAM cache (data/cache.py, cli --cache_frames):
    #    epoch 1 pays PNG decode once, epoch 2+ serves resized uint8 from
    #    memory — the steady-state number for any multi-epoch loop (training,
    #    PGO sweeps, repeated eval)
    from geomapnet_tpu.data import CachedScene

    cached = CachedScene(frames, max_bytes=2 * 1024 ** 3)
    ds_c = MF(cached, steps=config.steps, skip=config.skip, seed=7)
    if "cached" in stages:
        t0 = time.perf_counter()
        evaluate(model, state, ds_c, batch_size=args.batch,
                 preprocess=preprocess, progress=False,
                 num_workers=args.workers, **qkw)
        cold_s = time.perf_counter() - t0
        res_c = evaluate(model, state, ds_c, batch_size=args.batch,
                         preprocess=preprocess, progress=False,
                         num_workers=args.workers, **qkw)
        total = cached.hits + cached.misses
        print(json.dumps({"stage": "e2e_cached_epoch2",
                          "images_per_sec": round(res_c["images_per_sec"], 1),
                          "mode": mode,
                          "first_epoch_secs": round(cold_s, 1),
                          "cache_hit_rate": round(cached.hits / total, 3),
                          "cached_mb": round(
                              cached.cached_bytes / 2 ** 20, 1),
                          }), flush=True)

    # 5) device-resident frames (--device_cache): one upload, then batches
    #    are int32 index gathers — the per-batch host->device image
    #    transfer (the epoch-2 wall on this rig: ~60 MB/s tunnel)
    #    disappears. Second call reuses the returned buffer.
    if "device" in stages:
        dd = False if args.no_frame_dedup else None
        res_d = evaluate(model, state, ds_c, batch_size=args.batch,
                         preprocess=preprocess, progress=False,
                         num_workers=args.workers, device_cache=True,
                         dedup_frames=dd, **qkw)
        res_d2 = evaluate(model, state, ds_c, batch_size=args.batch,
                          preprocess=preprocess, progress=False,
                          num_workers=args.workers,
                          device_cache=res_d["device_frames"],
                          dedup_frames=dd, **qkw)
        n_eval = len(ds_c) * config.steps
        print(json.dumps({"stage": "e2e_device_cached",
                          # task rate: EVALUATED tuple-images / wall;
                          # frames_computed shows the dedup'd forward count
                          "images_per_sec": round(
                              res_d2["images_per_sec"], 1),
                          "mode": mode + (
                              "" if args.no_frame_dedup else "_dedup"),
                          "images_evaluated": n_eval,
                          "frames_computed": res_d2["frames_computed"],
                          "batches_per_epoch":
                          -(-len(ds_c) // args.batch),
                          "upload_secs": round(res_d["upload_secs"], 1),
                          "buffer_mb": round(
                              res_d["device_frames"].nbytes / 2 ** 20, 1),
                          }), flush=True)


if __name__ == "__main__":
    main()
