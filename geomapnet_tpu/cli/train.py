"""Training CLI for PoseNet and MapNet variants.

Reference parity: /root/reference/scripts/train.py — same flags, same .ini
semantics, same experiment naming. Additions: ``--dataset synth`` (in-memory
synthetic scene), ``--pretrained_npz`` (import converted ImageNet/reference
weights, since torchvision downloads are unavailable on a hermetic TPU host),
``--bf16`` (bfloat16 MXU compute), ``--no_mesh`` (disable multi-device
sharding).

Usage::

    python -m geomapnet_tpu.cli.train --dataset 7Scenes --scene heads \
        --config_file configs/mapnet.ini --model mapnet \
        --learn_beta --learn_gamma
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax.numpy as jnp

from ..models import load_npz, merge_variables
from ..train.loop import Trainer
from .builders import (
    build_criteria,
    build_datasets,
    build_device_preprocess,
    build_model,
    build_raw_device_preprocess,
    experiment_name,
)
from .config import parse_ini


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Training script for PoseNet and MapNet variants"
    )
    parser.add_argument("--dataset", type=str, required=True,
                        choices=("7Scenes", "RobotCar", "synth"))
    parser.add_argument("--scene", type=str, default="synth")
    parser.add_argument("--config_file", type=str, required=True)
    parser.add_argument("--model", required=True,
                        choices=("posenet", "mapnet", "mapnet++"))
    parser.add_argument("--trunk", default="resnet34",
                        choices=("resnet18", "resnet34", "resnet50"),
                        help="feature extractor (reference fixes resnet34)")
    parser.add_argument("--device", type=str, default="0",
                        help="unused on TPU (kept for CLI parity)")
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--learn_beta", action="store_true")
    parser.add_argument("--learn_gamma", action="store_true")
    parser.add_argument("--resume_optim", action="store_true")
    parser.add_argument(
        "--auto_resume", action="store_true",
        help="resume from the latest epoch_* checkpoint in the experiment "
        "logdir if one exists (full state: optimizer, epoch, criterion) — "
        "restart-safe production runs",
    )
    parser.add_argument("--suffix", type=str, default="")
    parser.add_argument("--data_path", type=str, default="data/deepslam_data")
    parser.add_argument("--asset_root", type=str, default="data")
    parser.add_argument("--pretrained_npz", type=str, default=None,
                        help="npz of converted torchvision/reference weights")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute dtype")
    parser.add_argument("--no_mesh", action="store_true")
    parser.add_argument(
        "--host_normalize", action="store_true",
        help="normalize images on the host (float32 transfer) instead of the "
        "default device-side pipeline (uint8 transfer, 4x smaller)",
    )
    parser.add_argument(
        "--raw_bayer", action="store_true",
        help="RobotCar only: load raw Bayer mosaics and run demosaic/"
        "[undistort]/resize/normalize fused on device (no offline "
        "process_robotcar_images step needed)",
    )
    parser.add_argument(
        "--camera_models_dir", type=str, default=None,
        help="RobotCar camera model dir for on-device undistortion with "
        "--raw_bayer (omit to skip undistortion)",
    )
    parser.add_argument(
        "--native_loader", action="store_true",
        help="decode+resize images with the C++ batch decoder "
        "(geomapnet_tpu.native) instead of PIL — the fast host IO path",
    )
    parser.add_argument(
        "--cache_frames", type=float, default=0.0, metavar="GB",
        help="decoded-frame RAM cache per split: decode is paid once, "
        "epoch 2+ loads at memory speed (skipped for jittered transforms)",
    )
    parser.add_argument(
        "--device_cache", nargs="?", const=True, default=False,
        choices=["shard"],
        help="upload each split's frames to HBM once and feed training by "
        "on-device index gather: no host decode or image transfer after "
        "the first epoch (replicated over the device mesh; under "
        "jax.distributed each process decodes only its shard). "
        "'--device_cache shard' keeps the stack frame-axis-sharded over "
        "the mesh — capacity scales with device count",
    )
    parser.add_argument(
        "--ingest_overlap", action="store_true",
        help="with --device_cache: overlap the first epoch's decode with "
        "training (warmup epoch feeds from the image loader while staging "
        "frames; the cache finalizes at epoch end) instead of paying the "
        "full scene decode before the first step",
    )
    parser.add_argument(
        "--steps_per_launch", type=int, default=1, metavar="K",
        help="with --device_cache, fuse K optimizer steps into one device "
        "launch (lax.scan over stacked index batches) — bit-identical "
        "updates, 1/K the host dispatch overhead",
    )
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a JAX profiler trace of early batches")
    parser.add_argument(
        "--bn_bf16_bwd", action="store_true",
        help="bfloat16 BatchNorm backward: +4-5%% train step on TPU, "
        "forward bit-identical, grads perturbed at bf16 rounding — all "
        "200-step parity envelopes green (docs/TRAIN_PARITY_BN_BF16BWD.md)")
    parser.add_argument("--debug_nans", action="store_true",
                        help="fail fast on the first NaN in jitted code")
    parser.add_argument(
        "--grad_accum", type=int, default=1,
        help="gradient-accumulation microbatches per optimizer step: the "
        ".ini batch_size stays the EFFECTIVE batch while HBM holds only "
        "batch_size/grad_accum activations at a time",
    )
    parser.add_argument("--tensorboard", action="store_true",
                        help="emit TensorBoard event files next to metrics.jsonl")
    parser.add_argument(
        "--distributed", action="store_true",
        help="initialize jax.distributed for multi-host (pod) training; "
        "coordinator discovered from the TPU launcher environment",
    )
    args = parser.parse_args(argv)

    if args.distributed:
        from ..parallel import initialize_distributed

        idx, count = initialize_distributed()
        print(f"jax.distributed: process {idx}/{count}")

    config = parse_ini(args.config_file)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    model, _ = build_model(args.model, config, dtype=dtype,
                           trunk=args.trunk, bn_bf16_bwd=args.bn_bf16_bwd)
    train_criterion, val_criterion = build_criteria(
        args.model, config, args.learn_beta, args.learn_gamma
    )
    data_path = (
        args.data_path if args.dataset == "synth"
        else f"{args.data_path}/{args.dataset}"
    )
    if args.raw_bayer:
        if args.dataset != "RobotCar":
            parser.error("--raw_bayer requires --dataset RobotCar")
        preprocess = build_raw_device_preprocess(
            args.scene, args.asset_root, dtype=dtype,
            camera_models_dir=args.camera_models_dir,
        )
    elif args.host_normalize:
        preprocess = None
    else:
        preprocess = build_device_preprocess(
            args.dataset, args.scene, args.asset_root, dtype=dtype
        )
    train_set, val_set = build_datasets(
        args.model, args.dataset, args.scene, data_path, config,
        asset_root=args.asset_root,
        keep_uint8=preprocess is not None and not args.raw_bayer,
        raw_bayer=args.raw_bayer,
        native_loader=args.native_loader,
        cache_gb=args.cache_frames,
    )

    name = experiment_name(
        args.dataset, args.scene, args.model, args.config_file,
        args.learn_beta, args.learn_gamma, args.suffix,
    )
    checkpoint, resume_optim = args.checkpoint, args.resume_optim
    if args.auto_resume and checkpoint is None:
        from ..train.checkpoint import latest_checkpoint

        latest = latest_checkpoint(Path("logs") / name)
        if latest is not None:
            checkpoint, resume_optim = str(latest), True
            print(f"Auto-resuming from {latest}")
    trainer = Trainer(
        model, train_criterion, config, name, train_set, val_set,
        val_criterion=val_criterion, checkpoint=checkpoint,
        resume_optim=resume_optim, use_mesh=not args.no_mesh,
        profile_dir=args.profile_dir, debug_nans=args.debug_nans,
        preprocess=preprocess, accum_steps=args.grad_accum,
        # `visdom = yes` in reference .ini files maps to the TensorBoard
        # writer — the live-dashboard equivalent here
        tensorboard=args.tensorboard or config.visdom,
        device_cache=args.device_cache,
        steps_per_launch=args.steps_per_launch,
        ingest_overlap=args.ingest_overlap,
    )

    if args.pretrained_npz and checkpoint is not None:
        # a restored checkpoint already contains trained weights; importing
        # the npz on top would silently clobber them (e.g. an --auto_resume
        # restart of a run that was launched with --pretrained_npz)
        print(f"Checkpoint {checkpoint} restored; ignoring --pretrained_npz")
    elif args.pretrained_npz:
        imported = load_npz(args.pretrained_npz)
        variables = {
            "params": trainer.state.params["model"],
            "batch_stats": trainer.state.batch_stats,
        }
        # MapNet nests the PoseNet tree under 'posenet'
        if "posenet" in variables["params"]:
            inner = {k: v["posenet"] for k, v in variables.items()}
            merged = merge_variables(inner, imported)
            variables = {k: {"posenet": merged[k]} for k in variables}
        else:
            variables = merge_variables(variables, imported)
        params = dict(trainer.state.params)
        params["model"] = variables["params"]
        trainer.state = trainer.state.replace(
            params=params, batch_stats=variables["batch_stats"]
        )
        print(f"Imported pretrained weights from {args.pretrained_npz}")

    trainer.train_val()


if __name__ == "__main__":
    main()
