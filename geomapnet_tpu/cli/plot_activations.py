"""Saliency visualization: |input x d(pose)/d(input)| heatmaps over frames.

Reference parity: /root/reference/scripts/plot_activations.py — forward with
gradients to the input, backprop ``mean(pose)``, saliency = channel-max of
|input * grad|, jet-colormapped and alpha-blended over the un-normalized
frame, written as a video.

TPU-native: the saliency of a whole batch is ONE jit'd ``jax.grad`` launch
(the reference backprops per frame); output is an MP4 if imageio/OpenCV is
available, else a directory of PNG frames.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data import Loader, MF
from ..train.checkpoint import load_model_params
from ..train.optim import make_optimizer
from ..train.state import create_train_state
from .builders import build_criteria, build_datasets, build_model
from .config import parse_ini

__all__ = ["saliency_fn", "main"]


def saliency_fn(model, state):
    """Batched saliency: images (N, [T,] H, W, 3) -> (N, [T,] H, W)."""

    def pose_sum(images):
        out = model.apply(
            {"params": state.params["model"], "batch_stats": state.batch_stats},
            images, train=False,
        )
        # gradient of the mean pose output w.r.t. every input pixel
        return jnp.mean(out)

    grad_fn = jax.grad(pose_sum)

    @jax.jit
    def saliency(images):
        g = grad_fn(images)
        return jnp.max(jnp.abs(images * g), axis=-1)

    return saliency


def _jet(x: np.ndarray) -> np.ndarray:
    """Minimal jet colormap: (H, W) in [0,1] -> (H, W, 3) uint8."""
    r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
    return (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Saliency video tool")
    parser.add_argument("--dataset", required=True,
                        choices=("7Scenes", "RobotCar", "synth"))
    parser.add_argument("--scene", default="synth")
    parser.add_argument("--weights", required=True)
    parser.add_argument("--model", required=True,
                        choices=("posenet", "mapnet", "mapnet++"))
    parser.add_argument("--trunk", default="resnet34",
                        choices=("resnet18", "resnet34", "resnet50"))
    parser.add_argument("--config_file", required=True)
    parser.add_argument("--val", action="store_true")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--frames", type=int, default=50)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--data_path", type=str, default="data/deepslam_data")
    parser.add_argument("--asset_root", type=str, default="data")
    args = parser.parse_args(argv)

    config = parse_ini(args.config_file)
    model_kind = "mapnet" if args.model.startswith("mapnet") else "posenet"
    model, _ = build_model(model_kind, config, trunk=args.trunk)
    criterion, _ = build_criteria(model_kind, config, False, False)

    data_path = (
        args.data_path if args.dataset == "synth"
        else f"{args.data_path}/{args.dataset}"
    )
    train_set, val_set = build_datasets(
        model_kind, args.dataset, args.scene, data_path, config,
        asset_root=args.asset_root,
    )
    dataset = train_set if not args.val else (val_set or train_set)

    sample = dataset[0][0][None]
    tx = make_optimizer(config.opt, config.lr)
    state = create_train_state(model, criterion, tx, jax.random.PRNGKey(0),
                               jnp.asarray(sample))
    state = load_model_params(args.weights, state)

    sal_fn = saliency_fn(model, state)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    frames = []
    loader = Loader(dataset, args.batch_size, shuffle=False, drop_last=False)
    count = 0
    for imgs, _, pad in loader:
        sal = np.asarray(sal_fn(jnp.asarray(imgs)))
        for b in range(imgs.shape[0] - pad):
            if count >= args.frames:
                break
            img = imgs[b]
            s = sal[b]
            if img.ndim == 4:  # tuple model: visualize middle frame
                mid = img.shape[0] // 2
                img, s = img[mid], s[mid]
            lo, hi = s.min(), s.max()
            s = (s - lo) / (hi - lo + 1e-12)
            heat = _jet(s)
            base = img - img.min()
            base = (base / (base.max() + 1e-12) * 255).astype(np.uint8)
            blend = (0.5 * base + 0.5 * heat).astype(np.uint8)
            frames.append(blend)
            count += 1
        if count >= args.frames:
            break

    try:
        import imageio.v2 as imageio

        video = out_dir / "saliency.mp4"
        imageio.mimwrite(video, frames, fps=10)
        print(f"{video} written ({len(frames)} frames)")
    except Exception:
        from PIL import Image

        for i, f in enumerate(frames):
            Image.fromarray(f).save(out_dir / f"saliency_{i:04d}.png")
        print(f"{len(frames)} saliency frames -> {out_dir}")


if __name__ == "__main__":
    main()
