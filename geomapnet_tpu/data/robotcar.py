"""Oxford RobotCar dataset: disk-format-compatible frame dataset.

Reference parity: /root/reference/dataset_loaders/robotcar.py. Reads the same
layout: a scene directory (``data_path/<scene>``) with ``train_split.txt`` /
``test_split.txt`` naming sequence dirs, each containing
``stereo.timestamps``, ``gps/ins.csv`` (GT), ``vo/vo.csv`` or
``gps/gps_ins.csv`` (real), and ``stereo/centre/<ts>.png`` images; an assets
dir with per-sequence ``<vo_lib>_vo_stats.pkl`` alignment and the scene
``pose_stats.txt``.

Pose stats semantics preserved: RobotCar writes *real* mean/std of the GT
translations on train construction (robotcar.py:89-99), unlike 7Scenes'
identity stats.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from functools import partial
from pathlib import Path

import numpy as np
from PIL import Image

from ..geometry.process import process_poses
from .robotcar_sdk import (
    CameraModel,
    interpolate_ins_poses,
    interpolate_vo_poses,
    load_stereo_image,
)

__all__ = ["RobotCar"]


@dataclasses.dataclass
class SequencePoses:
    """Everything one RobotCar sequence directory contributes."""

    timestamps: list[int]
    raw_poses: np.ndarray  # (F, 12) flattened [R|t] rows
    alignment: dict  # {R, t, s} similarity into the GT frame
    image_paths: list[Path]


def _read_timestamps(seq_dir: Path) -> list[int]:
    with open(seq_dir / "stereo.timestamps") as f:
        return [int(line.rstrip().split(" ")[0]) for line in f]


def _load_sequence(seq_dir: Path, asset_seq_dir: Path, real: bool,
                   vo_lib: str) -> SequencePoses:
    """Interpolate per-image poses for one sequence: INS ground truth, or
    integrated VO / GPS with its pickled GT alignment when ``real``."""
    stamps = _read_timestamps(seq_dir)
    if real:
        if vo_lib == "stereo":
            se3 = interpolate_vo_poses(seq_dir / "vo" / "vo.csv", stamps,
                                       stamps[0])
        elif vo_lib == "gps":
            se3 = interpolate_ins_poses(seq_dir / "gps" / "gps_ins.csv",
                                        stamps, stamps[0])
        else:
            raise NotImplementedError(f"unknown vo_lib {vo_lib}")
        with open(asset_seq_dir / f"{vo_lib}_vo_stats.pkl", "rb") as f:
            alignment = pickle.load(f)
    else:
        se3 = interpolate_ins_poses(seq_dir / "gps" / "ins.csv", stamps,
                                    stamps[0])
        alignment = {"R": np.eye(3), "t": np.zeros(3), "s": 1}
    se3 = np.asarray(se3)
    raw = se3[:, :3, :].reshape(len(se3), -1)
    paths = [seq_dir / "stereo" / "centre" / f"{t}.png" for t in stamps]
    return SequencePoses(stamps, raw, alignment, paths)


def _real_pose_stats(stats_file: Path, write_from: np.ndarray | None):
    """RobotCar normalizes by the REAL translation mean/std (UTM-scale
    values), written on train/GT construction and read back otherwise."""
    if write_from is not None:
        mean_t = np.mean(write_from[:, [3, 7, 11]], axis=0)
        std_t = np.std(write_from[:, [3, 7, 11]], axis=0)
        # a trajectory with zero variance along an axis (possible in tiny /
        # synthetic scenes) would make process_poses divide by zero and NaN
        # every target downstream — clamp to 1 (= "no normalization" for
        # that axis) with a warning instead
        stats_file.parent.mkdir(parents=True, exist_ok=True)
        # threshold covers the file format too: %8.7f quantizes anything
        # below 5e-8 to a literal 0.0 on disk
        std_t = _clamp_degenerate_std(std_t, threshold=1e-6)
        np.savetxt(stats_file, np.vstack((mean_t, std_t)), fmt="%8.7f")
        return mean_t, std_t
    stats = np.loadtxt(stats_file)
    # also guard the READ path: stats written by the reference (or by this
    # code before the guard) may carry a zero
    return stats[0], _clamp_degenerate_std(stats[1], threshold=1e-8)


def _clamp_degenerate_std(std_t: np.ndarray, threshold: float) -> np.ndarray:
    """A ~zero std along an axis (constant trajectory coordinate — possible
    in tiny/synthetic scenes) would make ``process_poses`` divide by zero
    and NaN every target downstream; clamp to 1 (= no normalization for
    that axis) with a warning."""
    degenerate = std_t < threshold
    if degenerate.any():
        import warnings

        warnings.warn(
            f"pose std is ~0 along axes {np.nonzero(degenerate)[0]} "
            f"(constant trajectory coordinate); clamping to 1 to avoid "
            f"NaN normalization", stacklevel=3,
        )
        std_t = np.where(degenerate, 1.0, std_t)
    return std_t


class RobotCar:
    """One RobotCar scene (e.g. 'loop', 'full') as a frame dataset.

    :param scene: sequence collection name
    :param data_path: raw dataset root (contains ``<scene>/<seq dirs>``)
    :param train: train vs test split
    :param transform: callable image -> float array
    :param real: poses from VO/GPS integration instead of INS ground truth
    :param undistort: demosaic+undistort raw Bayer images on load (slow host
        path; prefer offline preprocessing via cli.tools or the device kernel)
    :param vo_lib: 'stereo' (vo.csv) or 'gps' (gps_ins.csv) for real=True
    :param asset_dir: processed-assets root (defaults to ``data/RobotCar``)
    :param use_native: decode+resize offline-processed RGB images with the
        C++ batch decoder (geomapnet_tpu.native) instead of PIL
    :param native_size: (H, W) for the native decode path
    :param raw_bayer: return the raw single-channel Bayer mosaic uint8
        (H, W) with NO host processing — the TPU-native fast path: the fused
        device pipeline (ops.make_device_pipeline(bayer=True)) demosaics,
        undistorts, resizes and normalizes on-chip. ``transform`` is ignored.
    :param raw_size: expected (H, W) of raw mosaics (RobotCar Grasshopper2:
        960x1280)
    """

    def __init__(
        self,
        scene: str,
        data_path: str,
        train: bool,
        transform=None,
        target_transform=None,
        real: bool = False,
        skip_images: bool = False,
        seed: int = 7,
        undistort: bool = False,
        vo_lib: str = "stereo",
        asset_dir: str | None = None,
        camera_models_dir: str | None = None,
        use_native: bool = False,
        native_size: tuple[int, int] | None = None,
        raw_bayer: bool = False,
        raw_size: tuple[int, int] = (960, 1280),
    ):
        np.random.seed(seed)
        self.transform = transform
        self.target_transform = target_transform
        self.skip_images = skip_images
        self.undistort = undistort
        self.use_native = use_native
        self.native_size = native_size or (256, 341)
        self.raw_bayer = raw_bayer
        self.raw_size = raw_size
        scene_dir = Path(os.path.expanduser(data_path)) / scene
        asset_scene_dir = Path(asset_dir or Path("data") / "RobotCar") / scene

        split_name = "train_split.txt" if train else "test_split.txt"
        with open(scene_dir / split_name) as f:
            seq_names = [l.rstrip() for l in f if not l.startswith("#")]

        sequences = [
            _load_sequence(scene_dir / seq, asset_scene_dir / seq, real,
                           vo_lib)
            for seq in seq_names
        ]
        self.imgs = [p for s in sequences for p in s.image_paths]

        all_raw = np.vstack([s.raw_poses for s in sequences])
        mean_t, std_t = _real_pose_stats(
            asset_scene_dir / "pose_stats.txt",
            write_from=all_raw if (train and not real) else None,
        )
        self.poses = np.concatenate([
            process_poses(s.raw_poses, mean_t, std_t, s.alignment["R"],
                          s.alignment["t"], s.alignment["s"])
            for s in sequences
        ]).astype(np.float32)
        self.gt_idx = np.arange(len(self.poses))

        self._camera_model = None
        if undistort:
            models_dir = camera_models_dir or str(
                Path("data") / "robotcar_camera_models"
            )
            self._camera_model = CameraModel(
                models_dir, Path("stereo") / "centre"
            )

    def get_image(self, index: int):
        if self.skip_images:
            return None
        if self.raw_bayer:
            from .. import native

            if native.available():
                batch, ok = native.decode_batch_gray(
                    [self.imgs[index]], *self.raw_size, n_threads=1
                )
                return batch[0] if ok[0] else None
            try:
                raw = np.asarray(Image.open(self.imgs[index]))
            except (IOError, OSError) as e:
                print(f"Could not load image {self.imgs[index]}: {e}")
                return None
            if raw.ndim != 2 or raw.shape != self.raw_size:
                return None
            return raw.astype(np.uint8)
        if self.use_native:
            from .. import native

            img = native.decode_image(self.imgs[index], *self.native_size)
            if img is None:
                return None
            if self.transform is not None:
                return self.transform(img)
            return img
        if self.undistort:
            img = load_stereo_image(self.imgs[index], self._camera_model)
            if img is None:
                return None
            img = Image.fromarray(np.uint8(np.clip(img, 0, 255)))
        else:
            try:
                img = Image.open(self.imgs[index])
            except (IOError, OSError) as e:
                print(f"Could not load image {self.imgs[index]}: {e}")
                return None
        if self.transform is not None:
            return self.transform(img)
        return np.asarray(img)

    def get_images(self, indices, num_workers: int = 4) -> list:
        """Batch counterpart of :meth:`get_image`: raw-Bayer and native-RGB
        frames decode through one C++ thread-pooled call per loader batch."""
        if self.skip_images:
            return [None] * len(indices)
        from .. import native

        if self.raw_bayer and native.available():
            batch, ok = native.decode_batch_gray(
                [self.imgs[i] for i in indices], *self.raw_size,
                n_threads=num_workers,
            )
            return [img if good else None for img, good in zip(batch, ok)]
        if self.use_native:
            batch, ok = native.decode_batch(
                [self.imgs[i] for i in indices], *self.native_size,
                n_threads=num_workers,
            )
            return [
                (self.transform(img) if self.transform else img)
                if good else None
                for img, good in zip(batch, ok)
            ]
        return [self.get_image(i) for i in indices]

    def __getitem__(self, index: int):
        pose = self.poses[index]
        if self.target_transform is not None:
            pose = self.target_transform(pose)
        return self.get_image(index), pose

    def __len__(self) -> int:
        return len(self.poses)
