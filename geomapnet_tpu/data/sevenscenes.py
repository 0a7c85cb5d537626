"""7Scenes dataset: disk-format-compatible frame dataset.

Reads the same on-disk layout as the reference
(/root/reference/dataset_loaders/seven_scenes.py): a raw scene directory
(``data_path/<scene>``) containing ``seq-XX/`` folders with
``frame-%06d.color.png`` / ``frame-%06d.depth.png`` / ``frame-%06d.pose.txt``
and ``TrainSplit.txt`` / ``TestSplit.txt``, plus an assets directory
(``asset_dir/<scene>``) with ``pose_stats.txt``, per-sequence
``<vo_lib>_vo_stats.pkl`` alignments and ``<vo_lib>_poses/seq-XX.txt``
precomputed VO (for ``real=True``).

Behavioral parity notes:
- ``pose_stats.txt`` is written (identity stats) when constructing the
  train/GT dataset and read otherwise — the reference's hidden ordering
  dependency (seven_scenes.py:98-104) is preserved so asset files interop;
- ``real=True`` loads ``<vo_lib>_poses`` with frame indices (libviso2 indices
  are 1-based, seven_scenes.py:71-73) and the pickled {R, t, s} alignment;
- ``gt_idx`` maps real frames onto GT frame numbering across sequences;
- corrupt images yield None from ``get_image`` (the loader skips them).
"""

from __future__ import annotations

import os
import pickle
from pathlib import Path

import numpy as np
from PIL import Image

from ..geometry.process import process_poses

__all__ = ["SevenScenes"]


def _load_image(path: Path):
    try:
        return Image.open(path)
    except (IOError, OSError) as e:
        print(f"Could not load image {path}: {e}")
        return None


class SevenScenes:
    """One 7Scenes scene as a frame dataset (protocol of data.composite).

    :param scene: 'chess' | 'fire' | 'heads' | 'office' | 'pumpkin' |
        'redkitchen' | 'stairs'
    :param data_path: raw dataset root (contains ``<scene>/seq-XX``)
    :param train: use TrainSplit.txt vs TestSplit.txt
    :param transform: callable PIL -> float array (data.transforms)
    :param target_transform: optional callable on the (6,) pose
    :param mode: 0 color, 1 depth, 2 both ([color, depth] list)
    :param real: load integrated-VO poses instead of GT
    :param skip_images: pose-only dataset (images None)
    :param vo_lib: VO source for real=True ('dso', 'orbslam', 'libviso2')
    :param asset_dir: processed-assets root (defaults to ``data/7Scenes``)
    """

    def __init__(
        self,
        scene: str,
        data_path: str,
        train: bool,
        transform=None,
        target_transform=None,
        mode: int = 0,
        seed: int = 7,
        real: bool = False,
        skip_images: bool = False,
        vo_lib: str = "orbslam",
        asset_dir: str | None = None,
        use_native: bool = False,
        native_size: tuple[int, int] | None = None,
    ):
        self.mode = mode
        self.transform = transform
        self.target_transform = target_transform
        self.skip_images = skip_images
        # native C++ decode+resize path (geomapnet_tpu.native): images arrive
        # as pre-resized uint8 arrays; the transform skips PIL work
        self.use_native = use_native
        self.native_size = native_size or (256, 341)  # 480x640 @ shortest-256
        np.random.seed(seed)

        base_dir = Path(os.path.expanduser(data_path)) / scene
        data_dir = Path(asset_dir or Path("data") / "7Scenes") / scene

        split_file = base_dir / ("TrainSplit.txt" if train else "TestSplit.txt")
        with open(split_file) as f:
            seqs = [
                int(l.split("sequence")[-1])
                for l in f
                if not l.startswith("#")
            ]

        self.c_imgs: list[Path] = []
        self.d_imgs: list[Path] = []
        self.gt_idx = np.empty((0,), dtype=int)
        ps: dict[int, np.ndarray] = {}
        vo_stats: dict[int, dict] = {}
        gt_offset = 0
        for seq in seqs:
            seq_dir = base_dir / f"seq-{seq:02d}"
            seq_data_dir = data_dir / f"seq-{seq:02d}"
            p_filenames = [
                n for n in os.listdir(seq_dir) if n.find("pose") >= 0
            ]
            if real:
                pose_file = data_dir / f"{vo_lib}_poses" / f"seq-{seq:02d}.txt"
                pss = np.loadtxt(pose_file)
                frame_idx = pss[:, 0].astype(int)
                if vo_lib == "libviso2":
                    frame_idx -= 1
                ps[seq] = pss[:, 1:13]
                with open(seq_data_dir / f"{vo_lib}_vo_stats.pkl", "rb") as f:
                    vo_stats[seq] = pickle.load(f)
            else:
                frame_idx = np.arange(len(p_filenames))
                pss = [
                    np.loadtxt(seq_dir / f"frame-{i:06d}.pose.txt").flatten()[:12]
                    for i in frame_idx
                ]
                ps[seq] = np.asarray(pss)
                vo_stats[seq] = {"R": np.eye(3), "t": np.zeros(3), "s": 1}

            self.gt_idx = np.hstack((self.gt_idx, gt_offset + frame_idx))
            gt_offset += len(p_filenames)
            self.c_imgs += [seq_dir / f"frame-{i:06d}.color.png" for i in frame_idx]
            self.d_imgs += [seq_dir / f"frame-{i:06d}.depth.png" for i in frame_idx]

        pose_stats_file = data_dir / "pose_stats.txt"
        if train and not real:
            mean_t, std_t = np.zeros(3), np.ones(3)  # 7Scenes: identity stats
            pose_stats_file.parent.mkdir(parents=True, exist_ok=True)
            np.savetxt(pose_stats_file, np.vstack((mean_t, std_t)), fmt="%8.7f")
        else:
            mean_t, std_t = np.loadtxt(pose_stats_file)

        self.poses = np.empty((0, 6))
        for seq in seqs:
            pss = process_poses(
                ps[seq], mean_t, std_t,
                vo_stats[seq]["R"], vo_stats[seq]["t"], vo_stats[seq]["s"],
            )
            self.poses = np.vstack((self.poses, pss))
        self.poses = self.poses.astype(np.float32)

    def get_image(self, index: int):
        """Float image array for frame ``index`` (None if unreadable)."""
        if self.skip_images:
            return None
        if self.use_native and self.mode == 0:
            from .. import native

            img = native.decode_image(self.c_imgs[index], *self.native_size)
            if img is None:
                return None
            return self.transform(img) if self.transform else img
        if self.mode == 0:
            img = _load_image(self.c_imgs[index])
        elif self.mode == 1:
            img = _load_image(self.d_imgs[index])
        elif self.mode == 2:
            c = _load_image(self.c_imgs[index])
            d = _load_image(self.d_imgs[index])
            if c is None or d is None:
                return None
            if self.transform is not None:
                return [self.transform(c), self.transform(d)]
            return [np.asarray(c), np.asarray(d)]
        else:
            raise ValueError(f"wrong mode {self.mode}")
        if img is None:
            return None
        if self.transform is not None:
            return self.transform(img)
        return np.asarray(img)

    def __getitem__(self, index: int):
        pose = self.poses[index]
        if self.target_transform is not None:
            pose = self.target_transform(pose)
        return self.get_image(index), pose

    def __len__(self) -> int:
        return self.poses.shape[0]
