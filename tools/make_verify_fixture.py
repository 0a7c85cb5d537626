"""Build the tiny on-disk 7Scenes verification fixture.

Creates a disk-format-identical miniature scene (the exact layout
/root/reference/dataset_loaders/seven_scenes.py:43-112 reads) so the train /
eval / tools CLIs can be driven end to end on real hardware without the real
dataset: 2 sequences x N frames of random color+depth PNGs with poses,
TrainSplit/TestSplit, per-scene stats.txt, and a small .ini.

Usage: python tools/make_verify_fixture.py [root=/tmp/verify_7s] [n_frames=8]
Then follow .claude/skills/verify/SKILL.md for the drive commands.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
from PIL import Image

INI = """\
[training]
n_epochs = 2
batch_size = 4
do_val = yes
seed = 7
shuffle = yes
num_workers = 2
snapshot = 1
val_freq = 1
max_grad_norm = 0

[optimization]
opt = adam
lr = 1e-4
weight_decay = 0.0005

[logging]
visdom = no
print_freq = 1

[hyperparameters]
beta = -3.0
gamma = -3.0
dropout = 0.5
skip = 2
variable_skip = no
real = no
steps = 3
"""


def build(root: Path, n_frames: int = 8, h: int = 48, w: int = 64) -> Path:
    rng = np.random.RandomState(7)
    scene = root / "deepslam" / "7Scenes" / "heads"
    for s, seq_name in enumerate(("seq-01", "seq-02")):
        seq = scene / seq_name
        seq.mkdir(parents=True, exist_ok=True)
        for i in range(n_frames):
            Image.fromarray(
                rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
            ).save(seq / f"frame-{i:06d}.color.png")
            Image.fromarray(
                rng.randint(0, 65535, (h, w)).astype(np.uint16)
            ).save(seq / f"frame-{i:06d}.depth.png")
            pose = np.eye(4)
            pose[:3, 3] = [i * 0.1, s * 0.5, np.sin(i * 0.4)]
            np.savetxt(seq / f"frame-{i:06d}.pose.txt", pose)
    (scene / "TrainSplit.txt").write_text("sequence1\n")
    (scene / "TestSplit.txt").write_text("sequence2\n")

    assets = root / "assets" / "7Scenes" / "heads"
    assets.mkdir(parents=True, exist_ok=True)
    np.savetxt(assets / "stats.txt",
               np.array([[0.45, 0.45, 0.46], [0.078, 0.077, 0.072]]))

    (root / "tiny.ini").write_text(INI)
    return root


def build_robotcar(root: Path, n_frames: int = 8) -> Path:
    """RobotCar miniature: raw Bayer mosaics at the camera's NATIVE 960x1280
    (the CLI's raw_bayer pipeline is shape-pinned to it), INS csv + stereo
    timestamps in the exact disk format
    (/root/reference/dataset_loaders/robotcar.py:40-108). Lets the fused
    device demosaic path (Pallas kernel on TPU) be driven end to end:

        python -m geomapnet_tpu.cli.train --dataset RobotCar --scene loop \\
            --config_file <root>/tiny.ini --model mapnet --raw_bayer \\
            --data_path <root>/deepslam --asset_root <root>/assets
    """
    rng = np.random.RandomState(11)
    scene = root / "deepslam" / "RobotCar" / "loop"
    header = ("timestamp,ins_status,latitude,longitude,altitude,northing,"
              "easting,down,utm_zone,velocity_north,velocity_east,"
              "velocity_down,roll,pitch,yaw")
    for s, seq_name in enumerate(("2014-06-26-08-53-56", "2014-06-26-09-24-58")):
        seq = scene / seq_name
        (seq / "gps").mkdir(parents=True, exist_ok=True)
        centre = seq / "stereo" / "centre"
        centre.mkdir(parents=True, exist_ok=True)
        ts = [1000 * (i + 1) for i in range(n_frames)]
        (seq / "stereo.timestamps").write_text(
            "".join(f"{t} {i}\n" for i, t in enumerate(ts))
        )
        with open(seq / "gps" / "ins.csv", "w") as f:
            f.write(header + "\n")
            for i, t in enumerate(ts):
                f.write(f"{t},INS_SOLUTION_GOOD,0,0,0,"
                        f"{5e6 + s + i * 1.0},{6e5 + i * 0.5},"
                        f"{-1.0 - 0.1 * i},30U,"
                        f"0,0,0,0,0,{0.05 * i}\n")
        for t in ts:
            Image.fromarray(
                rng.randint(0, 255, (960, 1280), dtype=np.uint8)
            ).save(centre / f"{t}.png")
    (scene / "train_split.txt").write_text("2014-06-26-08-53-56\n")
    (scene / "test_split.txt").write_text("2014-06-26-09-24-58\n")

    assets = root / "assets" / "RobotCar" / "loop"
    assets.mkdir(parents=True, exist_ok=True)
    np.savetxt(assets / "stats.txt",
               np.array([[0.45, 0.45, 0.46], [0.078, 0.077, 0.072]]))
    (root / "tiny.ini").write_text(INI)
    return root


if __name__ == "__main__":
    robotcar = "--robotcar" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--robotcar"]
    root = Path(args[0]) if args else Path(
        "/tmp/verify_rc" if robotcar else "/tmp/verify_7s"
    )
    n = int(args[1]) if len(args) > 1 else 8
    (build_robotcar if robotcar else build)(root, n)
    print(f"fixture at {root}")
