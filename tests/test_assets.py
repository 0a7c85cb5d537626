"""Shipped data assets (data/): format and sanity validation.

These are the published dataset-statistics/alignment assets required to
reproduce the reference's accuracy (see data/PROVENANCE.md). The tests pin
their formats to what the datasets and CLIs consume.
"""

import pathlib
import pickle

import numpy as np
import pytest

DATA = pathlib.Path(__file__).resolve().parent.parent / "data"

pytestmark = pytest.mark.skipif(not DATA.exists(), reason="assets not built")

SCENES_7 = ["chess", "fire", "heads", "office", "pumpkin", "redkitchen",
            "stairs"]


def test_every_7scenes_scene_has_stats():
    for scene in SCENES_7:
        stats = np.loadtxt(DATA / "7Scenes" / scene / "stats.txt")
        assert stats.shape == (2, 3)
        assert np.all(stats[0] > 0) and np.all(stats[0] < 1)  # pixel means
        assert np.all(stats[1] > 0)  # variances
        pose_stats = np.loadtxt(DATA / "7Scenes" / scene / "pose_stats.txt")
        # 7Scenes uses identity normalization
        np.testing.assert_array_equal(pose_stats[0], np.zeros(3))
        np.testing.assert_array_equal(pose_stats[1], np.ones(3))


def test_robotcar_pose_stats_are_utm_scale():
    stats = np.loadtxt(DATA / "RobotCar" / "loop" / "pose_stats.txt")
    assert stats.shape == (2, 3)
    assert np.abs(stats[0]).max() > 1e3  # UTM-ish magnitudes


def test_vo_stats_pickles_are_similarity_transforms():
    pkls = sorted(DATA.rglob("*_vo_stats.pkl"))
    assert len(pkls) > 100
    for p in pkls[::7]:  # sample
        with open(p, "rb") as f:
            d = pickle.load(f)
        R, t, s = d["R"], d["t"], d["s"]
        assert R.shape == (3, 3) and t.shape == (3,) and np.isfinite(s)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert s > 0


def test_dso_poses_tables_load_through_vo_sequence():
    from geomapnet_tpu.data.sevenscenes import _vo_sequence

    # heads seq-02 is in the dso assets; fabricate the matching raw dir
    import tempfile

    table = np.loadtxt(DATA / "7Scenes" / "heads" / "dso_poses" / "seq-02.txt")
    assert table.ndim == 2 and table.shape[1] == 13
    frame_idx = table[:, 0].astype(int)
    assert (frame_idx >= 0).all()

    raw = pathlib.Path(tempfile.mkdtemp()) / "seq-02"
    raw.mkdir(parents=True)
    for i in range(frame_idx.max() + 1):
        (raw / f"frame-{i:06d}.pose.txt").write_text("")  # only counted
    seq = _vo_sequence(raw, DATA / "7Scenes" / "heads", 2, "dso")
    assert len(seq.color_paths) == len(table)
    assert seq.raw_poses.shape == (len(table), 12)
    assert set(seq.alignment) >= {"R", "t", "s"}


def test_splits_name_real_sequences():
    split = (DATA / "deepslam_data" / "RobotCar" / "loop" /
             "train_split.txt").read_text().split()
    assert len(split) >= 2 and all(s.count("-") >= 3 for s in split)
