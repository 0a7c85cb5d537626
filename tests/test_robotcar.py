"""RobotCar support tests: interpolation, demosaic, camera model, dataset."""

import numpy as np
import pytest

from geomapnet_tpu.data.robotcar_sdk import (
    CameraModel,
    demosaic_gbrg,
    interpolate_ins_poses,
    interpolate_vo_poses,
)
from geomapnet_tpu.geometry import euler2mat


def write_ins_csv(path, rows):
    header = ("timestamp,ins_status,latitude,longitude,altitude,northing,"
              "easting,down,utm_zone,velocity_north,velocity_east,"
              "velocity_down,roll,pitch,yaw")
    with open(path, "w") as f:
        f.write(header + "\n")
        for ts, n, e, d, r, p, y in rows:
            f.write(f"{ts},INS_SOLUTION_GOOD,0,0,0,{n},{e},{d},30U,"
                    f"0,0,0,{r},{p},{y}\n")


def write_vo_csv(path, rows):
    header = "source_timestamp,destination_timestamp,x,y,z,roll,pitch,yaw"
    with open(path, "w") as f:
        f.write(header + "\n")
        for src, dst, x, y, z, r, p, yw in rows:
            f.write(f"{src},{dst},{x},{y},{z},{r},{p},{yw}\n")


class TestInsInterpolation:
    def test_exact_timestamps_relative_to_origin(self, tmp_path):
        rows = [
            (1000, 10.0, 20.0, 1.0, 0, 0, 0.0),
            (2000, 11.0, 20.0, 1.0, 0, 0, 0.1),
            (3000, 12.0, 20.0, 1.0, 0, 0, 0.2),
        ]
        path = tmp_path / "ins.csv"
        write_ins_csv(path, rows)
        poses = interpolate_ins_poses(path, [1000, 2000, 3000], 1000)
        assert len(poses) == 3
        np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-9)
        # second pose: translated by [1, 0, 0] in the origin frame (origin has
        # identity rotation), rotated by 0.1 rad yaw
        np.testing.assert_allclose(poses[1][:3, 3], [1, 0, 0], atol=1e-9)
        np.testing.assert_allclose(
            poses[1][:3, :3], euler2mat(0, 0, 0.1), atol=1e-9
        )

    def test_midpoint_interpolation(self, tmp_path):
        rows = [(1000, 0, 0, 0, 0, 0, 0.0), (2000, 2.0, 0, 0, 0, 0, 0.4)]
        path = tmp_path / "ins.csv"
        write_ins_csv(path, rows)
        poses = interpolate_ins_poses(path, [1500], 1000)
        np.testing.assert_allclose(poses[0][:3, 3], [1, 0, 0], atol=1e-9)
        np.testing.assert_allclose(
            poses[0][:3, :3], euler2mat(0, 0, 0.2), atol=1e-6
        )  # slerp of a pure yaw = half the angle


class TestVoIntegration:
    def test_straight_line_integration(self, tmp_path):
        rows = [
            (2000, 1000, 1.0, 0, 0, 0, 0, 0),
            (3000, 2000, 1.0, 0, 0, 0, 0, 0),
            (4000, 3000, 1.0, 0, 0, 0, 0, 0),
        ]
        path = tmp_path / "vo.csv"
        write_vo_csv(path, rows)
        # request the integrated (source) timestamps themselves
        poses = interpolate_vo_poses(path, [2000, 3000, 4000], 2000)
        xs = [p[0, 3] for p in poses]
        np.testing.assert_allclose(xs, [0, 1, 2], atol=1e-9)

    def test_rotation_composition(self, tmp_path):
        rows = [
            (2000, 1000, 0, 0, 0, 0, 0, 0.3),
            (3000, 2000, 0, 0, 0, 0, 0, 0.3),
        ]
        path = tmp_path / "vo.csv"
        write_vo_csv(path, rows)
        poses = interpolate_vo_poses(path, [3000], 2000)
        np.testing.assert_allclose(
            poses[0][:3, :3], euler2mat(0, 0, 0.3), atol=1e-6
        )  # 0.6 total minus the 0.3 at the origin frame


class TestDemosaic:
    def test_constant_image(self):
        raw = np.full((8, 8), 100.0)
        rgb = demosaic_gbrg(raw)
        np.testing.assert_allclose(rgb, 100.0, atol=1e-6)

    def test_known_sites_preserved(self):
        rng = np.random.RandomState(0)
        raw = rng.randint(0, 255, (16, 16)).astype(np.float32)
        rgb = demosaic_gbrg(raw)
        # GBRG: G at (0,0),(1,1); B at (0,1); R at (1,0)
        assert rgb[0, 0, 1] == raw[0, 0]
        assert rgb[1, 1, 1] == raw[1, 1]
        assert rgb[0, 1, 2] == raw[0, 1]
        assert rgb[1, 0, 0] == raw[1, 0]

    def test_smooth_gradient_recovery(self):
        """On a smooth scene, demosaic should nearly recover each channel."""
        H, W = 32, 32
        yy, xx = np.mgrid[0:H, 0:W]
        r = 50 + xx * 2.0
        g = 80 + yy * 1.5
        b = 30 + (xx + yy)
        mosaic = np.zeros((H, W))
        mosaic[0::2, 0::2] = g[0::2, 0::2]
        mosaic[1::2, 1::2] = g[1::2, 1::2]
        mosaic[0::2, 1::2] = b[0::2, 1::2]
        mosaic[1::2, 0::2] = r[1::2, 0::2]
        rgb = demosaic_gbrg(mosaic)
        inner = np.s_[2:-2, 2:-2]
        assert np.abs(rgb[..., 0][inner] - r[inner]).max() < 3.0
        assert np.abs(rgb[..., 1][inner] - g[inner]).max() < 2.0
        assert np.abs(rgb[..., 2][inner] - b[inner]).max() < 3.0


class TestCameraModel:
    def make_model_dir(self, tmp_path, H=8, W=10):
        d = tmp_path / "models"
        d.mkdir()
        np.savetxt(d / "stereo_narrow_left.txt",
                   np.asarray([[400.0, 400.0, 5.0, 4.0]]))
        # identity LUT: each pixel samples itself
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
        lut = np.stack([xx.ravel(), yy.ravel()])
        lut.tofile(d / "stereo_narrow_left_distortion_lut.bin")
        return d

    def test_identity_lut(self, tmp_path):
        d = self.make_model_dir(tmp_path)
        model = CameraModel(d, "stereo/centre")
        assert model.focal_length == (400.0, 400.0)
        rng = np.random.RandomState(0)
        img = rng.rand(8, 10, 3).astype(np.float32) * 255
        out = model.undistort(img)
        np.testing.assert_allclose(out, img, atol=1e-4)

    def test_shift_lut(self, tmp_path):
        H, W = 8, 10
        d = tmp_path / "m"
        d.mkdir()
        np.savetxt(d / "stereo_narrow_left.txt",
                   np.asarray([[1.0, 1.0, 0.0, 0.0]]))
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
        lut = np.stack([(xx + 1).clip(0, W - 1).ravel(), yy.ravel()])
        lut.tofile(d / "stereo_narrow_left_distortion_lut.bin")
        model = CameraModel(d, "stereo/centre")
        img = np.tile(np.arange(W, dtype=np.float32)[None, :, None], (H, 1, 3))
        out = model.undistort(img)
        np.testing.assert_allclose(out[:, :-1, 0],
                                   img[:, 1:, 0], atol=1e-5)


class TestRobotCarDataset:
    def make_scene(self, tmp_path, n=6):
        """Minimal on-disk RobotCar scene with one sequence."""
        from PIL import Image

        scene = tmp_path / "raw" / "loop"
        seq = scene / "2014-06-26-08-53-56"
        (seq / "gps").mkdir(parents=True)
        (seq / "stereo" / "centre").mkdir(parents=True)
        ts = [1000 * (i + 1) for i in range(n)]
        with open(seq / "stereo.timestamps", "w") as f:
            for i, t in enumerate(ts):
                f.write(f"{t} {i}\n")
        write_ins_csv(
            seq / "gps" / "ins.csv",
            [(t, 5e6 + i * 1.0, 6e5 + i * 0.5, -1.0 - 0.1 * i, 0, 0, 0.05 * i)
             for i, t in enumerate(ts)],
        )
        rng = np.random.RandomState(0)
        for t in ts:
            Image.fromarray(
                rng.randint(0, 255, (32, 48, 3), dtype=np.uint8)
            ).save(seq / "stereo" / "centre" / f"{t}.png")
        with open(scene / "train_split.txt", "w") as f:
            f.write("2014-06-26-08-53-56\n")
        with open(scene / "test_split.txt", "w") as f:
            f.write("2014-06-26-08-53-56\n")
        return tmp_path / "raw", tmp_path / "assets"

    def test_construction_and_stats(self, tmp_path):
        from geomapnet_tpu.data.robotcar import RobotCar

        raw, assets = self.make_scene(tmp_path)
        ds = RobotCar("loop", str(raw), train=True,
                      asset_dir=str(assets / "RobotCar"))
        assert len(ds) == 6
        assert ds.poses.shape == (6, 6)
        # stats were written with real mean/std (not identity)
        stats = np.loadtxt(assets / "RobotCar" / "loop" / "pose_stats.txt")
        assert not np.allclose(stats[0], 0)
        # normalized translations have ~zero mean
        np.testing.assert_allclose(ds.poses[:, :3].mean(axis=0), 0, atol=1e-5)

    def test_images_load(self, tmp_path):
        from geomapnet_tpu.data.robotcar import RobotCar

        raw, assets = self.make_scene(tmp_path)
        ds = RobotCar("loop", str(raw), train=True,
                      asset_dir=str(assets / "RobotCar"))
        img = ds.get_image(0)
        assert img.shape == (32, 48, 3)

    def test_test_split_reads_stats(self, tmp_path):
        from geomapnet_tpu.data.robotcar import RobotCar

        raw, assets = self.make_scene(tmp_path)
        RobotCar("loop", str(raw), train=True,
                 asset_dir=str(assets / "RobotCar"))  # writes stats
        ds = RobotCar("loop", str(raw), train=False,
                      asset_dir=str(assets / "RobotCar"))
        assert len(ds) == 6


class TestRawBayerPath:
    """Raw mosaic -> device pipeline path: host does nothing but decode."""

    def _bayer_scene(self, tmp_path, h=16, w=24, n=4):
        from PIL import Image

        helper = TestRobotCarDataset()
        raw, assets = helper.make_scene(tmp_path, n=n)
        seq = raw / "loop" / "2014-06-26-08-53-56"
        rng = np.random.RandomState(1)
        mosaics = {}
        for p in sorted((seq / "stereo" / "centre").glob("*.png")):
            m = rng.randint(0, 255, (h, w), dtype=np.uint8)
            Image.fromarray(m, mode="L").save(p)
            mosaics[p.name] = m
        return raw, assets, mosaics

    def test_native_decode_batch_gray(self, tmp_path):
        from geomapnet_tpu import native

        if not native.available():
            import pytest

            pytest.skip("native library not built")
        raw, _, mosaics = self._bayer_scene(tmp_path)
        seq = raw / "loop" / "2014-06-26-08-53-56" / "stereo" / "centre"
        paths = sorted(seq.glob("*.png"))
        batch, ok = native.decode_batch_gray(paths, 16, 24)
        assert batch.shape == (len(paths), 16, 24)
        assert ok.all()
        for i, p in enumerate(paths):
            np.testing.assert_array_equal(batch[i], mosaics[p.name])
        # size mismatch flags failure
        _, ok2 = native.decode_batch_gray(paths, 8, 24)
        assert not ok2.any()

    def test_dataset_raw_bayer_mode(self, tmp_path):
        from geomapnet_tpu.data.robotcar import RobotCar

        raw, assets, mosaics = self._bayer_scene(tmp_path)
        ds = RobotCar("loop", str(raw), train=True,
                      asset_dir=str(assets / "RobotCar"),
                      raw_bayer=True, raw_size=(16, 24))
        img, pose = ds[0]
        assert img.shape == (16, 24) and img.dtype == np.uint8
        assert pose.shape == (6,)
        ts = sorted(mosaics)[0]
        np.testing.assert_array_equal(img, mosaics[ts])

    def test_raw_batch_through_device_pipeline(self, tmp_path):
        """Loader-stacked raw mosaics -> fused demosaic/resize/normalize."""
        import jax.numpy as jnp

        from geomapnet_tpu.data import Loader
        from geomapnet_tpu.data.robotcar import RobotCar
        from geomapnet_tpu.ops import make_device_pipeline

        raw, assets, _ = self._bayer_scene(tmp_path)
        ds = RobotCar("loop", str(raw), train=True,
                      asset_dir=str(assets / "RobotCar"),
                      raw_bayer=True, raw_size=(16, 24))
        imgs, poses, pad = next(iter(
            Loader(ds, 4, shuffle=False, drop_last=False)
        ))
        assert imgs.shape == (4, 16, 24) and imgs.dtype == np.uint8
        pipe = make_device_pipeline(
            mean=[0.5] * 3, std=[0.25] * 3, resize_to=(8, 11), bayer=True,
            dtype=jnp.float32,
        )
        out = np.asarray(pipe(jnp.asarray(imgs)))
        assert out.shape == (4, 8, 11, 3)
        assert np.isfinite(out).all()


def test_degenerate_axis_stats_clamped(tmp_path):
    """A constant trajectory coordinate must not NaN every target: the
    stats writer clamps ~zero std to 1 with a warning (observed as
    loss=nan end to end before the guard)."""
    from geomapnet_tpu.data.robotcar import _real_pose_stats

    poses = np.zeros((5, 12))
    poses[:, 3] = np.arange(5)     # northing varies
    poses[:, 7] = 2.5              # easting constant
    poses[:, 11] = -np.arange(5)   # down varies
    with pytest.warns(UserWarning, match="clamping"):
        mean_t, std_t = _real_pose_stats(tmp_path / "pose_stats.txt", poses)
    assert std_t[1] == 1.0 and std_t[0] > 0 and std_t[2] > 0
    assert np.isfinite(np.loadtxt(tmp_path / "pose_stats.txt")).all()
