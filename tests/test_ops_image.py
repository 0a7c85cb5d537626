"""Device image-pipeline tests: demosaic/undistort/resize/normalize parity."""

import numpy as np
import jax
import jax.numpy as jnp

from geomapnet_tpu.data.robotcar_sdk import demosaic_gbrg
from geomapnet_tpu.ops.image import (
    box_halve,
    demosaic,
    make_device_pipeline,
    normalize,
    precompute_undistort_maps,
    resize_bilinear,
    resize_shorter_side_shape,
    undistort,
)


class TestDemosaicDevice:
    def test_matches_host_implementation(self, rng):
        raw = rng.randint(0, 255, (2, 16, 20)).astype(np.float32)
        dev = np.asarray(demosaic(jnp.asarray(raw)))
        for n in range(2):
            host = demosaic_gbrg(raw[n])
            np.testing.assert_allclose(dev[n], host, atol=1e-4)


class TestUndistortDevice:
    def test_identity_maps(self, rng):
        H, W = 12, 16
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
        lut = np.stack([xx.ravel(), yy.ravel()])
        maps = precompute_undistort_maps(lut, H, W)
        img = rng.rand(3, H, W, 3).astype(np.float32)
        out = np.asarray(undistort(jnp.asarray(img), *maps))
        np.testing.assert_allclose(out, img, atol=1e-5)

    def test_half_pixel_shift_interpolates(self):
        H, W = 4, 8
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
        lut = np.stack([(xx + 0.5).clip(0, W - 1).ravel(), yy.ravel()])
        maps = precompute_undistort_maps(lut, H, W)
        img = np.tile(np.arange(W, dtype=np.float32)[None, :, None], (H, 1, 1))[None]
        out = np.asarray(undistort(jnp.asarray(img), *maps))
        expect = np.tile(np.arange(W - 1) + 0.5, (H, 1))
        np.testing.assert_allclose(out[0, :, :-1, 0], expect, atol=1e-5)


class TestResize:
    def test_shorter_side_shape(self):
        assert resize_shorter_side_shape(480, 640, 256) == (256, 341)
        assert resize_shorter_side_shape(640, 480, 256) == (341, 256)

    def test_resize_constant_preserved(self):
        img = jnp.full((1, 32, 48, 3), 7.0)
        out = np.asarray(resize_bilinear(img, 16, 24))
        np.testing.assert_allclose(out, 7.0, atol=1e-5)


class TestNormalize:
    def test_values(self):
        img = jnp.full((1, 2, 2, 3), 255.0)
        out = np.asarray(normalize(img, [0.5, 0.5, 0.5], [0.25, 0.5, 1.0]))
        np.testing.assert_allclose(out[0, 0, 0], [2.0, 1.0, 0.5], atol=1e-6)


class TestPipeline:
    def test_bayer_pipeline_end_to_end(self, rng):
        pipe = make_device_pipeline(
            mean=[0.5, 0.5, 0.5], std=[0.2, 0.2, 0.2],
            resize_to=(8, 12), bayer=True, dtype=jnp.float32,
        )
        raw = rng.randint(0, 255, (2, 16, 24)).astype(np.uint8)
        out = np.asarray(pipe(jnp.asarray(raw)))
        assert out.shape == (2, 8, 12, 3)
        assert np.all(np.isfinite(out))

    def test_rgb_pipeline_dtype(self, rng):
        pipe = make_device_pipeline(mean=[0.0] * 3, std=[1.0] * 3,
                                    dtype=jnp.bfloat16)
        img = rng.rand(1, 8, 8, 3).astype(np.float32) * 255
        out = pipe(jnp.asarray(img))
        assert out.dtype == jnp.bfloat16


class TestPallasKernel:
    def test_matches_xla_in_interpret_mode(self, rng):
        """The fused Pallas demosaic+normalize kernel is bit-compatible with
        the XLA composition (interpret mode on CPU)."""
        import functools

        from jax.experimental import pallas as pl

        import geomapnet_tpu.ops.pallas_image as P
        from geomapnet_tpu.ops.image import demosaic_half, normalize

        orig = pl.pallas_call
        pl.pallas_call = functools.partial(orig, interpret=True)
        try:
            raw = rng.randint(0, 255, (2, 16, 256)).astype(np.uint8)
            out = np.asarray(P.demosaic_half_normalize(
                jnp.asarray(raw), (0.5, 0.5, 0.5), (0.25, 0.25, 0.25),
                dtype=jnp.float32,
            ))
            ref = np.asarray(normalize(
                demosaic_half(jnp.asarray(raw)), [0.5] * 3, [0.25] * 3,
                dtype=jnp.float32,
            ))
            np.testing.assert_allclose(out, ref, atol=1e-6)
        finally:
            pl.pallas_call = orig


class TestTupleBatchPipeline:
    def test_bayer_tuple_batch_matches_flat(self):
        rng = np.random.RandomState(0)
        raw = rng.randint(0, 256, (2, 3, 16, 24), dtype=np.uint8)
        pipe = make_device_pipeline(
            mean=[0.5] * 3, std=[0.25] * 3, resize_to=(8, 11), bayer=True,
            dtype=jnp.float32,
        )
        tup = np.asarray(pipe(jnp.asarray(raw)))
        flat = np.asarray(pipe(jnp.asarray(raw.reshape(6, 16, 24))))
        assert tup.shape == (2, 3, 8, 11, 3)
        np.testing.assert_array_equal(tup.reshape(6, 8, 11, 3), flat)

    def test_rgb_tuple_batch(self):
        rng = np.random.RandomState(1)
        raw = rng.randint(0, 256, (2, 2, 12, 16, 3), dtype=np.uint8)
        pipe = make_device_pipeline(mean=[0.5] * 3, std=[0.5] * 3,
                                    dtype=jnp.float32)
        out = np.asarray(pipe(jnp.asarray(raw)))
        assert out.shape == (2, 2, 12, 16, 3)

    def test_build_raw_device_preprocess(self, tmp_path):
        from geomapnet_tpu.cli.builders import build_raw_device_preprocess

        scene_dir = tmp_path / "RobotCar" / "loop"
        scene_dir.mkdir(parents=True)
        np.savetxt(scene_dir / "stats.txt",
                   np.stack([[0.4, 0.45, 0.5], [0.04, 0.0625, 0.09]]))
        pipe = build_raw_device_preprocess(
            "loop", str(tmp_path), raw_size=(16, 24), resize=8,
        )
        raw = np.random.RandomState(2).randint(
            0, 256, (4, 16, 24), dtype=np.uint8)
        out = np.asarray(pipe(jnp.asarray(raw)))
        # shortest-side-8 resize of 16x24 -> 8x12
        assert out.shape == (4, 8, 12, 3)
        assert np.isfinite(out).all()


class TestMatmulResize:
    def test_matches_jax_image_resize(self):
        from geomapnet_tpu.ops import resize_bilinear_matmul

        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.rand(2, 3, 20, 32).astype(np.float32) * 255)
        ref = jax.image.resize(img, (2, 3, 9, 13), method="linear",
                               antialias=False)
        got = resize_bilinear_matmul(img, 9, 13)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-3)

    def test_identity(self):
        from geomapnet_tpu.ops import resize_bilinear_matmul

        img = jnp.asarray(np.random.RandomState(1).rand(1, 3, 8, 16)
                          .astype(np.float32))
        out = resize_bilinear_matmul(img, 8, 16)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                   atol=1e-6)


class TestPallasKernelInterpret:
    """Interpret-mode coverage of the fused demosaic kernel (bit-exactness
    vs the XLA composition; Mosaic lowering itself is validated on TPU)."""

    def test_matches_xla_composition(self):
        from geomapnet_tpu.ops.image import demosaic_half
        from geomapnet_tpu.ops.pallas_image import demosaic_half_normalize

        rng = np.random.RandomState(0)
        raw = jnp.asarray(rng.randint(0, 256, (2, 16, 256), dtype=np.uint8))
        mean, std = (0.4, 0.45, 0.5), (0.2, 0.25, 0.3)
        got = demosaic_half_normalize(raw, mean, std, dtype=jnp.float32)
        ref = (demosaic_half(raw) / 255.0 - jnp.asarray(mean)) / jnp.asarray(std)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_planar_layout(self):
        from geomapnet_tpu.ops.pallas_image import demosaic_half_normalize

        raw = jnp.zeros((1, 8, 256), jnp.uint8)
        out = demosaic_half_normalize(raw, (0.0,) * 3, (1.0,) * 3,
                                      dtype=jnp.float32, planar=True)
        assert out.shape == (1, 3, 4, 128)
