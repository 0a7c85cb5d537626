"""Native C++ image decoder tests (skipped when the library isn't built)."""

import os
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

native = pytest.importorskip("geomapnet_tpu.native")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


@pytest.fixture
def pngs(tmp_path, rng):
    paths = []
    for i in range(4):
        arr = rng.randint(0, 255, (48, 64, 3)).astype(np.uint8)
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def test_decode_batch_shapes(pngs):
    batch, ok = native.decode_batch(pngs, 24, 32, n_threads=2)
    assert batch.shape == (4, 24, 32, 3)
    assert batch.dtype == np.uint8
    assert ok.all()


def test_decode_identity_size(pngs):
    """Decoding at the source size reproduces the image exactly."""
    src = np.asarray(Image.open(pngs[0]))
    out = native.decode_image(pngs[0], 48, 64)
    np.testing.assert_array_equal(out, src)


def test_failure_flags(pngs, tmp_path):
    missing = tmp_path / "missing.png"
    batch, ok = native.decode_batch([pngs[0], missing], 24, 32)
    assert ok.tolist() == [True, False]


def test_grayscale_promoted(tmp_path, rng):
    arr = rng.randint(0, 255, (40, 40)).astype(np.uint8)
    p = tmp_path / "g.png"
    Image.fromarray(arr, mode="L").save(p)
    out = native.decode_image(p, 40, 40)
    assert out.shape == (40, 40, 3)
    np.testing.assert_array_equal(out[..., 0], arr)


def test_downscale_close_to_pil(tmp_path):
    """On a smooth image, native resize tracks PIL closely."""
    yy, xx = np.mgrid[0:128, 0:160]
    smooth = np.stack([yy, xx, yy + xx], axis=-1).astype(np.float64)
    smooth = (smooth / smooth.max() * 255).astype(np.uint8)
    p = tmp_path / "smooth.png"
    Image.fromarray(smooth).save(p)
    out = native.decode_image(p, 32, 40)
    ref = np.asarray(Image.open(p).resize((40, 32), Image.BILINEAR))
    assert np.abs(out.astype(int) - ref.astype(int)).mean() < 2.0


def test_sevenscenes_native_path(tmp_path, rng):
    """use_native=True drives the C++ decoder through the dataset."""
    from geomapnet_tpu.data.sevenscenes import SevenScenes

    scene = tmp_path / "raw" / "heads"
    seq = scene / "seq-01"
    seq.mkdir(parents=True)
    with open(scene / "TrainSplit.txt", "w") as f:
        f.write("sequence1\n")
    for i in range(3):
        Image.fromarray(
            rng.randint(0, 255, (48, 64, 3)).astype(np.uint8)
        ).save(seq / f"frame-{i:06d}.color.png")
        pose = np.eye(4)
        pose[:3, 3] = [i, 0, 0]
        np.savetxt(seq / f"frame-{i:06d}.pose.txt", pose)

    ds = SevenScenes(
        "heads", str(tmp_path / "raw"), train=True,
        asset_dir=str(tmp_path / "assets"), use_native=True,
        native_size=(24, 32),
    )
    img = ds.get_image(0)
    assert img.shape == (24, 32, 3)
    assert ds.poses.shape == (3, 6)


def test_sevenscenes_get_images_matches_get_image(tmp_path, rng):
    """The batched native path must produce exactly the per-image path's
    arrays (same decoder, same resize) in order."""
    from geomapnet_tpu.data.sevenscenes import SevenScenes

    scene = tmp_path / "raw" / "heads"
    seq = scene / "seq-01"
    seq.mkdir(parents=True)
    (scene / "TrainSplit.txt").write_text("sequence1\n")
    for i in range(5):
        arr = rng.randint(0, 255, (32, 48, 3)).astype(np.uint8)
        Image.fromarray(arr).save(seq / f"frame-{i:06d}.color.png")
        pose = np.eye(4)
        pose[:3, 3] = [i, 0, 0]
        np.savetxt(seq / f"frame-{i:06d}.pose.txt", pose)

    ds = SevenScenes("heads", str(tmp_path / "raw"), train=True, mode=0,
                     asset_dir=str(tmp_path / "assets"),
                     use_native=True, native_size=(16, 24))
    batched = ds.get_images([3, 0, 4], num_workers=2)
    for got, idx in zip(batched, [3, 0, 4]):
        np.testing.assert_array_equal(got, ds.get_image(idx))


def test_decode_batch_gray16_bit_exact(tmp_path, rng):
    paths, arrays = [], []
    for i in range(3):
        arr = rng.randint(0, 65535, (20, 30)).astype(np.uint16)
        p = tmp_path / f"depth_{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(p)
        arrays.append(arr)
    batch, ok = native.decode_batch_gray16(paths, 20, 30, n_threads=2)
    assert batch.dtype == np.uint16 and ok.all()
    for got, want in zip(batch, arrays):
        np.testing.assert_array_equal(got, want)


def test_decode_batch_gray16_rejects_wrong_depth(tmp_path, rng):
    p8 = tmp_path / "not16.png"
    Image.fromarray(rng.randint(0, 255, (20, 30)).astype(np.uint8)).save(p8)
    _, ok = native.decode_batch_gray16([p8], 20, 30)
    assert not ok[0]


def _depth_scene(tmp_path, rng, n=4):
    scene = tmp_path / "raw" / "heads"
    seq = scene / "seq-01"
    seq.mkdir(parents=True)
    (scene / "TrainSplit.txt").write_text("sequence1\n")
    for i in range(n):
        Image.fromarray(
            rng.randint(0, 255, (16, 24, 3)).astype(np.uint8)
        ).save(seq / f"frame-{i:06d}.color.png")
        Image.fromarray(
            rng.randint(0, 65535, (16, 24)).astype(np.uint16)
        ).save(seq / f"frame-{i:06d}.depth.png")
        pose = np.eye(4)
        pose[:3, 3] = [i, 0, 0]
        np.savetxt(seq / f"frame-{i:06d}.pose.txt", pose)
    return tmp_path / "raw", tmp_path / "assets"


def test_sevenscenes_depth_mode_native_matches_pil(tmp_path, rng):
    from geomapnet_tpu.data.sevenscenes import SevenScenes

    raw, assets = _depth_scene(tmp_path, rng)
    kw = dict(train=True, mode=1, asset_dir=str(assets))
    pil = SevenScenes("heads", str(raw), **kw)
    nat = SevenScenes("heads", str(raw), use_native=True, **kw)
    for i in range(3):
        np.testing.assert_array_equal(nat.get_image(i), pil.get_image(i))
    batched = nat.get_images([2, 0], num_workers=2)
    np.testing.assert_array_equal(batched[0], pil.get_image(2))
    np.testing.assert_array_equal(batched[1], pil.get_image(0))


def test_sevenscenes_both_mode_native(tmp_path, rng):
    from geomapnet_tpu.data.sevenscenes import SevenScenes

    raw, assets = _depth_scene(tmp_path, rng)
    ds = SevenScenes("heads", str(raw), train=True, mode=2,
                     asset_dir=str(assets), use_native=True,
                     native_size=(16, 24))
    out = ds.get_images([0, 1])
    for pair, i in zip(out, (0, 1)):
        assert isinstance(pair, list) and len(pair) == 2
        assert pair[0].shape == (16, 24, 3) and pair[0].dtype == np.uint8
        assert pair[1].shape == (16, 24) and pair[1].dtype == np.uint16


def test_io_backend_reports():
    from geomapnet_tpu import native

    if not native.available():
        pytest.skip("native lib not built")
    assert native.io_backend() in ("io_uring", "pread")


def test_pread_fallback_decodes_identically(tmp_path, rng):
    """GM_DISABLE_URING=1 (fresh process: the probe is per-process static)
    must produce the same bytes as the default backend."""
    import subprocess
    import sys

    from geomapnet_tpu import native

    if not native.available():
        pytest.skip("native lib not built")
    paths = []
    for i in range(4):
        img = rng.randint(0, 256, (20, 28, 3)).astype(np.uint8)
        p = tmp_path / f"f{i}.png"
        Image.fromarray(img).save(p)
        paths.append(str(p))
    here, _ = native.decode_batch(paths, 20, 28, n_threads=2)
    np.save(tmp_path / "expected.npy", here)

    code = (
        "import sys, numpy as np\n"
        f"sys.path.insert(0, {str(Path(__file__).resolve().parents[1])!r})\n"
        "from geomapnet_tpu import native\n"
        "assert native.io_backend() == 'pread', native.io_backend()\n"
        f"got, ok = native.decode_batch({paths!r}, 20, 28, n_threads=2)\n"
        "assert ok.all()\n"
        f"exp = np.load({str(tmp_path / 'expected.npy')!r})\n"
        "assert np.array_equal(got, exp)\n"
        "print('pread ok')\n"
    )
    env = dict(os.environ, GM_DISABLE_URING="1")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    assert "pread ok" in out.stdout


def test_corrupt_inputs_do_not_crash(tmp_path, rng):
    """Garbage bytes through both decoders: flagged failed, process lives.

    (libjpeg's default error handler calls exit(); a corrupt frame must not
    take down training — reference equivalent: load_image returns None,
    /root/reference/dataset_loaders/utils.py:8-18.)
    """
    from geomapnet_tpu import native

    if not native.available():
        pytest.skip("native lib not built")
    paths = []
    # truly random bytes, a truncated PNG, a mislabeled jpg, and one good file
    (tmp_path / "noise.png").write_bytes(rng.bytes(4096))
    paths.append(str(tmp_path / "noise.png"))
    img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "good.png")
    (tmp_path / "trunc.png").write_bytes(
        (tmp_path / "good.png").read_bytes()[:40])
    paths.append(str(tmp_path / "trunc.png"))
    (tmp_path / "fake.jpg").write_bytes(rng.bytes(512))
    paths.append(str(tmp_path / "fake.jpg"))
    paths.append(str(tmp_path / "good.png"))

    batch, ok = native.decode_batch(paths, 16, 16, n_threads=2)
    assert ok.tolist() == [False, False, False, True]
    np.testing.assert_array_equal(batch[3], img)


def test_large_batch_exercises_ring_refill(tmp_path, rng):
    """300 files >> the 64-deep io_uring: covers ring refill, completion
    interleaving and slot reuse; order and content must be exact."""
    from geomapnet_tpu import native

    if not native.available():
        pytest.skip("native lib not built")
    n = 300
    imgs, paths = [], []
    for i in range(n):
        a = np.full((4, 6, 3), i % 251, np.uint8)
        p = tmp_path / f"f{i:04d}.png"
        Image.fromarray(a).save(p)
        imgs.append(a)
        paths.append(str(p))
    batch, ok = native.decode_batch(paths, 4, 6, n_threads=3)
    assert ok.all()
    for i in range(n):
        np.testing.assert_array_equal(batch[i], imgs[i])
