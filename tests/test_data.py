"""Data layer tests: tuple index math, MF/MFOnline composition, loader."""

import numpy as np
import pytest

from geomapnet_tpu.data import (
    MF,
    MFOnline,
    Loader,
    OnlyPoses,
    SyntheticScene,
    TupleSampler,
    vos_logq_np,
    vos_simple_np,
)


class TestTupleSampler:
    def test_centered_offsets(self):
        s = TupleSampler(dataset_len=100, steps=3, skip=10)
        np.testing.assert_array_equal(s.indices(50), [40, 50, 60])

    def test_clamping_at_edges(self):
        s = TupleSampler(dataset_len=100, steps=3, skip=10)
        np.testing.assert_array_equal(s.indices(0), [0, 0, 10])
        np.testing.assert_array_equal(s.indices(99), [89, 99, 99])

    def test_even_steps_center(self):
        """steps=2: offsets [0, skip] centered on the *second* element
        (len//2 == 1), so indices are [i - skip, i]... actually [0,s]-s=[-s,0]
        -> [i-s, i]."""
        s = TupleSampler(dataset_len=100, steps=2, skip=5)
        np.testing.assert_array_equal(s.indices(50), [45, 50])

    def test_no_duplicates_shift_and_len(self):
        s = TupleSampler(dataset_len=100, steps=3, skip=10, no_duplicates=True)
        assert len(s) == 100 - 2 * 10
        # first tuple starts exactly at 0 and never clamps
        np.testing.assert_array_equal(s.indices(0), [0, 10, 20])
        np.testing.assert_array_equal(s.indices(79), [79, 89, 99])

    def test_variable_skip_bounds(self):
        s = TupleSampler(dataset_len=1000, steps=4, skip=7, variable_skip=True)
        rng = np.random.RandomState(0)
        for i in [100, 500]:
            idx = s.indices(i, rng)
            gaps = np.diff(idx)
            assert np.all(gaps >= 1) and np.all(gaps <= 7)
            assert len(idx) == 4

    def test_index_matrix_matches_indices(self):
        s = TupleSampler(dataset_len=50, steps=3, skip=4)
        mat = s.index_matrix()
        assert mat.shape == (50, 3)
        for i in [0, 10, 49]:
            np.testing.assert_array_equal(mat[i], s.indices(i))


class TestSyntheticScene:
    def test_protocol(self):
        ds = SyntheticScene(n_frames=16, height=32, width=48)
        assert len(ds) == 16
        assert ds.poses.shape == (16, 6)
        img = ds.get_image(3)
        assert img.shape == (32, 48, 3) and img.dtype == np.float32

    def test_images_deterministic_and_pose_dependent(self):
        ds = SyntheticScene(n_frames=16, height=32, width=48)
        np.testing.assert_array_equal(ds.get_image(3), ds.get_image(3))
        assert not np.allclose(ds.get_image(3), ds.get_image(10))

    def test_real_variant_has_drift(self):
        gt = SyntheticScene(n_frames=32, train=False)
        real = SyntheticScene(n_frames=32, train=False, real=True)
        assert not np.allclose(gt.poses[:, :3], real.poses[:, :3])
        np.testing.assert_array_equal(real.gt_idx, np.arange(32))


class TestMF:
    def test_tuple_shapes(self):
        ds = SyntheticScene(n_frames=32, height=32, width=48)
        mf = MF(ds, steps=3, skip=5)
        imgs, poses = mf[10]
        assert imgs.shape == (3, 32, 48, 3)
        assert poses.shape == (3, 6)
        np.testing.assert_array_equal(poses, ds.poses[[5, 10, 15]])

    def test_include_vos(self):
        ds = SyntheticScene(n_frames=32)
        mf = MF(ds, steps=3, skip=2, include_vos=True, vo_func=vos_logq_np)
        _, poses = mf[10]
        assert poses.shape == (5, 6)  # 3 abs + 2 vos
        np.testing.assert_allclose(
            poses[3:], vos_logq_np(ds.poses[[8, 10, 12]]), atol=1e-6
        )

    def test_real_swaps_abs_poses_from_gt(self):
        gt = SyntheticScene(n_frames=32, train=False)
        real = SyntheticScene(n_frames=32, train=False, real=True)
        mf = MF(real, steps=3, skip=1, include_vos=True, real=True,
                gt_dataset=gt, vo_func=vos_logq_np)
        _, poses = mf[5]
        # abs poses come from GT, VOs from the drifted real poses
        np.testing.assert_array_equal(poses[:3], gt.poses[[4, 5, 6]])
        np.testing.assert_allclose(
            poses[3:], vos_logq_np(real.poses[[4, 5, 6]]), atol=1e-6
        )


class TestMFOnline:
    def test_batch_layout(self):
        train_ds = SyntheticScene(n_frames=32)
        gt = SyntheticScene(n_frames=24, train=False)
        real = SyntheticScene(n_frames=24, train=False, real=True)
        T = 3
        train_mf = MF(train_ds, steps=T, skip=2)
        val_mf = MF(real, steps=T, skip=2, include_vos=True, real=True,
                    no_duplicates=True, gt_dataset=gt, vo_func=vos_logq_np)
        online = MFOnline(train_mf, val_mf)
        imgs, poses = online[0]
        assert imgs.shape[0] == 2 * T
        assert poses.shape == (2 * T - 1, 6)  # T abs + (T-1) vos
        assert len(online) == len(val_mf)

    def test_gps_mode_layout(self):
        train_ds = SyntheticScene(n_frames=32)
        real = SyntheticScene(n_frames=24, train=False, real=True)
        T = 2
        train_mf = MF(train_ds, steps=T, skip=2)
        val_mf = MF(real, steps=T, skip=2, include_vos=False,
                    no_duplicates=True)
        online = MFOnline(train_mf, val_mf, gps_mode=True)
        imgs, poses = online[1]
        assert imgs.shape[0] == 2 * T
        assert poses.shape == (2 * T, 6)  # T abs + T gps abs

    @pytest.mark.parametrize("gps_mode", [False, True])
    def test_get_indices_matches_getitem(self, gps_mode):
        """The device-cache API (get_indices into the concatenated
        [train ++ val] frame buffer + _poses_for) reproduces __getitem__."""
        train_ds = SyntheticScene(n_frames=32)
        real = SyntheticScene(n_frames=24, train=False, real=True)
        T = 3
        train_mf = MF(train_ds, steps=T, skip=2)
        if gps_mode:
            val_mf = MF(real, steps=T, skip=2, no_duplicates=True)
        else:
            gt = SyntheticScene(n_frames=24, train=False, skip_images=True)
            val_mf = MF(real, steps=T, skip=2, include_vos=True, real=True,
                        no_duplicates=True, gt_dataset=gt,
                        vo_func=vos_logq_np)
        online = MFOnline(train_mf, val_mf, gps_mode=gps_mode)
        assert online.frame_sources == (train_ds, real)

        buf = np.concatenate([
            np.stack([train_ds.get_image(i) for i in range(len(train_ds))]),
            np.stack([real.get_image(i) for i in range(len(real))]),
        ])
        for index in [0, 3, len(online) - 1]:
            idx = online.get_indices(index)
            want_imgs, want_poses = online[index]
            np.testing.assert_array_equal(buf[idx], want_imgs)
            np.testing.assert_allclose(online._poses_for(idx), want_poses,
                                       atol=1e-6)


class TestOnlyPoses:
    def test_pairs(self):
        gt = SyntheticScene(n_frames=16, train=False)
        real = SyntheticScene(n_frames=16, train=False, real=True)
        op = OnlyPoses(real, gt)
        r, g = op[4]
        np.testing.assert_array_equal(r, real.poses[4])
        np.testing.assert_array_equal(g, gt.poses[4])


class TestLoader:
    def make_mf(self, n=20):
        return MF(SyntheticScene(n_frames=n, height=16, width=16),
                  steps=3, skip=1)

    def test_fixed_shapes_drop_last(self):
        loader = Loader(self.make_mf(20), batch_size=8, drop_last=True)
        batches = list(loader)
        assert len(batches) == 2 == len(loader)
        for imgs, poses, pad in batches:
            assert imgs.shape == (8, 3, 16, 16, 3)
            assert poses.shape == (8, 3, 6)
            assert pad == 0

    def test_padding_no_drop(self):
        loader = Loader(self.make_mf(20), batch_size=8, drop_last=False)
        batches = list(loader)
        assert len(batches) == 3 == len(loader)
        assert batches[-1][0].shape == (8, 3, 16, 16, 3)
        assert batches[-1][2] == 4  # 20 = 2*8 + 4 -> pad 4

    def test_shuffle_changes_order_but_not_content(self):
        mf = self.make_mf(16)
        a = [p for _, p, _ in Loader(mf, 4, shuffle=False)]
        b = [p for _, p, _ in Loader(mf, 4, shuffle=True, seed=3)]
        assert not np.allclose(np.concatenate(a), np.concatenate(b))
        sa = np.sort(np.concatenate(a).reshape(-1, 6), axis=0)
        sb = np.sort(np.concatenate(b).reshape(-1, 6), axis=0)
        np.testing.assert_allclose(sa, sb, atol=1e-7)

    def test_corrupt_samples_skipped(self):
        class Flaky:
            def __init__(self, inner):
                self.inner = inner

            def __len__(self):
                return len(self.inner)

            def __getitem__(self, i):
                if i % 5 == 0:  # every 5th sample is corrupt
                    return None, None
                return self.inner[i]

        loader = Loader(Flaky(self.make_mf(20)), batch_size=4, drop_last=True)
        for imgs, poses, _ in loader:
            assert imgs is not None and np.all(np.isfinite(imgs))


class TestSevenScenesModes:
    """Color/depth/both modes (reference seven_scenes.py:114-158)."""

    def _scene(self, tmp_path, n=3):
        from PIL import Image

        scene = tmp_path / "raw" / "heads"
        seq = scene / "seq-01"
        seq.mkdir(parents=True)
        with open(scene / "TrainSplit.txt", "w") as f:
            f.write("sequence1\n")
        rng = np.random.RandomState(0)
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

    def test_color_mode(self, tmp_path):
        from geomapnet_tpu.data.sevenscenes import SevenScenes

        raw, assets = self._scene(tmp_path)
        ds = SevenScenes("heads", str(raw), train=True, mode=0,
                         asset_dir=str(assets))
        img, pose = ds[0]
        assert img.shape == (16, 24, 3)
        assert pose.shape == (6,)

    def test_depth_mode(self, tmp_path):
        from geomapnet_tpu.data.sevenscenes import SevenScenes

        raw, assets = self._scene(tmp_path)
        ds = SevenScenes("heads", str(raw), train=True, mode=1,
                         asset_dir=str(assets))
        img, _ = ds[0]
        assert img.shape[:2] == (16, 24)

    def test_both_mode(self, tmp_path):
        from geomapnet_tpu.data.sevenscenes import SevenScenes

        raw, assets = self._scene(tmp_path)
        ds = SevenScenes("heads", str(raw), train=True, mode=2,
                         asset_dir=str(assets))
        out, _ = ds[0]
        assert isinstance(out, list) and len(out) == 2


class TestLoaderWorkers:
    """num_workers parallel fetch (reference: num_workers=5 DataLoader
    processes, common/train.py:180-188) — same batches, less wall time."""

    class Slow:
        """A dataset whose per-sample cost is IO-like (sleep releases the
        GIL, as native decode and most numpy do)."""

        def __init__(self, n=32, delay=0.01):
            import time as _t

            self._sleep = _t.sleep
            self.delay = delay
            self.poses = np.arange(n * 6, dtype=np.float32).reshape(n, 6)

        def __len__(self):
            return len(self.poses)

        def __getitem__(self, i):
            self._sleep(self.delay)
            img = np.full((8, 8, 3), i, np.float32)
            return img, self.poses[i]

    def _drain(self, loader):
        import time

        t0 = time.perf_counter()
        batches = list(loader)
        return time.perf_counter() - t0, batches

    def test_speedup_and_identical_batches(self):
        ds = self.Slow()
        t1, serial = self._drain(Loader(ds, 8, num_workers=1))
        t4, pooled = self._drain(Loader(ds, 8, num_workers=4))
        assert t1 / t4 > 2.0, f"expected >2x speedup, got {t1 / t4:.2f}x"
        for (ia, pa, _), (ib, pb, _) in zip(serial, pooled):
            np.testing.assert_array_equal(ia, ib)
            np.testing.assert_array_equal(pa, pb)

    def test_corrupt_samples_substituted_in_pooled_path(self):
        inner = self.Slow(n=16, delay=0.0)

        class Flaky:
            def __len__(self):
                return len(inner)

            def __getitem__(self, i):
                if i % 5 == 0:
                    return None, None
                return inner[i]

        loader = Loader(Flaky(), 4, num_workers=3, drop_last=True)
        for imgs, poses, _ in loader:
            assert imgs is not None and np.all(np.isfinite(imgs))
            # substituted rows must be valid dataset images (value != 0 mod 5)
            vals = imgs[:, 0, 0, 0].astype(int)
            assert all(v % 5 != 0 for v in vals)


class TestMFFetchMany:
    def _mf(self, **kw):
        return MF(SyntheticScene(n_frames=24, height=8, width=8),
                  steps=3, skip=2, **kw)

    def test_matches_getitem(self):
        mf = self._mf()
        idx = [0, 3, 7, 11]
        batched = mf.fetch_many(idx)
        for i, (imgs, poses) in zip(idx, batched):
            ei, ep = mf[i]
            np.testing.assert_array_equal(imgs, ei)
            np.testing.assert_array_equal(poses, ep)

    def test_matches_getitem_with_vos_and_real(self):
        base = SyntheticScene(n_frames=24, height=8, width=8, real=True)
        gt = SyntheticScene(n_frames=24, height=8, width=8)
        mf = MF(base, steps=3, skip=1, include_vos=True, real=True,
                gt_dataset=gt, vo_func=vos_logq_np)
        batched = mf.fetch_many([2, 5])
        for i, (imgs, poses) in zip([2, 5], batched):
            ei, ep = mf[i]
            np.testing.assert_array_equal(imgs, ei)
            np.testing.assert_array_equal(poses, ep)

    def test_loader_uses_fetch_many(self):
        mf = self._mf()
        calls = []
        orig = mf.fetch_many

        def spy(indices, num_workers=1):
            calls.append(list(indices))
            return orig(indices, num_workers=num_workers)

        mf.fetch_many = spy  # type: ignore[assignment]
        list(Loader(mf, 4, drop_last=True, num_workers=2))
        assert calls and all(len(c) == 4 for c in calls)

    def test_overlapping_frames_decoded_once(self):
        """Consecutive tuples share frames; fetch_many must decode each
        unique frame ONCE per batch (the e2e-eval host-decode lever)."""
        mf = self._mf()  # steps=3, skip=2: tuples i use {i-2, i, i+2}
        fetched = []
        orig_get = mf.dset.get_image

        def spy(i):
            fetched.append(int(i))
            return orig_get(i)

        mf.dset.get_image = spy  # type: ignore[assignment]
        batched = mf.fetch_many(list(range(4, 12)))  # 8 tuples, 24 slots
        assert len(fetched) == len(set(fetched))  # no frame decoded twice
        assert len(fetched) < 8 * 3  # dedup actually collapsed overlap
        # outputs still exactly match per-tuple fetches
        for i, (imgs, poses) in zip(range(4, 12), batched):
            ei, ep = mf[i]
            np.testing.assert_array_equal(imgs, ei)
            np.testing.assert_array_equal(poses, ep)

    def test_corrupt_unique_frame_nulls_its_tuples(self):
        """A frame that fails to decode must None every tuple containing it
        (the Loader then substitutes forward), even via the dedup path."""
        mf = self._mf()
        orig_get = mf.dset.get_image

        def flaky(i):
            return None if int(i) == 6 else orig_get(i)

        mf.dset.get_image = flaky  # type: ignore[assignment]
        batched = mf.fetch_many(list(range(4, 10)))
        # frame 6 appears in tuples 4 (6=4+2), 6, and 8 (6=8-2)
        for i, (imgs, _) in zip(range(4, 10), batched):
            if i in (4, 6, 8):
                assert imgs is None, i
            else:
                assert imgs is not None, i


class TestDeterministicIndices:
    """variable_skip eval safety: get_indices(i) must be a pure function of
    i when deterministic_indices is set, so eval's middle-frame scatter
    reconstructs the exact tuples the loader fetched."""

    def _mf(self, deterministic):
        return MF(SyntheticScene(n_frames=40, height=8, width=8),
                  steps=3, skip=4, variable_skip=True,
                  deterministic_indices=deterministic)

    def test_shared_rng_draws_differ(self):
        mf = self._mf(deterministic=False)
        draws = [tuple(mf.get_indices(7)) for _ in range(8)]
        assert len(set(draws)) > 1  # the hazard this feature removes

    def test_deterministic_draws_repeat(self):
        mf = self._mf(deterministic=True)
        a = [tuple(mf.get_indices(i)) for i in range(10)]
        b = [tuple(mf.get_indices(i)) for i in reversed(range(10))]
        assert a == list(reversed(b))
        # still actually variable: not all tuples share one stride
        strides = {tuple(np.diff(t)) for t in a}
        assert len(strides) > 1

    def test_getitem_matches_scatter_reconstruction(self):
        mf = self._mf(deterministic=True)
        for i in (0, 5, 9):
            _, poses = mf[i]
            idx = mf.get_indices(i)
            np.testing.assert_array_equal(poses, mf.dset.poses[idx])


class TestCachedScene:
    """Decoded-frame RAM cache (data/cache.py): decode paid once, budget
    honored, stochastic transforms refused, dataset surface delegated."""

    class Counting:
        """Minimal scene: counts decodes, 3 KB per frame."""

        def __init__(self, n=8):
            self.n = n
            self.decodes = 0
            self.poses = np.arange(n * 6, dtype=np.float64).reshape(n, 6)
            self.transform = None
            self.target_transform = None

        def __len__(self):
            return self.n

        def get_image(self, index):
            return self.get_images([index])[0]

        def get_images(self, indices, num_workers=1):
            self.decodes += len(indices)
            return [np.full((32, 32, 3), i, np.uint8) for i in indices]

    def test_second_epoch_is_free(self):
        from geomapnet_tpu.data import CachedScene

        inner = self.Counting()
        ds = CachedScene(inner, max_bytes=10 * 1024 ** 2)
        first = ds.get_images(list(range(8)))
        assert inner.decodes == 8
        again = ds.get_images(list(range(8)))
        assert inner.decodes == 8  # all hits
        for a, b in zip(first, again):
            np.testing.assert_array_equal(a, b)
        assert ds.hits == 8 and ds.misses == 8

    def test_budget_honored_pass_through(self):
        from geomapnet_tpu.data import CachedScene

        inner = self.Counting()
        frame_bytes = 32 * 32 * 3
        ds = CachedScene(inner, max_bytes=3 * frame_bytes)
        ds.get_images(list(range(8)))
        assert ds.cached_frames == 3
        assert ds.cached_bytes <= 3 * frame_bytes
        ds.get_images(list(range(8)))
        # 3 hits, 5 re-decodes
        assert inner.decodes == 8 + 5

    def test_entries_frozen(self):
        from geomapnet_tpu.data import CachedScene

        ds = CachedScene(self.Counting(), max_bytes=10 * 1024 ** 2)
        img = ds.get_image(0)
        with pytest.raises(ValueError):
            img[0, 0, 0] = 99

    def test_duplicate_indices_one_decode(self):
        from geomapnet_tpu.data import CachedScene

        inner = self.Counting()
        ds = CachedScene(inner, max_bytes=10 * 1024 ** 2)
        out = ds.get_images([2, 2, 5, 2])
        assert inner.decodes == 2
        assert [int(o[0, 0, 0]) for o in out] == [2, 2, 5, 2]

    def test_refuses_jittered_transform(self):
        from geomapnet_tpu.data import CachedScene

        inner = self.Counting()

        class Jitter:
            color_jitter_strength = 0.5

        inner.transform = Jitter()
        with pytest.raises(ValueError, match="jitter"):
            CachedScene(inner, max_bytes=1024)

    def test_failed_decode_not_cached(self):
        from geomapnet_tpu.data import CachedScene

        inner = self.Counting()
        orig = inner.get_images

        def flaky(indices, num_workers=1):
            out = orig(indices, num_workers)
            return [None if i == 3 else s for i, s in zip(indices, out)]

        inner.get_images = flaky
        ds = CachedScene(inner, max_bytes=10 * 1024 ** 2)
        assert ds.get_images([3])[0] is None
        assert ds.cached_frames == 0
        assert ds.get_images([3])[0] is None  # re-attempted, not memoized

    def test_delegates_surface_and_getitem(self):
        from geomapnet_tpu.data import CachedScene

        inner = self.Counting()
        inner.target_transform = lambda p: p * 2
        ds = CachedScene(inner, max_bytes=10 * 1024 ** 2)
        assert len(ds) == 8
        np.testing.assert_array_equal(ds.poses, inner.poses)
        img, pose = ds[1]
        assert int(img[0, 0, 0]) == 1
        np.testing.assert_array_equal(pose, inner.poses[1] * 2)

    def test_mf_composite_over_cache(self):
        from geomapnet_tpu.data import CachedScene

        scene = SyntheticScene(n_frames=24, height=8, width=8)
        cached = CachedScene(scene, max_bytes=64 * 1024 ** 2)
        mf = MF(cached, steps=3, skip=2)
        imgs, poses = mf[4]
        imgs2, poses2 = mf[4]
        np.testing.assert_array_equal(np.asarray(imgs), np.asarray(imgs2))
        np.testing.assert_array_equal(poses, poses2)
