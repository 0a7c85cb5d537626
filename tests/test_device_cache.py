"""Device-resident frame cache (data/device_cache.py + eval --device_cache):
frames upload to HBM once, batches become on-device index gathers. The
contract: identical predictions to the loader path, upload chunking exact,
HBM budget enforced, buffer reuse across calls."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geomapnet_tpu.cli.eval import evaluate
from geomapnet_tpu.data import MF, SyntheticScene, upload_frames
from geomapnet_tpu.losses import MapNetCriterion, PoseNetCriterion
from geomapnet_tpu.models import MapNet, PoseNet, resnet18
from geomapnet_tpu.train import create_train_state, make_optimizer


class TestUploadFrames:
    def test_chunked_upload_matches_frames(self):
        ds = SyntheticScene(n_frames=11, height=16, width=24)
        buf = upload_frames(ds, chunk=4)
        assert buf.shape == (11, 16, 24, 3)
        want = np.stack([ds.get_image(i) for i in range(11)])
        np.testing.assert_array_equal(np.asarray(buf), want)

    def test_max_bytes_refused(self):
        ds = SyntheticScene(n_frames=8, height=16, width=24)
        with pytest.raises(ValueError, match="GiB"):
            upload_frames(ds, max_bytes=ds.get_image(0).nbytes * 4)

    def test_corrupt_frame_substituted(self):
        ds = SyntheticScene(n_frames=6, height=16, width=24)
        orig = ds.get_image

        def flaky(i):
            return None if i == 3 else orig(i)

        ds.get_image = flaky
        if hasattr(ds, "get_images"):
            ds.get_images = lambda idxs, num_workers=1: [
                flaky(i) for i in idxs]
        buf = np.asarray(upload_frames(ds, chunk=2))
        np.testing.assert_array_equal(buf[3], buf[2])  # previous good frame
        np.testing.assert_array_equal(buf[4], orig(4))


class TestShardedCache:
    """Frame-axis-sharded cache: capacity scales with device count; the
    psum_scatter gather is bit-identical to the replicated buf[idx]."""

    def _mesh(self):
        from geomapnet_tpu.parallel.mesh import make_mesh

        return make_mesh()

    def test_sharded_upload_matches_frames(self):
        from geomapnet_tpu.data import upload_frames_sharded

        mesh = self._mesh()
        d = mesh.devices.size
        ds = SyntheticScene(n_frames=d * 3 - 1, height=16, width=24)  # pads
        buf = upload_frames_sharded(ds, mesh, chunk=4)
        assert buf.shape[0] == d * 3  # padded to the axis size
        assert not buf.sharding.is_fully_replicated
        want = np.stack([ds.get_image(i) for i in range(len(ds))])
        got = np.asarray(buf)
        np.testing.assert_array_equal(got[:len(ds)], want)
        np.testing.assert_array_equal(got[-1], want[-1])  # pad = last frame

    def test_capacity_scales_with_devices(self):
        """A stack bigger than one device's budget is refused replicated
        but fits sharded (the whole point: capacity x device count)."""
        from geomapnet_tpu.data import upload_frames_sharded

        mesh = self._mesh()
        d = mesh.devices.size
        assert d > 1
        ds = SyntheticScene(n_frames=2 * d, height=16, width=24)
        budget = ds.get_image(0).nbytes * (d + 1)  # < 2d frames, > 2/dev
        with pytest.raises(ValueError, match="GiB"):
            upload_frames(ds, max_bytes=budget)
        buf = upload_frames_sharded(ds, mesh, max_bytes=budget)
        assert buf.shape[0] == 2 * d

    def test_sharded_gather_exact(self):
        from geomapnet_tpu.data import make_sharded_gather, upload_frames_sharded

        mesh = self._mesh()
        d = mesh.devices.size
        n = 3 * d
        ds = SyntheticScene(n_frames=n, height=16, width=24)
        buf = upload_frames_sharded(ds, mesh)
        want = np.stack([ds.get_image(i) for i in range(n)])
        gather = make_sharded_gather(mesh)
        rng = np.random.RandomState(0)
        # boundary rows (first/last/shard edges) + random, tuple-shaped
        idx = rng.randint(0, n, (2 * d, 3)).astype(np.int32)
        idx[0] = [0, n - 1, n // d]
        got = np.asarray(jax.jit(gather)(buf, jnp.asarray(idx)))
        np.testing.assert_array_equal(got, want[idx])
        # plain (B,) frame indices too
        idx1 = rng.randint(0, n, (d,)).astype(np.int32)
        got1 = np.asarray(jax.jit(gather)(buf, jnp.asarray(idx1)))
        np.testing.assert_array_equal(got1, want[idx1])


@pytest.fixture(scope="module")
def mapnet_state():
    model = MapNet(posenet=PoseNet(
        feature_extractor=resnet18(), feat_dim=32, droprate=0.0))
    criterion = MapNetCriterion()
    tx = make_optimizer("adam", 1e-3)
    x0 = jnp.zeros((1, 3, 32, 48, 3), jnp.float32)
    state = create_train_state(model, criterion, tx, jax.random.PRNGKey(3),
                               x0)
    return model, state


@pytest.mark.slow
class TestDeviceCachedEval:
    def test_matches_loader_path_tuples(self, mapnet_state):
        model, state = mapnet_state
        val = MF(SyntheticScene(n_frames=24, height=32, width=48,
                                train=False), steps=3, skip=2)
        # use_mesh=False on BOTH: a sharded batch compiles a different
        # (equally valid) program with 1e-6-level float differences —
        # compare like with like (the dp composition has its own test)
        base = evaluate(model, state, val, batch_size=8, progress=False,
                        use_mesh=False)
        dc = evaluate(model, state, val, batch_size=8, progress=False,
                      device_cache=True, use_mesh=False)
        np.testing.assert_allclose(dc["pred_poses"], base["pred_poses"],
                                   rtol=0, atol=1e-6)
        np.testing.assert_array_equal(dc["targ_poses"], base["targ_poses"])
        assert "device_frames" in dc and dc["upload_secs"] >= 0

    def test_ragged_last_batch(self, mapnet_state):
        model, state = mapnet_state
        # 24 frames, steps=3 skip=2 -> 24 tuples; batch 7 leaves remainder 3
        val = MF(SyntheticScene(n_frames=24, height=32, width=48,
                                train=False), steps=3, skip=2)
        base = evaluate(model, state, val, batch_size=7, progress=False)
        dc = evaluate(model, state, val, batch_size=7, progress=False,
                      device_cache=True)
        np.testing.assert_allclose(dc["pred_poses"], base["pred_poses"],
                                   rtol=0, atol=1e-6)

    def test_buffer_reuse_skips_upload(self, mapnet_state):
        model, state = mapnet_state
        val = MF(SyntheticScene(n_frames=16, height=32, width=48,
                                train=False), steps=3, skip=2)
        first = evaluate(model, state, val, batch_size=8, progress=False,
                         device_cache=True, use_mesh=False)
        again = evaluate(model, state, val, batch_size=8, progress=False,
                         device_cache=first["device_frames"],
                         use_mesh=False)
        np.testing.assert_array_equal(again["pred_poses"],
                                      first["pred_poses"])

    def test_epoch_scan_compiled_once_across_calls(self, mapnet_state):
        """Repeated evals (PGO sweeps, checkpoint ladders) must reuse the
        compiled epoch scan: a jit wrapper rebuilt per call re-paid trace +
        compile inside every epoch (measured on hardware: the one-launch
        scan clocked no faster than the per-batch loop until cached)."""
        from geomapnet_tpu.cli import eval as eval_mod

        model, state = mapnet_state
        val = MF(SyntheticScene(n_frames=16, height=32, width=48,
                                train=False), steps=3, skip=2)
        eval_mod._SCAN_CACHE.clear()
        first = evaluate(model, state, val, batch_size=8, progress=False,
                         device_cache=True, use_mesh=False)
        assert len(eval_mod._SCAN_CACHE) == 1
        (scan_jit, m_ref, _), = eval_mod._SCAN_CACHE.values()
        assert m_ref is model
        # _cache_size is a private JAX API; when absent, keep the
        # wrapper-identity + bumped-weights assertions as the core contract
        has_trace_count = callable(getattr(scan_jit, "_cache_size", None))
        traced_before = scan_jit._cache_size() if has_trace_count else None
        again = evaluate(model, state, val, batch_size=8, progress=False,
                         device_cache=first["device_frames"],
                         use_mesh=False)
        # same wrapper object survived and was NOT re-traced
        assert len(eval_mod._SCAN_CACHE) == 1
        assert next(iter(eval_mod._SCAN_CACHE.values()))[0] is scan_jit
        if has_trace_count:
            assert scan_jit._cache_size() == traced_before
        np.testing.assert_array_equal(again["pred_poses"],
                                      first["pred_poses"])
        # updated weights flow through the cached program as an argument
        bumped = state.replace(params=jax.tree.map(
            lambda p: p + 0.01, state.params))
        moved = evaluate(model, bumped, val, batch_size=8, progress=False,
                         device_cache=first["device_frames"],
                         use_mesh=False)
        if has_trace_count:
            assert scan_jit._cache_size() == traced_before
        assert not np.allclose(moved["pred_poses"], first["pred_poses"])

    def test_sharded_cache_matches_replicated_meshed(self, mapnet_state):
        """--device_cache shard over the dp mesh: same predictions as the
        replicated cache (the collective gather delivers identical frames;
        cross-program float noise only)."""
        model, state = mapnet_state
        val = MF(SyntheticScene(n_frames=24, height=32, width=48,
                                train=False), steps=3, skip=2)
        rep = evaluate(model, state, val, batch_size=8, progress=False,
                       device_cache=True)
        sh = evaluate(model, state, val, batch_size=8, progress=False,
                      device_cache="shard")
        assert not sh["device_frames"].sharding.is_fully_replicated
        np.testing.assert_allclose(sh["pred_poses"], rep["pred_poses"],
                                   rtol=0, atol=1e-6)
        np.testing.assert_array_equal(sh["targ_poses"], rep["targ_poses"])

    def test_sharded_cache_needs_mesh(self, mapnet_state):
        model, state = mapnet_state
        val = MF(SyntheticScene(n_frames=16, height=32, width=48,
                                train=False), steps=3, skip=2)
        with pytest.raises(ValueError, match="mesh"):
            evaluate(model, state, val, batch_size=8, progress=False,
                     device_cache="shard", use_mesh=False)

    def test_scan_cache_keys_on_steps(self, mapnet_state):
        """The cached epoch scan bakes fold_T (= dataset.steps) into its
        closure, so a second eval of the SAME model with a different MF
        steps must MISS the cache: a stale fold_T would silently regroup
        poses with the wrong T whenever B*T_new divides by T_old (here
        6*2 by 3), corrupting the middle-frame metrics (ADVICE round 4)."""
        from geomapnet_tpu.cli import eval as eval_mod

        model, state = mapnet_state
        eval_mod._SCAN_CACHE.clear()
        val3 = MF(SyntheticScene(n_frames=24, height=32, width=48,
                                 train=False), steps=3, skip=2)
        val2 = MF(SyntheticScene(n_frames=24, height=32, width=48,
                                 train=False), steps=2, skip=2)
        evaluate(model, state, val3, batch_size=6, progress=False,
                 device_cache=True, use_mesh=False)
        dc2 = evaluate(model, state, val2, batch_size=6, progress=False,
                       device_cache=True, use_mesh=False)
        assert len(eval_mod._SCAN_CACHE) == 2
        base2 = evaluate(model, state, val2, batch_size=6, progress=False,
                         use_mesh=False)
        np.testing.assert_allclose(dc2["pred_poses"], base2["pred_poses"],
                                   rtol=0, atol=1e-6)

    def test_pgo_targets_carry_vos(self, mapnet_state):
        from geomapnet_tpu.data import vos_logq_np

        model, state = mapnet_state
        val = MF(SyntheticScene(n_frames=16, height=32, width=48,
                                train=False), steps=3, skip=2,
                 include_vos=True, vo_func=vos_logq_np)
        base = evaluate(model, state, val, batch_size=8, pose_graph=True,
                        progress=False)
        dc = evaluate(model, state, val, batch_size=8, pose_graph=True,
                      progress=False, device_cache=True, use_mesh=False)
        np.testing.assert_allclose(dc["pred_poses"], base["pred_poses"],
                                   rtol=0, atol=1e-5)
        np.testing.assert_array_equal(dc["targ_poses"], base["targ_poses"])

    def test_single_frame_posenet(self):
        model = PoseNet(feature_extractor=resnet18(), feat_dim=32,
                        droprate=0.0)
        tx = make_optimizer("adam", 1e-3)
        ds = SyntheticScene(n_frames=10, height=32, width=48, train=False)
        x0 = jnp.asarray(ds[0][0][None])
        state = create_train_state(model, PoseNetCriterion(), tx,
                                   jax.random.PRNGKey(0), x0)
        base = evaluate(model, state, ds, batch_size=4, progress=False)
        dc = evaluate(model, state, ds, batch_size=4, progress=False,
                      device_cache=True, use_mesh=False)
        np.testing.assert_allclose(dc["pred_poses"], base["pred_poses"],
                                   rtol=0, atol=1e-6)
        np.testing.assert_array_equal(dc["targ_poses"], base["targ_poses"])


    def test_dp_mesh_scan_matches_single_device(self, mapnet_state):
        """device_cache x dp mesh: the epoch scan shards every batch's rows
        over the 8-device 'data' axis (frame buffer replicated, index
        tensor P(None, 'data')). Predictions must match the single-device
        scan to cross-program float noise."""
        model, state = mapnet_state
        val = MF(SyntheticScene(n_frames=24, height=32, width=48,
                                train=False), steps=3, skip=2)
        one = evaluate(model, state, val, batch_size=8, progress=False,
                       device_cache=True, use_mesh=False)
        dp = evaluate(model, state, val, batch_size=8, progress=False,
                      device_cache=True, use_mesh=True)
        assert len(jax.devices()) > 1  # conftest provisions the CPU mesh
        np.testing.assert_allclose(dp["pred_poses"], one["pred_poses"],
                                   rtol=0, atol=1e-5)
        np.testing.assert_array_equal(dp["targ_poses"], one["targ_poses"])


@pytest.mark.slow
class TestFrameDedup:
    """dedup_frames: the device-cache epoch computes each UNIQUE frame's
    forward once (tuples share frames (steps-1)*skip apart) and gathers
    per-tuple poses from the pose table — EXACTLY the tuple scan's output
    on every path (the dedup'd indices ride the same (kf, B, T) grid
    program; per-frame slots are independent data-parallel lanes)."""

    def _val(self, n=24):
        return MF(SyntheticScene(n_frames=n, height=32, width=48,
                                 train=False), steps=3, skip=2)

    def test_exact_vs_tuple_scan(self, mapnet_state):
        model, state = mapnet_state
        val = self._val()
        dd = evaluate(model, state, val, batch_size=8, progress=False,
                      device_cache=True, use_mesh=False, dedup_frames=True)
        ts = evaluate(model, state, val, batch_size=8, progress=False,
                      device_cache=True, use_mesh=False, dedup_frames=False)
        np.testing.assert_array_equal(dd["pred_poses"], ts["pred_poses"])
        np.testing.assert_array_equal(dd["targ_poses"], ts["targ_poses"])
        # 24 unique frames vs 3 batches x 24 tuple slots
        assert dd["frames_computed"] == 24
        assert ts["frames_computed"] == 24 * 3
        # consecutive unique frames + unmeshed cache -> the gather-free
        # dynamic_slice epoch (+11% on hardware, PERF.md r5)
        assert dd["dedup_slice"] is True
        assert ts["dedup_slice"] is False

    @pytest.mark.parametrize("n", [30, 48])
    def test_slice_windows_exact(self, mapnet_state, n):
        """kf > 1 slice windows: n=30 makes the LAST window overlap the
        previous one (30 uniques, 24-frame windows -> starts [0, 6]); n=48
        tiles exactly. Both must reproduce the tuple scan bit-for-bit
        (the overlap recomputes frames 6..23 — identical per-frame values,
        the host table takes the last copy)."""
        model, state = mapnet_state
        val = self._val(n=n)
        dd = evaluate(model, state, val, batch_size=8, progress=False,
                      device_cache=True, use_mesh=False, dedup_frames=True)
        ts = evaluate(model, state, val, batch_size=8, progress=False,
                      device_cache=True, use_mesh=False, dedup_frames=False)
        assert dd["dedup_slice"] is True
        assert dd["frames_computed"] == 2 * 24  # two slice windows
        np.testing.assert_array_equal(dd["pred_poses"], ts["pred_poses"])
        np.testing.assert_array_equal(dd["targ_poses"], ts["targ_poses"])

    def test_exact_meshed(self, mapnet_state):
        model, state = mapnet_state
        val = self._val()
        dd = evaluate(model, state, val, batch_size=8, progress=False,
                      device_cache=True, dedup_frames=True)
        ts = evaluate(model, state, val, batch_size=8, progress=False,
                      device_cache=True, dedup_frames=False)
        # meshed scans keep the (B, T) gather (dp-sharded batch axis)
        assert dd["dedup_slice"] is False
        np.testing.assert_array_equal(dd["pred_poses"], ts["pred_poses"])

    def test_exact_quant_fused_prequant(self, mapnet_state):
        """int8+fused dedup must be EXACT too. Historically it disagreed by
        up to 0.11 at the output; the root cause was the int8 fc_feat
        head's DYNAMIC per-tensor activation scale (batch absmax coupled a
        frame's pose to its batchmates). Calibration now bakes the head
        scale statically, and per-frame outputs are bit-identical across
        batch compositions and even structurally different scan programs
        (probe-verified); the dedup grid rides the tuple scan's program
        anyway so exactness holds by construction."""
        model, state = mapnet_state
        val = self._val()
        kw = dict(batch_size=8, progress=False, quantize=True,
                  calib_batches=1, quantize_heads=True, fuse_requant=True,
                  device_cache=True, use_mesh=False)
        dd = evaluate(model, state, val, dedup_frames=True, **kw)
        ts = evaluate(model, state, val, dedup_frames=False, **kw)
        assert dd["dedup_slice"] is True  # int8 rides the slice epoch too
        np.testing.assert_array_equal(dd["pred_poses"], ts["pred_poses"])

    def test_exact_sharded_cache(self, mapnet_state):
        model, state = mapnet_state
        val = self._val()
        kw = dict(batch_size=8, progress=False, device_cache="shard")
        dd = evaluate(model, state, val, dedup_frames=True, **kw)
        ts = evaluate(model, state, val, dedup_frames=False, **kw)
        # sharded cache keeps the gather-grid dedup (frame axis is sharded)
        assert dd["dedup_slice"] is False
        np.testing.assert_array_equal(dd["pred_poses"], ts["pred_poses"])

    def test_exact_with_pgo(self, mapnet_state):
        from geomapnet_tpu.data import vos_logq_np

        model, state = mapnet_state
        val = MF(SyntheticScene(n_frames=16, height=32, width=48,
                                train=False), steps=3, skip=2,
                 include_vos=True, vo_func=vos_logq_np)
        kw = dict(batch_size=8, pose_graph=True, progress=False,
                  device_cache=True, use_mesh=False)
        dd = evaluate(model, state, val, dedup_frames=True, **kw)
        ts = evaluate(model, state, val, dedup_frames=False, **kw)
        np.testing.assert_array_equal(dd["pred_poses"], ts["pred_poses"])

    def test_stochastic_rejected_and_auto_off(self, mapnet_state):
        model, state = mapnet_state
        # droprate=0 model still exercises the gating (stochastic flag alone)
        val = self._val(16)
        with pytest.raises(ValueError, match="dedup"):
            evaluate(model, state, val, batch_size=8, progress=False,
                     device_cache=True, use_mesh=False, stochastic=True,
                     dedup_frames=True)
        # auto mode silently falls back to the tuple scan
        r = evaluate(model, state, val, batch_size=8, progress=False,
                     device_cache=True, use_mesh=False, stochastic=True)
        assert r["frames_computed"] == 16 * 3
        # dynamic-scale int8 couples rows through the batch absmax:
        # forcing dedup must refuse, auto must fall back
        with pytest.raises(ValueError, match="dynamic"):
            evaluate(model, state, val, batch_size=8, progress=False,
                     device_cache=True, use_mesh=False, quantize=True,
                     dedup_frames=True)


class TestAutoShardSelection:
    """upload_dataset_frames(shard_frames='auto'): replicate while the
    stack fits one max_bytes budget (cheaper local gathers), shard when it
    only fits split across devices."""

    def test_auto_prefers_replicated_when_fits(self):
        from geomapnet_tpu.data.device_cache import upload_dataset_frames
        from geomapnet_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        ds = SyntheticScene(n_frames=mesh.devices.size, height=8, width=12)
        buf = upload_dataset_frames(ds, mesh=mesh, shard_frames="auto")
        assert buf.sharding.is_fully_replicated

    def test_auto_shards_past_the_budget(self):
        from geomapnet_tpu.data.device_cache import upload_dataset_frames
        from geomapnet_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        d = mesh.devices.size
        ds = SyntheticScene(n_frames=2 * d, height=8, width=12)
        budget = ds.get_image(0).nbytes * (d + 1)  # < 2d frames replicated
        buf = upload_dataset_frames(ds, mesh=mesh, shard_frames="auto",
                                    max_bytes=budget)
        assert not buf.sharding.is_fully_replicated
        want = np.stack([ds.get_image(i) for i in range(len(ds))])
        np.testing.assert_array_equal(np.asarray(buf)[:len(ds)], want)

    def test_auto_needs_mesh(self):
        from geomapnet_tpu.data.device_cache import upload_dataset_frames

        ds = SyntheticScene(n_frames=4, height=8, width=12)
        with pytest.raises(ValueError, match="mesh"):
            upload_dataset_frames(ds, shard_frames="auto")


@pytest.mark.slow
def test_sharded_prequant_cache_matches_replicated(mapnet_state):
    """--device_cache shard composes with --fuse_requant: the shard-local
    prequantize (elementwise, no collective) + int8-row psum_scatter
    gather must reproduce the replicated prequantized cache exactly."""
    model, state = mapnet_state
    val = MF(SyntheticScene(n_frames=24, height=32, width=48,
                            train=False), steps=3, skip=2)
    kw = dict(batch_size=8, progress=False, quantize=True,
              calib_batches=1, quantize_heads=True, fuse_requant=True)
    rep = evaluate(model, state, val, device_cache=True, **kw)
    sh = evaluate(model, state, val, device_cache="shard", **kw)
    buf = sh["device_frames"]
    assert buf.dtype == jnp.int8 and buf.ndim == 2  # prequantized rows
    assert not buf.sharding.is_fully_replicated    # still frame-sharded
    np.testing.assert_allclose(sh["pred_poses"], rep["pred_poses"],
                               rtol=0, atol=1e-6)
