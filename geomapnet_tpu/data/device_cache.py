"""Device-resident frame cache: the whole scene lives in HBM as uint8.

Measured motivation (PERF.md "device-resident frames"): once host decode is
cached (:class:`~geomapnet_tpu.data.CachedScene`), the end-to-end eval wall
is the host->device transfer itself — every epoch re-uploads every frame
(~0.25 MB/frame resized uint8; the development tunnel moves ~60 MB/s, and
even a co-located PCIe host spends real bandwidth on it). A resized-uint8
7Scenes scene is 0.25–1.8 GB: it FITS in HBM next to the model. So upload
each decoded frame ONCE; afterwards a batch is a (B, T) int32 index array
(a few KB) and the frame gather runs on device at HBM speed.

The reference has no analog — its DataLoader re-decodes and re-uploads per
epoch (/root/reference/common/train.py:180-188); this is a TPU-first design
choice enabled by fixed frame shapes and HBM capacity.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .loader import Loader

__all__ = [
    "upload_frames", "upload_frames_global", "upload_frames_sharded",
    "upload_dataset_frames", "make_sharded_gather", "local_shard_range",
    "frame_sources", "FrameRecorder", "IndexLoader",
]


def frame_sources(dataset) -> tuple:
    """Base frame dataset(s) a (possibly composite) dataset gathers from.

    Composites declare their own ``frame_sources`` (MF: one; MFOnline: the
    labeled and unlabeled splits, whose buffers concatenate in that order to
    match ``MFOnline.get_indices``). Plain frame datasets are their own
    source.
    """
    if hasattr(dataset, "frame_sources"):
        return tuple(dataset.frame_sources)
    if hasattr(dataset, "dset"):  # MF-shaped composite
        return (dataset.dset,)
    return (dataset,)


class _ConcatFrames:
    """Read-only concatenated view over multiple frame sources (composite
    datasets), so a SHARDED upload pads only once at the global end — padding
    each source separately would shift the second source's index offsets
    that the composite's ``get_indices`` rows encode."""

    def __init__(self, srcs):
        self.srcs = list(srcs)
        self._lens = [len(s) for s in self.srcs]
        self._offs = np.concatenate([[0], np.cumsum(self._lens)])

    def __len__(self):
        return int(self._offs[-1])

    def _locate(self, i: int):
        s = int(np.searchsorted(self._offs, i, side="right")) - 1
        return self.srcs[s], i - int(self._offs[s])

    def get_image(self, i):
        src, j = self._locate(int(i))
        return src.get_image(j)

    def get_images(self, idx, num_workers: int = 1):
        out = [None] * len(idx)
        by_src: dict = {}
        for pos, i in enumerate(idx):
            src, j = self._locate(int(i))
            by_src.setdefault(id(src), (src, []))[1].append((pos, j))
        for src, pairs in by_src.values():
            if hasattr(src, "get_images"):
                imgs = src.get_images([j for _, j in pairs],
                                      num_workers=num_workers)
            else:
                imgs = [src.get_image(j) for _, j in pairs]
            for (pos, _), im in zip(pairs, imgs):
                out[pos] = im
        return out


def upload_dataset_frames(dataset, mesh=None, shard_frames=False, **kwargs):
    """Upload every base frame of ``dataset`` (composite-aware).

    Multi-source composites (MFOnline) get ONE concatenated ``(N, H, W, C)``
    buffer, sources in ``frame_sources`` order, so the composite's
    ``get_indices`` rows index it directly.

    Under ``jax.distributed`` (``process_count > 1``) pass the global
    ``mesh``: each process then decodes only its shard of the frames and the
    stack replicates over the interconnect (:func:`upload_frames_global`).

    :param shard_frames: ``True`` keeps the stack frame-axis-SHARDED over
        ``mesh`` (capacity scales with device count; batches gather via
        :func:`make_sharded_gather`). ``"auto"`` replicates when the stack
        fits one ``max_bytes`` budget and falls back to sharding when it
        only fits split across devices (the gather collective costs ~2-3%
        per step on ICI — replication is preferred while it fits).
    """
    srcs = frame_sources(dataset)
    if shard_frames:
        if mesh is None:
            raise ValueError("shard_frames needs a mesh")
        combined = _ConcatFrames(srcs) if len(srcs) > 1 else srcs[0]
        if shard_frames == "auto":
            max_bytes = kwargs.get("max_bytes", 8 * 1024 ** 3)
            probe = _probe_frames(combined, len(combined), float("inf"))
            if len(combined) * probe.nbytes <= max_bytes:
                shard_frames = False  # fits replicated: cheaper gathers
        if shard_frames:
            return upload_frames_sharded(combined, mesh, **kwargs)
    if mesh is not None and jax.process_count() > 1:
        up = lambda src: upload_frames_global(src, mesh, **kwargs)  # noqa: E731
    else:
        up = lambda src: upload_frames(src, **kwargs)  # noqa: E731
    bufs = [up(src) for src in srcs]
    return jnp.concatenate(bufs, axis=0) if len(bufs) > 1 else bufs[0]


def upload_frames(
    frames,
    chunk: int = 192,
    num_workers: int = 4,
    max_bytes: int = 8 * 1024 ** 3,
):
    """Decode and upload every frame of a frame dataset, once, in chunks.

    :param frames: frame dataset (``SevenScenes`` / ``RobotCar`` /
        ``CachedScene`` wrapper / synthetic) exposing ``get_image`` /
        ``get_images``; its transform must yield fixed-shape single arrays
        (the device-pipeline uint8 path or host-normalized float path —
        mode-2 ``[color, depth]`` lists are not representable as one buffer)
    :param chunk: frames per decode+upload slice (bounds peak host memory
        and keeps transfers overlappable)
    :param max_bytes: refuse datasets whose frame stack would exceed this
        (HBM safety; a 256x341 uint8 frame is 262 KB — 8 GB holds ~30k)
    :returns: ``(N, H, W, C)`` device array in the frames' own dtype
    :raises ValueError: on oversize datasets or non-array frames
    """
    n = len(frames)
    probe = _probe_frames(frames, n, max_bytes)

    chunks = []
    last_good = probe
    n_bad = 0
    for s in range(0, n, chunk):
        idx = list(range(s, min(n, s + chunk)))
        if hasattr(frames, "get_images"):
            imgs = frames.get_images(idx, num_workers=num_workers)
        else:
            imgs = [frames.get_image(i) for i in idx]
        fixed = []
        for im in imgs:
            if im is None:  # corrupt frame: substitute the previous good
                n_bad += 1  # one (mirrors the loader's skip-substitute)
                im = last_good
            else:
                last_good = im
            fixed.append(im)
        # jnp.asarray dispatches the host->device copy; chunks overlap with
        # the next slice's decode
        chunks.append(jnp.asarray(np.stack(fixed)))
    if n_bad:
        print(f"device frame cache: {n_bad}/{n} frames failed to decode; "
              "substituted neighboring frames")
    return jnp.concatenate(chunks, axis=0) if len(chunks) > 1 else chunks[0]


def _probe_frames(frames, n: int, max_bytes: int) -> np.ndarray:
    """Validate a frame dataset for caching; return frame 0 as the probe."""
    if n == 0:
        raise ValueError("empty frame dataset")
    probe = frames.get_image(0)
    if probe is None or not isinstance(probe, np.ndarray):
        raise ValueError(
            "device frame cache needs fixed-shape array frames "
            f"(got {type(probe).__name__}; mode-2 [color, depth] datasets "
            "and skip_images datasets are not supported)"
        )
    total = n * probe.nbytes
    if total > max_bytes:
        raise ValueError(
            f"frame stack is {total / 2**30:.2f} GiB "
            f"({n} x {probe.nbytes / 2**20:.2f} MiB) > max_bytes "
            f"{max_bytes / 2**30:.2f} GiB"
        )
    return probe


def upload_frames_global(
    frames,
    mesh,
    num_workers: int = 4,
    max_bytes: int = 8 * 1024 ** 3,
    chunk: int = 192,
):
    """Multi-host frame upload: shard the decode, all-gather on interconnect.

    Each ``jax.distributed`` process decodes ONLY the frames backing its
    addressable shards of a frame-axis-sharded global array
    (``jax.make_array_from_callback`` invokes the callback per local shard),
    then one jit'd reshard to a replicated sharding all-gathers the stack
    over ICI/DCN. Host decode cost is ~1/process_count per host and the
    replication moves at interconnect bandwidth (GB/s) instead of host PNG
    decode speed (~100 img/s/core, PERF.md) — vs. the naive alternative of
    every host decoding the whole scene.

    Every process must call this collectively (it executes a collective
    program). The returned buffer is replicated over ``mesh``, ready for the
    device-cache index gather, exactly like :func:`upload_frames`'s output
    after replication.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    n = len(frames)
    probe = _probe_frames(frames, n, max_bytes)

    # pad the frame axis up to the device count so it shards evenly; pad
    # rows repeat the last frame and are sliced off inside the gather jit
    d = int(mesh.devices.size)
    n_pad = -(-n // d) * d
    sharded = NamedSharding(mesh, PartitionSpec(mesh.axis_names))

    def _decode_slice(index):
        sl = index[0]
        start = 0 if sl.start is None else sl.start
        stop = n_pad if sl.stop is None else sl.stop
        idx = [min(i, n - 1) for i in range(start, stop)]
        out = []
        for s in range(0, len(idx), chunk):
            part = idx[s:s + chunk]
            if hasattr(frames, "get_images"):
                imgs = frames.get_images(part, num_workers=num_workers)
            else:
                imgs = [frames.get_image(i) for i in part]
            # corrupt frame: substitute the probe (mirrors upload_frames)
            out.extend(probe if im is None else im for im in imgs)
        return np.stack(out)

    arr = jax.make_array_from_callback(
        (n_pad,) + probe.shape, sharded, _decode_slice)
    rep = NamedSharding(mesh, PartitionSpec())
    return jax.jit(
        lambda x: x[:n], out_shardings=rep)(arr)


def upload_frames_sharded(
    frames,
    mesh,
    axis: str = "data",
    num_workers: int = 4,
    max_bytes: int = 8 * 1024 ** 3,
    chunk: int = 192,
):
    """Frame-axis-SHARDED device cache: capacity scales with device count.

    The replicated cache (:func:`upload_frames`) puts the whole stack in
    every device's HBM, so capacity is one HBM budget. Here the stack stays
    ``P(axis)``-sharded on the frame axis — each device holds only N/d
    frames — and per-batch gathers become a masked local gather + one
    ``psum_scatter`` over ``axis`` (:func:`make_sharded_gather`), so a scene
    d× larger than one budget still runs. ``max_bytes`` bounds the
    PER-DEVICE shard, mirroring :func:`upload_frames`'s per-replica guard.

    Works single- and multi-process alike (``jax.make_array_from_callback``
    asks each process only for the slices backing its addressable shards,
    the same decode-sharding as :func:`upload_frames_global` — minus the
    replicating all-gather). The frame axis pads up to a multiple of the
    axis size; pad rows repeat the last frame and are never indexed.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    n = len(frames)
    d = int(mesh.shape[axis])
    probe = _probe_frames(frames, n, float("inf"))
    per_device = -(-n // d) * probe.nbytes
    if per_device > max_bytes:
        raise ValueError(
            f"sharded frame stack needs {per_device / 2**30:.2f} GiB per "
            f"device ({n} frames / {d} devices x "
            f"{probe.nbytes / 2**20:.2f} MiB) > max_bytes "
            f"{max_bytes / 2**30:.2f} GiB"
        )
    n_pad = -(-n // d) * d
    sharded = NamedSharding(mesh, PartitionSpec(axis))

    def _decode_slice(index):
        sl = index[0]
        start = 0 if sl.start is None else sl.start
        stop = n_pad if sl.stop is None else sl.stop
        idx = [min(i, n - 1) for i in range(start, stop)]
        out = []
        for s in range(0, len(idx), chunk):
            part = idx[s:s + chunk]
            if hasattr(frames, "get_images"):
                imgs = frames.get_images(part, num_workers=num_workers)
            else:
                imgs = [frames.get_image(i) for i in part]
            out.extend(probe if im is None else im for im in imgs)
        return np.stack(out)

    return jax.make_array_from_callback(
        (n_pad,) + probe.shape, sharded, _decode_slice)


def make_sharded_gather(mesh, axis: str = "data"):
    """Build ``gather(buf, idx) -> buf[idx]`` for a frame-axis-sharded cache.

    ``buf`` is ``(N_pad, H, W, C)`` sharded ``P(axis)``
    (:func:`upload_frames_sharded`); ``idx`` is an int32 ``(B,)`` or
    ``(B, T)`` index array with B divisible by the axis size (the same
    constraint dp batches already satisfy). Each device gathers the frames
    it owns for the full batch (out-of-shard rows masked to zero), then one
    ``psum_scatter`` over ``axis`` both sums the single-owner contributions
    and leaves the result BATCH-sharded — exactly the downstream sharding
    the dp step expects from the replicated-cache gather, with bit-identical
    values (uint8 sums are exact: every row has one owner, the rest are
    zeros).

    Usable inside jit and ``lax.scan`` bodies (it is a ``shard_map``).
    """
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def _gather(buf_l, idx):
        n_local = buf_l.shape[0]
        ax = jax.lax.axis_index(axis)
        loc = idx - ax * n_local
        ok = (loc >= 0) & (loc < n_local)
        g = buf_l[jnp.clip(loc, 0, n_local - 1)]
        mask = ok.reshape(ok.shape + (1,) * (g.ndim - ok.ndim))
        g = jnp.where(mask, g, jnp.zeros((), g.dtype))
        return jax.lax.psum_scatter(g, axis, scatter_dimension=0, tiled=True)

    return shard_map(_gather, mesh=mesh, in_specs=(P(axis), P()),
                     out_specs=P(axis))


class FrameRecorder:
    """Capture decoded frames from a live (image-)loader epoch into a host
    staging buffer, so the device-cache upload costs no second decode pass.

    The serial upload-then-train flow pays the full scene decode BEFORE the
    first optimizer step (epoch-1 wall = decode_all + train_epoch). Instead,
    the Trainer's warmup epoch trains straight from the image loader —
    decode already overlaps compute via the loader's prefetch thread — while
    this recorder intercepts the frame source's ``get_image``/``get_images``
    *instance methods* (instance attributes shadow bound methods even for the
    dataset's internal self-calls) and scatters every decoded frame into
    ``staging``. ``finalize()`` decodes only the frames the epoch never
    touched and returns the complete stack for one upload: epoch-1 wall
    drops to ~max(decode, train) and the decode is still paid exactly once.

    Multi-host: pass ``lo``/``hi`` to record only the frames backing this
    process's shard of the global upload
    (:func:`local_shard_range` — staging memory drops to ~N/P and frames
    other processes will upload are not staged twice); ``finalize`` then
    completes just that range and :meth:`as_source` feeds the collective
    upload (:func:`upload_frames_global` / :func:`upload_frames_sharded`)
    straight from staging.
    """

    def __init__(self, src, max_bytes: int = 8 * 1024 ** 3,
                 lo: int = 0, hi: int | None = None):
        self.src = src
        self.n = len(src)
        self.lo = int(lo)
        self.hi = self.n if hi is None else min(int(hi), self.n)
        n_range = self.hi - self.lo
        if not 0 < n_range <= self.n:
            raise ValueError(f"bad record range [{lo}, {hi}) for {self.n}")
        probe = _probe_frames(src, n_range, max_bytes)
        self.staging = np.empty((n_range,) + probe.shape, probe.dtype)
        self.seen = np.zeros(n_range, bool)
        if self.lo == 0:
            self.staging[0] = probe
            self.seen[0] = True
        self._orig: dict = {}

    def _record(self, i: int, im) -> None:
        if im is not None and self.lo <= i < self.hi \
                and not self.seen[i - self.lo]:
            self.staging[i - self.lo] = im
            self.seen[i - self.lo] = True

    def install(self) -> "FrameRecorder":
        src = self.src
        orig_one = src.get_image
        self._orig["get_image"] = orig_one

        def get_image(i):
            im = orig_one(i)
            self._record(int(i), im)
            return im

        src.get_image = get_image
        if hasattr(src, "get_images"):
            orig_many = src.get_images
            self._orig["get_images"] = orig_many

            def get_images(idx, **kw):
                imgs = orig_many(idx, **kw)
                for i, im in zip(idx, imgs):
                    self._record(int(i), im)
                return imgs

            src.get_images = get_images
        return self

    def restore(self) -> None:
        for name, fn in self._orig.items():
            setattr(self.src, name, fn)
        self._orig.clear()

    def finalize(self, num_workers: int = 4) -> np.ndarray:
        """Decode the frames the warmup epoch never touched; return the
        complete ``(hi - lo, H, W, C)`` stack (corrupt residuals substitute
        the nearest already-staged frame, mirroring :func:`upload_frames`)."""
        self.restore()
        missing = np.flatnonzero(~self.seen)
        if missing.size:
            want = [int(i) + self.lo for i in missing]
            if hasattr(self.src, "get_images"):
                imgs = self.src.get_images(want, num_workers=num_workers)
            else:
                imgs = [self.src.get_image(i) for i in want]
            fallback = (self.seen.nonzero()[0][0] if self.seen.any() else
                        None)
            for i, im in zip(missing, imgs):
                if im is None:
                    im = (self.staging[fallback] if fallback is not None
                          else _probe_frames(self.src, 1, float("inf")))
                self.staging[i] = im
                self.seen[i] = True
        return self.staging

    def as_source(self, num_workers: int = 4) -> "_StagedSource":
        """Finalize this recorder's range and return a frame-source view
        over the FULL ``[0, n)`` index space: staged frames serve from host
        memory, anything outside ``[lo, hi)`` delegates to the original
        dataset. Feeds the collective upload paths
        (:func:`upload_frames_global`, :func:`upload_frames_sharded`) whose
        per-process callbacks only ever request this process's shard — so
        the warmup epoch's decode work is never repeated."""
        self.finalize(num_workers=num_workers)
        return _StagedSource(self)


class _StagedSource:
    """Frame-source adapter over a finalized :class:`FrameRecorder`."""

    def __init__(self, rec: FrameRecorder):
        self.rec = rec

    def __len__(self):
        return self.rec.n

    def get_image(self, i):
        r = self.rec
        i = int(i)
        if r.lo <= i < r.hi:
            return r.staging[i - r.lo]
        return r.src.get_image(i)

    def get_images(self, idx, num_workers: int = 1):
        r = self.rec
        out = [None] * len(idx)
        miss = []
        for pos, i in enumerate(idx):
            i = int(i)
            if r.lo <= i < r.hi:
                out[pos] = r.staging[i - r.lo]
            else:
                miss.append((pos, i))
        if miss:
            if hasattr(r.src, "get_images"):
                imgs = r.src.get_images([i for _, i in miss],
                                        num_workers=num_workers)
            else:
                imgs = [r.src.get_image(i) for _, i in miss]
            for (pos, _), im in zip(miss, imgs):
                out[pos] = im
        return out


def local_shard_range(n: int, mesh) -> tuple:
    """Frame-index range ``[lo, hi)`` backing THIS process's addressable
    shards of the frame-axis-sharded global upload (the same padding and
    ``P(mesh.axis_names)`` sharding :func:`upload_frames_global` /
    :func:`upload_frames_sharded` construct). Used to bound a multi-host
    :class:`FrameRecorder` to the frames this process will actually
    contribute."""
    from jax.sharding import NamedSharding, PartitionSpec

    d = int(mesh.devices.size)
    n_pad = -(-n // d) * d
    sh = NamedSharding(mesh, PartitionSpec(mesh.axis_names))
    imap = sh.devices_indices_map((n_pad,))
    starts, stops = [], []
    for dev in sh.addressable_devices:
        sl = imap[dev][0]
        starts.append(0 if sl.start is None else int(sl.start))
        stops.append(n_pad if sl.stop is None else int(sl.stop))
    return min(starts), min(max(stops), n)


class IndexLoader(Loader):
    """Loader twin for the device frame cache: yields
    ``(frame_indices, poses, n_padded)`` instead of decoded images.

    Inherits Loader's sampling order, shuffling, padding, process sharding
    and background prefetch unchanged — only the batch payload differs:
    ``frame_indices`` is int32 ``(B, T)`` for tuple (MF) datasets or ``(B,)``
    for plain frame datasets, ready to gather from the HBM buffer built by
    :func:`upload_frames` (``buf[frame_indices]`` inside the jit'd step).
    Poses are assembled exactly as the image path would (MF's pose/VO block,
    or the frame dataset's target-transformed pose) — only the host decode
    and the per-batch image transfer disappear.
    """

    def _make_batch(self, idx: np.ndarray, pad: int):
        ds = self.dataset
        if hasattr(ds, "get_indices"):  # tuple (MF) dataset
            rows = [ds.get_indices(int(i)) for i in idx]
            poses = np.stack(
                [ds._poses_for(r).astype(np.float32) for r in rows])
            frame_idx = np.stack(rows).astype(np.int32)
        else:  # plain frame dataset
            tt = getattr(ds, "target_transform", None)
            poses = np.stack([
                np.asarray(
                    tt(ds.poses[int(i)]) if tt is not None
                    else ds.poses[int(i)],
                    np.float32,
                )
                for i in idx
            ])
            frame_idx = np.asarray(idx, np.int32)
        if pad:
            frame_idx = np.concatenate(
                [frame_idx, np.repeat(frame_idx[-1:], pad, axis=0)])
            poses = np.concatenate(
                [poses, np.repeat(poses[-1:], pad, axis=0)])
        return frame_idx, poses, pad
