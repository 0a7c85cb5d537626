"""Evaluation CLI: batched inference, optional PGO, median/mean pose errors.

Reference parity: /root/reference/scripts/eval.py — same flags, same metric
definitions (per-frame L2 translation error + quaternion angular error,
median and mean reported), same middle-frame-of-tuple selection and
translation un-normalization via ``pose_stats.txt``.

TPU-native differences (the performance story):
- the reference hard-codes ``batch_size = 1`` (eval.py:138-139) and runs one
  host-side scipy PGO per sample; here tuples are batched (``--batch_size``,
  default 64), the forward is one jit'd launch per batch, and PGO runs as a
  vmapped Gauss-Newton over the whole batch on device;
- trajectory plots are saved headlessly (Agg) when ``--output_dir`` is given.
"""

from __future__ import annotations

import argparse
import pickle
import threading
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data import MF, Loader, vos_logq_fc_np, vos_logq_np
from ..geometry import qexp_np, quaternion_angular_error, translation_error
from ..models import load_npz, merge_variables
from ..pgo import optimize_poses_batch
from ..train.checkpoint import restore_checkpoint, load_model_params
from ..train.state import create_train_state, make_eval_step
from ..train.optim import make_optimizer
from .builders import (
    build_criteria,
    build_device_preprocess,
    build_frame_dataset,
    build_model,
    build_raw_device_preprocess,
    build_transform,
)
from .config import parse_ini

__all__ = ["evaluate", "main"]

# Compiled epoch-scan cache for repeated device-cache evals (PGO sweeps,
# checkpoint ladders, serving loops): ``jax.jit`` only reuses a compiled
# program through the SAME wrapper object, and a wrapper built inside
# ``evaluate()`` dies with the call — every eval re-paid trace + compile
# inside the timed epoch (measured: the scanned one-launch epoch clocked
# no faster than the per-batch loop until this landed). Keyed on the
# semantic closure (model/preprocess identity, quantize flags, mesh
# devices); strong refs to model/preprocess are stored so ids can't be
# recycled by the allocator. Shapes are NOT part of the key — jit keys its
# own program cache on argument shapes.
_SCAN_CACHE: dict = {}
_SCAN_CACHE_MAX = 8
_SCAN_CACHE_LOCK = threading.Lock()


def evaluate(model, state, dataset, **kwargs) -> dict:
    """Run batched evaluation over an MF (or plain frame) dataset.

    ``preprocess`` fuses a device-side image stage (e.g. uint8 normalize)
    into the jit'd eval step; ``stochastic`` keeps dropout active (the
    reference's eval-time dropout quirk, for accuracy-parity runs). Returns
    {"pred_poses", "targ_poses", "t_err", "q_err", "median_t", "median_q",
    "mean_t", "mean_q", "images_per_sec"}.

    ``dedup_frames`` (device-cache evals): ``None`` (default) computes each
    UNIQUE cached frame's forward once and gathers per-tuple poses from the
    pose table whenever that saves work — bit-identical to the tuple scan
    (the dedup'd indices ride the same scanned program) at up to T x less
    device compute; ``False`` forces the tuple scan; ``True`` forces dedup
    (errors when the model isn't per-frame at eval).

    With a variable-skip MF dataset the loader's get_indices draws and the
    middle-frame scatter's re-draws would differ under the shared RNG, so
    per-index deterministic sampling is forced for the duration of the call
    (and restored afterwards — the caller's dataset is not left mutated).
    """
    needs_det = (
        isinstance(dataset, MF)
        and dataset.sampler.variable_skip
        and not dataset.deterministic_indices
    )
    if not needs_det:
        return _evaluate(model, state, dataset, **kwargs)
    dataset.deterministic_indices = True
    try:
        return _evaluate(model, state, dataset, **kwargs)
    finally:
        dataset.deterministic_indices = False


def _evaluate(
    model,
    state,
    dataset,
    batch_size: int = 64,
    pose_stats: tuple[np.ndarray, np.ndarray] | None = None,
    pose_graph: bool = False,
    fc_vos: bool = False,
    pgo_weights: dict | None = None,
    progress: bool = True,
    preprocess=None,
    stochastic: bool = False,
    seed: int = 7,
    num_workers: int = 1,
    quantize: bool = False,
    fold_bn: bool = False,
    calib_batches: int = 0,
    quantize_heads: bool = False,
    fuse_requant: bool = False,
    use_mesh: bool = True,
    device_cache=False,
    dedup_frames: bool | None = None,
) -> dict:
    is_tuple = isinstance(dataset, MF)
    L = len(dataset.dset) if is_tuple else len(dataset)
    steps = dataset.steps if is_tuple else 1

    # Tuple batches upload T-FOLDED, (B*T, H, W, C): a free host-side view
    # that spares the program the full-batch relayout XLA inserts to bitcast
    # the 5D parameter before the stem conv (measured +2%,
    # scripts/bench_input_layout.py); pose outputs fold back to (B, T, d)
    # inside the step. MapNet only — VidLoc's recurrence needs the T axis.
    # Stochastic (eval-dropout) runs stay 5D: the folded branch applies the
    # posenet submodule directly, which folds the dropout rng at a different
    # module path ('Dropout' vs 'posenet/Dropout') — the draws would differ
    # from the 5D path and between the loader and meshed device-cache flows.
    fold_T = (
        steps if (is_tuple and hasattr(model, "posenet") and not stochastic)
        else None
    )

    # device-resident frame cache (data/device_cache.py): frames upload to
    # HBM once; batches become int32 index gathers. ``device_cache`` may be
    # a previously returned buffer (result["device_frames"]) to skip the
    # upload on repeated calls (PGO sweeps, serving loops).
    use_device_cache = device_cache is not False and device_cache is not None
    if dedup_frames and not use_device_cache:
        raise ValueError(
            "dedup_frames=True requires device_cache (the dedup epoch is a "
            "scan over unique cached frame indices)")

    pose_m, pose_s = (
        pose_stats if pose_stats is not None else (np.zeros(3), np.ones(3))
    )

    # data-parallel eval: batches shard over all local devices (same SPMD
    # story as the Trainer); single-device when only one chip is visible
    from ..parallel.mesh import make_mesh, replicated, shard_step
    from ..parallel.mesh import shard_batch as _shard_batch

    n_dev = len(jax.devices())
    if use_mesh and n_dev > 1 and batch_size % n_dev:
        print(f"eval: batch_size {batch_size} not divisible by {n_dev} "
              f"devices; running single-device (pick a multiple to shard)")
        use_mesh = False
    mesh = make_mesh() if (use_mesh and n_dev > 1) else None

    def _jit_step(fn):
        if mesh is None:
            return jax.jit(fn)
        # (state, images, targets, rng): state/targets/rng replicated,
        # images batch-sharded
        return shard_step(fn, mesh, n_batch_args=1, n_state_args=1,
                          n_replicated_args=2, donate_state=False)

    if quantize or fold_bn:
        # int8 PTQ inference or BN-folded float serving (models/quant.py):
        # both run the same hand-written trunk walk over a prepared pytree —
        # int8 conv MACs on the int8 MXU, or folded conv+bias with zero BN
        # ops in the graph
        if stochastic:
            raise ValueError(
                "--quantize/--fold_bn are incompatible with --eval_dropout")
        if quantize and fold_bn:
            raise ValueError("--fold_bn is implied by --quantize; pick one")
        from ..models.quant import (
            calibrate_activation_scales,
            fold_posenet_variables,
            mapnet_apply_int8,
            posenet_apply_int8,
            quantize_posenet_variables,
        )

        trunk = getattr(model, "posenet", model).feature_extractor
        variables = {"params": state.params["model"],
                     "batch_stats": state.batch_stats}
        if quantize:
            qtree = quantize_posenet_variables(
                variables, stage_sizes=tuple(trunk.stage_sizes),
                quantize_heads=quantize_heads,
            )
            if calib_batches:
                # static activation scales: observe absmax over the first
                # few batches of this very dataset, then bake scales in
                calib = []
                cl = Loader(dataset, batch_size, shuffle=False,
                            drop_last=False, num_workers=num_workers)
                for i, (imgs, _, _) in enumerate(cl):
                    if i >= calib_batches:
                        break
                    x = jnp.asarray(imgs)
                    calib.append(preprocess(x) if preprocess is not None else x)
                qtree = calibrate_activation_scales(qtree, calib)
        else:
            qtree = fold_posenet_variables(
                variables, stage_sizes=tuple(trunk.stage_sizes))
        qtree = jax.device_put(
            qtree, replicated(mesh)) if mesh is not None else jax.device_put(
            qtree)
        # int8 serves in bf16 compute dtype; BN folding is a float-path
        # optimization and must keep the model's own precision semantics
        apply_dtype = (
            jnp.bfloat16 if quantize
            else getattr(getattr(model, "posenet", model), "dtype",
                         jnp.bfloat16)
        )

        # the prepared pytree rides as the step's state ARGUMENT (not a
        # traced constant): weights aren't baked into the XLA program, so
        # the compiled step is reusable across checkpoints/calibrations
        if fuse_requant and not (quantize and calib_batches):
            raise ValueError(
                "--fuse_requant needs --quantize int8 with --calibrate N "
                "(static scales on every site)")

        def step_core(qtree_, images, targets=None, rng=None):
            if preprocess is not None and images.dtype != jnp.int8:
                # int8 input = prequantized device cache (quantize_input_int8
                # already ran preprocess + stem quantize at upload)
                images = preprocess(images)
            if images.ndim == 5:
                out = mapnet_apply_int8(qtree_, images, dtype=apply_dtype,
                                        fused=fuse_requant)
            else:
                out = posenet_apply_int8(qtree_, images, dtype=apply_dtype,
                                         fused=fuse_requant)
                if fold_T is not None:
                    out = out.reshape(-1, fold_T, out.shape[-1])
            return jnp.zeros(()), out

        scan_state = qtree
    else:
        step_core = make_eval_step(model, None, preprocess=preprocess,
                                   stochastic=stochastic,
                                   fold_tuples=fold_T)
        scan_state = state
    eval_step = None if use_device_cache else _jit_step(step_core)
    eval_rng = jax.random.PRNGKey(seed)

    pred_poses = np.zeros((L, 7))
    targ_poses = np.zeros((L, 7))
    n_images = 0
    upload_secs = 0.0
    frame_buf = None
    # device-side loop: launches are dispatched asynchronously and outputs
    # stay on device — a single readback at the end instead of one host sync
    # per batch (each sync costs a full host<->device round trip)
    dev_outputs = []
    host_targets = []
    valids = []

    if use_device_cache:
        # frames live in HBM; each batch is a (B, T) index gather on device
        # (the loader + per-batch image transfer disappear — measured e2e
        # win in PERF.md "device-resident frames")
        from ..data.device_cache import (
            make_sharded_gather,
            upload_frames,
            upload_frames_sharded,
        )

        frames_src = dataset.dset if is_tuple else dataset
        t_up = time.time()
        if device_cache == "shard":
            # frame-axis-SHARDED stack: each device holds N/d frames and the
            # per-batch gather becomes a psum_scatter collective — capacity
            # scales with device count (scenes > one HBM budget)
            if mesh is None:
                raise ValueError(
                    "device_cache='shard' needs a multi-device mesh "
                    "(use_mesh=True with batch_size divisible by devices)")
            frame_buf = upload_frames_sharded(
                frames_src, mesh, num_workers=num_workers)
        elif isinstance(device_cache, bool):
            frame_buf = upload_frames(frames_src, num_workers=num_workers)
        else:
            frame_buf = device_cache
        cache_sharded = (
            mesh is not None
            and getattr(frame_buf, "sharding", None) is not None
            and len(frame_buf.sharding.device_set) > 1
            and not frame_buf.sharding.is_fully_replicated
        )
        if mesh is not None and not cache_sharded:
            # pin the buffer replicated over the dp mesh once; each device
            # gathers its own batch shard locally (no collective)
            frame_buf = jax.device_put(frame_buf, replicated(mesh))
        # PREQUANTIZED int8 row cache (--fuse_requant + --device_cache):
        # with static scales the stem's int8 input is a per-frame constant,
        # so the cache stores it directly — preprocess + quantize run ONCE
        # at upload instead of per batch, bit-identically (models/quant.py
        # quantize_input_int8; tests/test_quant.py pins exact equality).
        # Rows flatten to (N, H/2*W/2*4C) space-to-depth frames: a
        # contiguous row gather measured +7% over the 4-D frame gather
        # (PERF.md r5 product-dataflow ladder).
        # Composes with the SHARDED cache: the transform is per-frame
        # elementwise, so it runs shard-local (no collective) and the
        # psum_scatter gather stays exact on int8 rows (one owner per row).
        prequant = bool(fuse_requant)
        if prequant:
            from ..models.quant import (
                convert_stem_s2d,
                quantize_input_int8,
                space_to_depth_input,
            )

            # SPACE-TO-DEPTH stem on the cached path: the cache stores the
            # frames 2x2-space-to-depth rearranged and the stem runs as a
            # stride-1 4x4 conv over 12 channels — BIT-exact (same int32
            # accumulator, tests/test_quant.py::TestStemS2D) and measured
            # +4.5% on hardware (PERF.md r5 ladder H vs F: the stride-2 C=3
            # conv is the trunk's least MXU-efficient site and its input
            # relayout disappears when the cache stores the target layout).
            # The loader path keeps the 7x7 stem: an IN-graph rearrange
            # measured -3% (ladder I), so S2D only pays when the producer
            # ships the layout.
            scan_state = jax.device_put(
                convert_stem_s2d(qtree),
                replicated(mesh) if mesh is not None else None)

            def _s2d_shape(shape):
                h_, w_, c_ = shape
                return ((h_ + h_ % 2) // 2, (w_ + w_ % 2) // 2, 4 * c_)

            if frame_buf.dtype == jnp.int8 and frame_buf.ndim == 2:
                # reused buffer is already the prequantized row cache; the
                # frame geometry comes from one probe decode
                from ..data.device_cache import _probe_frames

                frame_shape = _s2d_shape(tuple(_probe_frames(
                    frames_src, len(frames_src), float("inf")).shape))
            else:
                frame_shape = _s2d_shape(tuple(frame_buf.shape[1:]))

                def _qput(b):
                    return space_to_depth_input(quantize_input_int8(
                        qtree,
                        preprocess(b) if preprocess is not None else b,
                    )).reshape(b.shape[0], -1)

                if cache_sharded:
                    from jax.sharding import NamedSharding, PartitionSpec

                    dat = NamedSharding(mesh, PartitionSpec("data"))
                    qput = jax.jit(_qput, in_shardings=(dat,),
                                   out_shardings=dat)
                else:
                    qput = jax.jit(_qput)
                frame_buf = qput(frame_buf)
        upload_secs = time.time() - t_up

        S = len(dataset)
        tuple_idx = (
            [dataset.get_indices(i) for i in range(S)]
            if is_tuple else [np.array([i]) for i in range(S)]
        )
        if is_tuple:
            targets_np = [dataset._poses_for(ti) for ti in tuple_idx]
        else:
            tt = getattr(frames_src, "target_transform", None)
            targets_np = [
                np.asarray(
                    tt(frames_src.poses[i]) if tt is not None
                    else frames_src.poses[i],
                    np.float32,
                )[None]
                for i in range(S)
            ]
        idx_mat = np.stack(tuple_idx).astype(np.int32)  # (S, T)

        t_start = time.time()
        n_batches = (S + batch_size - 1) // batch_size
        # ONE launch for the whole epoch. With the frames resident in HBM the
        # measured wall is the per-batch dispatch RPC through the tunnel
        # (PERF.md "device-resident frames": 864 img/s looped vs ~6k
        # device-resident) — so the per-batch loop collapses into a
        # lax.scan over the (n_batches, B, T) index tensor: one dispatch,
        # one stacked (n_batches, B, T, 6) readback.
        pad_rows = n_batches * batch_size - S
        idx_all = np.concatenate(
            [idx_mat, np.repeat(idx_mat[-1:], pad_rows, axis=0)]
        ).reshape(n_batches, batch_size, -1)
        rngs_all = (
            jnp.stack([jax.random.fold_in(eval_rng, i)
                       for i in range(n_batches)])
            if stochastic else jnp.zeros((n_batches, 2), jnp.uint32)
        )

        # FRAME-DEDUP epoch: tuples share frames ((steps-1)*skip apart), so
        # the tuple scan recomputes each cached frame up to T times. The
        # reference's eval pays the same T x redundancy, one tuple per
        # launch (/root/reference/scripts/eval.py:138-166). At eval the
        # model is per-frame whenever fold_T holds (VidLoc's recurrence and
        # stochastic dropout keep fold_T None and are excluded), so the
        # epoch instead computes each UNIQUE frame's pose once — a scan
        # over deduplicated cache indices — and the (S, T) tuple structure
        # is a host-side gather of the tiny (U, d) pose table. The dedup'd
        # indices are arranged in the SAME (kf, B, T) grid the tuple scan
        # consumes — the scanned program is structurally IDENTICAL (only
        # the trip count differs), reusing its compiled wrapper — and the
        # per-frame values are BIT-exact on every path incl. int8 fused
        # (tests/test_device_cache.py::TestFrameDedup; requires the
        # calibrated STATIC head scale below — a dynamic batch-absmax
        # anywhere couples a frame's pose to its batchmates). Up to T x
        # less device work; auto-enabled whenever it saves scanned
        # batches; dedup_frames=False forces the tuple scan.
        # dynamic-scale int8 (--quantize without --calibrate) quantizes each
        # site at the BATCH's absmax, so a frame's pose depends on its
        # batchmates — regrouping into the dedup grid would genuinely
        # change results, not just reorder work. (Calibrated runs are safe:
        # every site including the int8 head carries a static scale.)
        dynamic_q = quantize and not calib_batches
        dedup_ok = (is_tuple and fold_T is not None and not stochastic
                    and not dynamic_q)
        if dedup_frames and not dedup_ok:
            raise ValueError(
                "dedup_frames needs a per-frame (MapNet-style) tuple model: "
                "no --eval_dropout (stochastic draws are per tuple slot) "
                "and no dynamic-scale int8 (--quantize without --calibrate "
                "quantizes at the batch absmax, coupling rows)")
        nb_flat = batch_size * steps
        uniq = inverse = fidx = None
        if dedup_ok and dedup_frames is not False:
            uniq, inverse = np.unique(idx_mat, return_inverse=True)
            kf = (len(uniq) + nb_flat - 1) // nb_flat
            if dedup_frames or kf < n_batches:
                fidx = np.concatenate(
                    [uniq, np.full(kf * nb_flat - len(uniq), uniq[-1])]
                ).reshape(kf, batch_size, steps).astype(np.int32)
        dedup = fidx is not None
        # SLICE fast path for the dedup epoch: a full-scene eval's unique
        # frame indices form ONE contiguous range (np.unique sorts), and on
        # hardware the gather OP — not the access pattern — costs ~10% of
        # the epoch (PERF.md r5 ladder: random gather 16.2k ≈ sequential
        # gather 16.2k, dynamic_slice 18.0k img/s). So consecutive indices
        # swap the scanned gather for a dynamic_slice on the frame axis:
        # windows step nb_flat and the LAST window shifts back to stay in
        # range, recomputing the overlap — per-frame outputs are
        # bit-identical across batch positions (the dedup contract), so the
        # host table takes the last occurrence. Meshed/sharded caches keep
        # the gather (their batch axis is sharded; a replicated slice would
        # immediately reshard).
        dedup_slice = (
            dedup and mesh is None and not cache_sharded
            and len(uniq) >= nb_flat
            and int(uniq[-1]) - int(uniq[0]) == len(uniq) - 1)

        if progress:
            print(f"eval: scanning {n_batches} batches in one launch"
                  + (f" over {n_dev} devices" if mesh is not None else ""))
        scan_key = (
            id(model), id(preprocess), bool(quantize), bool(fold_bn),
            bool(quantize_heads), bool(fuse_requant), bool(stochastic),
            is_tuple, fold_T, cache_sharded, prequant, dedup_slice,
            None if mesh is None else tuple(mesh.devices.flat),
        )
        with _SCAN_CACHE_LOCK:
            cached = _SCAN_CACHE.get(scan_key)
            if cached is not None:
                # refresh recency (LRU, not FIFO): without this, alternating
                # among >MAX configs evicts the hottest entry every pass
                _SCAN_CACHE[scan_key] = _SCAN_CACHE.pop(scan_key)
        if cached is not None:
            scan_jit = cached[0]
        elif dedup_slice:

            def epoch_slice(state_, buf_, starts, rngs):
                def body(carry, xs):
                    s, _rng = xs
                    rows = jax.lax.dynamic_slice_in_dim(buf_, s, nb_flat)
                    if prequant:
                        rows = rows.reshape((nb_flat,) + frame_shape)
                    _, out = step_core(state_, rows, None, None)
                    return carry, (out if out.ndim == 3
                                   else out[:, None, :])

                _, outs = jax.lax.scan(body, 0, (starts, rngs))
                return outs

            scan_jit = jax.jit(epoch_slice)
            with _SCAN_CACHE_LOCK:
                while len(_SCAN_CACHE) >= _SCAN_CACHE_MAX:
                    _SCAN_CACHE.pop(next(iter(_SCAN_CACHE)))
                _SCAN_CACHE[scan_key] = (scan_jit, model, preprocess)
        else:
            sh_gather = make_sharded_gather(mesh) if cache_sharded else None

            def epoch_scan(state_, buf_, idx_batches, rngs):
                def body(carry, xs):
                    ib, rng = xs
                    gi = ib if is_tuple else ib[:, 0]
                    if fold_T is not None and mesh is None:
                        # folded gather: (B*T,) indices -> 4D frames; the
                        # step folds poses back (see fold_T above). Meshed
                        # scans keep the (B, T) gather — the folded reshape
                        # would merge the dp-sharded batch axis
                        gi = gi.reshape(-1)
                    # sharded cache: masked local gather + psum_scatter
                    # (bit-identical values, batch-sharded output)
                    frames_b = (
                        sh_gather(buf_, gi) if cache_sharded else buf_[gi])
                    if prequant:
                        # row cache: (.., H*W*C) int8 rows -> frames (the
                        # reshape is free; the step skips preprocess+quant
                        # on int8 input)
                        frames_b = frames_b.reshape(gi.shape + frame_shape)
                    _, out = step_core(
                        state_, frames_b, None,
                        rng if stochastic else None)
                    return carry, (out if out.ndim == 3 else out[:, None, :])
                _, outs = jax.lax.scan(body, 0, (idx_batches, rngs))
                return outs

            if mesh is None:
                scan_jit = jax.jit(epoch_scan)
            else:
                # dp over the scan: the index tensor shards on its BATCH
                # axis (each device evaluates its slice of every scanned
                # batch against its local replica of the frame buffer —
                # or, sharded cache, against the frame-axis shard it owns)
                from jax.sharding import NamedSharding, PartitionSpec

                rep = replicated(mesh)
                d2 = NamedSharding(mesh, PartitionSpec(None, "data"))
                buf_sh = (
                    NamedSharding(mesh, PartitionSpec("data"))
                    if cache_sharded else rep)
                scan_jit = jax.jit(
                    epoch_scan, in_shardings=(rep, buf_sh, d2, rep))
            # a duplicate compile under a concurrent-eval race is harmless;
            # the insert is last-writer-wins under the lock
            with _SCAN_CACHE_LOCK:
                while len(_SCAN_CACHE) >= _SCAN_CACHE_MAX:
                    _SCAN_CACHE.pop(next(iter(_SCAN_CACHE)))
                _SCAN_CACHE[scan_key] = (scan_jit, model, preprocess)
        if dedup_slice:
            kf = fidx.shape[0]
            # window starts (absolute frame ids): step nb_flat, last window
            # shifted back so every slice stays inside the unique range
            starts = (np.minimum(np.arange(kf) * nb_flat,
                                 len(uniq) - nb_flat)
                      + int(uniq[0])).astype(np.int32)
            outs = scan_jit(scan_state, frame_buf, jnp.asarray(starts),
                            jnp.zeros((kf, 2), jnp.uint32))
        elif dedup:
            outs = scan_jit(scan_state, frame_buf, jnp.asarray(fidx),
                            jnp.zeros((fidx.shape[0], 2), jnp.uint32))
        else:
            outs = scan_jit(scan_state, frame_buf, jnp.asarray(idx_all),
                            rngs_all)
        # the dispatch above is ASYNC — stage the host-side targets while
        # the epoch scan runs on device (one vectorized stack, not a
        # per-batch python loop: the loop measured ~30 us/img, the whole
        # gap between the e2e rate and the device-program rate, PERF.md r5)
        targ_all = np.asarray(np.stack(targets_np), np.float64)  # (S, T', 6)
        if pad_rows:
            targ_all = np.concatenate(
                [targ_all, np.repeat(targ_all[-1:], pad_rows, axis=0)])
        targ_all = targ_all.reshape(
            (n_batches, batch_size) + targ_all.shape[1:])
        if dedup:
            # sync: (kf, B, T, d) per-slot poses of the dedup grid -> flat
            # per-frame pose table -> per-tuple structure via the np.unique
            # inverse map (host gather of a tiny array)
            fp = np.asarray(outs, np.float64)
            fp = fp.reshape(-1, fp.shape[-1])
            if dedup_slice:
                # slice windows: frame uniq[r] sits at flat slot r for the
                # non-overlap head; the shifted last window re-covers
                # [U-nb_flat, U) — identical values, take the last copy
                U = len(uniq)
                head = (fidx.shape[0] - 1) * nb_flat
                table = np.empty((U, fp.shape[-1]), fp.dtype)
                table[:head] = fp[:head]
                table[U - nb_flat:] = fp[head:]
                fp = table
            else:
                fp = fp[:len(uniq)]
            outs_np = fp[inverse].reshape(idx_mat.shape + (fp.shape[-1],))
            if pad_rows:
                outs_np = np.concatenate(
                    [outs_np, np.repeat(outs_np[-1:], pad_rows, axis=0)])
            outs_np = outs_np.reshape(
                (n_batches, batch_size) + outs_np.shape[1:])
        else:
            outs_np = np.asarray(outs, np.float64)  # (n_batches, B, T, 6)

        for batch_idx in range(n_batches):
            valid = min(batch_size, S - batch_idx * batch_size)
            dev_outputs.append(outs_np[batch_idx])
            host_targets.append(targ_all[batch_idx])
            valids.append(valid)
            n_images += valid * steps
        loop_done = True
    else:
        loop_done = False

    if not loop_done and not is_tuple:
        # wrap plain frame datasets so the same loader/batch path applies
        class _Single:
            def __init__(self, ds):
                self.ds = ds

            def __len__(self):
                return len(self.ds)

            def __getitem__(self, i):
                img, pose = self.ds[i]
                return (
                    None if img is None else img[None],
                    np.asarray(pose, np.float32)[None],
                )

        dataset = _Single(dataset)

    if not loop_done:
        loader = Loader(dataset, batch_size, shuffle=False, drop_last=False,
                        num_workers=num_workers)
        t_start = time.time()
        for batch_idx, (imgs, poses, pad) in enumerate(loader):
            valid = imgs.shape[0] - pad
            if progress and batch_idx % 10 == 0:
                print(f"Batch {batch_idx} / {len(loader)}")

            if fold_T is not None:
                # T-folded upload (free numpy view; see fold_T above)
                imgs = imgs.reshape(-1, *imgs.shape[2:])
            x = jnp.asarray(imgs)
            if not is_tuple:
                # PoseNet consumes (B, H, W, C); the _Single wrapper added a
                # frame axis only for uniform loader/batch bookkeeping
                x = x[:, 0]
            if mesh is not None:
                x = _shard_batch(x, mesh)
            rng = (jax.random.fold_in(eval_rng, batch_idx)
                   if stochastic else None)
            _, output = eval_step(scan_state, x, None, rng)
            dev_outputs.append(
                output if output.ndim == 3 else output[:, None, :])
            targ = np.asarray(poses, np.float64)
            host_targets.append(targ if targ.ndim == 3 else targ[:, None, :])
            valids.append(valid)
            n_images += valid * steps

    # all launches are in flight; readback after the fact only pays transfer
    # (no XLA program is compiled for the host-side concatenation)
    output = np.concatenate(
        [np.asarray(o, np.float64) for o in dev_outputs]
    )  # (S, T, 6)
    elapsed = time.time() - t_start
    targ = np.concatenate(host_targets)

    # log-q -> unit quaternion
    out7 = np.concatenate([output[..., :3], qexp_np(output[..., 3:])], axis=-1)
    targ_abs = targ[:, :steps]
    targ7 = np.concatenate(
        [targ_abs[..., :3], qexp_np(targ_abs[..., 3:])], axis=-1
    )

    if pose_graph:
        # targets carry [steps abs | VOs]; ALL windows optimize in one
        # vmapped device launch (~19k windows/s, scripts/bench_pgo.py)
        vos_log = targ[:, steps:]
        vos7 = np.concatenate(
            [vos_log[..., :3], qexp_np(vos_log[..., 3:])], axis=-1
        )
        out7 = np.asarray(
            optimize_poses_batch(
                jnp.asarray(out7, jnp.float32),
                jnp.asarray(vos7, jnp.float32),
                fc=fc_vos,
                **(pgo_weights or {}),
            ),
            np.float64,
        )

    # un-normalize translations
    out7[..., :3] = out7[..., :3] * pose_s + pose_m
    targ7[..., :3] = targ7[..., :3] * pose_s + pose_m

    # middle-frame selection into the global arrays (pad rows skipped)
    base = 0
    row = 0
    for batch_idx, valid in enumerate(valids):
        batch_rows = (
            len(host_targets[batch_idx])
        )
        for b in range(valid):
            sample_idx = base + b
            if is_tuple:
                idx = dataset.get_indices(sample_idx)
                idx = idx[len(idx) // 2]
            else:
                idx = sample_idx
            pred_poses[idx] = out7[row + b, steps // 2]
            targ_poses[idx] = targ7[row + b, steps // 2]
        base += valid
        row += batch_rows
    t_err = translation_error(pred_poses[:, :3], targ_poses[:, :3])
    q_err = quaternion_angular_error(pred_poses[:, 3:], targ_poses[:, 3:])
    result = {
        "pred_poses": pred_poses,
        "targ_poses": targ_poses,
        "t_err": t_err,
        "q_err": q_err,
        "median_t": float(np.median(t_err)),
        "mean_t": float(np.mean(t_err)),
        "median_q": float(np.median(q_err)),
        "mean_q": float(np.mean(q_err)),
        "images_per_sec": n_images / max(elapsed, 1e-9),
    }
    if use_device_cache:
        # hand the buffer back so repeated calls (PGO sweeps, serving
        # loops) pass it as ``device_cache=`` and skip the upload
        result["device_frames"] = frame_buf
        result["upload_secs"] = upload_secs
        # honesty split for the dedup epoch: images_per_sec counts the
        # EVALUATED tuple-images (the task rate); frames_computed is how
        # many forwards the device actually ran (pad rows included)
        result["frames_computed"] = int(
            fidx.size if dedup else idx_all.size)
        # True when the dedup epoch ran gather-free (consecutive unique
        # frames -> dynamic_slice windows; +11% on hardware, PERF.md r5)
        result["dedup_slice"] = dedup_slice
    return result


def plot_trajectories(pred_poses, targ_poses, dataset_name, path):
    """Save the reference's 3D (7Scenes) / 2D (RobotCar) trajectory figure
    (/root/reference/scripts/eval.py:208-231)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure()
    three_d = dataset_name == "7Scenes"
    ax = fig.add_subplot(111, projection="3d" if three_d else None)
    plt.subplots_adjust(left=0, bottom=0, right=1, top=1)
    ss = max(1, len(pred_poses) // 1000)
    x = np.vstack((pred_poses[::ss, 0].T, targ_poses[::ss, 0].T))
    y = np.vstack((pred_poses[::ss, 1].T, targ_poses[::ss, 1].T))
    if three_d:
        z = np.vstack((pred_poses[::ss, 2].T, targ_poses[::ss, 2].T))
        for xx, yy, zz in zip(x.T, y.T, z.T):
            ax.plot(xx, yy, zs=zz, c="b")
        ax.scatter(x[0, :], y[0, :], zs=z[0, :], c="r", depthshade=0)
        ax.scatter(x[1, :], y[1, :], zs=z[1, :], c="g", depthshade=0)
        ax.view_init(azim=119, elev=13)
    else:
        ax.plot(x, y, c="b")
        ax.scatter(x[0, :], y[0, :], c="r")
        ax.scatter(x[1, :], y[1, :], c="g")
    fig.savefig(path)
    plt.close(fig)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Evaluation script for PoseNet and MapNet variants"
    )
    parser.add_argument("--dataset", type=str, required=True,
                        choices=("7Scenes", "RobotCar", "synth"))
    parser.add_argument("--scene", type=str, default="synth")
    parser.add_argument("--weights", type=str, required=True,
                        help="orbax checkpoint dir or converted npz")
    parser.add_argument("--model", required=True,
                        choices=("posenet", "mapnet", "mapnet++"))
    parser.add_argument("--trunk", default="resnet34",
                        choices=("resnet18", "resnet34", "resnet50"),
                        help="feature extractor (reference fixes resnet34)")
    parser.add_argument("--device", type=str, default="0")
    parser.add_argument("--config_file", type=str, required=True)
    parser.add_argument("--val", action="store_true")
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--pose_graph", action="store_true")
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--data_path", type=str, default="data/deepslam_data")
    parser.add_argument("--asset_root", type=str, default="data")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument(
        "--host_normalize", action="store_true",
        help="normalize images on the host (float32 transfer) instead of the "
        "default device-side pipeline (uint8 transfer, 4x smaller)",
    )
    parser.add_argument(
        "--eval_dropout", action="store_true",
        help="keep dropout active at eval (the reference's ungated F.dropout "
        "quirk; its published numbers include it)",
    )
    parser.add_argument(
        "--raw_bayer", action="store_true",
        help="RobotCar only: raw Bayer mosaics + fused on-device "
        "demosaic/[undistort]/resize/normalize",
    )
    parser.add_argument("--camera_models_dir", type=str, default=None)
    parser.add_argument(
        "--native_loader", action="store_true",
        help="decode+resize images with the C++ batch decoder "
        "(geomapnet_tpu.native) instead of PIL — the fast host IO path",
    )
    parser.add_argument(
        "--cache_frames", type=float, default=0.0, metavar="GB",
        help="decoded-frame RAM cache: repeated eval passes (e.g. PGO "
        "sweeps) decode each frame once",
    )
    parser.add_argument(
        "--device_cache", nargs="?", const=True, default=False,
        choices=["shard"],
        help="upload the whole scene's frames to HBM once and gather "
        "batches by index on device (removes the per-batch host->device "
        "image transfer; a resized-uint8 scene is 0.25-1.8 GB). "
        "'--device_cache shard' keeps the stack frame-axis-sharded over "
        "the mesh instead of replicated — capacity scales with device "
        "count (scenes bigger than one HBM budget)",
    )
    parser.add_argument(
        "--no_frame_dedup", action="store_true",
        help="with --device_cache: keep the tuple epoch scan instead of the "
        "default frame-dedup epoch (each unique frame's forward computed "
        "once, per-tuple poses gathered from the pose table — "
        "bit-identical at up to T x less device work)",
    )
    parser.add_argument(
        "--quantize", choices=["int8"], default=None,
        help="run the trunk with int8 PTQ inference (models/quant.py)",
    )
    parser.add_argument(
        "--fold_bn", action="store_true",
        help="serving float path: fold BatchNorm into conv weights+bias "
        "(no quantization; implied by --quantize)",
    )
    parser.add_argument(
        "--calibrate", type=int, default=0, metavar="N",
        help="with --quantize: observe N batches to bake static activation "
        "scales (default 0 = dynamic per-batch scales)",
    )
    parser.add_argument(
        "--quantize_heads", action="store_true",
        help="with --quantize: run the fc_feat head matmul in int8 too",
    )
    parser.add_argument(
        "--fuse_requant", action="store_true",
        help="with --quantize + --calibrate: int8 dataflow — requantization "
        "fused into each conv's epilogue, inter-layer activations stay int8",
    )
    args = parser.parse_args(argv)

    config = parse_ini(args.config_file)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    fc_vos = args.dataset == "RobotCar"

    use_tuples = args.model.startswith("mapnet") or args.pose_graph
    model_kind = "mapnet" if use_tuples else "posenet"
    model, _ = build_model(model_kind, config, dtype=dtype, trunk=args.trunk)
    criterion, _ = build_criteria(model_kind, config, False, False)

    # template state for checkpoint restore
    T = config.steps if use_tuples else 1
    sample = jnp.zeros(
        (1, T, 64, 64, 3) if use_tuples else (1, 64, 64, 3), dtype
    )
    tx = make_optimizer(config.opt, config.lr)
    state = create_train_state(model, criterion, tx, jax.random.PRNGKey(0), sample)

    weights = Path(args.weights)
    if weights.suffix == ".npz":
        imported = load_npz(str(weights))
        variables = {"params": state.params["model"],
                     "batch_stats": state.batch_stats}
        if "posenet" in variables["params"]:
            inner = {k: v["posenet"] for k, v in variables.items()}
            merged = merge_variables(inner, imported)
            variables = {k: {"posenet": merged[k]} for k in variables}
        else:
            variables = merge_variables(variables, imported)
        params = dict(state.params)
        params["model"] = variables["params"]
        state = state.replace(params=params, batch_stats=variables["batch_stats"])
    else:
        state = load_model_params(weights, state)
    print(f"Loaded weights from {weights}")

    train = not args.val
    print(f"Running {args.model} on {'TRAIN' if train else 'VAL'} data")

    data_path = (
        args.data_path if args.dataset == "synth"
        else f"{args.data_path}/{args.dataset}"
    )
    if args.raw_bayer:
        if args.dataset != "RobotCar":
            parser.error("--raw_bayer requires --dataset RobotCar")
        preprocess = build_raw_device_preprocess(
            args.scene, args.asset_root, dtype=dtype,
            camera_models_dir=args.camera_models_dir,
        )
    elif args.host_normalize:
        preprocess = None
    else:
        preprocess = build_device_preprocess(args.dataset, args.scene,
                                             args.asset_root, dtype=dtype)
    tf = build_transform(
        args.dataset, args.scene, config, args.asset_root,
        train=False, seed=config.seed,
        keep_uint8=preprocess is not None and not args.raw_bayer,
    )
    frames = build_frame_dataset(
        args.dataset, args.scene, data_path, train, config, transform=tf,
        real=config.real if use_tuples else False,
        asset_root=args.asset_root,
        vo_lib=config.vo_lib if args.pose_graph else None,
        raw_bayer=args.raw_bayer,
        native_loader=args.native_loader,
        cache_gb=args.cache_frames,
    )
    if use_tuples:
        gt_frames = None
        if args.pose_graph and config.real:
            gt_frames = build_frame_dataset(
                args.dataset, args.scene, data_path, train, config,
                skip_images=True, asset_root=args.asset_root,
            )
        dataset = MF(
            frames, steps=config.steps, skip=config.skip,
            variable_skip=config.variable_skip,
            include_vos=args.pose_graph, real=config.real and args.pose_graph,
            gt_dataset=gt_frames,
            vo_func=vos_logq_fc_np if fc_vos else vos_logq_np,
            seed=config.seed,
        )
    else:
        dataset = frames

    if args.dataset == "synth":
        pose_stats = (np.zeros(3), np.ones(3))
    else:
        pose_stats = tuple(
            np.loadtxt(Path(args.asset_root) / args.dataset / args.scene
                       / "pose_stats.txt")
        )

    pgo_weights = dict(
        sax=config.s_abs_trans, saq=config.s_abs_rot,
        srx=config.s_rel_trans, srq=config.s_rel_rot,
    ) if args.pose_graph else None

    results = evaluate(
        model, state, dataset, batch_size=args.batch_size,
        pose_stats=pose_stats, pose_graph=args.pose_graph, fc_vos=fc_vos,
        pgo_weights=pgo_weights, preprocess=preprocess,
        stochastic=args.eval_dropout, seed=config.seed,
        num_workers=config.num_workers,
        quantize=args.quantize == "int8",
        fold_bn=args.fold_bn,
        calib_batches=args.calibrate,
        quantize_heads=args.quantize_heads,
        fuse_requant=args.fuse_requant,
        device_cache=args.device_cache,
        dedup_frames=False if args.no_frame_dedup else None,
    )

    print(
        "Error in translation: median {:3.2f} m,  mean {:3.2f} m\n"
        "Error in rotation: median {:3.2f} degrees, mean {:3.2f} degree".format(
            results["median_t"], results["mean_t"],
            results["median_q"], results["mean_q"],
        )
    )
    print(f"Eval throughput: {results['images_per_sec']:.1f} images/sec")

    if args.output_dir:
        out = Path(args.output_dir).expanduser()
        out.mkdir(parents=True, exist_ok=True)
        model_name = args.model + ("_pgo" if args.pose_graph else "")
        name = f"{args.dataset}_{args.scene}_{model_name}"
        plot_trajectories(results["pred_poses"], results["targ_poses"],
                          args.dataset, out / f"{name}.png")
        with open(out / f"{name}.pkl", "wb") as f:
            pickle.dump({"targ_poses": results["targ_poses"],
                         "pred_poses": results["pred_poses"]}, f)
        import json

        with open(out / f"{name}_metrics.json", "w") as f:
            json.dump({
                k: results[k] for k in
                ("median_t", "mean_t", "median_q", "mean_q",
                 "images_per_sec")
            }, f, indent=2)
        print(f"{out / name}.png / .pkl / _metrics.json saved")
    return results


if __name__ == "__main__":
    main()
