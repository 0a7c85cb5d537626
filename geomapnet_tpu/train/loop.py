"""The training loop: epochs, validation, snapshots, metrics.

Reference parity: ``Trainer.train_val`` (/root/reference/common/
train.py:206-320) — same epoch structure (validate every ``val_freq``,
snapshot every ``snapshot`` epochs + at the end, per-batch data/batch-time
meters, ``print_freq`` console lines), rebuilt around the functional core:

- one jit-compiled train step per batch (forward+loss+backward+update fused;
  the reference dispatches dozens of framework ops per step);
- batches stream through :class:`geomapnet_tpu.data.Loader` with background
  prefetch and static shapes;
- with a :class:`jax.sharding.Mesh` the same loop runs data-parallel — the
  step is compiled with batch-sharded inputs and XLA all-reduces gradients
  over ICI;
- metrics go to stdout (tee'd to ``log.txt``) and structured JSONL
  (``metrics.jsonl``) instead of visdom.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import numpy as np

from ..data.device_cache import IndexLoader
from ..data.loader import Loader
from ..parallel.mesh import make_mesh, replicated, shard_batch, shard_step
from ..parallel.multihost import local_batch_size, make_global_batch
from ..utils.logger import AverageMeter, MetricsWriter, Tee
from .checkpoint import load_model_params, restore_checkpoint, save_checkpoint
from .optim import make_optimizer
from .state import create_train_state, make_eval_step, make_train_step

__all__ = ["Trainer"]


def chunked(iterable, k):
    """Yield lists of up to ``k`` consecutive items; the final chunk is the
    (possibly shorter) tail. Shared by the launch-fusion loops (train /
    validate / scripts/bench_launch_fusion.py): full chunks go through the
    scanned K-step launch, the tail through single-step launches."""
    chunk = []
    for item in iterable:
        chunk.append(item)
        if len(chunk) == k:
            yield chunk
            chunk = []
    if chunk:
        yield chunk


class Trainer:
    """Drives training of a PoseNet/MapNet-family model.

    :param model: Flax module
    :param train_criterion / val_criterion: loss callables from
        :mod:`geomapnet_tpu.losses`
    :param config: :class:`geomapnet_tpu.cli.config.ExperimentConfig`
    :param experiment: experiment name (logdir ``logs/<experiment>``)
    :param train_dataset / val_dataset: indexable (imgs, poses) datasets
    :param checkpoint: optional checkpoint path to start from
    :param resume_optim: restore optimizer/epoch too (else weights only)
    :param use_mesh: shard batches over all available devices
    :param preprocess: optional device-side image function fused into the
        jit'd steps (see :func:`geomapnet_tpu.cli.builders.build_device_preprocess`);
        the loader should then emit raw uint8 batches (``keep_uint8``)
    :param accum_steps: gradient-accumulation microbatches per optimizer
        step (see :func:`geomapnet_tpu.train.make_train_step`); batch_size
        stays the effective batch
    :param device_cache: upload each split's frames to HBM once and feed
        the train/eval steps by on-device index gather
        (:mod:`geomapnet_tpu.data.device_cache`) — removes host decode AND
        the per-batch image transfer from every epoch after the first. On a
        multi-device mesh the buffer replicates and each device gathers its
        own batch shard locally. Under jax.distributed each process decodes
        only its shard of the frames and ONE interconnect all-gather
        replicates the stack (:func:`~geomapnet_tpu.data.device_cache.
        upload_frames_global`). Pass ``"shard"`` to keep the stack
        frame-axis-SHARDED over the mesh instead: each device holds N/d
        frames and batch gathers become a ``psum_scatter`` collective
        (:func:`~geomapnet_tpu.data.device_cache.make_sharded_gather`) —
        capacity scales with device count, for scenes bigger than one HBM
        budget
    :param steps_per_launch: with ``device_cache``, fuse this many optimizer
        steps into ONE device launch (a ``lax.scan`` over stacked index
        batches). Semantics are bit-identical to launching each step —
        dropout folds per ``state.step`` inside the scan — but the
        per-launch host dispatch (the measured wall on remote/tunneled
        rigs, PERF.md "device-resident frames") is paid once per K steps.
        Losses for all K steps come back as one array, so per-batch
        logging is unchanged. Ignored without ``device_cache``.
    :param ingest_overlap: with ``device_cache``, overlap the first epoch's
        decode with training instead of paying it serially before the first
        step: the warmup epoch trains straight from the image loader (whose
        prefetch thread already overlaps decode with compute) while a
        :class:`~geomapnet_tpu.data.device_cache.FrameRecorder` captures
        every decoded frame; the cache finalizes at epoch end from the
        staged frames (decode still paid exactly once). Epoch-1 wall drops
        from ``decode_all + train_epoch`` to ``~max(decode, train)``.
        Composite datasets with several frame sources (MFOnline) record
        each source separately and finalize in ``frame_sources`` order;
        under jax.distributed each process records only the frames backing
        its shard of the collective upload
        (:func:`~geomapnet_tpu.data.device_cache.local_shard_range`) and
        the finalize feeds :func:`upload_frames_global` /
        :func:`upload_frames_sharded` straight from staging.
    """

    def __init__(
        self,
        model,
        train_criterion,
        config,
        experiment: str,
        train_dataset,
        val_dataset=None,
        val_criterion=None,
        checkpoint: str | None = None,
        resume_optim: bool = False,
        logdir_root: str = "logs",
        use_mesh: bool = True,
        profile_dir: str | None = None,
        debug_nans: bool = False,
        preprocess=None,
        tensorboard: bool = False,
        accum_steps: int = 1,
        device_cache: bool = False,
        steps_per_launch: int = 1,
        ingest_overlap: bool = False,
    ):
        self.model = model
        self.config = config
        self.profile_dir = profile_dir
        if debug_nans:
            # numerical-safety mode: fail fast on the first NaN produced by a
            # jitted computation (aux subsystem per SURVEY.md §5)
            jax.config.update("jax_debug_nans", True)
        self.experiment = experiment
        self.train_criterion = train_criterion
        self.val_criterion = val_criterion or train_criterion

        # multi-host: this process loads 1/process_count of each global batch
        # (same seeded permutation everywhere, disjoint strided slices); logs
        # and metrics files are written by process 0 only
        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        local_bs = local_batch_size(config.batch_size)

        self.logdir = Path(logdir_root) / experiment
        self.logdir.mkdir(parents=True, exist_ok=True)
        self.is_main = self.process_index == 0
        self.tee = (
            Tee(self.logdir / "log.txt").install() if self.is_main else None
        )
        self.metrics = MetricsWriter(
            self.logdir / "metrics.jsonl", enabled=self.is_main,
            tensorboard=tensorboard,
        )

        print("---------------------------------------")
        print(f"Experiment: {experiment}")
        for k, v in vars(config).items():
            print(f"{k}: {v}")
        print(f"Devices: {jax.devices()}")
        if self.process_count > 1:
            print(f"Process {self.process_index}/{self.process_count}, "
                  f"local batch {local_bs}")
        print("---------------------------------------")

        if device_cache:
            # cached frames are post-transform: a stochastic host jitter
            # (RobotCar color_jitter) would freeze one draw for all epochs
            from ..data.device_cache import frame_sources

            for src in frame_sources(train_dataset):
                jitter = getattr(getattr(src, "transform", None),
                                 "color_jitter_strength", 0)
                if jitter:
                    print(f"trainer: device_cache disabled — the train "
                          f"transform jitters "
                          f"(color_jitter_strength={jitter})")
                    device_cache = False
                    break
        self.device_cache = device_cache
        if steps_per_launch > 1 and not device_cache:
            print("trainer: steps_per_launch needs device_cache "
                  "(the batches must already live on device); ignoring")
        self.steps_per_launch = (
            max(1, int(steps_per_launch)) if device_cache else 1)
        self._train_scan = None
        self._eval_scan = None
        self._warmup_pending = False
        self._cache_sharded = False
        self._recorders = []
        self._val_shares_train = False

        loader_kwargs = dict(
            process_index=self.process_index, process_count=self.process_count,
            num_workers=config.num_workers,
        )
        loader_cls = IndexLoader if device_cache else Loader
        self.train_loader = loader_cls(
            train_dataset, local_bs, shuffle=config.shuffle,
            drop_last=True, seed=config.seed, **loader_kwargs,
        )
        self.val_loader = (
            loader_cls(val_dataset, local_bs, shuffle=False,
                       drop_last=False, seed=config.seed, **loader_kwargs)
            if (config.do_val and val_dataset is not None) else None
        )

        # return_schedule: the logged lr reads the schedule *inside* the
        # optimizer chain, not a parallel reconstruction that could drift
        self.tx, self._lr_schedule = make_optimizer(
            config.opt, config.lr, config.weight_decay,
            steps_per_epoch=max(1, len(self.train_loader)),
            max_grad_norm=config.max_grad_norm,
            return_schedule=True,
            **config.optim_extras,
        )

        sample_imgs, _, _ = next(iter(
            Loader(train_dataset, 1, shuffle=False, drop_last=True)
        ))
        sample_imgs = jax.numpy.asarray(sample_imgs)
        if preprocess is not None:
            # uint8 device-preprocess path: init the model on the
            # post-pipeline (float) sample, not the raw transfer dtype
            sample_imgs = preprocess(sample_imgs)
        self.rng = jax.random.PRNGKey(config.seed)
        self.state = create_train_state(
            model, train_criterion, self.tx, self.rng, sample_imgs,
        )

        self.start_epoch = 0
        if checkpoint:
            if resume_optim:
                self.start_epoch, self.state = restore_checkpoint(
                    checkpoint, self.state
                )
                print(f"Resumed {checkpoint} at epoch {self.start_epoch}")
            else:
                self.state = load_model_params(checkpoint, self.state)
                print(f"Loaded model weights from {checkpoint}")

        # multi-host always needs the mesh (global batches are assembled
        # onto it in _put, whatever use_mesh says)
        self.mesh = (
            make_mesh() if (use_mesh or self.process_count > 1) else None
        )
        train_step = make_train_step(model, train_criterion, self.tx,
                                     preprocess=preprocess,
                                     accum_steps=accum_steps)
        eval_step = make_eval_step(model, self.val_criterion,
                                   preprocess=preprocess)
        if self.device_cache:
            # frames live in HBM; steps gather by index (images arg becomes
            # an int32 index array). The buffer rides as an explicit jit
            # argument — closing over it would bake 100s of MB into the
            # jaxpr as a constant. On a multi-device mesh the buffer is
            # REPLICATED (each device gathers its own index shard locally —
            # no collective) while idx/poses shard on the batch dim.
            from ..data.device_cache import (
                frame_sources, upload_dataset_frames,
            )

            srcs = frame_sources(train_dataset)
            self._val_shares_train = (
                self.val_loader is not None
                and frame_sources(val_dataset) == srcs
            )
            self._cache_sharded = device_cache == "shard"
            if self._cache_sharded and (
                    self.mesh is None or self.mesh.devices.size == 1):
                print("trainer: device_cache='shard' needs a multi-device "
                      "mesh; using the replicated cache")
                self._cache_sharded = False
            self._warmup_pending = bool(ingest_overlap)
            # multi-host (jax.distributed): each process decodes only its
            # shard of the frames; one interconnect all-gather replicates
            # the stack (upload_frames_global) — no fallback to the loader
            up_mesh = self.mesh if self.process_count > 1 else None
            if self._warmup_pending:
                # ingest overlap: the warmup epoch trains from this image
                # loader while a recorder per frame source stages every
                # decoded frame; the cache finalizes at epoch end
                # (_finalize_device_cache). Multi-host recorders cover only
                # this process's shard of the collective upload.
                from ..data.device_cache import (
                    FrameRecorder, local_shard_range,
                )

                for src in srcs:
                    lo, hi = (
                        local_shard_range(len(src), self.mesh)
                        if self.process_count > 1 else (0, None))
                    self._recorders.append(
                        FrameRecorder(src, lo=lo, hi=hi).install())
                self._train_frames = None
                wu_kwargs = dict(num_workers=config.num_workers)
                if self.process_count > 1:
                    wu_kwargs.update(process_index=self.process_index,
                                     process_count=self.process_count)
                self._warmup_loader = Loader(
                    train_dataset, local_bs, shuffle=config.shuffle,
                    drop_last=True, seed=config.seed, **wu_kwargs,
                )
                self._warmup_val_loader = (
                    Loader(val_dataset, local_bs, shuffle=False,
                           drop_last=False, seed=config.seed, **wu_kwargs)
                    if (self.val_loader is not None
                        and self._val_shares_train) else None
                )
                self._val_frames = (
                    upload_dataset_frames(
                        val_dataset,
                        mesh=self.mesh if self._cache_sharded else None,
                        shard_frames=self._cache_sharded,
                        num_workers=config.num_workers)
                    if (self.val_loader is not None
                        and not self._val_shares_train) else None
                )
            else:
                up_kwargs = dict(
                    mesh=self.mesh if self._cache_sharded else up_mesh,
                    shard_frames=self._cache_sharded,
                    num_workers=config.num_workers,
                )
                self._train_frames = upload_dataset_frames(
                    train_dataset, **up_kwargs)
                self._val_frames = (
                    self._train_frames
                    if self._val_shares_train
                    else upload_dataset_frames(val_dataset, **up_kwargs)
                    if self.val_loader is not None else None
                )

            if self._cache_sharded:
                from ..data.device_cache import make_sharded_gather

                _gather = make_sharded_gather(self.mesh)
            else:
                _gather = lambda b, i: b[i]  # noqa: E731 — local gather

            def _ts_fn(s, idx, poses, rng, buf):
                return train_step(s, _gather(buf, idx), poses, rng)

            def _es_fn(s, idx, poses, buf):
                return eval_step(s, _gather(buf, idx), poses)

            if self.mesh is not None and self.mesh.devices.size > 1:
                # pin the buffers replicated ONCE — an uncommitted
                # single-device arg would re-broadcast on every call
                # (the multi-host path already returns them replicated;
                # warmup buffers replicate in _finalize_device_cache;
                # sharded buffers are already placed P('data'))
                if self.process_count == 1 and not self._cache_sharded:
                    rep = replicated(self.mesh)
                    if self._train_frames is not None:
                        self._train_frames = jax.device_put(
                            self._train_frames, rep)
                    if self._val_frames is not None:
                        self._val_frames = jax.device_put(
                            self._val_frames, rep)
                if self._cache_sharded:
                    # the frame buffer shards on ITS OWN leading (frame)
                    # axis, so shard_step's state/batch/replicated split
                    # doesn't fit — spell the shardings out
                    from jax.sharding import NamedSharding, PartitionSpec

                    rep_s = replicated(self.mesh)
                    dat = NamedSharding(self.mesh, PartitionSpec("data"))
                    _ts = jax.jit(
                        _ts_fn,
                        in_shardings=(rep_s, dat, dat, rep_s, dat),
                        donate_argnums=(0,))
                    _es = jax.jit(
                        _es_fn, in_shardings=(rep_s, dat, dat, dat))
                else:
                    _ts = shard_step(_ts_fn, self.mesh, n_batch_args=2,
                                     n_state_args=1, n_replicated_args=2,
                                     donate_state=True)
                    _es = shard_step(_es_fn, self.mesh, n_batch_args=2,
                                     n_state_args=1, n_replicated_args=1,
                                     donate_state=False)
            else:
                _ts = jax.jit(_ts_fn, donate_argnums=(0,))
                _es = jax.jit(_es_fn)
            self._train_step = (
                lambda s, idx, poses, rng: _ts(s, idx, poses, rng,
                                               self._train_frames))
            self._eval_step = (
                lambda s, idx, poses: _es(s, idx, poses, self._val_frames))

            if self.steps_per_launch > 1:
                # K optimizer steps per device launch: scan over stacked
                # (K, B, ...) index/pose batches. Bit-identical to K single
                # launches (dropout folds per state.step inside the scan);
                # the host dispatch RPC is paid once per K steps.
                def _tsk_fn(s, idx_k, poses_k, rng, buf):
                    def body(s_, xs):
                        i_, p_ = xs
                        return train_step(s_, _gather(buf, i_), p_, rng)

                    return jax.lax.scan(body, s, (idx_k, poses_k))

                if self.mesh is not None and self.mesh.devices.size > 1:
                    from jax.sharding import NamedSharding, PartitionSpec

                    rep = replicated(self.mesh)
                    d2 = NamedSharding(
                        self.mesh, PartitionSpec(None, "data"))
                    buf_sh = (
                        NamedSharding(self.mesh, PartitionSpec("data"))
                        if self._cache_sharded else rep)
                    _tsk = jax.jit(
                        _tsk_fn, in_shardings=(rep, d2, d2, rep, buf_sh),
                        donate_argnums=(0,))
                else:
                    _tsk = jax.jit(_tsk_fn, donate_argnums=(0,))
                self._train_scan = (
                    lambda s, idx_k, poses_k, rng: _tsk(
                        s, idx_k, poses_k, rng, self._train_frames))

                # validation gets the same launch fusion (read-only: no
                # carry mutation, losses stack to (K,))
                def _esk_fn(s, idx_k, poses_k, buf):
                    def body(carry, xs):
                        i_, p_ = xs
                        loss, _ = eval_step(s, _gather(buf, i_), p_)
                        return carry, loss

                    _, k_losses = jax.lax.scan(body, 0, (idx_k, poses_k))
                    return k_losses

                if self.mesh is not None and self.mesh.devices.size > 1:
                    _esk = jax.jit(
                        _esk_fn, in_shardings=(rep, d2, d2, buf_sh))
                else:
                    _esk = jax.jit(_esk_fn)
                self._eval_scan = (
                    lambda s, idx_k, poses_k: _esk(
                        s, idx_k, poses_k, self._val_frames))

            if self._warmup_pending:
                # image-fed steps for the warmup epoch only (epochs 2+ run
                # the index-gather steps above)
                if self.mesh is not None and self.mesh.devices.size > 1:
                    self._img_train_step = shard_step(
                        train_step, self.mesh, n_batch_args=2,
                        n_replicated_args=1, donate_state=True,
                    )
                    self._img_eval_step = shard_step(
                        eval_step, self.mesh, n_batch_args=2,
                        donate_state=False,
                    )
                else:
                    self._img_train_step = jax.jit(train_step,
                                                   donate_argnums=(0,))
                    self._img_eval_step = jax.jit(eval_step)
        elif self.mesh is not None and self.mesh.devices.size > 1:
            self._train_step = shard_step(
                train_step, self.mesh, n_batch_args=2, n_replicated_args=1,
                donate_state=True,
            )
            self._eval_step = shard_step(
                eval_step, self.mesh, n_batch_args=2, donate_state=False,
            )
        else:
            self._train_step = jax.jit(train_step, donate_argnums=(0,))
            self._eval_step = jax.jit(eval_step)

    def _put(self, imgs, poses):
        batch = (imgs, poses)
        if self.process_count > 1:
            # local numpy shard -> globally-sharded jax.Array over DCN mesh
            return make_global_batch(batch, self.mesh)
        batch = tuple(jax.numpy.asarray(x) for x in batch)
        if self.mesh is not None and self.mesh.devices.size > 1:
            batch = shard_batch(batch, self.mesh)
        return batch

    def _put_scan(self, idx_k, poses_k):
        """Place (K, B, ...) launch-fusion stacks: batch axis 1 shards over
        'data'; multi-host assembles each process's local stack into the
        global array (axis 1 = process-concatenated local batches)."""
        if self.process_count > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            sh = NamedSharding(self.mesh, PartitionSpec(None, "data"))
            return tuple(
                jax.make_array_from_process_local_data(sh, x)
                for x in (idx_k, poses_k)
            )
        return jax.numpy.asarray(idx_k), jax.numpy.asarray(poses_k)

    def _finalize_device_cache(self) -> None:
        """End of the warmup epoch: upload the staged frames, switch the
        loop onto the index-gather steps (ingest_overlap). Multi-source
        recorders concatenate in ``frame_sources`` order (the index space
        the composite's ``get_indices`` rows encode); multi-host recorders
        hold only this process's shard, so the finalize feeds the
        collective uploads straight from staging via ``as_source()``."""
        nw = self.config.num_workers
        pre_staged = sum(int(r.seen.sum()) for r in self._recorders)
        n_total = sum(r.n for r in self._recorders)
        if self.process_count > 1:
            # each process staged only its shard range; the callback-driven
            # collective uploads request exactly those frames from staging
            # (out-of-range stragglers delegate to the original dataset)
            from ..data.device_cache import (
                _ConcatFrames, upload_frames_global, upload_frames_sharded,
            )

            staged = [r.as_source(num_workers=nw) for r in self._recorders]
            if self._cache_sharded:
                combined = (_ConcatFrames(staged) if len(staged) > 1
                            else staged[0])
                buf = upload_frames_sharded(combined, self.mesh,
                                            num_workers=nw)
            else:
                bufs = [upload_frames_global(s, self.mesh, num_workers=nw)
                        for s in staged]
                buf = (jax.numpy.concatenate(bufs, axis=0)
                       if len(bufs) > 1 else bufs[0])
        else:
            stacks = [r.finalize(num_workers=nw) for r in self._recorders]
            staging = (np.concatenate(stacks, axis=0) if len(stacks) > 1
                       else stacks[0])
            if self._cache_sharded:
                # staged frames go straight to the frame-axis-sharded
                # layout (pad rows repeat the last frame; never indexed)
                from jax.sharding import NamedSharding, PartitionSpec

                d = int(self.mesh.shape["data"])
                n = staging.shape[0]
                n_pad = -(-n // d) * d
                if n_pad != n:
                    staging = np.concatenate(
                        [staging,
                         np.repeat(staging[-1:], n_pad - n, axis=0)])
                buf = jax.device_put(
                    staging, NamedSharding(self.mesh, PartitionSpec("data")))
            else:
                buf = jax.numpy.asarray(staging)
                if self.mesh is not None and self.mesh.devices.size > 1:
                    buf = jax.device_put(buf, replicated(self.mesh))
        self._train_frames = buf
        if self._val_shares_train:
            self._val_frames = buf
        self._warmup_pending = False
        self._recorders = []
        # keep epochs 2+ on the same shuffle sequence a no-warmup run would
        # draw: the warmup loader consumed one epoch's permutation, so the
        # index loader's rng advances by exactly one epoch too
        if self.config.shuffle:
            self.train_loader.rng.shuffle(
                np.arange(len(self.train_loader.dataset)))
        print(f"device cache finalized from warmup epoch: "
              f"{pre_staged}/{n_total} frames staged in-epoch")

    def validate(self, epoch: int) -> float:
        # losses accumulate on device; a single readback at the end keeps the
        # launch queue full (a float() per batch is one host sync per batch)
        losses, weights, pads = [], [], []
        batch_time = AverageMeter()
        end = time.time()
        if self._warmup_pending and self._val_frames is None:
            # warmup epoch with a val split sharing the train frames: the
            # cache isn't built yet — validate through the image loader
            val_loader, eval_scan, eval_step = (
                self._warmup_val_loader, None, self._img_eval_step)
        else:
            val_loader, eval_scan, eval_step = (
                self.val_loader, self._eval_scan, self._eval_step)
        if eval_scan is not None:
            # launch fusion (see steps_per_launch): K val batches per scan
            # launch; the whole chunk's losses come back as one (K,) array
            K = self.steps_per_launch
            n_val = len(val_loader)
            base = 0
            for chunk in chunked(val_loader, K):
                if len(chunk) == K:
                    k_losses = eval_scan(
                        self.state,
                        *self._put_scan(np.stack([c[0] for c in chunk]),
                                        np.stack([c[1] for c in chunk])))
                    chunk_losses = list(k_losses)
                else:  # epoch tail: per-batch launches
                    chunk_losses = []
                    for idx, poses, _pad in chunk:
                        idx, poses = self._put(idx, poses)
                        loss, _ = eval_step(self.state, idx, poses)
                        chunk_losses.append(loss)
                batch_time.update(time.time() - end)
                for j, (idx, _poses, pad) in enumerate(chunk):
                    losses.append(chunk_losses[j])
                    weights.append(len(idx) - pad * self.process_count)
                    pads.append(pad)
                    if (base + j) % self.config.print_freq == 0:
                        print(
                            f"Val {self.experiment}: Epoch {epoch}\t"
                            f"Batch {base + j}/{n_val - 1}\t"
                            f"Batch time {batch_time.val:.4f} "
                            f"({batch_time.avg:.4f})\t"
                            f"Loss {float(chunk_losses[j]):f}"
                        )
                base += len(chunk)
                end = time.time()
        else:
            for batch_idx, (imgs, poses, pad) in enumerate(val_loader):
                imgs, poses = self._put(imgs, poses)
                loss, _ = eval_step(self.state, imgs, poses)
                losses.append(loss)
                # imgs is the GLOBAL batch after _put; every process pads
                # its local tail identically (same local length + batch
                # size), so global valid count = global rows - local pad *
                # process_count (the identical-pad invariant is checked
                # after the loop)
                weights.append(imgs.shape[0] - pad * self.process_count)
                pads.append(pad)
                batch_time.update(time.time() - end)
                end = time.time()
                if batch_idx % self.config.print_freq == 0:
                    print(
                        f"Val {self.experiment}: Epoch {epoch}\t"
                        f"Batch {batch_idx}/{len(val_loader) - 1}\t"
                        f"Batch time {batch_time.val:.4f} "
                        f"({batch_time.avg:.4f})\t"
                        f"Loss {float(loss):f}"
                    )
        if self.process_count > 1:
            # one collective per validation: the weighted average above is
            # only correct if every process padded every batch identically
            from ..parallel.multihost import assert_same_across_processes

            assert_same_across_processes(pads, "per-batch val pad counts")
        w = np.asarray(weights, np.float64)
        val_loss = float(np.dot(np.asarray(losses, np.float64), w) / w.sum())
        print(f"Val {self.experiment}: Epoch {epoch}, val_loss {val_loss:f}")
        self.metrics.write(kind="val", epoch=epoch,
                           step=int(self.state.step), loss=val_loss)
        return val_loss

    def train_val(self) -> None:
        """Run the full schedule (validation / snapshot / train epochs)."""
        cfg = self.config
        for epoch in range(self.start_epoch, cfg.n_epochs):
            if self.val_loader is not None and (
                epoch % cfg.val_freq == 0 or epoch == cfg.n_epochs - 1
            ):
                self.validate(epoch)

            if epoch % cfg.snapshot == 0:
                save_checkpoint(self.logdir, epoch, self.state)
                print(f"Epoch {epoch} checkpoint saved for {self.experiment}")

            data_time = AverageMeter()
            batch_time = AverageMeter()
            end = time.time()
            tracing = False
            if self.profile_dir and epoch == self.start_epoch:
                jax.profiler.start_trace(self.profile_dir)
                tracing = True
            # warmup epoch (ingest_overlap): train from the image loader
            # while the FrameRecorder stages frames; the cache finalizes
            # after this epoch and later epochs run the index-gather steps
            warmup_now = self._warmup_pending
            train_loader = (self._warmup_loader if warmup_now
                            else self.train_loader)
            train_step = (self._img_train_step if warmup_now
                          else self._train_step)
            train_scan = None if warmup_now else self._train_scan
            n_batches = len(train_loader)
            # per-batch optimizer step, tracked on host: one sync here (epoch
            # start) instead of per print point; under launch fusion the
            # device state only reflects post-LAUNCH steps, so per-batch
            # step/lr attribution must come from this counter
            host_step = int(self.state.step)

            def emit(batch_idx, loss, step):
                # loss readback only at print points — syncing every
                # batch stalls the dispatch pipeline on the host RTT
                loss = float(loss)
                # criterion params (beta/gamma) read from the live state:
                # exact per batch without fusion, sampled at launch
                # granularity with steps_per_launch>1
                cparams = {
                    k: float(v)
                    for k, v in self.state.params["criterion"].items()
                }
                lr = float(self._lr_schedule(step))
                print(
                    f"Train {self.experiment}: Epoch {epoch}\t"
                    f"Batch {batch_idx}/{n_batches - 1}\t"
                    f"Data Time {data_time.val:.4f} ({data_time.avg:.4f})\t"
                    f"Batch Time {batch_time.val:.4f} ({batch_time.avg:.4f})\t"
                    f"Loss {loss:f}\t"
                    f"lr: {lr:f}"
                )
                self.metrics.write(
                    kind="train", step=step, epoch=epoch,
                    batch=batch_idx, loss=loss, lr=lr,
                    data_time=data_time.avg,
                    batch_time=batch_time.avg, **cparams,
                )

            if train_scan is not None:
                # K steps per launch (see steps_per_launch): stack K index
                # batches, run the scanned step, get all K losses back as
                # one device array. Timing meters are per-LAUNCH here.
                K = self.steps_per_launch
                base = 0
                for chunk in chunked(train_loader, K):
                    data_time.update(time.time() - end)
                    if len(chunk) == K:
                        idx_k, poses_k = self._put_scan(
                            np.stack([c[0] for c in chunk]),
                            np.stack([c[1] for c in chunk]))
                        self.state, losses = train_scan(
                            self.state, idx_k, poses_k, self.rng)
                    else:
                        # epoch tail shorter than K: per-step launches
                        # (one scan compile per tail length isn't worth it)
                        losses = []
                        for idx, poses, _ in chunk:
                            idx, poses = self._put(idx, poses)
                            self.state, l = train_step(
                                self.state, idx, poses, self.rng)
                            losses.append(l)
                    if tracing:
                        # force the launch to EXECUTE before closing the
                        # trace — dispatch is async and an unforced
                        # stop_trace records host activity only
                        float(losses[-1])
                        jax.profiler.stop_trace()
                        tracing = False
                        print(f"Profiler trace written to {self.profile_dir}")
                    batch_time.update(time.time() - end)
                    for j in range(len(chunk)):
                        if (base + j) % cfg.print_freq == 0:
                            emit(base + j, losses[j], host_step + j + 1)
                    host_step += len(chunk)
                    base += len(chunk)
                    end = time.time()
            else:
                for batch_idx, (imgs, poses, _) in enumerate(train_loader):
                    data_time.update(time.time() - end)
                    if tracing and batch_idx == 10:
                        jax.profiler.stop_trace()
                        tracing = False
                        print(f"Profiler trace written to {self.profile_dir}")
                    imgs, poses = self._put(imgs, poses)
                    self.state, loss = train_step(
                        self.state, imgs, poses, self.rng
                    )
                    host_step += 1
                    batch_time.update(time.time() - end)
                    if batch_idx % cfg.print_freq == 0:
                        emit(batch_idx, loss, host_step)
                    end = time.time()
            if tracing:
                jax.profiler.stop_trace()
            if warmup_now:
                self._finalize_device_cache()

        save_checkpoint(self.logdir, cfg.n_epochs, self.state)
        print(f"Epoch {cfg.n_epochs} checkpoint saved")
        if self.tee is not None:
            self.tee.uninstall()
