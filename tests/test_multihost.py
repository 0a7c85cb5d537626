"""Multi-host helpers (single-process semantics) + metrics writer options.

True multi-process DCN runs need a pod; here we verify the single-process
degenerate path is exact (make_global_batch == shard_batch placement) and the
per-process loader slicing composes to the global order, which is the
contract the multi-host batch assembly relies on.
"""

import json
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from geomapnet_tpu.data import Loader
from geomapnet_tpu.parallel import (
    initialize_distributed,
    local_batch_size,
    make_global_batch,
    make_mesh,
    shard_batch,
)
from geomapnet_tpu.utils.logger import MetricsWriter


class _Range:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((2, 3), i, np.float32), np.full((6,), i, np.float32)


def test_initialize_distributed_single_process():
    idx, count = initialize_distributed()
    assert (idx, count) == (0, 1)


def test_local_batch_size():
    assert local_batch_size(16) == 16  # single process


def test_make_global_batch_matches_shard_batch():
    mesh = make_mesh()
    imgs = np.arange(8 * 2 * 3, dtype=np.float32).reshape(8, 2, 3)
    poses = np.arange(8 * 6, dtype=np.float32).reshape(8, 6)
    g = make_global_batch((imgs, poses), mesh)
    s = shard_batch((jnp.asarray(imgs), jnp.asarray(poses)), mesh)
    for a, b in zip(g, s):
        assert a.sharding == b.sharding
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_process_sharded_loaders_compose_to_global_batch():
    """Concatenating every process's local batch = the global batch."""
    n, bs, count = 24, 8, 4
    ds = _Range(n)
    global_loader = Loader(ds, bs, shuffle=True, seed=3)
    locals_ = [
        Loader(ds, bs // count, shuffle=True, seed=3,
               process_index=p, process_count=count)
        for p in range(count)
    ]
    for global_b, *local_bs_ in zip(
        global_loader, *locals_
    ):
        # same seeded permutation: process p holds order[p::count], so the
        # interleave of local batches is a permutation of the global batch
        g = set(global_b[0][:, 0, 0].tolist())
        l = set(
            np.concatenate([lb[0] for lb in local_bs_])[:, 0, 0].tolist()
        )
        assert g == l


def test_process_loaders_equal_batch_counts_with_ragged_dataset():
    """Indivisible dataset sizes must still give every process the SAME
    number of batches (unequal counts deadlock collectives at epoch end)."""
    for n in (13, 15, 17):
        for drop_last in (True, False):
            lens = {
                len(Loader(_Range(n), 7, drop_last=drop_last,
                           process_index=p, process_count=2))
                for p in range(2)
            }
            assert len(lens) == 1, (n, drop_last, lens)
            # iteration agrees with __len__
            for p in range(2):
                ldr = Loader(_Range(n), 7, drop_last=drop_last,
                             process_index=p, process_count=2)
                assert sum(1 for _ in ldr) == len(ldr)


def test_metrics_writer_disabled(tmp_path):
    w = MetricsWriter(tmp_path / "m.jsonl", enabled=False)
    w.write(kind="train", loss=1.0)
    w.close()
    assert not (tmp_path / "m.jsonl").exists()


@pytest.mark.slow
def test_metrics_writer_tensorboard(tmp_path):
    import pytest

    pytest.importorskip("tensorboard")
    w = MetricsWriter(tmp_path / "m.jsonl", tensorboard=True)
    w.write(kind="train", step=1, loss=0.5, lr=1e-4)
    w.write(kind="val", epoch=0, loss=0.4)
    w.close()
    lines = [json.loads(x) for x in open(tmp_path / "m.jsonl")]
    assert lines[0]["loss"] == 0.5
    events = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > 0


def test_two_process_global_batch(tmp_path):
    """Real jax.distributed (2 local CPU processes): per-process loader
    shards assemble into one globally-sharded array with the right values."""
    import socket
    import subprocess
    import sys
    import textwrap

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "probe.py"
    script.write_text(textwrap.dedent(f"""
        import os, sys
        proc_id = int(sys.argv[1])
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        import jax
        jax.config.update("jax_platforms", "cpu")
        import numpy as np, jax.numpy as jnp
        sys.path.insert(0, {str(Path.cwd())!r})
        from geomapnet_tpu.parallel import (
            initialize_distributed, make_mesh, make_global_batch)
        # through the production helper (must precede other JAX calls)
        idx, count = initialize_distributed(
            coordinator_address="localhost:{port}",
            num_processes=2, process_id=proc_id)
        assert (idx, count) == (proc_id, 2), (idx, count)
        mesh = make_mesh()
        assert jax.process_count() == 2
        local = np.full((4, 3), float(proc_id), np.float32)
        g = make_global_batch(local, mesh)
        assert g.shape == (8, 3), g.shape
        assert float(jnp.sum(g)) == 12.0
        print("OK", proc_id)
    """))
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=120)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"OK {i}" in out


@pytest.mark.slow
def test_two_process_trainer_epoch(tmp_path):
    """Full Trainer epoch across 2 real processes: per-process loaders feed
    global batches; the sharded step all-reduces over the 2x2-device mesh;
    both processes converge on identical train state."""
    import socket
    import subprocess
    import sys
    import textwrap

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "trainer_probe.py"
    script.write_text(textwrap.dedent(f"""
        import os, sys
        proc_id = int(sys.argv[1])
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        import jax
        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, {str(Path.cwd())!r})
        from geomapnet_tpu.parallel import initialize_distributed
        initialize_distributed(coordinator_address="localhost:{port}",
                               num_processes=2, process_id=proc_id)
        import numpy as np, jax.numpy as jnp
        from geomapnet_tpu.cli.config import ExperimentConfig
        from geomapnet_tpu.data import MF, SyntheticScene
        from geomapnet_tpu.losses import MapNetCriterion
        from geomapnet_tpu.models import MapNet, PoseNet, resnet18
        from geomapnet_tpu.train.loop import Trainer

        model = MapNet(posenet=PoseNet(
            feature_extractor=resnet18(), feat_dim=16, droprate=0.0))
        criterion = MapNetCriterion(saq=-3.0, srq=-3.0)
        cfg = ExperimentConfig(n_epochs=1, batch_size=8, do_val=True, seed=7,
                               snapshot=50, val_freq=1, print_freq=1,
                               opt="adam", lr=1e-3)
        train_ds = MF(SyntheticScene(n_frames=18, height=16, width=24),
                      steps=2, skip=1)
        val_ds = MF(SyntheticScene(n_frames=9, height=16, width=24,
                                   train=False), steps=2, skip=1)
        t = Trainer(model, criterion, cfg, f"mh_{{proc_id}}", train_ds, val_ds,
                    logdir_root=sys.argv[2])
        assert t.process_count == 2
        assert t.train_loader.batch_size == 4  # local share of global 8
        t.train_val()
        w = np.asarray(jax.tree.leaves(t.state.params["model"])[0])
        np.save(sys.argv[2] + f"/w{{proc_id}}.npy", w)
        print("DONE", proc_id)
    """))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"DONE {i}" in out
    w0 = np.load(tmp_path / "w0.npy")
    w1 = np.load(tmp_path / "w1.npy")
    np.testing.assert_array_equal(w0, w1)  # replicas stayed in sync
    # rank-0-only logging
    assert (tmp_path / "mh_0" / "log.txt").exists()
    assert not (tmp_path / "mh_1" / "log.txt").exists()


@pytest.mark.slow
def test_two_process_device_cache_training(tmp_path):
    """--device_cache under real jax.distributed (VERDICT r3 item 4): each
    process decodes only its shard of the frames (upload_frames_global),
    one interconnect all-gather replicates the stack, and the scanned
    launch-fusion path (_put_scan) assembles global (K, B, ...) stacks.
    Both ranks must finish with identical replicas."""
    import socket
    import subprocess
    import sys
    import textwrap

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "dc_probe.py"
    script.write_text(textwrap.dedent(f"""
        import os, sys
        proc_id = int(sys.argv[1])
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        import jax
        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, {str(Path.cwd())!r})
        from geomapnet_tpu.parallel import initialize_distributed
        initialize_distributed(coordinator_address="localhost:{port}",
                               num_processes=2, process_id=proc_id)
        import numpy as np, jax.numpy as jnp
        from geomapnet_tpu.cli.config import ExperimentConfig
        from geomapnet_tpu.data import MF, SyntheticScene
        from geomapnet_tpu.losses import MapNetCriterion
        from geomapnet_tpu.models import MapNet, PoseNet, resnet18
        from geomapnet_tpu.train.loop import Trainer

        model = MapNet(posenet=PoseNet(
            feature_extractor=resnet18(), feat_dim=16, droprate=0.0))
        criterion = MapNetCriterion(saq=-3.0, srq=-3.0)
        cfg = ExperimentConfig(n_epochs=2, batch_size=8, do_val=True, seed=7,
                               snapshot=50, val_freq=1, print_freq=1,
                               opt="adam", lr=1e-3)
        train_ds = MF(SyntheticScene(n_frames=18, height=16, width=24),
                      steps=2, skip=1)
        val_ds = MF(SyntheticScene(n_frames=9, height=16, width=24,
                                   train=False), steps=2, skip=1)
        t = Trainer(model, criterion, cfg, f"dc_{{proc_id}}", train_ds, val_ds,
                    logdir_root=sys.argv[2], device_cache=True,
                    steps_per_launch=2)
        assert t.process_count == 2
        assert t.device_cache, "device_cache must NOT fall back multi-host"
        assert t._train_scan is not None  # launch fusion active
        # the frame buffer is a replicated GLOBAL array over all 4 devices
        assert t._train_frames.shape[0] == 18, t._train_frames.shape
        assert len(t._train_frames.sharding.device_set) == 4
        t.train_val()
        w = np.asarray(jax.tree.leaves(t.state.params["model"])[0])
        np.save(sys.argv[2] + f"/dcw{{proc_id}}.npy", w)
        print("DONE", proc_id)
    """))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"DONE {i}" in out
    w0 = np.load(tmp_path / "dcw0.npy")
    w1 = np.load(tmp_path / "dcw1.npy")
    np.testing.assert_array_equal(w0, w1)  # replicas stayed in sync


def test_upload_frames_global_single_process_matches_local():
    """upload_frames_global degrades to upload_frames' values (replicated)
    on a single process; frame-axis padding is sliced off."""
    from geomapnet_tpu.data import SyntheticScene
    from geomapnet_tpu.data.device_cache import (
        upload_frames,
        upload_frames_global,
    )

    ds = SyntheticScene(n_frames=11, height=8, width=12)  # 11 % 8 != 0
    mesh = make_mesh()
    g = upload_frames_global(ds, mesh)
    l = upload_frames(ds)
    assert g.shape == l.shape == (11, 8, 12, 3)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(l))
    # replicated over the mesh: every device holds the full stack
    assert len(g.sharding.device_set) == mesh.devices.size
    shard_shapes = {s.data.shape for s in g.addressable_shards}
    assert shard_shapes == {(11, 8, 12, 3)}


@pytest.mark.slow
def test_two_process_shared_logdir_checkpoint_and_resume(tmp_path):
    """Rank-0 checkpointing under real multi-process: both processes share
    ONE experiment logdir; only rank 0 writes (behind the all-rank barrier),
    and a restart restores the same state on both ranks and keeps training."""
    import socket
    import subprocess
    import sys
    import textwrap

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "ckpt_probe.py"
    script.write_text(textwrap.dedent(f"""
        import os, sys
        proc_id = int(sys.argv[1])
        phase = sys.argv[3]
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        import jax
        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, {str(Path.cwd())!r})
        from geomapnet_tpu.parallel import initialize_distributed
        initialize_distributed(coordinator_address="localhost:{port}",
                               num_processes=2, process_id=proc_id)
        import numpy as np
        from geomapnet_tpu.cli.config import ExperimentConfig
        from geomapnet_tpu.data import MF, SyntheticScene
        from geomapnet_tpu.losses import MapNetCriterion
        from geomapnet_tpu.models import MapNet, PoseNet, resnet18
        from geomapnet_tpu.train.loop import Trainer

        def build(checkpoint=None):
            model = MapNet(posenet=PoseNet(
                feature_extractor=resnet18(), feat_dim=16, droprate=0.0))
            cfg = ExperimentConfig(n_epochs=1, batch_size=8, do_val=False,
                                   seed=7, snapshot=1, val_freq=5,
                                   print_freq=1, opt="adam", lr=1e-3)
            ds = MF(SyntheticScene(n_frames=18, height=16, width=24),
                    steps=2, skip=1)
            return Trainer(model, MapNetCriterion(saq=-3.0, srq=-3.0), cfg,
                           "shared_exp", ds, None, logdir_root=sys.argv[2],
                           checkpoint=checkpoint, resume_optim=True)

        if phase == "train":
            t = build()
            t.train_val()
        else:
            ckpt = os.path.join(sys.argv[2], "shared_exp", "epoch_001")
            assert os.path.exists(ckpt), ckpt
            t = build(checkpoint=ckpt)
            w = np.asarray(jax.tree.leaves(t.state.params["model"])[0])
            np.save(sys.argv[2] + f"/resumed{{proc_id}}.npy", w)
            t.train_val()
        print("DONE", phase, proc_id)
    """))

    def run(phase):
        procs = [
            subprocess.Popen(
                [sys.executable, str(script), str(i), str(tmp_path), phase],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
            for i in range(2)
        ]
        outs = [p.communicate(timeout=900)[0] for p in procs]
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"{phase} proc {i} failed:\n{out[-3000:]}"
        return outs

    run("train")
    ckpts = sorted((tmp_path / "shared_exp").glob("epoch_*"))
    assert [c.name for c in ckpts] == ["epoch_000", "epoch_001"]

    run("resume")
    r0 = np.load(tmp_path / "resumed0.npy")
    r1 = np.load(tmp_path / "resumed1.npy")
    np.testing.assert_array_equal(r0, r1)  # both ranks restored identically


@pytest.mark.slow
def test_two_process_ingest_overlap_matches_serial(tmp_path):
    """--ingest_overlap under real jax.distributed (VERDICT r4 item 5):
    each process records only the frames backing ITS shard of the
    collective upload (local_shard_range), the warmup epoch trains from
    the sharded image loaders, and the finalize feeds upload_frames_global
    straight from staging — final weights must match the serial
    multi-host device-cache run, and both ranks must agree."""
    import socket
    import subprocess
    import sys
    import textwrap

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "io_probe.py"
    script.write_text(textwrap.dedent(f"""
        import os, sys
        proc_id = int(sys.argv[1])
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        import jax
        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, {str(Path.cwd())!r})
        from geomapnet_tpu.parallel import initialize_distributed
        initialize_distributed(coordinator_address="localhost:{port}",
                               num_processes=2, process_id=proc_id)
        import numpy as np
        from geomapnet_tpu.cli.config import ExperimentConfig
        from geomapnet_tpu.data import MF, SyntheticScene
        from geomapnet_tpu.losses import MapNetCriterion
        from geomapnet_tpu.models import MapNet, PoseNet, resnet18
        from geomapnet_tpu.train.loop import Trainer

        def build(name, root, **kw):
            model = MapNet(posenet=PoseNet(
                feature_extractor=resnet18(), feat_dim=16, droprate=0.0))
            criterion = MapNetCriterion(saq=-3.0, srq=-3.0)
            cfg = ExperimentConfig(n_epochs=2, batch_size=8, do_val=False,
                                   seed=7, snapshot=50, val_freq=5,
                                   print_freq=1, opt="adam", lr=1e-3)
            ds = MF(SyntheticScene(n_frames=18, height=16, width=24),
                    steps=2, skip=1)
            return Trainer(model, criterion, cfg, name, ds, None,
                           logdir_root=root, device_cache=True, **kw)

        t_serial = build("ios", sys.argv[2] + "/s")
        t_serial.train_val()
        ws = np.asarray(jax.tree.leaves(t_serial.state.params["model"])[0])

        t_warm = build("iow", sys.argv[2] + "/w", ingest_overlap=True)
        assert t_warm._warmup_pending
        recs = t_warm._recorders
        assert len(recs) == 1
        # each process stages only its shard range of the 4-device upload
        n_range = recs[0].hi - recs[0].lo
        assert n_range < recs[0].n, (recs[0].lo, recs[0].hi, recs[0].n)
        t_warm.train_val()
        assert not t_warm._warmup_pending
        # finalized buffer is the replicated global stack
        assert t_warm._train_frames.shape[0] == 18
        assert len(t_warm._train_frames.sharding.device_set) == 4
        ww = np.asarray(jax.tree.leaves(t_warm.state.params["model"])[0])
        np.testing.assert_allclose(ws, ww, rtol=0, atol=1e-6)
        np.save(sys.argv[2] + f"/iow{{proc_id}}.npy", ww)
        print("DONE", proc_id)
    """))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"DONE {i}" in out
    w0 = np.load(tmp_path / "iow0.npy")
    w1 = np.load(tmp_path / "iow1.npy")
    np.testing.assert_array_equal(w0, w1)  # replicas stayed in sync
