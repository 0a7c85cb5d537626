"""Driver entry points (__graft_entry__.py) are runnable off-TPU.

The driver compile-checks ``entry()`` single-chip and runs
``dryrun_multichip(8)``; these tests keep both paths working in CI on the
virtual CPU mesh: entry() is shape-checked via eval_shape (full ResNet-34
compile is minutes on one CPU core), the dry run executes a real sharded
train step on a 4-device sub-mesh.
"""

import pathlib
import sys

import jax
import pytest
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft

pytestmark = pytest.mark.slow  # full-workflow module; see docs/TESTING.md fast lane


def test_entry_traces_and_shapes():
    fn, args = graft.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (2, 3, 6)
    # pose heads compute in f32 for numerical stability of the log-q head
    assert out.dtype == jnp.float32


def test_dryrun_multichip_on_available_devices(capsys):
    # 4 <= the suite's 8 virtual devices: runs in-process (no re-exec)
    graft.dryrun_multichip(4)
    out = capsys.readouterr().out
    assert "dryrun_multichip(4): dp ok" in out
    assert "dryrun_multichip(4): dp2xtp2 ok" in out
    assert "dryrun_multichip(4): spatial eval ok" in out
    assert "dryrun_multichip(4): pp2 ok" in out


def test_reexec_env_construction(monkeypatch):
    """The re-exec path must pin JAX_PLATFORMS=cpu and the device-count flag
    before any jax import in the child."""
    captured = {}

    def fake_run(cmd, env=None, check=None):
        captured["cmd"], captured["env"] = cmd, env

        class R:
            returncode = 0

        return R()

    monkeypatch.setattr(graft.subprocess, "run", fake_run)
    graft._reexec_on_virtual_mesh(16)
    env = captured["env"]
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "--xla_force_host_platform_device_count=16" in env["XLA_FLAGS"]
    assert env["_GEOMAPNET_DRYRUN_CHILD"] == "1"
    assert "dryrun_multichip(16)" in captured["cmd"][-1]
