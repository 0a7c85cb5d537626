"""Pipeline parallelism: GPipe schedule over a 'stage' mesh axis.

Exactness bar: pipelined execution must reproduce sequential composition
(see test_tensor_parallel.py for the sibling tp/sp strategies).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geomapnet_tpu.parallel import make_mesh
from geomapnet_tpu.parallel.pipeline import (
    pack_stage_params,
    pipeline_apply,
    shard_stage_params,
    stage_shapes,
    unpack_stage_params,
)


def _mlp_stages(key, dims=(12, 32, 20, 8, 5)):
    """A chain of dense+tanh stages with DIFFERENT activation shapes."""
    keys = jax.random.split(key, len(dims) - 1)
    stages = []
    for k, din, dout in zip(keys, dims[:-1], dims[1:]):
        w = jax.random.normal(k, (din, dout)) / np.sqrt(din)

        def stage(a, w=w):
            return jnp.tanh(a @ w)

        stages.append(stage)
    return stages


class TestPipeline:
    def test_matches_sequential(self):
        stages = _mlp_stages(jax.random.PRNGKey(0))
        mesh = make_mesh(jax.devices()[:4], ("stage",), (4,))
        x = jax.random.normal(jax.random.PRNGKey(1), (12, 12))

        ref = x
        for f in stages:
            ref = f(ref)

        for n_micro in (1, 3, 6, 12):
            got = pipeline_apply(stages, mesh, x, n_microbatches=n_micro)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-6, err_msg=f"M={n_micro}")

    def test_single_stage_degenerates(self):
        stages = _mlp_stages(jax.random.PRNGKey(0), dims=(6, 4))
        mesh = make_mesh(jax.devices()[:1], ("stage",), (1,))
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 6))
        got = pipeline_apply(stages, mesh, x, n_microbatches=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(stages[0](x)),
                                   atol=1e-6)

    def test_validation_errors(self):
        stages = _mlp_stages(jax.random.PRNGKey(0), dims=(6, 4, 3))
        mesh = make_mesh(jax.devices()[:4], ("stage",), (4,))
        with pytest.raises(ValueError, match="stage functions"):
            pipeline_apply(stages, mesh, jnp.zeros((4, 6)), 2)
        mesh2 = make_mesh(jax.devices()[:2], ("stage",), (2,))
        with pytest.raises(ValueError, match="not divisible"):
            pipeline_apply(stages, mesh2, jnp.zeros((5, 6)), 2)

    def test_stage_shapes(self):
        stages = _mlp_stages(jax.random.PRNGKey(0), dims=(6, 4, 3))
        shapes = stage_shapes(
            stages, jax.ShapeDtypeStruct((2, 6), jnp.float32)
        )
        assert [s.shape for _, s in shapes] == [(2, 4), (2, 3)]

    @pytest.mark.slow
    def test_posenet_trunk_head_split(self):
        """A REAL model split: stage 0 = ResNet trunk, stage 1 = pose head.

        The head stage reproduces PoseNet's eval-time head from its params
        (fc_feat -> relu -> fc_xyz/fc_wpqr concat; dropout is identity in
        deterministic eval) so the pipelined output must equal the full
        module's apply.
        """
        from geomapnet_tpu.models import PoseNet, resnet18

        trunk = resnet18()
        model = PoseNet(feature_extractor=trunk, feat_dim=16, droprate=0.5)
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 32, 32, 3))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        ref = model.apply(variables, x, train=False)

        tvars = {
            "params": variables["params"]["feature_extractor"],
            "batch_stats": variables["batch_stats"]["feature_extractor"],
        }
        head = variables["params"]

        from geomapnet_tpu.models import posenet_head_apply

        def stage_trunk(a):
            return trunk.apply(tvars, a, train=False)

        def stage_head(feats):
            return posenet_head_apply(head, feats)

        mesh = make_mesh(jax.devices()[:2], ("stage",), (2,))
        got = pipeline_apply([stage_trunk, stage_head], mesh, x,
                             n_microbatches=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


class TestPipelineTraining:
    @pytest.mark.slow
    def test_grads_flow_through_pipeline(self):
        """PP is trainable: jax.grad differentiates through the schedule
        (lax.ppermute transposes to the inverted permutation), matching
        sequential-execution gradients."""
        mesh = make_mesh(jax.devices()[:3], ("stage",), (3,))
        dims = (10, 8, 6, 4)
        keys = jax.random.split(jax.random.PRNGKey(0), len(dims) - 1)
        params = [
            jax.random.normal(k, (din, dout)) / np.sqrt(din)
            for k, din, dout in zip(keys, dims[:-1], dims[1:])
        ]
        x = jax.random.normal(jax.random.PRNGKey(1), (6, 10))
        targ = jax.random.normal(jax.random.PRNGKey(2), (6, 4))

        # params must be EXPLICIT pipeline operands to differentiate —
        # closure-captured weights become shard_map constants whose
        # cotangents are not accumulated across devices
        fns = [lambda w, a: jnp.tanh(a @ w)] * len(params)

        def loss_pp(ws):
            out = pipeline_apply(fns, mesh, x, n_microbatches=3,
                                 stage_params=ws)
            return jnp.mean((out - targ) ** 2)

        def loss_seq(ws):
            a = x
            for f, w in zip(fns, ws):
                a = f(w, a)
            return jnp.mean((a - targ) ** 2)

        l_pp, g_pp = jax.value_and_grad(loss_pp)(params)
        l_seq, g_seq = jax.value_and_grad(loss_seq)(params)
        np.testing.assert_allclose(float(l_pp), float(l_seq), rtol=1e-6)
        for a, b in zip(g_pp, g_seq):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


def _stage_weights(key, dims=(10, 8, 6, 4)):
    keys = jax.random.split(key, len(dims) - 1)
    return [
        jax.random.normal(k, (din, dout)) / np.sqrt(din)
        for k, din, dout in zip(keys, dims[:-1], dims[1:])
    ]


class TestPackedStageParams:
    """Weight-memory sharding: per-stage params live only on their stage."""

    def test_pack_unpack_roundtrip(self):
        params = [
            {"w": jnp.arange(6.0).reshape(2, 3),
             "b": jnp.ones((3,), jnp.bfloat16)},
            {"w": jnp.full((4, 1), 2.0)},
        ]
        buf, meta = pack_stage_params(params)
        assert buf.shape == (2, 9)  # max(6+3, 4) = 9
        out = unpack_stage_params(buf, meta)
        for p, q in zip(params, out):
            assert jax.tree.map(lambda a: a.dtype, p) == \
                jax.tree.map(lambda a: a.dtype, q)
            for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(q)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_forward_matches_sequential(self):
        mesh = make_mesh(jax.devices()[:3], ("stage",), (3,))
        params = _stage_weights(jax.random.PRNGKey(0))
        fns = [lambda w, a: jnp.tanh(a @ w)] * len(params)
        x = jax.random.normal(jax.random.PRNGKey(1), (6, 10))
        ref = x
        for f, w in zip(fns, params):
            ref = f(w, ref)
        buf, meta = shard_stage_params(params, mesh)
        got = pipeline_apply(fns, mesh, x, n_microbatches=3,
                             packed_params=buf, params_meta=meta)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)

    def test_weight_memory_is_sharded(self):
        """Per-device param bytes ~ 1/S: each device holds exactly one row."""
        mesh = make_mesh(jax.devices()[:4], ("stage",), (4,))
        params = _stage_weights(jax.random.PRNGKey(0), dims=(16, 16, 16, 16, 16))
        buf, meta = shard_stage_params(params, mesh)
        assert buf.shape == (4, 256)
        for shard in buf.addressable_shards:
            assert shard.data.shape == (1, 256)  # 1/S of the buffer
        # rows land on distinct devices
        devs = {s.device for s in buf.addressable_shards}
        assert len(devs) == 4

    def test_grads_match_sequential(self):
        """Training on the packed buffer: d(loss)/d(buf) equals the packed
        sequential gradients — PP training with 1/S weight memory."""
        mesh = make_mesh(jax.devices()[:3], ("stage",), (3,))
        params = _stage_weights(jax.random.PRNGKey(0))
        fns = [lambda w, a: jnp.tanh(a @ w)] * len(params)
        x = jax.random.normal(jax.random.PRNGKey(1), (6, 10))
        targ = jax.random.normal(jax.random.PRNGKey(2), (6, 4))
        buf, meta = shard_stage_params(params, mesh)

        def loss_pp(b):
            out = pipeline_apply(fns, mesh, x, n_microbatches=3,
                                 packed_params=b, params_meta=meta)
            return jnp.mean((out - targ) ** 2)

        def loss_seq(ws):
            a = x
            for f, w in zip(fns, ws):
                a = f(w, a)
            return jnp.mean((a - targ) ** 2)

        l_pp, g_pp = jax.value_and_grad(loss_pp)(buf)
        l_seq, g_seq = jax.value_and_grad(loss_seq)(params)
        g_seq_packed, _ = pack_stage_params(g_seq)
        np.testing.assert_allclose(float(l_pp), float(l_seq), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g_pp),
                                   np.asarray(g_seq_packed), atol=1e-6)
        # the gradient buffer inherits the 1/S sharding
        assert all(s.data.shape[0] == 1 for s in g_pp.addressable_shards)

    def test_validation(self):
        mesh = make_mesh(jax.devices()[:2], ("stage",), (2,))
        fns = [lambda w, a: a + w] * 2
        buf, meta = pack_stage_params([jnp.zeros(()), jnp.zeros(())])
        with pytest.raises(ValueError, match="params_meta"):
            pipeline_apply(fns, mesh, jnp.zeros((2, 3)), 1,
                           packed_params=buf)
        with pytest.raises(ValueError, match="not both"):
            pipeline_apply(fns, mesh, jnp.zeros((2, 3)), 1,
                           packed_params=buf, params_meta=meta,
                           stage_params=[jnp.zeros(())] * 2)


class TestDataPipelineMesh:
    """dp x pp on a 2-D ('data', 'stage') mesh."""

    @pytest.mark.slow
    def test_forward_and_grads_match_sequential(self):
        mesh = make_mesh(jax.devices()[:8], ("data", "stage"), (2, 4))
        params = _stage_weights(jax.random.PRNGKey(0), dims=(10, 8, 6, 4, 5))
        fns = [lambda w, a: jnp.tanh(a @ w)] * len(params)
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 10))
        targ = jax.random.normal(jax.random.PRNGKey(2), (8, 5))
        buf, meta = shard_stage_params(params, mesh)

        def loss_pp(b, xb):
            out = pipeline_apply(fns, mesh, xb, n_microbatches=2,
                                 packed_params=b, params_meta=meta,
                                 data_axis="data")
            return jnp.mean((out - targ) ** 2)

        def loss_seq(ws, xb):
            a = xb
            for f, w in zip(fns, ws):
                a = f(w, a)
            return jnp.mean((a - targ) ** 2)

        (l_pp, g_pp) = jax.value_and_grad(loss_pp)(buf, x)
        (l_seq, g_seq) = jax.value_and_grad(loss_seq)(params, x)
        g_seq_packed, _ = pack_stage_params(g_seq)
        np.testing.assert_allclose(float(l_pp), float(l_seq), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g_pp),
                                   np.asarray(g_seq_packed), atol=1e-6)

    def test_micro_not_divisible_by_data_axis(self):
        mesh = make_mesh(jax.devices()[:8], ("data", "stage"), (2, 4))
        fns = [lambda a: a] * 4
        with pytest.raises(ValueError, match="data axis"):
            pipeline_apply(fns, mesh, jnp.zeros((6, 4)), 2,
                           data_axis="data")


class TestPipelineEdges:
    def test_bf16_and_uint8_transport_roundtrip(self):
        """Stage boundaries travel in an f32 buffer: uint8 transport is
        bit-exact; bf16 agrees within bf16 resolution (XLA may hold bf16
        intermediates at f32 precision inside the compiled pipeline, while
        the eager reference rounds at each op — a compiler semantic, not a
        transport loss)."""
        mesh = make_mesh(jax.devices()[:2], ("stage",), (2,))
        x = jnp.asarray(
            np.random.RandomState(0).randint(0, 250, (4, 8)), jnp.uint8
        )

        def stage_u8(a):  # uint8 -> uint8 (exactness probe)
            return a + 1

        def stage_f32(a):
            return a.astype(jnp.float32) / 255.0

        got = pipeline_apply([stage_u8, stage_f32], mesh, x, n_microbatches=2)
        # atol ~ f32 ULP: XLA may compile /255 as *(1/255) in one program
        # and not the other; a transport bug would be off by >= 1/255
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(stage_f32(stage_u8(x))), atol=1e-6
        )

        def stage_bf16(a):  # uint8 -> bf16
            return (a.astype(jnp.bfloat16) / 255.0) * 2 - 1

        def stage_sq(a):
            return (a * a).astype(jnp.float32)

        got = pipeline_apply([stage_bf16, stage_sq], mesh, x,
                             n_microbatches=2)
        ref = stage_sq(stage_bf16(x))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1 / 64)

    def test_stage_params_length_mismatch(self):
        mesh = make_mesh(jax.devices()[:2], ("stage",), (2,))
        fns = [lambda w, a: a + w] * 2
        with pytest.raises(ValueError, match="stage_params"):
            pipeline_apply(fns, mesh, jnp.zeros((2, 3)), 1,
                           stage_params=[jnp.zeros(())])
