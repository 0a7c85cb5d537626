"""int8 post-training quantization for PoseNet/MapNet inference.

TPU MXUs run int8 matmuls at twice the bf16 rate (measured 1.43x on a
representative 3x3 conv on this chip — PERF.md round 2), and camera
localization inference is conv-bound, so a quantized serving path is the
single biggest single-chip throughput lever left after bf16 + batch tuning.
The reference has no equivalent (pure float32 torch); this is a
beyond-parity capability.

Scheme (standard, robust PTQ):

- **Weights**: symmetric per-output-channel int8; each conv kernel is folded
  with its BatchNorm first (inference BN is an affine ``a*z + b`` per
  channel), so the conv's int32 accumulator is rescaled once by
  ``m = a * w_scale * x_scale`` and shifted by ``b``.
- **Activations**: symmetric per-tensor int8 with a DYNAMIC scale
  (``max|x| / 127`` computed in-graph per batch). No calibration data needed,
  no accuracy cliff from stale static ranges; the extra reduction is noise
  next to the conv.
- Residual adds, relu, pooling and the tiny pose heads stay in ``compute
  dtype`` (bf16) — only the conv MACs run int8.

Everything here is pure-functional: :func:`quantize_posenet_variables`
prepares a pytree offline, :func:`posenet_apply_int8` /
:func:`mapnet_apply_int8` are jittable forwards over it.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "quantize_posenet_variables",
    "posenet_apply_int8",
    "mapnet_apply_int8",
]

_BN_EPS = 1e-5  # matches models/resnet.py


def _fold_conv_bn(kernel: np.ndarray, bn_params: Mapping, bn_stats: Mapping,
                  ) -> dict:
    """Quantize one conv kernel with its BatchNorm folded in.

    kernel: (H, W, I, O) float; BN affine a*z + b computed from
    scale/bias/mean/var. Returns {qkernel int8, m (O,) f32, b (O,) f32} with
    ``conv_int32 * (m * x_scale) + b`` reproducing BN(conv(x)).
    """
    kernel = np.asarray(kernel, np.float32)
    a = np.asarray(bn_params["scale"], np.float32) / np.sqrt(
        np.asarray(bn_stats["var"], np.float32) + _BN_EPS
    )
    b = np.asarray(bn_params["bias"], np.float32) - np.asarray(
        bn_stats["mean"], np.float32
    ) * a

    w_absmax = np.max(np.abs(kernel), axis=(0, 1, 2))  # per out channel
    w_scale = np.maximum(w_absmax, 1e-12) / 127.0
    qkernel = np.clip(np.round(kernel / w_scale), -127, 127).astype(np.int8)
    return {
        "qkernel": qkernel,
        "m": (a * w_scale).astype(np.float32),
        "b": b.astype(np.float32),
    }


def _quant_block(params: Mapping, stats: Mapping) -> dict:
    out = {
        "conv1": _fold_conv_bn(params["conv1"]["kernel"], params["bn1"],
                               stats["bn1"]),
        "conv2": _fold_conv_bn(params["conv2"]["kernel"], params["bn2"],
                               stats["bn2"]),
    }
    if "conv3" in params:  # Bottleneck (resnet50-family)
        out["conv3"] = _fold_conv_bn(params["conv3"]["kernel"], params["bn3"],
                                     stats["bn3"])
    if "downsample_conv" in params:
        out["downsample"] = _fold_conv_bn(
            params["downsample_conv"]["kernel"], params["downsample_bn"],
            stats["downsample_bn"],
        )
    return out


def quantize_posenet_variables(variables: Mapping,
                               stage_sizes=(3, 4, 6, 3)) -> dict:
    """PoseNet variables -> int8 inference pytree.

    Accepts the ``{"params", "batch_stats"}`` tree of a PoseNet (or the
    ``posenet``-nested MapNet equivalent). Heads stay float.
    """
    params, stats = variables["params"], variables["batch_stats"]
    if "posenet" in params:  # MapNet nesting
        params, stats = params["posenet"], stats["posenet"]
    fe_p, fe_s = params["feature_extractor"], stats["feature_extractor"]

    trunk: dict[str, Any] = {
        "conv1": _fold_conv_bn(fe_p["conv1"]["kernel"], fe_p["bn1"],
                               fe_s["bn1"]),
    }
    for stage, n_blocks in enumerate(stage_sizes):
        for block in range(n_blocks):
            name = f"layer{stage + 1}_{block}"
            trunk[name] = _quant_block(fe_p[name], fe_s[name])

    heads = {
        k: jax.tree.map(np.asarray, dict(params[k]))
        for k in ("fc_feat", "fc_xyz", "fc_wpqr")
    }
    return {"trunk": trunk, "heads": heads, "stage_sizes": tuple(stage_sizes)}


def _quant_conv(x: jnp.ndarray, q: Mapping, strides, padding,
                dtype=jnp.bfloat16) -> jnp.ndarray:
    """Dynamic per-tensor int8 activation quant + int8 conv + affine."""
    x_scale = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32), 1e-12) / 127.0
    qx = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale), -127, 127
                  ).astype(jnp.int8)
    dn = lax.conv_dimension_numbers(qx.shape, q["qkernel"].shape,
                                    ("NHWC", "HWIO", "NHWC"))
    acc = lax.conv_general_dilated(
        qx, q["qkernel"], strides, padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (q["m"] * x_scale) + q["b"]
    return y.astype(dtype)


def _quant_basic_block(x: jnp.ndarray, q: Mapping, stride, dtype
                       ) -> jnp.ndarray:
    y = _quant_conv(x, q["conv1"], stride, [(1, 1), (1, 1)], dtype)
    y = jax.nn.relu(y)
    y = _quant_conv(y, q["conv2"], (1, 1), [(1, 1), (1, 1)], dtype)
    identity = (
        _quant_conv(x, q["downsample"], stride, [(0, 0), (0, 0)], dtype)
        if "downsample" in q else x
    )
    return jax.nn.relu(y + identity)


def _quant_bottleneck_block(x: jnp.ndarray, q: Mapping, stride, dtype
                            ) -> jnp.ndarray:
    y = _quant_conv(x, q["conv1"], (1, 1), [(0, 0), (0, 0)], dtype)
    y = jax.nn.relu(y)
    y = _quant_conv(y, q["conv2"], stride, [(1, 1), (1, 1)], dtype)
    y = jax.nn.relu(y)
    y = _quant_conv(y, q["conv3"], (1, 1), [(0, 0), (0, 0)], dtype)
    identity = (
        _quant_conv(x, q["downsample"], stride, [(0, 0), (0, 0)], dtype)
        if "downsample" in q else x
    )
    return jax.nn.relu(y + identity)


def _trunk_forward(qtree: Mapping, x: jnp.ndarray,
                   dtype=jnp.bfloat16) -> jnp.ndarray:
    trunk = qtree["trunk"]
    x = _quant_conv(x, trunk["conv1"], (2, 2), [(3, 3), (3, 3)], dtype)
    x = jax.nn.relu(x)
    x = lax.reduce_window(
        x, jnp.asarray(-jnp.inf, x.dtype), lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    for stage, n_blocks in enumerate(qtree["stage_sizes"]):
        for block in range(n_blocks):
            # same static rule as models/resnet.py: stages after the first
            # open with a stride-2 block (resnet50's layer1.0 has a
            # projection downsample at stride 1, so downsample presence
            # cannot stand in for the stride)
            stride = (2, 2) if (stage > 0 and block == 0) else (1, 1)
            q = trunk[f"layer{stage + 1}_{block}"]
            run = _quant_bottleneck_block if "conv3" in q else _quant_basic_block
            x = run(x, q, stride, dtype)
    return jnp.mean(x, axis=(1, 2))


def posenet_apply_int8(qtree: Mapping, images: jnp.ndarray,
                       dtype=jnp.bfloat16) -> jnp.ndarray:
    """(N, H, W, 3) -> (N, 6) poses via the int8 trunk + float heads."""
    feat = _trunk_forward(qtree, images.astype(dtype), dtype)
    heads = qtree["heads"]

    def dense(h, p):
        return h @ jnp.asarray(p["kernel"], dtype) + jnp.asarray(
            p["bias"], dtype)

    h = jax.nn.relu(dense(feat, heads["fc_feat"]))
    xyz = dense(h, heads["fc_xyz"]).astype(jnp.float32)
    wpqr = dense(h, heads["fc_wpqr"]).astype(jnp.float32)
    return jnp.concatenate([xyz, wpqr], axis=-1)


def mapnet_apply_int8(qtree: Mapping, images: jnp.ndarray,
                      dtype=jnp.bfloat16) -> jnp.ndarray:
    """(N, T, H, W, 3) -> (N, T, 6): shared-weight PoseNet per frame."""
    n, t = images.shape[:2]
    flat = images.reshape(n * t, *images.shape[2:])
    out = posenet_apply_int8(qtree, flat, dtype)
    return out.reshape(n, t, 6)
