"""BN folding + int8 post-training quantization for PoseNet/MapNet inference.

TPU MXUs run int8 matmuls at twice the bf16 rate (measured 1.43x on a
representative 3x3 conv on this chip — PERF.md round 2), and camera
localization inference is conv-bound, so a quantized serving path is the
single biggest single-chip throughput lever left after bf16 + batch tuning.
The reference has no equivalent (pure float32 torch); this is a
beyond-parity capability.

Two inference pytrees share one trunk walk (``_trunk_forward``), with each
conv site self-describing its arithmetic:

- **folded float** (:func:`fold_posenet_variables`): inference BatchNorm is
  an affine ``a*z + b`` per channel, so it folds into the conv kernel
  (``kernel * a``) and a bias — the serving-path forward then runs pure
  conv+bias with zero BN ops. Used by ``--fold_bn`` on the eval CLI.
- **int8 PTQ** (:func:`quantize_posenet_variables`): symmetric per-output-
  channel int8 weights with BN folded into the requant multiplier
  (``m = a * w_scale * x_scale``); the conv's int32 accumulator is rescaled
  once and shifted by ``b``.

Activation scales for int8 are symmetric per-tensor and either

- **dynamic** (default): ``max|x| / 127`` computed in-graph per batch — no
  calibration needed, but each conv input pays a full-tensor reduction; or
- **static** (:func:`calibrate_activation_scales`): absmax observed over a
  few calibration batches and baked into the pytree, turning quantization
  into a fuse-friendly elementwise op (multiply/round/clip) with no extra
  reduction pass over HBM.

Residual adds, relu and pooling stay in ``compute dtype`` (bf16); the big
``fc_feat`` head matmul can optionally run int8 too (``quantize_heads``),
while the tiny 3-wide pose heads always stay float.

Everything here is pure-functional: the ``*_variables`` functions prepare a
pytree offline, :func:`posenet_apply_int8` / :func:`posenet_apply_folded`
(and their ``mapnet_*`` wrappers) are jittable forwards over it.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "quantize_posenet_variables",
    "fold_posenet_variables",
    "calibrate_activation_scales",
    "posenet_apply_int8",
    "mapnet_apply_int8",
    "posenet_apply_folded",
    "mapnet_apply_folded",
    "convert_stem_s2d",
    "space_to_depth_input",
]

_BN_EPS = 1e-5  # matches models/resnet.py


def _bn_affine(bn_params: Mapping, bn_stats: Mapping):
    """Inference BN as a per-channel affine: returns (a, b) with BN(z)=a*z+b."""
    a = np.asarray(bn_params["scale"], np.float32) / np.sqrt(
        np.asarray(bn_stats["var"], np.float32) + _BN_EPS
    )
    b = np.asarray(bn_params["bias"], np.float32) - np.asarray(
        bn_stats["mean"], np.float32
    ) * a
    return a, b


def _fold_conv_bn(kernel: np.ndarray, bn_params: Mapping, bn_stats: Mapping,
                  ) -> dict:
    """Quantize one conv kernel with its BatchNorm folded in.

    kernel: (H, W, I, O) float; BN affine a*z + b computed from
    scale/bias/mean/var. Returns {qkernel int8, m (O,) f32, b (O,) f32} with
    ``conv_int32 * (m * x_scale) + b`` reproducing BN(conv(x)).
    """
    kernel = np.asarray(kernel, np.float32)
    a, b = _bn_affine(bn_params, bn_stats)

    w_absmax = np.max(np.abs(kernel), axis=(0, 1, 2))  # per out channel
    w_scale = np.maximum(w_absmax, 1e-12) / 127.0
    qkernel = np.clip(np.round(kernel / w_scale), -127, 127).astype(np.int8)
    return {
        "qkernel": qkernel,
        "m": (a * w_scale).astype(np.float32),
        "b": b.astype(np.float32),
    }


def _fold_conv_bn_float(kernel: np.ndarray, bn_params: Mapping,
                        bn_stats: Mapping) -> dict:
    """Fold BN into the conv weights WITHOUT quantizing (serving float path).

    Returns {kernel (H,W,I,O) f32 scaled per out channel, b (O,) f32} with
    ``conv(x, kernel) + b`` reproducing BN(conv(x)) exactly (in f32).
    """
    kernel = np.asarray(kernel, np.float32)
    a, b = _bn_affine(bn_params, bn_stats)
    return {"kernel": (kernel * a).astype(np.float32),
            "b": b.astype(np.float32)}


def _walk_block(params: Mapping, stats: Mapping, fold) -> dict:
    out = {
        "conv1": fold(params["conv1"]["kernel"], params["bn1"], stats["bn1"]),
        "conv2": fold(params["conv2"]["kernel"], params["bn2"], stats["bn2"]),
    }
    if "conv3" in params:  # Bottleneck (resnet50-family)
        out["conv3"] = fold(params["conv3"]["kernel"], params["bn3"],
                            stats["bn3"])
    if "downsample_conv" in params:
        out["downsample"] = fold(
            params["downsample_conv"]["kernel"], params["downsample_bn"],
            stats["downsample_bn"],
        )
    return out


def _prepare_tree(variables: Mapping, stage_sizes, fold,
                  quantize_heads: bool = False) -> dict:
    params, stats = variables["params"], variables["batch_stats"]
    if "posenet" in params:  # MapNet nesting
        params, stats = params["posenet"], stats["posenet"]
    fe_p, fe_s = params["feature_extractor"], stats["feature_extractor"]

    trunk: dict[str, Any] = {
        "conv1": fold(fe_p["conv1"]["kernel"], fe_p["bn1"], fe_s["bn1"]),
    }
    for stage, n_blocks in enumerate(stage_sizes):
        for block in range(n_blocks):
            name = f"layer{stage + 1}_{block}"
            trunk[name] = _walk_block(fe_p[name], fe_s[name], fold)

    heads = {
        k: jax.tree.map(np.asarray, dict(params[k]))
        for k in ("fc_feat", "fc_xyz", "fc_wpqr")
    }
    if quantize_heads:
        # the 512->2048 fc_feat matmul is the only head worth int8; the
        # 3-wide pose heads are noise. Per-output-channel symmetric weights.
        w = np.asarray(heads["fc_feat"]["kernel"], np.float32)  # (I, O)
        w_scale = np.maximum(np.max(np.abs(w), axis=0), 1e-12) / 127.0
        heads["fc_feat"] = {
            "qkernel": np.clip(np.round(w / w_scale), -127, 127
                               ).astype(np.int8),
            "m": w_scale.astype(np.float32),
            "b": np.asarray(heads["fc_feat"]["bias"], np.float32),
        }
    return {"trunk": trunk, "heads": heads}


def _stage_sizes(trunk: Mapping) -> tuple:
    """Recover (n_blocks per stage) from the trunk's ``layer{s}_{b}`` keys.

    Dict keys are static under jit, so deriving the block structure here —
    instead of carrying Python ints as pytree leaves — lets a prepared tree
    ride as a *traced jit argument* (weights not baked into the program)
    without its structure metadata turning into tracers.
    """
    counts: dict[int, int] = {}
    for k in trunk:
        if k.startswith("layer"):
            s, b = k[5:].split("_")
            counts[int(s)] = max(counts.get(int(s), 0), int(b) + 1)
    return tuple(counts[s] for s in sorted(counts))


def quantize_posenet_variables(variables: Mapping, stage_sizes=(3, 4, 6, 3),
                               quantize_heads: bool = False) -> dict:
    """PoseNet variables -> int8 inference pytree.

    Accepts the ``{"params", "batch_stats"}`` tree of a PoseNet (or the
    ``posenet``-nested MapNet equivalent). Pose heads stay float;
    ``quantize_heads`` additionally runs the fc_feat matmul in int8.
    """
    return _prepare_tree(variables, stage_sizes, _fold_conv_bn,
                         quantize_heads=quantize_heads)


def fold_posenet_variables(variables: Mapping, stage_sizes=(3, 4, 6, 3)
                           ) -> dict:
    """PoseNet variables -> BN-folded FLOAT inference pytree (no quant).

    The serving-path counterpart of ``--quantize``: same trunk walk and
    apply functions, but convs run in compute dtype with BN pre-folded into
    weights+bias, removing every BN op from the inference graph.
    """
    return _prepare_tree(variables, stage_sizes, _fold_conv_bn_float)


def _conv_site(x: jnp.ndarray, q: Mapping, strides, padding,
               dtype=jnp.bfloat16, observe: list | None = None
               ) -> jnp.ndarray:
    """One conv site: int8 (dynamic or static scale) or folded float.

    ``observe`` (calibration mode): append this site's input absmax to the
    list — sites are visited in a deterministic order shared with
    :func:`_iter_sites`, which is how calibrated scales find their site.
    """
    if observe is not None:
        observe.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
    if "qkernel" not in q:  # folded float path
        y = lax.conv_general_dilated(
            x.astype(dtype), jnp.asarray(q["kernel"], dtype), strides, padding,
            dimension_numbers=lax.conv_dimension_numbers(
                x.shape, q["kernel"].shape, ("NHWC", "HWIO", "NHWC")),
        )
        return y + jnp.asarray(q["b"], dtype)
    if "x_scale" in q:  # static calibrated activation scale
        x_scale = jnp.asarray(q["x_scale"], jnp.float32)
    else:  # dynamic: one extra full-tensor reduction per conv input
        x_scale = jnp.maximum(
            jnp.max(jnp.abs(x)).astype(jnp.float32), 1e-12) / 127.0
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


def _basic_block(x: jnp.ndarray, q: Mapping, stride, dtype, observe
                 ) -> jnp.ndarray:
    y = _conv_site(x, q["conv1"], stride, [(1, 1), (1, 1)], dtype, observe)
    y = jax.nn.relu(y)
    y = _conv_site(y, q["conv2"], (1, 1), [(1, 1), (1, 1)], dtype, observe)
    identity = (
        _conv_site(x, q["downsample"], stride, [(0, 0), (0, 0)], dtype,
                   observe)
        if "downsample" in q else x
    )
    return jax.nn.relu(y + identity)


def _bottleneck_block(x: jnp.ndarray, q: Mapping, stride, dtype, observe
                      ) -> jnp.ndarray:
    y = _conv_site(x, q["conv1"], (1, 1), [(0, 0), (0, 0)], dtype, observe)
    y = jax.nn.relu(y)
    y = _conv_site(y, q["conv2"], stride, [(1, 1), (1, 1)], dtype, observe)
    y = jax.nn.relu(y)
    y = _conv_site(y, q["conv3"], (1, 1), [(0, 0), (0, 0)], dtype, observe)
    identity = (
        _conv_site(x, q["downsample"], stride, [(0, 0), (0, 0)], dtype,
                   observe)
        if "downsample" in q else x
    )
    return jax.nn.relu(y + identity)


def _trunk_forward(qtree: Mapping, x: jnp.ndarray, dtype=jnp.bfloat16,
                   observe: list | None = None) -> jnp.ndarray:
    trunk = qtree["trunk"]
    x = _conv_site(x, trunk["conv1"], (2, 2), [(3, 3), (3, 3)], dtype,
                   observe)
    x = jax.nn.relu(x)
    x = lax.reduce_window(
        x, jnp.asarray(-jnp.inf, x.dtype), lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    for stage, n_blocks in enumerate(_stage_sizes(trunk)):
        for block in range(n_blocks):
            # same static rule as models/resnet.py: stages after the first
            # open with a stride-2 block (resnet50's layer1.0 has a
            # projection downsample at stride 1, so downsample presence
            # cannot stand in for the stride)
            stride = (2, 2) if (stage > 0 and block == 0) else (1, 1)
            q = trunk[f"layer{stage + 1}_{block}"]
            run = _bottleneck_block if "conv3" in q else _basic_block
            x = run(x, q, stride, dtype, observe)
    return jnp.mean(x, axis=(1, 2))


def _iter_sites(qtree: Mapping):
    """Yield conv-site dicts in exactly ``_trunk_forward``'s visit order."""
    trunk = qtree["trunk"]
    yield trunk["conv1"]
    for stage, n_blocks in enumerate(_stage_sizes(trunk)):
        for block in range(n_blocks):
            blk = trunk[f"layer{stage + 1}_{block}"]
            for key in ("conv1", "conv2", "conv3", "downsample"):
                if key in blk:
                    yield blk[key]


def calibrate_activation_scales(qtree: Mapping, batches,
                                dtype=jnp.bfloat16) -> dict:
    """Bake static activation scales into an int8 pytree.

    Runs the (dynamic-scale) int8 forward over ``batches`` — an iterable of
    (N, H, W, 3) or (N, T, H, W, 3) preprocessed image arrays — observing
    each conv input's absmax, and returns a new pytree whose sites carry
    ``x_scale = max_batches(absmax) / 127``. The static-scale forward then
    quantizes with a pure elementwise op (no per-conv reduction), which is
    both faster and deterministic batch-to-batch.
    """

    if _stem_is_s2d(qtree):
        raise ValueError("calibrate before convert_stem_s2d: the observer "
                         "walk runs the canonical 7x7-stem trunk")

    # int8 fc_feat head: calibrate its activation scale too — the last
    # dynamic per-tensor reduction goes away and every row's output becomes
    # independent of its batchmates (see _apply_heads)
    head_q = "qkernel" in qtree["heads"]["fc_feat"]

    @jax.jit
    def _absmaxes(x):
        if x.ndim == 5:
            x = x.reshape(-1, *x.shape[2:])
        obs: list = []
        feat = _trunk_forward(qtree, x.astype(dtype), dtype, observe=obs)
        if head_q:
            obs.append(jnp.max(jnp.abs(feat.astype(jnp.float32))))
        return jnp.stack(obs)

    mx = None
    for batch in batches:
        m = _absmaxes(jnp.asarray(batch))
        mx = m if mx is None else jnp.maximum(mx, m)
    if mx is None:
        raise ValueError("calibration requires at least one batch")
    mx = np.asarray(mx, np.float32)

    out = jax.tree.map(lambda v: v, qtree)  # rebuild containers, share leaves
    sites = list(_iter_sites(out))
    if head_q:
        sites.append(out["heads"]["fc_feat"])
    if len(sites) != len(mx):
        raise AssertionError(
            f"site walk ({len(sites)}) and observation ({len(mx)}) diverged")
    for site, absmax in zip(sites, mx):
        site["x_scale"] = np.float32(max(float(absmax), 1e-12) / 127.0)
    return out


def _q8(x: jnp.ndarray, x_scale) -> jnp.ndarray:
    """Symmetric per-tensor quantize to int8 at a known (static) scale."""
    return jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)


def _conv_acc(qx: jnp.ndarray, q: Mapping, strides, padding) -> jnp.ndarray:
    """int8 x int8 conv -> int32 accumulator (MXU native rate)."""
    dn = lax.conv_dimension_numbers(qx.shape, q["qkernel"].shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        qx, q["qkernel"], strides, padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )


def _site_scale(q: Mapping) -> jnp.ndarray:
    return jnp.asarray(q["x_scale"], jnp.float32)


def _deq(acc: jnp.ndarray, q: Mapping, s_in) -> jnp.ndarray:
    """Dequantize a conv accumulator: BN-folded affine in f32."""
    return acc.astype(jnp.float32) * (q["m"] * s_in) + q["b"]


def _fused_basic_block(qx: jnp.ndarray, s_in, q: Mapping, stride, s_out):
    """Basic block with int8 dataflow: int8 in (scale ``s_in``), int8 out
    (scale ``s_out``), or float out when ``s_out`` is None (last block).

    The conv1->relu->conv2 chain never materializes a float activation in
    HBM: conv1's epilogue dequantizes, relus and REquantizes straight to
    conv2's static input scale, so the inter-conv tensor is 1 byte/elem
    (half the bf16 traffic) and the requant ops fuse into the conv's output
    fusion instead of standing as separate loop fusions at the next conv's
    input (the 4.5% "loop fusion" share in PERF.md round 3's int8 profile).
    The identity branch rides as int8 too and dequantizes inside the final
    add's fusion (same rounding the branch already suffered when the
    unfused path quantized it for conv1).
    """
    y1 = jax.nn.relu(_deq(_conv_acc(qx, q["conv1"], stride,
                                    [(1, 1), (1, 1)]), q["conv1"], s_in))
    q1 = _q8(y1, _site_scale(q["conv2"]))
    y2 = _deq(_conv_acc(q1, q["conv2"], (1, 1), [(1, 1), (1, 1)]),
              q["conv2"], _site_scale(q["conv2"]))
    if "downsample" in q:
        idn = _deq(_conv_acc(qx, q["downsample"], stride, [(0, 0), (0, 0)]),
                   q["downsample"], s_in)
    else:
        idn = qx.astype(jnp.float32) * s_in
    out = jax.nn.relu(y2 + idn)
    return _q8(out, s_out) if s_out is not None else out


def _trunk_forward_fused(qtree: Mapping, x: jnp.ndarray,
                         dtype=jnp.bfloat16) -> jnp.ndarray:
    """Static-scale int8 trunk with FUSED requantization (int8 dataflow).

    Requires calibrated scales on every site and basic (2-conv) blocks; the
    bottleneck/dynamic/folded variants keep using :func:`_trunk_forward`.
    Inter-site activations stay int8 end to end — stem relu+maxpool included
    (max-pooling commutes with the monotone quantization, so the pool runs
    on int8 directly).
    """
    trunk = qtree["trunk"]
    stages = _stage_sizes(trunk)
    blocks = [trunk[f"layer{s + 1}_{b}"]
              for s, n in enumerate(stages) for b in range(n)]

    c1 = trunk["conv1"]
    s_in = _site_scale(c1)
    # int8 input passes through untouched: the caller pre-quantized at the
    # stem's STATIC scale (quantize_input_int8 — e.g. a prequantized device
    # cache, where each frame's int8 stem input is a per-frame constant)
    qx = x if x.dtype == jnp.int8 else _q8(x.astype(jnp.float32), s_in)
    if c1["qkernel"].shape[0] == 4:  # S2D stem (convert_stem_s2d)
        if qx.shape[-1] * 4 == c1["qkernel"].shape[2]:
            # input not yet rearranged (a prequantized S2D cache ships
            # 4C-channel frames and skips this)
            qx = space_to_depth_input(qx)
        y = _deq(_conv_acc(qx, c1, (1, 1), [(2, 1), (2, 1)]), c1, s_in)
    else:
        y = _deq(_conv_acc(qx, c1, (2, 2), [(3, 3), (3, 3)]), c1, s_in)
    y = jax.nn.relu(y)
    qy = _q8(y, _site_scale(blocks[0]["conv1"]))
    qy = lax.reduce_window(
        qy, jnp.asarray(-127, jnp.int8), lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)],
    )

    flat_strides = [
        (2, 2) if (stage > 0 and block == 0) else (1, 1)
        for stage, n in enumerate(stages) for block in range(n)
    ]
    for i, (q, stride) in enumerate(zip(blocks, flat_strides)):
        s_out = (_site_scale(blocks[i + 1]["conv1"])
                 if i + 1 < len(blocks) else None)
        qy = _fused_basic_block(qy, _site_scale(q["conv1"]), q, stride,
                                s_out)
    return jnp.mean(qy, axis=(1, 2)).astype(dtype)


def _is_fusable(qtree: Mapping) -> bool:
    """Fused dataflow needs static scales everywhere and basic blocks only."""
    sites = list(_iter_sites(qtree))
    return all("qkernel" in s and "x_scale" in s for s in sites) and not any(
        "conv3" in qtree["trunk"][k] for k in qtree["trunk"]
        if k.startswith("layer")
    )


def _apply_heads(qtree: Mapping, feat: jnp.ndarray, dtype) -> jnp.ndarray:
    heads = qtree["heads"]

    def dense(h, p):
        return h @ jnp.asarray(p["kernel"], dtype) + jnp.asarray(
            p["bias"], dtype)

    fc_feat = heads["fc_feat"]
    if "qkernel" in fc_feat:  # int8 fc_feat
        if "x_scale" in fc_feat:
            # static calibrated scale: pure elementwise quantize, and —
            # critically — each row's output no longer depends on its
            # batchmates (the dynamic per-TENSOR absmax below made a
            # frame's pose a function of batch COMPOSITION, which broke
            # bit-equality between differently-batched epochs, e.g. the
            # frame-dedup eval scan vs the tuple scan)
            x_scale = jnp.asarray(fc_feat["x_scale"], jnp.float32)
        else:  # dynamic per-tensor act scale — the (N, 512) input makes
            # the reduction negligible, but it couples rows in the batch
            x_scale = jnp.maximum(
                jnp.max(jnp.abs(feat)).astype(jnp.float32), 1e-12) / 127.0
        qh = jnp.clip(jnp.round(feat.astype(jnp.float32) / x_scale),
                      -127, 127).astype(jnp.int8)
        acc = lax.dot_general(
            qh, fc_feat["qkernel"], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        h = acc.astype(jnp.float32) * (fc_feat["m"] * x_scale) + fc_feat["b"]
        h = h.astype(dtype)
    else:
        h = dense(feat, fc_feat)
    h = jax.nn.relu(h)
    xyz = dense(h, heads["fc_xyz"]).astype(jnp.float32)
    wpqr = dense(h, heads["fc_wpqr"]).astype(jnp.float32)
    return jnp.concatenate([xyz, wpqr], axis=-1)


def quantize_input_int8(qtree: Mapping, images: jnp.ndarray) -> jnp.ndarray:
    """Pre-quantize preprocessed images to the stem conv's STATIC scale.

    With calibrated scales the fused trunk's int8 stem input is a pure
    per-frame elementwise function — it does not depend on the batch — so a
    device frame cache can store THIS tensor (1 byte/elem, same size as the
    raw uint8 frames) and feed :func:`posenet_apply_int8` ``fused=True``
    directly: the per-batch normalize + quantize chain disappears from the
    serving program, bit-identically (PERF.md round 5 "prequantized device
    cache"). Requires a static ``x_scale`` on the stem site.
    """
    c1 = qtree["trunk"]["conv1"]
    if "qkernel" not in c1 or "x_scale" not in c1:
        raise ValueError("quantize_input_int8 needs an int8 trunk with a "
                         "calibrated static stem scale (--calibrate N)")
    return _q8(images.astype(jnp.float32), _site_scale(c1))


def space_to_depth_input(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 space-to-depth: (N, H, W, C) -> (N, ceil(H/2), ceil(W/2), 4C).

    Odd spatial dims are zero-padded high first (zero is the conv padding
    value in both the float and the symmetric-int8 domain, so the pad is
    exactly the stem conv's own implicit padding). Channel order is
    ``(dh*2 + dw)*C + c`` — the layout :func:`_stem_kernel_s2d` targets.
    """
    n, h, w, c = x.shape
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        h, w = h + h % 2, w + w % 2
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def _stem_kernel_s2d(k7: np.ndarray) -> np.ndarray:
    """Rearrange a (7,7,C,O) stride-2 stem kernel for the S2D dataflow.

    The stride-2 7x7 conv ``y[i,j] = sum_{a,b} x[2i+a-3, 2j+b-3] k[a,b]``
    regroups exactly over 2x2 input blocks: with ``x2[p,q,(dh,dw)] =
    x[2p+dh, 2q+dw]`` each tap ``a`` lands in block ``p = i + m - 2`` with
    ``a = 2m - 1 + dh`` (dh fixed to ``(a+1) % 2``), so the whole stem is a
    STRIDE-1 4x4 conv over x2 with padding (2, 1) — same multiplies, same
    int32 accumulator, just a different loop nest. (m=0, dh=0) falls
    outside the 7-tap support and stays zero.
    """
    kh, kw, c, o = k7.shape
    if (kh, kw) != (7, 7):
        raise ValueError(f"S2D stem rearrange expects a 7x7 kernel, "
                         f"got {(kh, kw)}")
    k4 = np.zeros((4, 4, 4 * c, o), k7.dtype)
    for m in range(4):
        for dh in range(2):
            a = 2 * m - 1 + dh
            if not 0 <= a < 7:
                continue
            for n_ in range(4):
                for dw in range(2):
                    b = 2 * n_ - 1 + dw
                    if not 0 <= b < 7:
                        continue
                    blk = (dh * 2 + dw) * c
                    k4[m, n_, blk:blk + c, :] = k7[a, b]
    return k4


def convert_stem_s2d(qtree: Mapping) -> dict:
    """Rewrite an int8 tree's stem site for the space-to-depth dataflow.

    Returns a new tree (leaves shared except conv1's qkernel) whose stem is
    the stride-1 4x4 conv over 2x2-space-to-depth input. On the int8 path
    this is BIT-exact — integer accumulation is associative — while mapping
    far better onto the MXU: the stride-2 C=3 stem is the trunk's least
    efficient conv (PERF.md round 3 profile), and a prequantized device
    cache can store the S2D rows so no rearrange appears in the serving
    program at all. The fused forward dispatches on the kernel's static
    shape; non-fused/float paths reject S2D trees.
    """
    c1 = qtree["trunk"]["conv1"]
    if "qkernel" not in c1:
        raise ValueError("convert_stem_s2d needs an int8 tree (--quantize)")
    if c1["qkernel"].shape[:2] == (4, 4):
        return dict(qtree)  # already converted
    new_c1 = dict(c1)
    new_c1["qkernel"] = _stem_kernel_s2d(np.asarray(c1["qkernel"]))
    out = dict(qtree)
    out["trunk"] = dict(qtree["trunk"])
    out["trunk"]["conv1"] = new_c1
    return out


def _stem_is_s2d(qtree: Mapping) -> bool:
    c1 = qtree["trunk"]["conv1"]
    return "qkernel" in c1 and c1["qkernel"].shape[:2] == (4, 4)


def posenet_apply_int8(qtree: Mapping, images: jnp.ndarray,
                       dtype=jnp.bfloat16, fused: bool = False
                       ) -> jnp.ndarray:
    """(N, H, W, 3) -> (N, 6) poses via the int8 trunk + float heads.

    ``fused=True`` (static-calibrated basic-block trees only) switches to
    the int8-dataflow trunk (:func:`_trunk_forward_fused`): requantization
    runs in each conv's epilogue and inter-site activations stay int8 —
    half the activation HBM traffic of the bf16-linked path. Raises if the
    tree isn't fusable (dynamic scales / bottleneck blocks / folded float).
    """
    if fused:
        if not _is_fusable(qtree):
            raise ValueError(
                "fused requant needs calibrated static scales on every "
                "site and a basic-block (resnet18/34) trunk")
        feat = _trunk_forward_fused(qtree, images, dtype)
    else:
        if images.dtype == jnp.int8:
            raise ValueError("prequantized int8 input "
                             "(quantize_input_int8) needs fused=True")
        if _stem_is_s2d(qtree):
            raise ValueError("space-to-depth stem trees (convert_stem_s2d) "
                             "run fused only; pass fused=True")
        feat = _trunk_forward(qtree, images.astype(dtype), dtype)
    return _apply_heads(qtree, feat, dtype)


def mapnet_apply_int8(qtree: Mapping, images: jnp.ndarray,
                      dtype=jnp.bfloat16, fused: bool = False
                      ) -> jnp.ndarray:
    """(N, T, H, W, 3) -> (N, T, 6): shared-weight PoseNet per frame."""
    n, t = images.shape[:2]
    flat = images.reshape(n * t, *images.shape[2:])
    out = posenet_apply_int8(qtree, flat, dtype, fused=fused)
    return out.reshape(n, t, 6)


# The folded-float pytree runs through the identical walk; these aliases keep
# call sites honest about which pytree they hold.
posenet_apply_folded = posenet_apply_int8
mapnet_apply_folded = mapnet_apply_int8
