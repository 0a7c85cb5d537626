"""Model export for serving: ahead-of-time artifacts via ``jax.export``.

The reference has no deployment story — inference means running eval.py with
the full training stack importable. Here the flagship inference path (the
device image pipeline fused with the model forward) exports to a serialized
StableHLO artifact with the weights baked in:

- self-contained: serving needs jax + the artifact, not Flax/this package's
  model code;
- batch-polymorphic: the batch dim is symbolic, one artifact serves any
  batch size;
- portable: StableHLO recompiles onto whatever backend loads it (TPU
  serving fleet, CPU canary), with XLA's forward-compatibility guarantees.

Typical flow::

    blob = export_inference(model, state, frame_shape=(3, 256, 341, 3))
    Path("mapnet.shlo").write_bytes(blob)
    # ... in the serving process:
    infer = load_inference("mapnet.shlo")
    poses = infer(images)          # any batch size
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
from jax import export as jax_export

__all__ = ["export_inference", "load_inference"]


def export_inference(
    model,
    state,
    frame_shape: tuple[int, ...],
    dtype=jnp.bfloat16,
    preprocess=None,
    platforms: tuple[str, ...] | None = None,
    quantize: bool = False,
    fold_bn: bool = False,
    calib_data=None,
    quantize_heads: bool = False,
    fuse_requant: bool = False,
) -> bytes:
    """Serialize the inference function (weights baked in) to StableHLO.

    :param model: Flax module (PoseNet/MapNet family)
    :param state: TrainState holding trained params/batch_stats
    :param frame_shape: per-sample shape WITHOUT the batch dim, e.g.
        ``(T, H, W, 3)`` for MapNet tuples or ``(H, W, 3)`` for PoseNet
    :param dtype: input dtype the artifact accepts (uint8 when ``preprocess``
        handles normalization on device)
    :param preprocess: optional device-side pipeline fused in front of the
        model (e.g. :func:`geomapnet_tpu.cli.builders.build_device_preprocess`)
    :param platforms: lowering platforms (default: current backend). Pass
        ``("tpu", "cpu")`` for an artifact that loads on both.
    :param quantize: bake an int8-PTQ trunk into the artifact
        (:mod:`geomapnet_tpu.models.quant`)
    :param fold_bn: bake a BN-folded float trunk instead (serving float path
        with zero BN ops; implied by ``quantize``)
    :param calib_data: with ``quantize``, an iterable of preprocessed image
        batches used to bake static activation scales
    :param quantize_heads: with ``quantize``, run the fc_feat matmul int8
    :param fuse_requant: with ``quantize`` + ``calib_data``, bake the int8
        DATAFLOW trunk (requantization fused into each conv's epilogue,
        inter-layer activations stay int8 — the headline serving
        configuration, +12% over linked int8 on hardware, PERF.md round 4).
        Needs static scales on every site and a basic-block trunk — the same
        ``_is_fusable`` contract as the eval CLI's ``--fuse_requant``
    :returns: serialized artifact bytes
    """
    params = jax.device_get(state.params["model"])
    batch_stats = jax.device_get(state.batch_stats)

    if fuse_requant and not (quantize and calib_data is not None):
        raise ValueError(
            "fuse_requant needs quantize=True with calib_data "
            "(static scales on every site)")

    if quantize or fold_bn:
        from .models.quant import (
            _is_fusable,
            calibrate_activation_scales,
            fold_posenet_variables,
            mapnet_apply_int8,
            posenet_apply_int8,
            quantize_posenet_variables,
        )

        trunk = getattr(model, "posenet", model).feature_extractor
        variables = {"params": params, "batch_stats": batch_stats}
        if quantize:
            qtree = quantize_posenet_variables(
                variables, stage_sizes=tuple(trunk.stage_sizes),
                quantize_heads=quantize_heads,
            )
            if calib_data is not None:
                qtree = calibrate_activation_scales(qtree, calib_data)
        else:
            qtree = fold_posenet_variables(
                variables, stage_sizes=tuple(trunk.stage_sizes))
        if fuse_requant and not _is_fusable(qtree):
            raise ValueError(
                "fuse_requant needs calibrated static scales on every "
                "site and a basic-block (resnet18/34) trunk")

        def infer(images):
            if preprocess is not None:
                images = preprocess(images)
            fn = (mapnet_apply_int8 if images.ndim == 5
                  else posenet_apply_int8)
            return fn(qtree, images, fused=fuse_requant)
    else:
        def infer(images):
            if preprocess is not None:
                images = preprocess(images)
            return model.apply(
                {"params": params, "batch_stats": batch_stats}, images,
                train=False,
            )

    (batch,) = jax_export.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((batch, *frame_shape), dtype)
    exported = jax_export.export(
        jax.jit(infer),
        platforms=list(platforms) if platforms else None,
    )(spec)
    return exported.serialize()


def load_inference(path_or_bytes):
    """Load a serialized artifact; returns ``infer(images) -> poses``.

    The callable jit-compiles onto the current backend on first use and
    accepts any batch size (the exported batch dim is symbolic).
    """
    blob = (
        path_or_bytes
        if isinstance(path_or_bytes, (bytes, bytearray))
        else Path(path_or_bytes).read_bytes()
    )
    exported = jax_export.deserialize(blob)
    return jax.jit(exported.call)
