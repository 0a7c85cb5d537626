"""The exact state-dict layout of torchvision's ``resnet34()``.

The reference builds its trunk from torchvision with ImageNet weights
(/root/reference/scripts/train.py:76, /root/reference/models/posenet.py:43-46),
so importing real checkpoints requires knowing torchvision's key set
precisely — including quirks like ``num_batches_tracked`` buffers and the
``layerL.0.downsample.{0,1}`` projection naming. torchvision is not a runtime
dependency here; this module encodes the layout as data so that:

- :func:`validate_trunk_state_dict` can give precise errors on user-supplied
  checkpoints before conversion, and
- tests can synthesize a structurally-real state dict and drive the full
  convert -> npz -> merge -> forward pipeline without network access.

Layout source: the torchvision BasicBlock ResNet graph (conv1/bn1, four
stages of [3, 4, 6, 3] blocks at widths [64, 128, 256, 512] with a 1x1
projection downsample on the first block of stages 2-4, then a 1000-way fc),
which is fixed public API; shapes below are the authoritative record.
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = [
    "resnet34_state_shapes",
    "resnet50_state_shapes",
    "synthetic_resnet34_state_dict",
    "synthetic_resnet50_state_dict",
    "synthetic_posenet_state_dict",
    "validate_trunk_state_dict",
]

_STAGES = ((1, 3, 64), (2, 4, 128), (3, 6, 256), (4, 3, 512))


def _bn(shapes: dict, name: str, c: int) -> None:
    shapes[f"{name}.weight"] = (c,)
    shapes[f"{name}.bias"] = (c,)
    shapes[f"{name}.running_mean"] = (c,)
    shapes[f"{name}.running_var"] = (c,)
    shapes[f"{name}.num_batches_tracked"] = ()


def resnet34_state_shapes(include_fc: bool = True) -> dict[str, tuple[int, ...]]:
    """Key -> shape for ``torchvision.models.resnet34().state_dict()``,
    in module-registration (state-dict) order."""
    shapes: dict[str, tuple[int, ...]] = {"conv1.weight": (64, 3, 7, 7)}
    _bn(shapes, "bn1", 64)
    c_in = 64
    for stage, n_blocks, width in _STAGES:
        for b in range(n_blocks):
            prefix = f"layer{stage}.{b}"
            cin = c_in if b == 0 else width
            shapes[f"{prefix}.conv1.weight"] = (width, cin, 3, 3)
            _bn(shapes, f"{prefix}.bn1", width)
            shapes[f"{prefix}.conv2.weight"] = (width, width, 3, 3)
            _bn(shapes, f"{prefix}.bn2", width)
            if b == 0 and stage > 1:
                shapes[f"{prefix}.downsample.0.weight"] = (width, cin, 1, 1)
                _bn(shapes, f"{prefix}.downsample.1", width)
        c_in = width
    if include_fc:
        shapes["fc.weight"] = (1000, 512)
        shapes["fc.bias"] = (1000,)
    return shapes


def resnet50_state_shapes(include_fc: bool = True) -> dict[str, tuple[int, ...]]:
    """Key -> shape for ``torchvision.models.resnet50().state_dict()``
    (Bottleneck graph: 1x1/3x3/1x1 at widths [64, 128, 256, 512] with 4x
    expansion; a projection downsample on the FIRST block of every stage,
    including layer1 where 64 -> 256 channels)."""
    shapes: dict[str, tuple[int, ...]] = {"conv1.weight": (64, 3, 7, 7)}
    _bn(shapes, "bn1", 64)
    c_in = 64
    for stage, n_blocks, width in _STAGES:
        out = width * 4
        for b in range(n_blocks):
            prefix = f"layer{stage}.{b}"
            cin = c_in if b == 0 else out
            shapes[f"{prefix}.conv1.weight"] = (width, cin, 1, 1)
            _bn(shapes, f"{prefix}.bn1", width)
            shapes[f"{prefix}.conv2.weight"] = (width, width, 3, 3)
            _bn(shapes, f"{prefix}.bn2", width)
            shapes[f"{prefix}.conv3.weight"] = (out, width, 1, 1)
            _bn(shapes, f"{prefix}.bn3", out)
            if b == 0:
                shapes[f"{prefix}.downsample.0.weight"] = (out, cin, 1, 1)
                _bn(shapes, f"{prefix}.downsample.1", out)
        c_in = out
    if include_fc:
        shapes["fc.weight"] = (1000, 2048)
        shapes["fc.bias"] = (1000,)
    return shapes


def _deterministic_values(key: str, shape: tuple[int, ...]) -> np.ndarray:
    """Reproducible filler values keyed by tensor name (stable across torch/
    numpy versions — no library RNG streams involved in the seed)."""
    seed = int.from_bytes(hashlib.sha256(key.encode()).digest()[:8], "little")
    rng = np.random.Generator(np.random.PCG64(seed))
    if key.endswith("num_batches_tracked"):
        return np.asarray(1000, np.int64)
    v = rng.standard_normal(shape).astype(np.float32) * 0.05
    if key.endswith("running_var"):
        v = np.abs(v) + 0.5  # variances are positive
    return v


def synthetic_resnet34_state_dict(torch_tensors: bool = True) -> dict:
    """A state dict with torchvision-resnet34's REAL structure and
    deterministic synthetic values (for exercising the import pipeline;
    sha256 of these exact values is recorded in the committed fixture)."""
    out = {}
    for key, shape in resnet34_state_shapes().items():
        v = _deterministic_values(key, shape)
        if torch_tensors:
            import torch

            out[key] = torch.from_numpy(np.ascontiguousarray(v))
        else:
            out[key] = v
    return out


def synthetic_resnet50_state_dict(torch_tensors: bool = True) -> dict:
    """As :func:`synthetic_resnet34_state_dict`, for the Bottleneck graph."""
    out = {}
    for key, shape in resnet50_state_shapes().items():
        v = _deterministic_values(key, shape)
        if torch_tensors:
            import torch

            out[key] = torch.from_numpy(np.ascontiguousarray(v))
        else:
            out[key] = v
    return out


def synthetic_posenet_state_dict(feat_dim: int = 32,
                                 torch_tensors: bool = True) -> dict:
    """A full reference-PoseNet state dict with deterministic values.

    Keys exactly as the reference's ``PoseNet(feature_extractor=resnet34())``
    module emits (/root/reference/models/posenet.py:36-63): the trunk under
    ``feature_extractor.`` with its ``fc`` REPLACED by a
    ``(feat_dim, 512)`` layer, plus ``fc_xyz`` / ``fc_wpqr`` heads. Used to
    drive the reference module and ours with identical weights in the
    model-golden tests.
    """
    out = {}
    for key, shape in resnet34_state_shapes(include_fc=False).items():
        out[f"feature_extractor.{key}"] = _deterministic_values(key, shape)
    heads = {
        "feature_extractor.fc.weight": (feat_dim, 512),
        "feature_extractor.fc.bias": (feat_dim,),
        "fc_xyz.weight": (3, feat_dim),
        "fc_xyz.bias": (3,),
        "fc_wpqr.weight": (3, feat_dim),
        "fc_wpqr.bias": (3,),
    }
    for key, shape in heads.items():
        out[key] = _deterministic_values(key, shape)
    if torch_tensors:
        import torch

        out = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in out.items()}
    return out


def validate_trunk_state_dict(state_dict, arch: str = "resnet34") -> list[str]:
    """Check a (prefix-stripped) trunk state dict against the torchvision
    layout. Returns a list of human-readable problems (empty = valid).
    ``fc.*`` is optional: the classifier is discarded on import anyway."""
    expected = {
        "resnet34": resnet34_state_shapes,
        "resnet50": resnet50_state_shapes,
    }[arch]()
    problems = []
    for key, shape in expected.items():
        if key.startswith("fc."):
            continue
        if key not in state_dict:
            problems.append(f"missing key: {key}")
            continue
        got = tuple(getattr(state_dict[key], "shape", ()))
        if got != shape:
            problems.append(f"shape mismatch at {key}: {got} != {shape}")
    known = set(expected)
    for key in state_dict:
        if key not in known:
            problems.append(f"unexpected key: {key}")
    return problems
