"""Flax ResNet trunk (NHWC, MXU-friendly) for the pose regressors.

Re-implements the torchvision ResNet-34 topology the reference uses as its
feature extractor (/root/reference/scripts/train.py:76,
/root/reference/models/posenet.py:43-46) as an idiomatic Flax module:

- NHWC layout (TPU-native; torch uses NCHW),
- parameters stored float32, compute in a configurable ``dtype`` (bfloat16 by
  default on TPU) so convolutions hit the MXU at full rate,
- BatchNorm statistics kept in float32 regardless of compute dtype,
- module names mirror the torchvision state-dict layout (``conv1``, ``bn1``,
  ``layer1_0`` ...) so pretrained torchvision / reference checkpoints can be
  imported mechanically (:mod:`geomapnet_tpu.models.torch_import`).

The trunk ends at the global-average-pooled 512-d feature (the reference
replaces ``avgpool`` with adaptive pooling and swaps the final fc; our trunk
simply does not own an fc — the PoseNet head does).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ResNet", "resnet18", "resnet34", "resnet50"]

# matches torch.nn.init.kaiming_normal_ defaults (fan_in, gain sqrt(2)) used
# by the reference's re-init path (/root/reference/models/posenet.py:59-63)
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class BatchNorm(nn.Module):
    """BatchNorm with torch's running-statistics semantics.

    Identical to ``nn.BatchNorm`` in normalization (biased batch variance,
    f32 statistics) but updates the running variance with the UNBIASED batch
    variance (``n/(n-1)``), as torch does — flax's own BatchNorm stores the
    biased one. Keeps flax's param/variable names (``scale``/``bias``,
    ``batch_stats: mean/var``) so checkpoints, importers and the quantizer
    are layout-compatible. Pinned against the reference's observed training
    run in tests/test_train_golden.py.
    """

    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros,
                                None, (features,), jnp.float32)
        ra_var = self.variable("batch_stats", "var", nn.initializers.ones,
                               None, (features,), jnp.float32)

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            # single-pass E[x^2] - E[x]^2 (flax's form): both reductions
            # fuse over ONE read of the activations — a separate
            # mean((x-mean)^2) pass measured ~8% slower on the train step
            mean = jnp.mean(xf, axes)
            var = jnp.mean(jnp.square(xf), axes) - jnp.square(mean)  # biased
            if not self.is_initializing():
                n = x.size // features
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (
                    self.momentum * ra_mean.value
                    + (1.0 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1.0 - self.momentum) * unbiased
                )

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(self.dtype)


class BasicBlock(nn.Module):
    """Two 3x3 convs with a residual connection (torchvision BasicBlock)."""

    filters: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv = partial(
            nn.Conv,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=kaiming_normal,
        )
        norm = partial(
            BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )

        identity = x
        y = conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                 padding=[(1, 1), (1, 1)], name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), strides=(1, 1),
                 padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = norm(name="bn2")(y)

        if self.stride != 1 or x.shape[-1] != self.filters:
            identity = conv(self.filters, (1, 1),
                            strides=(self.stride, self.stride),
                            name="downsample_conv")(x)
            identity = norm(name="downsample_bn")(identity)

        return nn.relu(y + identity.astype(y.dtype))


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with 4x expansion (torchvision
    Bottleneck; stride lives on the 3x3 as in torchvision's v1.5 graph)."""

    filters: int  # bottleneck width; the block outputs filters * 4
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv = partial(
            nn.Conv,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=kaiming_normal,
        )
        norm = partial(
            BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )

        out_ch = self.filters * 4
        identity = x
        y = conv(self.filters, (1, 1), name="conv1")(x)
        y = nn.relu(norm(name="bn1")(y))
        y = conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                 padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = nn.relu(norm(name="bn2")(y))
        y = conv(out_ch, (1, 1), name="conv3")(y)
        y = norm(name="bn3")(y)

        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = conv(out_ch, (1, 1),
                            strides=(self.stride, self.stride),
                            name="downsample_conv")(x)
            identity = norm(name="downsample_bn")(identity)

        return nn.relu(y + identity.astype(y.dtype))


class ResNet(nn.Module):
    """ResNet trunk ending at the pooled feature vector.

    :param stage_sizes: blocks per stage, e.g. (3, 4, 6, 3) for ResNet-34
    :param block_cls: :class:`BasicBlock` (18/34) or :class:`Bottleneck`
        (50/101/152)
    :param dtype: compute dtype (bfloat16 recommended on TPU)
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    block_cls: type = BasicBlock
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(N, H, W, 3) images -> (N, 512) pooled features."""
        x = x.astype(self.dtype)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=kaiming_normal, name="conv1",
        )(x)
        x = BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, param_dtype=jnp.float32, name="bn1",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x = x.astype(self.dtype)

        for stage, n_blocks in enumerate(self.stage_sizes):
            filters = 64 * (2 ** stage)
            for block in range(n_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = self.block_cls(
                    filters=filters, stride=stride, dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x, train=train)

        # global average pool (the reference swaps in AdaptiveAvgPool2d(1),
        # /root/reference/models/posenet.py:44)
        x = jnp.mean(x, axis=(1, 2))
        return x


def resnet34(dtype: Any = jnp.float32, name: str | None = None) -> ResNet:
    """ResNet-34 trunk — the reference's feature extractor."""
    return ResNet(stage_sizes=(3, 4, 6, 3), dtype=dtype, name=name)


def resnet18(dtype: Any = jnp.float32, name: str | None = None) -> ResNet:
    """ResNet-18 trunk (lighter option for ablations/tests)."""
    return ResNet(stage_sizes=(2, 2, 2, 2), dtype=dtype, name=name)


def resnet50(dtype: Any = jnp.float32, name: str | None = None) -> ResNet:
    """ResNet-50 trunk (2048-d features): the reference's PoseNet accepts any
    torchvision trunk (/root/reference/models/posenet.py:36-46), so heavier
    backbones are first-class here too."""
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck, dtype=dtype,
                  name=name)
