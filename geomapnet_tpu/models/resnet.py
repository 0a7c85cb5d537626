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


def _bn_train_stats(x, epsilon):
    """Single-pass f32 batch statistics (see BatchNorm.__call__ note)."""
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(xf, axes)
    var = jnp.mean(jnp.square(xf), axes) - jnp.square(mean)  # biased
    r = jax.lax.rsqrt(var + epsilon)
    return xf, mean, var, r


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_train_norm_bf16bwd(x, scale, bias, epsilon):
    """Batch-stats BN normalize+affine with a bfloat16 BACKWARD.

    The forward is bit-identical to the default f32 path (same single-pass
    ``E[x^2]-E[x]^2`` statistics, same f32 normalize/affine association).
    The backward computes the big per-element tensors (the incoming grad and
    x_hat — e.g. f32[B,128,171,64] on the ResNet stem) in bfloat16, roughly
    halving the HBM traffic of the autodiff backward, while every REDUCTION
    accumulates in f32 and the per-channel coefficients stay f32.

    Returns ``(y, mean, var)``. The mean/var outputs exist ONLY for the
    running-statistics update, which is never differentiated (flax mutable
    collections sit outside the grad closure), so their cotangents are
    structurally zero and the vjp drops them — do not differentiate through
    the mean/var outputs of this function.

    Bounded experiment per VERDICT r4 item 6; measured on hardware in
    PERF.md round 5 and gated behind ``ResNet(bn_bf16_bwd=True)`` /
    ``bench_train --bn_bf16_bwd``.
    """
    xf, mean, var, r = _bn_train_stats(x, epsilon)
    y = (xf - mean) * r * scale + bias
    return y, mean, var


def _bn_bf16bwd_fwd(x, scale, bias, epsilon):
    xf, mean, var, r = _bn_train_stats(x, epsilon)
    xhat = (xf - mean) * r
    y = xhat * scale + bias
    # zero-size proto carries x's dtype through the residuals (a raw dtype
    # object is not a valid JAX residual leaf)
    return (y, mean, var), (xhat.astype(jnp.bfloat16), scale, r,
                            jnp.zeros((0,), x.dtype))


def _bn_bf16bwd_bwd(epsilon, res, cts):
    g = cts[0]  # mean/var cotangents: structurally zero (running stats only)
    xhat, scale, r, x_proto = res
    x_dtype = x_proto.dtype
    axes = tuple(range(g.ndim - 1))
    n = g.size // g.shape[-1]
    gb = g.astype(jnp.bfloat16)
    sum_g = jnp.sum(gb, axes, dtype=jnp.float32)
    sum_gx = jnp.sum(gb * xhat, axes, dtype=jnp.float32)
    # dx = (gamma r) (g - mean(g) - xhat mean(g xhat)): element math bf16,
    # per-channel coefficients f32
    coef = (scale.astype(jnp.float32) * r).astype(jnp.bfloat16)
    dx = coef * (gb
                 - (sum_g / n).astype(jnp.bfloat16)
                 - xhat * (sum_gx / n).astype(jnp.bfloat16))
    return (dx.astype(x_dtype), sum_gx.astype(scale.dtype),
            sum_g.astype(scale.dtype))


bn_train_norm_bf16bwd.defvjp(_bn_bf16bwd_fwd, _bn_bf16bwd_bwd)


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
    bf16_backward: bool = False

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
        elif self.bf16_backward:
            # same forward values as the default branch (see
            # bn_train_norm_bf16bwd: identical stats + association), but the
            # backward's big elementwise/multiply-reduce tensors go bf16
            y, mean, var = bn_train_norm_bf16bwd(
                x, scale.astype(jnp.float32), bias.astype(jnp.float32),
                self.epsilon)
            mean = jax.lax.stop_gradient(mean)
            var = jax.lax.stop_gradient(var)
            self._update_running(ra_mean, ra_var, mean, var,
                                 x.size // features)
            return y.astype(self.dtype)
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            # single-pass E[x^2] - E[x]^2 (flax's form): both reductions
            # fuse over ONE read of the activations — a separate
            # mean((x-mean)^2) pass measured ~8% slower on the train step
            mean = jnp.mean(xf, axes)
            var = jnp.mean(jnp.square(xf), axes) - jnp.square(mean)  # biased
            self._update_running(ra_mean, ra_var, mean, var,
                                 x.size // features)

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(self.dtype)

    def _update_running(self, ra_mean, ra_var, mean, var, n: int) -> None:
        if self.is_initializing():
            return
        unbiased = var * (n / max(n - 1, 1))
        ra_mean.value = (
            self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
        )
        ra_var.value = (
            self.momentum * ra_var.value + (1.0 - self.momentum) * unbiased
        )


class BasicBlock(nn.Module):
    """Two 3x3 convs with a residual connection (torchvision BasicBlock)."""

    filters: int
    stride: int = 1
    dtype: Any = jnp.float32
    bn_bf16_bwd: bool = False

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
            bf16_backward=self.bn_bf16_bwd,
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
    bn_bf16_bwd: bool = False

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
            bf16_backward=self.bn_bf16_bwd,
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
    # bf16 BN backward (bn_train_norm_bf16bwd): forward bit-identical,
    # grads perturbed at bf16 rounding — measured in PERF.md round 5
    bn_bf16_bwd: bool = False

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
            dtype=jnp.float32, param_dtype=jnp.float32,
            bf16_backward=self.bn_bf16_bwd, name="bn1",
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
                    bn_bf16_bwd=self.bn_bf16_bwd,
                    name=f"layer{stage + 1}_{block}",
                )(x, train=train)

        # global average pool (the reference swaps in AdaptiveAvgPool2d(1),
        # /root/reference/models/posenet.py:44)
        x = jnp.mean(x, axis=(1, 2))
        return x


def resnet34(dtype: Any = jnp.float32, name: str | None = None,
             bn_bf16_bwd: bool = False) -> ResNet:
    """ResNet-34 trunk — the reference's feature extractor."""
    return ResNet(stage_sizes=(3, 4, 6, 3), dtype=dtype, name=name,
                  bn_bf16_bwd=bn_bf16_bwd)


def resnet18(dtype: Any = jnp.float32, name: str | None = None,
             bn_bf16_bwd: bool = False) -> ResNet:
    """ResNet-18 trunk (lighter option for ablations/tests)."""
    return ResNet(stage_sizes=(2, 2, 2, 2), dtype=dtype, name=name,
                  bn_bf16_bwd=bn_bf16_bwd)


def resnet50(dtype: Any = jnp.float32, name: str | None = None,
             bn_bf16_bwd: bool = False) -> ResNet:
    """ResNet-50 trunk (2048-d features): the reference's PoseNet accepts any
    torchvision trunk (/root/reference/models/posenet.py:36-46), so heavier
    backbones are first-class here too."""
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck, dtype=dtype,
                  name=name, bn_bf16_bwd=bn_bf16_bwd)
