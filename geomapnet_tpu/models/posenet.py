"""PoseNet and MapNet pose-regression heads (Flax).

Reference parity: /root/reference/models/posenet.py.

- :class:`PoseNet`: trunk features -> fc(feat_dim) -> relu -> dropout ->
  two heads (xyz, log-q) concatenated to a 6-vector
  (/root/reference/models/posenet.py:36-73).
- :class:`MapNet`: pure reshape wrapper applying a shared-weight PoseNet to
  every frame of an (N, T, H, W, C) tuple (/root/reference/models/
  posenet.py:75-97). On TPU the T axis is folded into the batch so the MXU
  sees one large batched conv workload — there is no cross-frame compute in
  the network itself (coupling lives in the loss / PGO).
- :func:`nan_grad_guard`: TPU-native equivalent of the reference's
  ``filter_hook`` backward hook that zeroes NaN gradients flowing into the
  log-q head during MapNet++ fine-tuning (/root/reference/models/
  posenet.py:28-34, enabled at /root/reference/scripts/train.py:78): a
  ``custom_vjp`` identity that sanitizes the incoming cotangent.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .resnet import kaiming_normal, resnet34

__all__ = ["PoseNet", "MapNet", "nan_grad_guard", "posenet_head_apply"]


def posenet_head_apply(params: dict, feats: jnp.ndarray) -> jnp.ndarray:
    """Deterministic-eval PoseNet head as a pure function of its params.

    ``fc_feat -> relu -> fc_xyz / fc_wpqr -> concat`` (dropout is identity
    in deterministic eval) — exactly the head section of
    :class:`PoseNet.__call__`, for callers that split the model at the
    trunk|head boundary (pipeline-parallel stages in
    ``tests/test_pipeline.py`` and ``__graft_entry__.dryrun_multichip``).
    Equality with the full module is pinned by the pipeline tests.
    """
    h = feats @ params["fc_feat"]["kernel"] + params["fc_feat"]["bias"]
    h = jax.nn.relu(h)
    xyz = h @ params["fc_xyz"]["kernel"] + params["fc_xyz"]["bias"]
    wpqr = h @ params["fc_wpqr"]["kernel"] + params["fc_wpqr"]["bias"]
    return jnp.concatenate([xyz, wpqr], axis=-1).astype(jnp.float32)


@jax.custom_vjp
def nan_grad_guard(x: jnp.ndarray) -> jnp.ndarray:
    """Identity whose backward pass replaces NaN cotangents with zero."""
    return x


def _nan_guard_fwd(x):
    return x, None


def _nan_guard_bwd(_, g):
    return (jnp.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0),)


nan_grad_guard.defvjp(_nan_guard_fwd, _nan_guard_bwd)


class PoseNet(nn.Module):
    """Single-image 6-DoF pose regressor.

    :param feature_extractor: trunk module mapping (N, H, W, 3) -> (N, F)
    :param droprate: dropout probability after the feature fc
    :param feat_dim: width of the feature fc (reference: 2048)
    :param filter_nans: guard the log-q head against NaN gradients
    :param dtype: compute dtype of the heads
    """

    feature_extractor: nn.Module = None
    droprate: float = 0.5
    feat_dim: int = 2048
    filter_nans: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 stochastic: bool = False) -> jnp.ndarray:
        """(N, H, W, 3) -> (N, 6) ``[xyz, log-q]`` poses.

        ``stochastic=True`` keeps dropout active with ``train=False`` (BN in
        inference mode) — reproducing the reference's always-on ``F.dropout``
        quirk whose published eval numbers include it (see below).
        """
        trunk = self.feature_extractor
        if trunk is None:
            trunk = resnet34(self.dtype, name="feature_extractor")
        feats = trunk(x, train=train)

        dense = lambda n, name: nn.Dense(
            n, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=kaiming_normal, bias_init=nn.initializers.zeros,
            name=name,
        )
        feats = dense(self.feat_dim, "fc_feat")(feats)
        feats = nn.relu(feats)
        if self.droprate > 0:
            # The reference calls F.dropout without gating on eval mode, so its
            # published eval numbers include active dropout (/root/reference/
            # models/posenet.py:68-69). We default to deterministic eval;
            # `stochastic=True` reproduces the quirk for parity runs.
            feats = nn.Dropout(
                rate=self.droprate, deterministic=not (train or stochastic)
            )(feats)

        xyz = dense(3, "fc_xyz")(feats)
        wpqr = dense(3, "fc_wpqr")(feats)
        if self.filter_nans:
            wpqr = nan_grad_guard(wpqr)
        return jnp.concatenate([xyz, wpqr], axis=-1).astype(jnp.float32)


class MapNet(nn.Module):
    """Shared-weight PoseNet applied per frame of an image tuple."""

    posenet: PoseNet

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 stochastic: bool = False) -> jnp.ndarray:
        """(N, T, H, W, C) -> (N, T, 6)."""
        n, t = x.shape[0], x.shape[1]
        poses = self.posenet(x.reshape((n * t,) + x.shape[2:]), train=train,
                             stochastic=stochastic)
        return poses.reshape((n, t, -1))
