"""VidLoc: bidirectional-LSTM video relocalization baseline (CVPR'17).

Reference parity: /root/reference/models/vidloc.py — a ResNet trunk encodes
each frame, a bidirectional LSTM smooths the per-frame features over the
sequence, and a linear head regresses the 6-DoF pose per frame. The reference
keeps it unreachable from its CLIs (scripts/train.py:31-32); it is included
here for completeness and as the recurrent-model example.

TPU-native: the recurrence runs under ``flax.linen.RNN`` (``lax.scan`` inside
— one compiled program, no per-step Python), and the trunk processes all
frames of all sequences as one batched conv workload before the scan. There
is no hidden-state reset/detach bookkeeping — state is threaded functionally.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .resnet import kaiming_normal, resnet34

__all__ = ["VidLoc"]


class VidLoc(nn.Module):
    """(N, T, H, W, 3) video -> (N, T, 6) poses.

    :param feature_extractor: per-frame trunk -> (n, F) features
    :param hidden_size: LSTM hidden width per direction
    :param bidirectional: run forward+backward passes and concat
    """

    feature_extractor: nn.Module = None
    hidden_size: int = 512
    bidirectional: bool = True
    droprate: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        trunk = self.feature_extractor
        if trunk is None:
            trunk = resnet34(self.dtype, name="feature_extractor")

        n, t = x.shape[0], x.shape[1]
        feats = trunk(x.reshape((n * t,) + x.shape[2:]), train=train)
        feats = feats.reshape(n, t, -1).astype(self.dtype)
        if self.droprate > 0:
            feats = nn.Dropout(rate=self.droprate,
                               deterministic=not train)(feats)

        # name the cells explicitly: nn.RNN does not adopt the cell into its
        # own scope, so the cell name IS the checkpoint key. The layout per
        # cell matches torch nn.LSTM via convert_lstm_weights
        # (tests/test_lstm_golden.py pins it against a real torch forward).
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size, name="lstm_fwd"))
        h = fwd(feats)
        if self.bidirectional:
            bwd = nn.RNN(
                nn.OptimizedLSTMCell(self.hidden_size, name="lstm_bwd"),
                reverse=True, keep_order=True,
            )
            h = jnp.concatenate([h, bwd(feats)], axis=-1)

        pose = nn.Dense(
            6, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=kaiming_normal, name="fc_pose",
        )(h)
        return pose.astype(jnp.float32)
