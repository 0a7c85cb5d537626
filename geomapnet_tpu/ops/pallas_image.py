"""Pallas TPU kernel: fused GBRG demosaic-half + normalize.

One VMEM pass per image: uint8 Bayer mosaic in, normalized bf16 half-res
RGB out — the fused core of the RobotCar raw pipeline
(:mod:`geomapnet_tpu.ops.image` provides the XLA composition; this kernel
is the hand-scheduled alternative, selected by benchmark).

Layout strategy (TPU vector-unit friendly):
- columns deinterleave via the uint8->uint16 bitcast trick (adjacent byte
  pairs become one lane; even col = low byte, odd col = high byte) — pure
  elementwise VPU work, no lane-stride gathers;
- rows deinterleave on the sublane axis (supported stride);
- output is written channel-planar (3, H/2, W/2) so the lane dimension stays
  wide; the caller transposes to NHWC (a cheap XLA relayout) or consumes
  planar directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["demosaic_half_normalize"]


def _kernel(raw_ref, out_ref, *, mean, std, h, w):
    # raw_ref holds the byte-pair-packed mosaic: (h, w/2) uint16 where lane i
    # carries columns (2i, 2i+1) (packed by the caller — Mosaic cannot change
    # bitwidths in-kernel)
    # Mosaic lacks a direct uint16->float cast; go through int32
    u16 = raw_ref[0].astype(jnp.int32)
    even_c = (u16 & 0xFF).astype(jnp.float32)
    odd_c = (u16 >> 8).astype(jnp.float32)

    # row deinterleave via a sublane-splitting reshape (strided slicing
    # lowers to an unsupported gather inside Mosaic)
    even_r = even_c.reshape(h // 2, 2, w // 2)
    odd_r = odd_c.reshape(h // 2, 2, w // 2)
    g0 = even_r[:, 0, :]   # (even row, even col) = G
    r = even_r[:, 1, :]    # (odd row, even col)  = R
    b = odd_r[:, 0, :]     # (even row, odd col)  = B
    g1 = odd_r[:, 1, :]    # (odd row, odd col)   = G
    g = (g0 + g1) * 0.5

    scale = 1.0 / 255.0
    out_ref[0, 0] = ((r * scale - mean[0]) / std[0]).astype(out_ref.dtype)
    out_ref[0, 1] = ((g * scale - mean[1]) / std[1]).astype(out_ref.dtype)
    out_ref[0, 2] = ((b * scale - mean[2]) / std[2]).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("mean", "std", "dtype", "planar", "interpret")
)
def demosaic_half_normalize(
    raw: jnp.ndarray,
    mean: tuple[float, float, float],
    std: tuple[float, float, float],
    dtype=jnp.bfloat16,
    planar: bool = False,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(N, H, W) uint8 GBRG -> normalized (N, H/2, W/2, 3) ``dtype``.

    ``planar=True`` returns channel-first (N, 3, H/2, W/2) without the final
    relayout (fastest when the consumer accepts planar input).
    ``interpret`` defaults to True off-TPU so the kernel stays testable on
    the CPU CI mesh (Mosaic only lowers for TPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w = raw.shape
    packed = jax.lax.bitcast_convert_type(
        raw.reshape(n, h, w // 2, 2), jnp.uint16
    )
    # block over rows so VMEM holds one block's input + intermediates + output
    # regardless of sensor height (even divisor of h, Bayer quads intact)
    bh = h
    for cand in (256, 240, 192, 160, 128, 120, 96, 80, 64, 48, 32, 16, 8, 4, 2):
        if h % cand == 0:
            bh = cand
            break
    out = pl.pallas_call(
        functools.partial(_kernel, mean=mean, std=std, h=bh, w=w),
        grid=(n, h // bh),
        in_specs=[
            pl.BlockSpec((1, bh, w // 2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, bh // 2, w // 2), lambda i, j: (i, 0, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, 3, h // 2, w // 2), dtype),
        interpret=interpret,
    )(packed)
    if planar:
        return out
    return jnp.transpose(out, (0, 2, 3, 1))
