"""Device-side image preprocessing: the fused decode->tensor pipeline.

The reference does all image prep on the host in DataLoader workers (PIL
resize, SDK demosaic/undistort — /root/reference/dataset_loaders/
robotcar.py:110-125, scripts/train.py:120-128). This host has a single CPU
core, and on any TPU pod the host:chip ratio makes per-image Python work the
bottleneck — so the heavy per-pixel stages run on device here, batched and
jit-fused:

- :func:`demosaic`: batched GBRG Bayer demosaic (pure gather/arithmetic; XLA
  fuses it with the downstream stages);
- :func:`undistort`: LUT resampling as 4 gathers + bilinear weights, with the
  integer indices/weights precomputed once on the host from the camera LUT;
- :func:`resize_bilinear`: batched antialiased resize via jax.image;
- :func:`normalize`: (x/255 - mean)/std + dtype cast;
- :func:`make_device_pipeline`: composes the stages into one jit'd function
  from raw uint8 batches to model-ready bf16/f32 tensors.

Everything operates on NHWC batches with static shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "demosaic",
    "precompute_undistort_maps",
    "undistort",
    "resize_bilinear",
    "resize_shorter_side_shape",
    "normalize",
    "make_device_pipeline",
]


def demosaic(raw: jnp.ndarray) -> jnp.ndarray:
    """Batched bilinear GBRG demosaic: (N, H, W) -> (N, H, W, 3) float32.

    Device equivalent of
    :func:`geomapnet_tpu.data.robotcar_sdk.demosaic_gbrg`.
    """
    raw = raw.astype(jnp.float32)
    N, H, W = raw.shape
    pad = jnp.pad(raw, ((0, 0), (1, 1), (1, 1)), mode="reflect")

    def shift(dy, dx):
        return jax.lax.dynamic_slice(pad, (0, 1 + dy, 1 + dx), (N, H, W))

    cross = (shift(-1, 0) + shift(1, 0) + shift(0, -1) + shift(0, 1)) * 0.25
    diag = (shift(-1, -1) + shift(-1, 1) + shift(1, -1) + shift(1, 1)) * 0.25
    horiz = (shift(0, -1) + shift(0, 1)) * 0.5
    vert = (shift(-1, 0) + shift(1, 0)) * 0.5

    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) % 2
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) % 2
    g_mask = row == col              # G at (even,even) and (odd,odd)
    b_mask = (row == 0) & (col == 1)
    r_mask = (row == 1) & (col == 0)

    green = jnp.where(g_mask, raw, cross)
    red = jnp.where(
        r_mask, raw,
        jnp.where(b_mask, diag, jnp.where(g_mask & (row == 1), horiz, vert)),
    )
    blue = jnp.where(
        b_mask, raw,
        jnp.where(r_mask, diag, jnp.where(g_mask & (row == 0), horiz, vert)),
    )
    return jnp.clip(jnp.stack([red, green, blue], axis=-1), 0.0, 255.0)


def demosaic_half(raw: jnp.ndarray) -> jnp.ndarray:
    """Half-resolution demosaic: (N, H, W) GBRG -> (N, H//2, W//2, 3).

    Each 2x2 Bayer quad (G B / R G) yields one RGB pixel directly:
    R = the quad's red sample, G = mean of its two greens, B = its blue.
    This fuses demosaic + the first antialias octave into strided slices —
    no full-resolution RGB intermediate ever hits HBM, which makes it the
    fast path when the target size is <= half the sensor size (RobotCar
    960x1280 -> 256x341 always qualifies).
    """
    n, h, w = raw.shape
    if raw.dtype == jnp.uint8:
        # column deinterleave via byte bitcast: adjacent uint8 pairs become
        # one uint16 lane, so even/odd columns fall out of a mask and a shift
        # (elementwise on the vector unit — lane-stride-2 slicing would
        # lower to slow gathers instead)
        u16 = jax.lax.bitcast_convert_type(
            raw.reshape(n, h, w // 2, 2), jnp.uint16
        )
        even_c = (u16 & 0xFF).astype(jnp.float32)       # cols 0, 2, 4, ...
        odd_c = (u16 >> 8).astype(jnp.float32)          # cols 1, 3, 5, ...
    else:
        raw = raw.astype(jnp.float32)
        even_c = raw[:, :, 0::2]
        odd_c = raw[:, :, 1::2]
    # row deinterleave on the sublane axis (cheap on TPU)
    g0 = even_c[:, 0::2]   # (even row, even col) = G
    b = odd_c[:, 0::2]     # (even row, odd col)  = B
    r = even_c[:, 1::2]    # (odd row, even col)  = R
    g1 = odd_c[:, 1::2]    # (odd row, odd col)   = G
    return jnp.stack([r, (g0 + g1) * 0.5, b], axis=-1)


def precompute_undistort_maps(lut: np.ndarray, height: int, width: int):
    """LUT (2, H*W) of float64 source coords -> static gather indices/weights.

    Returns int32 (H, W) arrays y0, x0 and float32 (H, W) fractional parts —
    host-side one-time work so the device undistort is pure gathers.
    """
    lx = lut[0].reshape(height, width)
    ly = lut[1].reshape(height, width)
    x0 = np.clip(np.floor(lx), 0, width - 1).astype(np.int32)
    y0 = np.clip(np.floor(ly), 0, height - 1).astype(np.int32)
    fx = (lx - x0).astype(np.float32)
    fy = (ly - y0).astype(np.float32)
    return y0, x0, fy, fx


def undistort(img: jnp.ndarray, y0, x0, fy, fx) -> jnp.ndarray:
    """Batched LUT undistortion: (N, H, W, C) + precomputed maps -> same shape."""
    H, W = img.shape[1], img.shape[2]
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    fy = fy[None, :, :, None]
    fx = fx[None, :, :, None]
    im = img.astype(jnp.float32)
    return (
        im[:, y0, x0] * (1 - fx) * (1 - fy)
        + im[:, y0, x1] * fx * (1 - fy)
        + im[:, y1, x0] * (1 - fx) * fy
        + im[:, y1, x1] * fx * fy
    )


def resize_shorter_side_shape(h: int, w: int, size: int) -> tuple[int, int]:
    """Target (H, W) for a shortest-side resize (torchvision Resize(int))."""
    if w <= h:
        return max(1, round(h * size / w)), size
    return size, max(1, round(w * size / h))


def box_halve(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 box downsample: (N, H, W, C) -> (N, H//2, W//2, C).

    A reshape+mean, which XLA compiles to a trivial reduction — used as the
    antialias prefilter octave (large antialiased gathers at RobotCar
    resolution compile pathologically slowly on this toolchain).
    """
    n, h, w, c = img.shape
    img = img[:, : h - h % 2, : w - w % 2]
    return img.reshape(n, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int,
                    antialias: bool = True) -> jnp.ndarray:
    """Batched resize (N, H, W, C) -> (N, out_h, out_w, C).

    Downscales > 2x are prefiltered with 2x2 box octaves (cheap, fast to
    compile), then a plain bilinear resize covers the remainder — closely
    approximating PIL's antialiased BILINEAR without the compile cost of
    XLA's antialiased gather at megapixel sizes.
    """
    img = img.astype(jnp.float32)
    if antialias:
        while img.shape[1] >= 2 * out_h and img.shape[2] >= 2 * out_w:
            img = box_halve(img)
    n, _, _, c = img.shape
    return jax.image.resize(
        img, (n, out_h, out_w, c), method="linear", antialias=False,
    )


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear_matmul(img: jnp.ndarray, out_h: int, out_w: int
                           ) -> jnp.ndarray:
    """Separable bilinear resize as two dense matmuls (MXU-friendly).

    (N, C, H, W) channel-planar -> (N, C, out_h, out_w). Bilinear
    interpolation along each axis is a sparse linear map (2 taps/output); on
    TPU, materializing it as a dense (out, in) matrix and contracting on the
    MXU beats gather-based resampling — resampling becomes two matmuls that
    XLA fuses with neighbors. Weights match ``jax.image.resize(method=
    'linear', antialias=False)`` (half-pixel centers, edge clamp).
    """

    def weights(n_in: int, n_out: int) -> jnp.ndarray:
        scale = n_in / n_out
        src = (np.arange(n_out) + 0.5) * scale - 0.5
        i0 = np.clip(np.floor(src), 0, n_in - 1).astype(np.int64)
        i1 = np.minimum(i0 + 1, n_in - 1)
        frac = np.clip(src - i0, 0.0, 1.0)
        w = np.zeros((n_out, n_in), np.float32)
        w[np.arange(n_out), i0] += 1.0 - frac
        w[np.arange(n_out), i1] += frac
        return jnp.asarray(w)

    h, w = img.shape[-2], img.shape[-1]
    img = img.astype(jnp.float32)
    wy = weights(h, out_h)    # (out_h, H)
    wx = weights(w, out_w)    # (out_w, W)
    out = jnp.einsum("oh,nchw->ncow", wy, img,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("pw,ncow->ncop", wx, out,
                      preferred_element_type=jnp.float32)


def normalize(img: jnp.ndarray, mean, std, dtype=jnp.float32,
              scale: float = 1.0 / 255.0) -> jnp.ndarray:
    """(x * scale - mean) / std, cast to the compute dtype."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    out = (img.astype(jnp.float32) * scale - mean) / std
    return out.astype(dtype)


def make_device_pipeline(
    mean,
    std,
    resize_to: tuple[int, int] | None = None,
    undistort_maps=None,
    bayer: bool = False,
    dtype=jnp.bfloat16,
) -> Callable:
    """Compose a one-launch device pipeline: raw batch -> model input.

    :param bayer: input is (N, H, W) GBRG mosaic (RobotCar raw); else
        (N, H, W, 3) RGB
    :param undistort_maps: output of :func:`precompute_undistort_maps`
    :param resize_to: target (H, W) after geometry ops
    """

    use_pallas = jax.default_backend() == "tpu"

    @jax.jit
    def pipeline(raw: jnp.ndarray) -> jnp.ndarray:
        # tuple batches (N, T, ...) fold the frame axis into the batch for
        # the duration of the per-image stages (mirrors MapNet's reshape)
        tuple_shape = None
        if raw.ndim == (4 if bayer else 5):
            tuple_shape = raw.shape[:2]
            raw = raw.reshape((-1,) + raw.shape[2:])
        out = _pipeline_flat(raw)
        if tuple_shape is not None:
            out = out.reshape(tuple_shape + out.shape[1:])
        return out

    def _pipeline_flat(raw: jnp.ndarray) -> jnp.ndarray:
        if bayer:
            # fast path: when undistortion is off and the target fits in half
            # the sensor, demosaic directly at half resolution (no full-res
            # RGB intermediate); undistortion LUTs are defined at full
            # resolution, so that path keeps the classic demosaic. On TPU the
            # fused Pallas kernel (demosaic+normalize in one VMEM pass,
            # ops/pallas_image.py) is ~17% faster than the XLA composition;
            # normalize commutes with the linear resize, so it runs first.
            if (
                undistort_maps is None
                and resize_to is not None
                and resize_to[0] * 2 <= raw.shape[1]
                and resize_to[1] * 2 <= raw.shape[2]
            ):
                if use_pallas:
                    from .pallas_image import demosaic_half_normalize

                    # stay channel-planar through the resize; transpose only
                    # the small output (NHWC relayout at half resolution is
                    # 4x more HBM traffic than at target resolution). The
                    # separable-matmul resize runs on the MXU and fuses with
                    # the kernel output: +34% full-pipeline vs
                    # jax.image.resize (PERF.md).
                    img = demosaic_half_normalize(
                        raw, tuple(mean), tuple(std), dtype=jnp.float32,
                        planar=True,
                    )
                    img = resize_bilinear_matmul(img, *resize_to)
                    return jnp.transpose(img, (0, 2, 3, 1)).astype(dtype)
                img = demosaic_half(raw)
            else:
                img = demosaic(raw)
        else:
            img = raw.astype(jnp.float32)
        if undistort_maps is not None:
            img = undistort(img, *undistort_maps)
        if resize_to is not None:
            img = resize_bilinear(img, *resize_to)
        return normalize(img, mean, std, dtype=dtype)

    return pipeline
