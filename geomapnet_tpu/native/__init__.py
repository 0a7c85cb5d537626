"""Native (C++) batch image decoder, exposed through ctypes.

Build once with ``python -m geomapnet_tpu.native.build`` (g++ + libpng/libjpeg,
both standard on Linux). The Python side degrades gracefully: when the shared
library is absent, callers fall back to the PIL path.

Why native: the reference decodes images in Python worker processes
(/root/reference/common/train.py:180-188); on a TPU host the CPU:chip ratio
makes that the bottleneck. ``decode_batch`` decodes and resizes a whole batch
with a C++ thread pool directly into one contiguous array — zero Python
per-image work, and IO overlaps decode even on few cores.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

__all__ = [
    "available",
    "decode_batch",
    "decode_batch_gray",
    "decode_image",
    "io_backend",
    "lib_path",
]

_LIB = None
_TRIED = False


def lib_path() -> Path:
    return Path(__file__).parent / "libgeomapnet_io.so"


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = lib_path()
    if not path.exists():
        return None
    lib = ctypes.CDLL(str(path))
    lib.gm_decode_image.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int,
    ]
    lib.gm_decode_image.restype = ctypes.c_int
    lib.gm_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.gm_decode_batch.restype = ctypes.c_int
    lib.gm_decode_batch_gray.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.gm_decode_batch_gray.restype = ctypes.c_int
    try:
        lib.gm_decode_batch_gray16.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.gm_decode_batch_gray16.restype = ctypes.c_int
    except AttributeError:
        # a .so built before the 16-bit depth entry point; rebuild via
        # `python -m geomapnet_tpu.native.build`
        pass
    _LIB = lib
    return lib


def available() -> bool:
    """True when the native library is built and loadable."""
    return _load() is not None


def io_backend() -> str | None:
    """Batch-read backend the library chose for this process.

    ``"io_uring"`` (async kernel reads; the default where the kernel and
    seccomp policy allow it — set ``GM_DISABLE_URING=1`` to opt out) or
    ``"pread"`` (synchronous fallback). None when the library is not built
    or predates the async reader.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "gm_io_backend"):
        return None
    lib.gm_io_backend.restype = ctypes.c_char_p
    return lib.gm_io_backend().decode()


def decode_image(path: str, out_h: int, out_w: int) -> np.ndarray | None:
    """Decode+resize one image to (out_h, out_w, 3) uint8 (None on failure)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built; run "
                           "`python -m geomapnet_tpu.native.build`")
    out = np.empty((out_h, out_w, 3), np.uint8)
    ok = lib.gm_decode_image(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h, out_w,
    )
    return out if ok else None


def decode_batch(paths, out_h: int, out_w: int, n_threads: int = 4
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Decode+resize a batch into (N, out_h, out_w, 3) uint8.

    Returns (batch, ok_mask); failed images leave their slot unspecified and
    are flagged False in the mask (callers substitute a neighbor, mirroring
    the safe_collate semantics).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built; run "
                           "`python -m geomapnet_tpu.native.build`")
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    ok = np.zeros(n, np.uint8)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.gm_decode_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h, out_w, n_threads,
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out, ok.astype(bool)


def decode_batch_gray16(paths, h: int, w: int, n_threads: int = 4
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Decode 16-bit single-channel PNGs (7Scenes depth, values in mm) into
    (N, h, w) uint16 at native resolution. Images whose size or bit depth
    differ are flagged failed in the ok mask."""
    lib = _load()
    if lib is None or not hasattr(lib, "gm_decode_batch_gray16"):
        raise RuntimeError("native library not built (or stale); run "
                           "`python -m geomapnet_tpu.native.build`")
    n = len(paths)
    out = np.empty((n, h, w), np.uint16)
    ok = np.zeros(n, np.uint8)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.gm_decode_batch_gray16(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        h, w, n_threads,
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out, ok.astype(bool)


def decode_batch_gray(paths, h: int, w: int, n_threads: int = 4
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Decode raw single-channel (Bayer) PNGs into (N, h, w) uint8.

    No resize and no channel promotion — the mosaic ships to the device
    intact for the fused demosaic pipeline (geomapnet_tpu.ops). Images whose
    native size differs from (h, w) are flagged failed in the ok mask.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built; run "
                           "`python -m geomapnet_tpu.native.build`")
    n = len(paths)
    out = np.empty((n, h, w), np.uint8)
    ok = np.zeros(n, np.uint8)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.gm_decode_batch_gray(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, n_threads,
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out, ok.astype(bool)
