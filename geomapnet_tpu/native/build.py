"""Build the native image-IO library: ``python -m geomapnet_tpu.native.build``."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path


def build(verbose: bool = True) -> Path:
    src = Path(__file__).parent / "imageio.cc"
    out = Path(__file__).parent / "libgeomapnet_io.so"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(src), "-o", str(out), "-lpng", "-ljpeg", "-lpthread",
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    if verbose:
        print(f"built {out}")
    return out


if __name__ == "__main__":
    sys.exit(0 if build() else 1)
