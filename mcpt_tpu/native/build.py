"""Build the native library (g++ -O3 -shared) with on-demand caching.

The shared object is rebuilt automatically when the source is newer than the
cached build. No external build system needed (cmake/bazel are available in
the image but overkill for one TU); `python -m mcpt_tpu.native.build` forces
a rebuild.
"""
from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "mcpt_native.cpp")
OUT_DIR = os.path.join(_DIR, "_build")
OUT = os.path.join(OUT_DIR, "libmcpt_native.so")


def ensure_built(force: bool = False) -> str:
    """Return the .so path, building it if stale. Raises on compile failure."""
    if (
        not force
        and os.path.exists(OUT)
        and os.path.getmtime(OUT) >= os.path.getmtime(SRC)
    ):
        return OUT
    os.makedirs(OUT_DIR, exist_ok=True)
    tmp = OUT + f".tmp.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        SRC, "-o", tmp,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    os.replace(tmp, OUT)  # atomic under concurrent builders
    return OUT


if __name__ == "__main__":
    print(ensure_built(force=True))
