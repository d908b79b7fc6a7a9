"""Builds the native packer shared library with g++.

Run directly (``python flacenc_tpu/native/build.py``) or let
``flacenc_tpu.native`` auto-build on first import.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "packer.cpp")
LIB = os.path.join(HERE, "libflacenc_packer.so")


def build(force: bool = False) -> str:
    if not force and os.path.exists(LIB) and os.path.getmtime(LIB) >= os.path.getmtime(SRC):
        return LIB
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-fno-exceptions", "-fno-rtti", "-pthread", SRC, "-o", LIB,
    ]
    subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
