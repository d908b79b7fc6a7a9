"""Builds the native shared libraries with g++.

Two deliberately SEPARATE libraries:
- ``libflacenc_packer.so`` (packer.cpp): the encoder-side bit packer and
  strict-float kernels.
- ``libflacenc_decoder.so`` (decoder.cpp): the clean-room independent
  decoder oracle, which must not link against (or share sources with)
  the packer so encoder bugs cannot cancel out in round-trip tests.

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
DEC_SRC = os.path.join(HERE, "decoder.cpp")
DEC_LIB = os.path.join(HERE, "libflacenc_decoder.so")


def _compile(src: str, lib: str, force: bool) -> str:
    if (
        not force
        and os.path.exists(lib)
        and os.path.getmtime(lib) >= os.path.getmtime(src)
    ):
        return lib
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-fno-exceptions", "-fno-rtti", "-pthread", src, "-o", lib,
    ]
    subprocess.run(cmd, check=True)
    return lib


def build(force: bool = False) -> str:
    return _compile(SRC, LIB, force)


def build_decoder(force: bool = False) -> str:
    return _compile(DEC_SRC, DEC_LIB, force)


if __name__ == "__main__":
    force = "--force" in sys.argv
    print(build(force=force))
    print(build_decoder(force=force))
