"""Profiling helper (the reference CLI's pprof wrap analogue,
flacenc-bin/src/main.rs:377-402): captures a jax.profiler trace of a
full encode for TensorBoard/Perfetto.

Usage: python tools/profile.py [--trace-dir /tmp/flacenc_trace] [--seconds 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/flacenc_trace")
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--packer", default="auto",
                    choices=["auto", "native2", "native", "python"])
    args = ap.parse_args()

    import jax

    from bench import make_audio
    from flacenc_tpu import config
    from flacenc_tpu.models import batch_encoder as be
    from flacenc_tpu.source import MemSource

    cfg = config.Encoder().into_verified()
    # warm up outside the trace so compilation doesn't dominate it
    be.encode_with_fixed_block_size(
        cfg, MemSource(make_audio(6.0), 2, 16, 44100), 4096, packer=args.packer
    )
    audio = make_audio(args.seconds)
    with jax.profiler.trace(args.trace_dir):
        be.encode_with_fixed_block_size(
            cfg, MemSource(audio, 2, 16, 44100), 4096, packer=args.packer
        )
    print(f"trace written to {args.trace_dir} (open with TensorBoard/Perfetto)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
