"""Library usage example: encode PCM from memory, verify, decode back."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import flacenc_tpu
from flacenc_tpu import config, sigen
from flacenc_tpu.component import decode_stream, parse_stream
from flacenc_tpu.component.verify import verify_stream
from flacenc_tpu.source import MemSource


def main():
    # 2 seconds of synthetic stereo audio
    n = 88200
    pcm = np.zeros(2 * n, np.int32)
    pcm[0::2] = sigen.Sine(100, 0.5).noise_with_seed(1, 0.01).to_vec_quantized(16, n)
    pcm[1::2] = sigen.Sine(101, 0.5).noise_with_seed(2, 0.01).to_vec_quantized(16, n)

    cfg = config.Encoder()
    cfg.subframe_coding.qlpc.lpc_order = 12  # customize like the reference
    verified = cfg.into_verified()

    stream = flacenc_tpu.encode_with_fixed_block_size(
        verified, MemSource(pcm, 2, 16, 44100), cfg.block_size
    )
    verify_stream(stream)
    data = stream.to_bytes()
    print(f"{len(pcm) * 2} PCM bytes -> {len(data)} FLAC bytes "
          f"({len(data) / (len(pcm) * 2):.3f})")

    decoded = decode_stream(parse_stream(data))
    assert np.array_equal(decoded, pcm)
    print("lossless round trip verified")


if __name__ == "__main__":
    main()
