"""Corpus example: encode many WAV files with cross-file device batching."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flacenc_tpu import config
from flacenc_tpu.parallel import encode_corpus
from flacenc_tpu.wav import WavFileSource


def main(paths, out_dir):
    sources = [(p, WavFileSource(p)) for p in paths]
    streams, stats = encode_corpus(
        sources, config.Encoder().into_verified(), 4096
    )
    os.makedirs(out_dir, exist_ok=True)
    for path, stream in streams.items():
        name = os.path.splitext(os.path.basename(path))[0] + ".flac"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(stream.to_bytes())
    print(f"{stats.files} files, {stats.frames} frames in {stats.batches} device batches")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(f"usage: {sys.argv[0]} input.wav [input2.wav ...] out_dir",
              file=sys.stderr)
        sys.exit(64)  # EX_USAGE
    main(sys.argv[1:-1], sys.argv[-1])
