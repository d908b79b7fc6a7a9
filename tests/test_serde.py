"""Component serde round-trip: a persisted Stream must re-serialize to
identical FLAC bytes (the reference's serde feature + msgpack dump,
flacenc-bin/src/main.rs:301-316)."""

import json

import numpy as np

from flacenc_tpu import config, sigen, source
from flacenc_tpu.component import serde
from flacenc_tpu.models import reference_encoder as re


def _stream():
    n = 2600
    x = np.zeros(2 * n, np.int32)
    x[0::2] = sigen.Sine(90, 0.4).noise_with_seed(1, 0.02).to_vec_quantized(16, n)
    x[1::2] = sigen.Square(70, 0.3).noise_with_seed(2, 0.02).to_vec_quantized(16, n)
    src = source.MemSource(x, 2, 16, 44100)
    return re.encode_with_fixed_block_size(config.Encoder().into_verified(), src, 1024)


def test_stream_serde_roundtrip_bytes():
    s = _stream()
    d = serde.stream_to_dict(s)
    json.dumps(d)  # must be JSON-able
    s2 = serde.stream_from_dict(d)
    assert s2.to_bytes() == s.to_bytes()


def test_stream_serde_with_metadata_and_cache(tmp_path):
    from flacenc_tpu.component import MetadataBlock

    s = _stream()
    s.add_metadata_block(MetadataBlock.new_unknown(4, b"\x01\x02\x03"))
    for f in s.frames():
        f.precompute_bitstream()
    path = tmp_path / "stream.json"
    serde.dump_stream(s, str(path), include_bitstream_cache=True)
    s2 = serde.load_stream(str(path))
    assert s2.to_bytes() == s.to_bytes()
    assert s2.frames()[0].precomputed_bitstream is not None
