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


def test_msgpack_roundtrip_primitives():
    """utils/msgpack: codec round trip over the serde tree's type surface."""
    from flacenc_tpu.utils import msgpack as mp

    cases = [
        None, True, False, 0, 1, 127, 128, 255, 256, 65535, 65536,
        2**32 - 1, 2**32, 2**63 - 1, -1, -31, -32, -33, -128, -129,
        -32768, -32769, -2**31, -2**31 - 1, -2**63,
        1.5, -0.25, "", "a", "x" * 31, "y" * 32, "z" * 300,
        b"", b"\x00\xff" * 10, bytes(300),
        [], [1, "two", None], list(range(20)), list(range(70000)),
        {}, {"k": [1, 2, {"n": None}]},
        {f"k{i}": i for i in range(20)},
    ]
    for c in cases:
        assert mp.unpackb(mp.packb(c)) == c, repr(c)[:60]


def test_cli_dump_struct_msgpack(tmp_path):
    """--dump-struct emits msgpack (main.rs:301-316 analogue) that decodes
    back into a dict tree matching the JSON dump."""
    import json

    import numpy as np

    from flacenc_tpu import config, sigen, source
    from flacenc_tpu.cli import main
    from flacenc_tpu.models import reference_encoder as re
    from flacenc_tpu.utils import msgpack as mp
    from flacenc_tpu.wav import write_wav

    n = 2000
    x = np.zeros(2 * n, np.int32)
    x[0::2] = sigen.Sine(99, 0.4).noise_with_seed(4, 0.02).to_vec_quantized(16, n)
    x[1::2] = sigen.Sine(101, 0.4).noise_with_seed(5, 0.02).to_vec_quantized(16, n)
    write_wav(str(tmp_path / "in.wav"), x, 2, 16, 44100)
    assert main(["encode", str(tmp_path / "in.wav"),
                 "-o", str(tmp_path / "o.flac")]) == 0
    assert main(["decode", str(tmp_path / "o.flac"),
                 "-o", str(tmp_path / "b.wav"),
                 "--dump-struct", str(tmp_path / "tree.msgpack")]) == 0
    assert main(["decode", str(tmp_path / "o.flac"),
                 "-o", str(tmp_path / "b2.wav"),
                 "--dump-struct", str(tmp_path / "tree.json")]) == 0
    packed = mp.unpackb((tmp_path / "tree.msgpack").read_bytes())
    jsoned = json.loads((tmp_path / "tree.json").read_text())
    assert packed == jsoned
