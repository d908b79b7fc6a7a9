"""Component model tests: bit-count accuracy, golden bit patterns,
serialization round trips."""

import numpy as np
import pytest

from flacenc_tpu.bitio import BitSink
from flacenc_tpu.component import (
    BlockSizeSpec,
    ChannelAssignment,
    Constant,
    FixedLpc,
    Frame,
    FrameHeader,
    Residual,
    SampleRateSpec,
    SampleSizeSpec,
    Stream,
    StreamInfo,
    Verbatim,
)


def bit_count_matches_written(component) -> int:
    """The reference's verify_bit_counter (bitrepr.rs:96-105)."""
    sink = BitSink()
    component.write(sink)
    assert component.count_bits() == len(sink)
    return len(sink)


def make_random_residual(rng, warmup_length: int, block_size: int = 4096) -> Residual:
    """Analogue of test_helper::make_random_residual (test_helper.rs:187-221)."""
    partition_order = int(rng.integers(0, 5))
    nparts = 1 << partition_order
    params = rng.integers(0, 15, nparts).astype(np.uint8)
    part_len = block_size >> partition_order
    ps = np.repeat(params.astype(np.uint32), part_len)
    quotients = rng.integers(0, 16, block_size).astype(np.uint32)
    remainders = (
        rng.integers(0, 1 << 20, block_size).astype(np.uint32)
        & ((np.uint32(1) << ps) - 1)
    ).astype(np.uint32)
    quotients[:warmup_length] = 0
    remainders[:warmup_length] = 0
    return Residual(partition_order, block_size, warmup_length, params, quotients, remainders)


def test_write_empty_stream():
    # bitrepr.rs:611-621
    stream = Stream(44100, 2, 16)
    data = stream.to_bytes()
    assert len(data) * 8 == 32 + 1 + 7 + 24 + (16 + 16 + 24 + 24 + 20 + 3 + 5 + 36 + 128)
    assert stream.count_bits() == len(data) * 8
    assert data[:4] == b"fLaC"


def test_write_stream_info():
    info = StreamInfo(44100, 2, 16)
    sink = BitSink()
    info.write(sink)
    assert len(sink) == 16 + 16 + 24 + 24 + 20 + 3 + 5 + 36 + 128
    assert info.count_bits() == len(sink)


def test_frame_header_golden_bitstring():
    # bitrepr.rs:635-667
    header = FrameHeader(
        BlockSizeSpec.from_size(192),
        ChannelAssignment.independent(2),
        SampleSizeSpec.UNSPECIFIED,
        SampleRateSpec.UNSPECIFIED,
    )
    sink = BitSink()
    header.write(sink)
    assert sink.to_bitstring() == (
        "11111111_11111001_00010000_00010000_00000000_01101001"
    )
    assert header.count_bits() == 48
    bit_count_matches_written(header)

    # non-canonical block size requires extra bytes but must still be countable
    header2 = FrameHeader(
        BlockSizeSpec.from_size(2304),
        ChannelAssignment.independent(2),
        SampleSizeSpec.UNSPECIFIED,
        SampleRateSpec.UNSPECIFIED,
    )
    bit_count_matches_written(header2)


def test_channel_assignment_encoding():
    # bitrepr.rs:670-677
    sink = BitSink()
    ChannelAssignment.independent(8).write(sink)
    assert sink.to_bitstring() == "0111****"
    sink = BitSink()
    ChannelAssignment.right_side().write(sink)
    assert sink.to_bitstring() == "1001****"


def test_verbatim_frame_bit_count():
    # bitrepr.rs:680-705
    nch, nsamples, bps = 3, 17, 16
    header = FrameHeader(
        BlockSizeSpec.from_size(nsamples),
        ChannelAssignment.independent(nch),
        SampleSizeSpec.from_bits(bps),
        SampleRateSpec.from_freq(16000),
    )
    subframes = [
        Verbatim(np.full(nsamples, -1, dtype=np.int32), bps) for _ in range(nch)
    ]
    frame = Frame(header, subframes)
    bit_count_matches_written(header)
    for s in subframes:
        bit_count_matches_written(s)
    sink = BitSink()
    frame.write(sink)
    assert frame.count_bits() == len(sink)


@pytest.mark.parametrize("warmup", [0, 4, 12])
def test_bit_count_residual(warmup):
    # bitrepr.rs:708-717
    rng = np.random.default_rng(42 + warmup)
    for _ in range(5):
        residual = make_random_residual(rng, warmup)
        bit_count_matches_written(residual)


def test_bit_count_constant_and_fixed():
    c = Constant(4096, -123, 16)
    bit_count_matches_written(c)
    rng = np.random.default_rng(7)
    res = make_random_residual(rng, 2)
    f = FixedLpc(np.array([3, -4], dtype=np.int32), res, 16)
    bit_count_matches_written(f)


def test_block_size_spec_tags():
    # datatype.rs:1237-1248 semantics
    cases = {
        192: (1, 0),
        576: (2, 0), 1152: (3, 0), 2304: (4, 0), 4608: (5, 0),
        256: (8, 0), 4096: (12, 0), 32768: (15, 0),
        100: (6, 8), 1000: (7, 16), 32767: (7, 16),
    }
    for size, (tag, extra_bits) in cases.items():
        spec = BlockSizeSpec.from_size(size)
        assert spec.tag == tag, size
        assert spec.count_extra_bits() == extra_bits, size
        assert spec.size == size


def test_sample_rate_spec():
    assert SampleRateSpec.from_freq(44100).tag == 9
    assert SampleRateSpec.from_freq(96000).tag == 11
    khz = SampleRateSpec.from_freq(128000)
    assert khz.tag == 12 and khz.extra == 128
    dahz = SampleRateSpec.from_freq(95800)
    assert dahz.tag == 14 and dahz.extra == 9580
    hz = SampleRateSpec.from_freq(16001)
    assert hz.tag == 13 and hz.extra == 16001


def test_metadata_block_chaining():
    from flacenc_tpu.component import MetadataBlock

    stream = Stream(44100, 2, 16)
    stream.add_metadata_block(MetadataBlock.new_unknown(4, b"\x00" * 8))
    stream.add_metadata_block(MetadataBlock.new_unknown(5, b"\x01" * 4))
    data = stream.to_bytes()
    # STREAMINFO block header must not be last (0x00), block 4 not last, block 5 last
    assert data[4] == 0x00
    from flacenc_tpu.component import parse_stream

    parsed = parse_stream(data)
    assert len(parsed.metadata()) == 2
    assert parsed.metadata()[1].is_last


def test_variable_blocking_header_golden():
    # doctest golden from datatype.rs:1586-1598: block 192, mono, 8-bit,
    # 44.1kHz, start sample 123456 (variable blocking)
    header = FrameHeader(
        BlockSizeSpec.from_size(192),
        ChannelAssignment.independent(1),
        SampleSizeSpec.from_bits(8),
        SampleRateSpec.from_freq(44100),
    )
    header.set_start_sample_number(123456)
    data = header.to_bytes()
    assert list(data[:8]) == [0xFF, 0xF9, 0x19, 0x02, 0xF0, 0x9E, 0x89, 0x80]
    bit_count_matches_written(header)
