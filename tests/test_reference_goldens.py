"""Remaining reference golden tests, ported systematically (VERDICT r1 #6).

Each test cites the reference `#[test]` it reproduces; together with the
ports already spread across test_utils/test_rice/test_lpc/test_coding/
test_component, COVERAGE.md's appendix maps every golden-bearing reference
test to a repo test. These literal bit patterns / digests / sizes are the
strongest independent-decoder substitute available on this box (no `flac`
binary, no network).
"""

import numpy as np
import pytest

from flacenc_tpu import config, sigen, source
from flacenc_tpu.bitio import BitSink
from flacenc_tpu.component.datatype import (
    BlockSizeSpec,
    ChannelAssignment,
    Frame,
    FrameHeader,
    SampleRateSpec,
    SampleSizeSpec,
    StreamInfo,
    Verbatim,
)
from flacenc_tpu.errors import VerifyError
from flacenc_tpu.source import Context, FrameBuf, MemSource, le_bytes_to_samples


def _bits(s: str) -> str:
    """Bit content of a to_bitstring pattern (drop grouping and padding)."""
    return s.replace("_", "").rstrip("*")


def make_verbatim_frame(info: StreamInfo, samples: np.ndarray, offset: int) -> Frame:
    """test_helper.rs:223-248 (channel-major sample layout, StartSample)."""
    channels = info.channels
    block_size = len(samples) // channels
    header = FrameHeader(
        BlockSizeSpec.from_size(block_size),
        ChannelAssignment.independent(channels),
        SampleSizeSpec.from_bits(info.bits_per_sample),
        SampleRateSpec.from_freq(info.sample_rate) or SampleRateSpec.UNSPECIFIED,
    )
    header.set_start_sample_number(offset)
    subframes = [
        Verbatim(
            np.asarray(samples[block_size * ch: block_size * (ch + 1)], np.int32),
            info.bits_per_sample,
        )
        for ch in range(channels)
    ]
    return Frame(header, subframes)


# ---------------------------------------------------------------------------
# bitsink.rs test matrix (747-933)
# ---------------------------------------------------------------------------


def test_u64vec_write_msb_patterns():
    # bitsink.rs:797-845 (u64vec_write_msb); our sink is byte-backed, so
    # compare bit content rather than the u64 grouping
    s = BitSink()
    s.write_msbs(0xFF, 8, 3)
    assert _bits(s.to_bitstring()) == "111"
    s.write_msbs(0, 16, 15)
    assert _bits(s.to_bitstring()) == "111" + "0" * 15
    s.write_msbs((1 << 64) - 1, 64, 45)
    assert _bits(s.to_bitstring()) == "111" + "0" * 15 + "1" * 45
    s.write_msbs(0xAAAA_AAAA_AAAA_AAAA, 64, 60)
    assert _bits(s.to_bitstring()) == (
        "111" + "0" * 15 + "1" * 45 + "10" * 30
    )
    s.align_to_byte()
    assert _bits(s.to_bitstring()) == (
        "111" + "0" * 15 + "1" * 45 + "10" * 30 + "00000"
    )
    s.write_msbs(0xAAAA_AAAA_AAAA_AAAA, 64, 60)
    assert _bits(s.to_bitstring()).endswith("10" * 30)


def test_bytevec_write_lsb_patterns():
    # bitsink.rs:847-863 (bytevec_write_lsb)
    s = BitSink()
    s.write_lsbs(0xFF, 3)
    s.write_lsbs(0x0, 12)
    s.write_lsbs(0xFFFF_FFFF, 9)
    s.write_lsbs(0x0, 8)
    assert s.to_bitstring() == "11100000_00000001_11111111_00000000"

    s = BitSink()
    s.write_lsbs(0xFF, 3)
    s.write_lsbs(0x0, 12)
    s.write_lsbs(0xFFFF_FFFF, 9)
    s.write_lsbs(0x0, 5)
    assert s.to_bitstring() == "11100000_00000001_11111111_00000***"


def test_write_zeros_pattern():
    # bitsink.rs:882-896 (u64vec_write_zeros)
    s = BitSink()
    s.write_lsbs(0xFF, 3)
    assert _bits(s.to_bitstring()) == "111"
    s.write_zeros(15)
    assert _bits(s.to_bitstring()) == "111" + "0" * 15


def test_u64vec_mixed_ops_pattern():
    # bitsink.rs:899-933 (u64vec): msbs + aligned bytes + lsbs
    s = BitSink()
    s.write_msbs(0xFFFF_FFFF, 32, 17)
    assert _bits(s.to_bitstring()) == "1" * 17
    assert len(s) == 17
    s.align_to_byte()  # reference MemSink<u64> pads before the byte blit
    s.write_bytes_aligned(bytes([0xCA, 0xFE]))
    assert _bits(s.to_bitstring()) == "1" * 17 + "0" * 7 + "1100101011111110"
    assert len(s) == 40
    s.write_lsbs(1, 2)
    assert len(s) == 42
    s.write_lsbs(0xAAAA_AAAA, 31)
    assert _bits(s.to_bitstring()) == (
        "1" * 17 + "0" * 7 + "1100101011111110" + "01"
        + format(0xAAAA_AAAA & ((1 << 31) - 1), "031b")
    )
    assert len(s) == 73


# ---------------------------------------------------------------------------
# source.rs tests (640-748)
# ---------------------------------------------------------------------------


def test_reading_and_deinterleaving():
    # source.rs:647-673
    block_size, channels = 512, 4
    signal = np.repeat(np.arange(block_size, dtype=np.int32), channels)
    src = MemSource(signal, channels, 16, 16000)
    fb = FrameBuf(channels, block_size)
    ctx = Context(16, channels)
    read = src.read_samples(block_size, (fb, ctx))
    assert read == block_size
    for ch in range(channels):
        assert np.array_equal(fb.channel_slice(ch), np.arange(block_size))


def test_sequential_read():
    # source.rs:677-721
    total, channels, block_size = 1100, 3, 128
    signal = np.empty(total * channels, np.int32)
    t = np.arange(total, dtype=np.int32)
    signal[0::3], signal[1::3], signal[2::3] = t, -t, -t
    src = MemSource(signal, channels, 16, 16000)
    fb = FrameBuf(channels, block_size)
    ctx = Context(16, channels)
    for step in range(8):
        read = src.read_samples(block_size, (fb, ctx))
        assert read == 128
        base = block_size * step
        assert np.array_equal(fb.channel_slice(0), np.arange(base, base + 128))
        assert np.array_equal(fb.channel_slice(1), -np.arange(base, base + 128))
    read = src.read_samples(block_size, (fb, ctx))
    assert read == 76
    assert np.array_equal(fb.channel_slice(0)[:76], np.arange(1024, 1100))
    assert np.array_equal(fb.channel_slice(2)[:76], -np.arange(1024, 1100))


def test_md5_computation_goldens():
    # source.rs:723-748 (digests computed with Python hashlib / a reliable
    # build of the reference)
    ctx = Context(16, 2)
    ctx.fill_interleaved(np.zeros(32 * 2, np.int32))
    assert ctx.md5_digest() == bytes([
        0xF0, 0x9F, 0x35, 0xA5, 0x63, 0x78, 0x39, 0x45,
        0x8E, 0x46, 0x2E, 0x63, 0x50, 0xEC, 0xBC, 0xE4,
    ])

    ctx = Context(16, 2)
    ctx.fill_interleaved(np.full(32 * 2, 0xABCD, np.int32))
    assert ctx.md5_digest() == bytes([
        0x02, 0x3D, 0x3A, 0xE9, 0x26, 0x0B, 0xB0, 0xC9,
        0x51, 0xF6, 0x5B, 0x25, 0x24, 0x62, 0xB1, 0xFA,
    ])


# ---------------------------------------------------------------------------
# arrayutils.rs byte-conversion goldens (712-728)
# ---------------------------------------------------------------------------


def test_convert_le_bytes_to_ints():
    # arrayutils.rs:712-719
    data = bytes([0x56, 0x34, 0x12, 0x9B, 0x57, 0x13,
                  0xFF, 0xFF, 0xFF, 0xAC, 0x68, 0x24])
    assert le_bytes_to_samples(data, 3).tolist() == [
        0x12_3456, 0x13_579B, -1, 0x24_68AC
    ]


def test_convert_bytes_to_i8s():
    # arrayutils.rs:722-728
    data = bytes([0x56, 0x34, 0x12, 0x9B, 0x80, 0x13, 0xFF, 0x68])
    assert le_bytes_to_samples(data, 1).tolist() == [
        0x56, 0x34, 0x12, -0x65, -0x80, 0x13, -0x01, 0x68
    ]


# ---------------------------------------------------------------------------
# component.rs tests (80-130)
# ---------------------------------------------------------------------------


def test_stream_info_update_golden_sizes():
    # component.rs:80-109 (779/1034-byte frame-size goldens)
    info = StreamInfo(44100, 2, 16)
    fb1 = sigen.Dc(0.01).noise(0.002).to_vec_quantized(16, 256 * 2)
    frame1 = make_verbatim_frame(info, fb1, 0)
    info.update_frame_info(frame1)
    fb2 = sigen.Dc(0.02).noise(0.1).to_vec_quantized(16, 192 * 2)
    frame2 = make_verbatim_frame(info, fb2, 256)
    info.update_frame_info(frame2)

    assert info.min_block_size == 192
    assert info.max_block_size == 256
    assert info.min_frame_size == 779
    assert info.max_frame_size == 1034


def test_frame_bitstream_precomputation():
    # component.rs:111-130
    info = StreamInfo(44100, 2, 16)
    samples = sigen.Sine(128, 0.2).noise(0.1).to_vec_quantized(12, 512)
    frame = make_verbatim_frame(info, samples, 0)
    ref_sink = BitSink()
    frame.write(ref_sink)
    assert len(ref_sink) % 8 == 0  # frame must be byte-aligned

    frame2 = make_verbatim_frame(info, samples, 0)
    frame2.precompute_bitstream()
    assert frame2.precomputed_bitstream is not None
    assert frame.precomputed_bitstream is None
    sink = BitSink()
    frame2.write(sink)
    assert sink.to_bitstring() == ref_sink.to_bitstring()


# ---------------------------------------------------------------------------
# lpc.rs tests (1172-1257)
# ---------------------------------------------------------------------------

_KNOWN_COEF_SIGNAL = np.array([
    0, -512, 0, 512, 256, -256, -256, 128, 256, 0, -192, -64,
    128, 96, -64, -96, 16, 80, 16, -56, -32, 32, 36, -12,
], np.int32)


def test_lpc_with_known_coefs():
    # lpc.rs:1172-1193 (AR filter [1, -1, 0.5] sign pattern via autocorr)
    from flacenc_tpu.ops import ref_np

    coefs = ref_np.lpc_from_autocorr(
        _KNOWN_COEF_SIGNAL, config.Window.tukey(0.25), 3
    )
    assert coefs[0] > 0.0 and coefs[1] < 0.0 and coefs[2] > 0.0


def test_tukey_window_range():
    # lpc.rs:1231-1243: every weight is zero or a normal float
    from flacenc_tpu.ops.windows import get_window

    for alpha in (0.0, 0.3, 0.5, 0.8, 1.0):
        w = get_window(config.Window.tukey(alpha), 4096)
        finite_normal = (w == 0.0) | (
            np.isfinite(w) & (np.abs(w) >= np.finfo(np.float32).tiny)
        )
        assert finite_normal.all(), alpha


# ---------------------------------------------------------------------------
# config.rs verification + serde tests (439-599)
# ---------------------------------------------------------------------------


def test_verification_for_encoder():
    # config.rs:439-465 (block_size range; our schema verifies on the gate)
    config.Encoder().verify()
    c = config.Encoder()
    c.block_size = 1234
    c.verify()
    for bad in (1, 123_456):
        c = config.Encoder()
        c.block_size = bad
        with pytest.raises(VerifyError):
            c.verify()


def test_verification_for_subframe_coding_propagates():
    # config.rs:474-486
    config.Encoder().subframe_coding.verify()
    c = config.Encoder()
    c.subframe_coding.prc.max_parameter = 1234
    with pytest.raises(VerifyError):
        c.subframe_coding.verify()


def test_verification_for_prc_and_qlpc():
    # config.rs:488-546
    config.Encoder().subframe_coding.prc.verify()
    c = config.Encoder()
    c.subframe_coding.prc.max_parameter = 31
    with pytest.raises(VerifyError):
        c.subframe_coding.prc.verify()
    c = config.Encoder()
    c.subframe_coding.qlpc.lpc_order = 39
    with pytest.raises(VerifyError):
        c.subframe_coding.qlpc.verify()
    c = config.Encoder()
    c.subframe_coding.qlpc.quant_precision = 256
    with pytest.raises(VerifyError):
        c.subframe_coding.qlpc.verify()
    # experimental features always ship here (config.rs:503-546 gates them
    # behind the `experimental` cargo feature; deviation noted in DESIGN.md)
    c = config.Encoder()
    c.subframe_coding.qlpc.use_direct_mse = True
    c.subframe_coding.qlpc.verify()
    c.subframe_coding.qlpc.mae_optimization_steps = 20
    c.subframe_coding.qlpc.verify()


def test_config_toml_defaults_and_partial_overrides():
    # config.rs:556-599 (deserialization / empty source / verify-after)
    c = config.Encoder.from_toml("[subframe_coding.qlpc]\nlpc_order = 7\n")
    assert c.subframe_coding.qlpc.lpc_order == 7
    assert c.subframe_coding.qlpc.quant_precision == 15
    assert c.block_size == 4096
    assert c.subframe_coding.use_lpc

    empty = config.Encoder.from_toml("")
    assert empty.to_toml() == config.Encoder().to_toml()

    bad = config.Encoder.from_toml("[subframe_coding.qlpc]\nlpc_order = 256\n")
    with pytest.raises(VerifyError):
        bad.verify()


# ---------------------------------------------------------------------------
# parser.rs element round trips (763-1031); stream-level round trips are
# covered everywhere else, these pin the element encoders
# ---------------------------------------------------------------------------


def test_parser_utf8_code_roundtrip_vectors():
    # parser.rs:884-905 + component.rs:60-77
    from flacenc_tpu.utils.utf8like import encode_to_utf8like
    from flacenc_tpu.component.parser import BitReader, parse_utf8like

    for x in (0, 76, 195, 256, 257, 1000, 1023, 1024, 65535, 65536,
              68000, (1 << 36) - 1):
        code = encode_to_utf8like(x)
        r = BitReader(code)
        assert parse_utf8like(r) == x, x
        assert r.at_end(), x


def test_parser_frame_header_matrix():
    # parser.rs:873-882 grid: header to_bytes survives a stream round trip
    from flacenc_tpu.models import reference_encoder as re
    from flacenc_tpu.component import parse_stream

    for block_size in (192, 1152, 127, 298, 1024):
        for rate in (88200, 3, 65535, 95900):
            x = np.zeros(2 * block_size, np.int32)
            x[0::2] = sigen.Sine(40, 0.3).to_vec_quantized(16, block_size)
            x[1::2] = x[0::2]
            s = re.encode_with_fixed_block_size(
                config.Encoder().into_verified(),
                MemSource(x, 2, 16, rate), block_size,
            )
            data = s.to_bytes()
            parsed = parse_stream(data)
            assert parsed.to_bytes() == data, (block_size, rate)


def test_prc_max_bits_saturation():
    # rice.rs:415-420: cost table entries are bounded by (1<<27)-1
    import jax.numpy as jnp

    from flacenc_tpu.ops import rice as ops_rice

    z = jnp.asarray([[0x0FFF_FFFE, 0x0100_0000]], dtype=jnp.uint32)
    warm = jnp.zeros((1,), jnp.int32)
    tables = ops_rice._finest_tables(z, warm, 0, 2)
    assert int(tables[0, 0, 0]) == ops_rice.MAX_P_TO_BITS


def test_parser_unary_code_goldens():
    # parser.rs:1009-1029
    from flacenc_tpu.component.parser import BitReader

    r = BitReader(bytes([0x01]))
    assert r.read_unary() == 7

    r = BitReader(bytes([0x81]))
    r.read(1)
    assert r.read_unary() == 6

    r = BitReader(bytes([0x80, 0x0F]))
    r.read(1)
    assert r.read_unary() == 11

    r = BitReader(bytes([0xDF]))
    r.read(2)
    assert r.read_unary() == 1


def test_parser_unsigned_to_signed_goldens():
    # parser.rs:1031-1034 (u_to_i): two's-complement reinterpretation
    from flacenc_tpu.component.parser import BitReader

    r = BitReader(bytes([127]))
    assert r.read_signed(8) == 127
    r = BitReader(bytes([128]))
    assert r.read_signed(8) == -128


def test_seekable_read_samples_from():
    # source.rs:499-538 (Seekable trait): len/is_empty/read_samples_from
    from flacenc_tpu.source import Seekable

    total, channels = 600, 2
    sig = np.arange(total * channels, dtype=np.int32)
    src = MemSource(sig, channels, 16, 44100)
    assert isinstance(src, Seekable)
    assert len(src) == total and not src.is_empty()
    fb = FrameBuf(channels, 128)
    got = src.read_samples_from(100, 128, fb)
    assert got == 128
    assert fb.channel_slice(0)[0] == 100 * channels
    assert fb.channel_slice(1)[0] == 100 * channels + 1
    # empty source
    assert MemSource(np.zeros(0, np.int32), 2, 16, 44100).is_empty()


def test_config_canonical_doc_toml():
    # config.rs:22-55 — the reference's canonical documentation TOML
    toml = """
block_size = 4096
multithread = true

[stereo_coding]
use_leftside = true
use_rightside = true
use_midside = true

[subframe_coding]
use_constant = true
use_fixed = true
use_lpc = true

[subframe_coding.fixed]
max_order = 4

[subframe_coding.fixed.order_sel]
type = "ApproxEnt"
partitions = 32

[subframe_coding.qlpc]
lpc_order = 10
quant_precision = 15
use_direct_mse = false
mae_optimization_steps = 0

[subframe_coding.qlpc.window]
type = "Tukey"
alpha = 0.4

[subframe_coding.prc]
max_parameter = 14
"""
    c = config.Encoder.from_toml(toml)
    c.verify()
    assert c.block_size == 4096
    assert c.subframe_coding.fixed.order_sel.partitions == 32
    assert c.subframe_coding.prc.max_parameter == 14
    assert c.subframe_coding.qlpc.window.type == "Tukey"
    assert c.subframe_coding.qlpc.window.alpha == 0.4


def test_large_block_sizes_roundtrip():
    """Block-size edges: T=16384 (finest partition order 8 on the device
    path) and the maximum odd T=32767 (trailing-zeros=0 -> single
    partition, constant.rs:57) both stay lossless."""
    from flacenc_tpu.models import batch_encoder as be
    from flacenc_tpu.models import reference_encoder as re
    from flacenc_tpu.component import decode_stream, parse_stream
    from flacenc_tpu.ops.rice import finest_partition_order

    assert finest_partition_order(16384, 64) == 8
    assert finest_partition_order(32767, 64) == 0

    n = 16384 * 2 + 777
    x = np.zeros(2 * n, np.int32)
    x[0::2] = sigen.Sine(500, 0.4).noise_with_seed(1, 0.03).to_vec_quantized(16, n)
    x[1::2] = sigen.Sine(501, 0.4).noise_with_seed(2, 0.03).to_vec_quantized(16, n)
    d = be.encode_with_fixed_block_size(
        config.Encoder().into_verified(), MemSource(x, 2, 16, 44100),
        16384, batch_size=2,
    ).to_bytes()
    assert np.array_equal(decode_stream(parse_stream(d)), x)

    n2 = 32767 + 100
    y = np.zeros(2 * n2, np.int32)
    y[0::2] = sigen.Sine(321, 0.3).noise_with_seed(5, 0.02).to_vec_quantized(16, n2)
    y[1::2] = y[0::2]
    d2 = re.encode_with_fixed_block_size(
        config.Encoder().into_verified(), MemSource(y, 2, 16, 44100), 32767
    ).to_bytes()
    assert np.array_equal(decode_stream(parse_stream(d2)), y)
