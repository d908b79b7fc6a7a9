"""Controller-level tests: fixed cascade, order selection, losslessness,
MD5 goldens, tail-block regressions (mirrors coding.rs tests)."""

import hashlib

import numpy as np
import pytest

from flacenc_tpu import config, sigen, source
from flacenc_tpu.component.decode import decode_stream, decode_subframe
from flacenc_tpu.component import parse_stream
from flacenc_tpu.models import reference_encoder as re
from flacenc_tpu.ops import ref_np


def test_fixed_lpc_error_computation():
    # coding.rs:708-722
    signal = sigen.Sine(32, 0.3).noise_with_seed(9, 0.1).to_vec_quantized(16, 64)
    errors = ref_np.fixed_lpc_errors(signal)
    for t in range(1, len(signal)):
        assert errors[1][t] == signal[t] - signal[t - 1]
    for t in range(2, len(signal)):
        assert errors[2][t] == signal[t] - 2 * signal[t - 1] + signal[t - 2]


def test_fixed_lpc_of_sine_lossless():
    # coding.rs:725-735
    signal = sigen.Sine(100, 0.6).to_vec_quantized(8, 1024)
    cfg = config.SubFrameCoding()
    for order in range(5):
        cfg.fixed.max_order = order
        sf = re.fixed_lpc(cfg, signal, 8, 1 << 62)
        assert sf is not None
        assert np.array_equal(decode_subframe(sf), signal)


def test_md5_invariance_golden():
    # coding.rs:738-769 — golden digest from the reference test suite
    channels, bps, rate, block = 2, 24, 16000, 128
    constant = np.float32(np.float64(23) / np.float64(1 << 23))
    signal = sigen.Dc(constant).to_vec_quantized(bps, 1024 * channels)
    assert signal[0] == 23
    src = source.MemSource(signal, channels, bps, rate)
    stream = re.encode_with_fixed_block_size(
        config.Encoder().into_verified(), src, block
    )
    assert stream.stream_info().md5 == bytes(
        [0xEE, 0x78, 0x7A, 0x6E, 0x99, 0x01, 0x36, 0x79,
         0xA5, 0xBB, 0x6D, 0x5C, 0x10, 0xAF, 0x0B, 0x87]
    )


def test_losslessness_residual_coding():
    # coding.rs:772-784
    signal = sigen.Noise(0.4, seed0=1).to_vec_quantized(8, 64)
    residual = re.encode_residual(config.Prc(), signal, 0)
    assert np.array_equal(residual.decode(), signal)

    signal = np.concatenate([
        sigen.Noise(0.9, seed0=2).to_vec_quantized(8, 2048),
        sigen.Sine(40, 0.1).to_vec_quantized(8, 2048),
    ])
    residual = re.encode_residual(config.Prc(), signal, 0)
    assert np.array_equal(residual.decode(), signal)


def test_losslessness_subframe_coding():
    # coding.rs:787-799
    cfg = config.SubFrameCoding()
    for sig in [
        sigen.Noise(0.4, seed0=3).to_vec_quantized(8, 64),
        sigen.Sine(40, 0.9).to_vec_quantized(8, 64),
    ]:
        sf = re.encode_subframe(cfg, sig, 8)
        assert np.array_equal(decode_subframe(sf), sig)


def test_encoding_zeros():
    # coding.rs:802-820
    from flacenc_tpu.component.datatype import StreamInfo
    from flacenc_tpu.source import FrameBuf

    info = StreamInfo(88200, 1, 8)
    fb = FrameBuf(1, 64)
    fb.fill_interleaved(np.zeros(64, dtype=np.int32))
    frame = re.encode_fixed_size_frame(config.Encoder().into_verified(), fb, 0, info)
    from flacenc_tpu.component.decode import decode_frame

    assert np.array_equal(decode_frame(frame), np.zeros(64, dtype=np.int32))


def _assert_fixed_block_tail_alignment(stream, signal_len, block_size):
    # coding.rs:822-858
    info = stream.stream_info()
    remainder = signal_len % block_size
    expected_frames = -(-signal_len // block_size)
    assert stream.frame_count() == expected_frames
    assert info.total_samples == signal_len
    assert info.min_block_size == info.max_block_size
    for i, frame in enumerate(stream.frames()):
        assert not frame.header().is_variable_blocking()
        assert frame.header().frame_number == i
        expected_bs = (
            remainder if (i + 1 == expected_frames and remainder) else block_size
        )
        assert frame.block_size() == expected_bs


def _roundtrip(stream, interleaved, channels, bps):
    data = stream.to_bytes()
    parsed = parse_stream(data)
    decoded = decode_stream(parsed)
    assert np.array_equal(decoded, interleaved)
    md5 = hashlib.md5(
        source.samples_to_le_bytes(np.asarray(interleaved, np.int32), -(-bps // 8))
    ).digest()
    assert parsed.stream_info().md5 == md5


@pytest.mark.parametrize(
    "block_size,signal_len,channels",
    [(4096, 102, 1), (128, 102, 1), (4096, 16123, 2)],
)
def test_fixed_block_tail_alignment(block_size, signal_len, channels):
    # coding.rs:870-942
    bps, rate = 16, 44100
    sig = sigen.Sine(1000, 0.4).noise_with_seed(5, 0.05)
    signal = sig.to_vec_quantized(bps, signal_len * channels)
    src = source.MemSource(signal, channels, bps, rate)
    stream = re.encode_with_fixed_block_size(
        config.Encoder().into_verified(), src, block_size
    )
    _assert_fixed_block_tail_alignment(stream, signal_len, block_size)
    _roundtrip(stream, signal, channels, bps)


def test_order_selector_bitcount():
    # coding.rs:945-979
    block_size, bps = 256, 16
    errors = [
        np.full(block_size, 255, np.int32),
        np.full(block_size, 256, np.int32),
        np.full(block_size, 128, np.int32),
    ]
    sel = re.select_order_and_encode_residual(
        config.OrderSel.bit_count(), config.Prc(), list(enumerate(errors)), bps, 1 << 62
    )
    assert sel is not None
    order, residual = sel
    assert order == 0
    selected_count = residual.count_bits() + order * bps
    for o, err in enumerate(errors):
        ref_res = re.encode_residual(config.Prc(), err, o)
        assert ref_res.count_bits() + bps * o >= selected_count


def test_order_selector_approxent():
    # coding.rs:982-1004
    block_size, bps = 256, 16
    errors = [
        np.full(block_size, 255, np.int32),
        np.full(block_size, 256, np.int32),
        np.full(block_size, 128, np.int32),
        np.full(block_size, 127, np.int32),
    ]
    sel = re.select_order_and_encode_residual(
        config.OrderSel.approx_ent(32), config.Prc(), list(enumerate(errors)), bps, 1 << 62
    )
    assert sel is not None
    order, _ = sel
    assert order == 2


def test_stereo_mode_search_picks_midside():
    # strongly correlated channels should pick a side mode
    n = 4096
    base = sigen.Sine(150, 0.5).noise_with_seed(3, 0.02).to_vec_quantized(16, n)
    detune = sigen.Noise(0.001, seed0=8).to_vec_quantized(16, n)
    interleaved = np.zeros(2 * n, np.int32)
    interleaved[0::2] = base
    interleaved[1::2] = base + detune
    src = source.MemSource(interleaved, 2, 16, 44100)
    stream = re.encode_with_fixed_block_size(config.Encoder().into_verified(), src, 4096)
    kinds = {f.header().channel_assignment.kind for f in stream.frames()}
    assert kinds <= {"left_side", "right_side", "mid_side"}
    _roundtrip(stream, interleaved, 2, 16)


def test_rice2_five_bit_params_roundtrip():
    """24-bit heavy-noise content drives rice params > 14 (RICE2, 5-bit
    partition params — bitrepr.rs:541-554); stream must stay lossless and
    the native packer byte-equal."""
    from flacenc_tpu.component import FixedLpc, Lpc
    from flacenc_tpu.models import batch_encoder as be

    n = 3000
    x = np.zeros(2 * n, np.int32)
    for ch in range(2):
        x[ch::2] = (
            sigen.Sine(97 + ch, 0.6).noise_with_seed(ch, 0.15)
            .to_vec_quantized(24, n)
        )
    src = source.MemSource(x, 2, 24, 96000)
    s = re.encode_with_fixed_block_size(config.Encoder().into_verified(), src, 1024)
    max_p = max(
        int(sub.residual.rice_params.max())
        for f in s.frames()
        for sub in f.subframes()
        if isinstance(sub, (Lpc, FixedLpc))
    )
    assert max_p > 14, "fixture must exercise RICE2"
    d = s.to_bytes()
    assert np.array_equal(decode_stream(parse_stream(d)), x)
    # device + native packer must agree byte-for-byte
    d_dev = be.encode_with_fixed_block_size(
        config.Encoder().into_verified(), source.MemSource(x, 2, 24, 96000), 1024
    ).to_bytes()
    assert d_dev == d


def test_async_context_matches_context():
    """AsyncContext (dedicated MD5 worker, par.rs:196-277) must produce the
    same digest and counters as the synchronous Context, via both Fill
    surfaces, and surface worker errors at finish()."""
    import numpy as np

    from flacenc_tpu.source import AsyncContext, Context

    rng = np.random.default_rng(11)
    blocks = [rng.integers(-30000, 30000, 2 * 512, dtype=np.int64).astype(np.int32)
              for _ in range(40)]
    sync = Context(16, 2)
    async_ = AsyncContext(16, 2)
    for i, b in enumerate(blocks):
        if i % 3 == 2:  # exercise the byte surface too
            from flacenc_tpu.source import samples_to_le_bytes

            data = samples_to_le_bytes(b, 2)
            sync.fill_le_bytes(data, 2)
            async_.fill_le_bytes(data, 2)
        else:
            sync.fill_interleaved(b)
            async_.fill_interleaved(b)
            b += 1  # callers may mutate after return; snapshot must hold
    assert async_.md5_digest() == sync.md5_digest()
    assert async_.total_samples() == sync.total_samples()
    assert async_.current_frame_number() == sync.current_frame_number()

    # read-then-continue (the sync Context contract, md5.copy() analogue):
    # a mid-stream digest/counter read barriers but keeps hashing alive
    mid = AsyncContext(16, 2)
    ref = Context(16, 2)
    mid.fill_interleaved(blocks[0]); ref.fill_interleaved(blocks[0])
    assert mid.md5_digest() == ref.md5_digest()       # mid-stream read
    assert mid.total_samples() == ref.total_samples()
    mid.fill_interleaved(blocks[1]); ref.fill_interleaved(blocks[1])
    assert mid.md5_digest() == ref.md5_digest()       # later fills counted
    mid.finish()
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        mid.fill_interleaved(blocks[2])  # fills after stop are errors, not silent drops

    # worker errors propagate at finish()
    bad = AsyncContext(16, 2)
    bad.fill_le_bytes(b"\x00\x01", 0)  # division by zero in the counter
    with _pytest.raises(ZeroDivisionError):
        bad.finish()


def test_variable_block_size_encode_verify_decode():
    """Variable-blocking encode entry (completeness; the reference only
    verifies such streams, datatype.rs:266-314): encode with a block-size
    schedule, verify() the stream, and round-trip through the CRC parser
    AND the clean-room C++ decoder."""
    import hashlib

    from flacenc_tpu import config, source
    from flacenc_tpu.component import decode_stream, parse_stream
    from flacenc_tpu.component.verify import verify_stream
    from flacenc_tpu.models import reference_encoder as re

    n = 4096 + 1024 + 512 + 300  # three scheduled sizes + ragged tail
    rng = np.random.default_rng(11)
    x = np.cumsum(rng.integers(-60, 61, 2 * n), 0).astype(np.int32)
    x = np.clip(x, -30000, 30000)
    src = source.MemSource(x, 2, 16, 44100)
    stream = re.encode_with_variable_block_size(
        config.Encoder().into_verified(), src, [4096, 1024, 512]
    )
    verify_stream(stream)  # cumulative sample-number offsets check
    headers = [f.header() for f in stream.frames()]
    assert all(h.is_variable_blocking() for h in headers)
    assert [h.start_sample_number for h in headers] == [0, 4096, 5120, 5632]
    info = stream.stream_info()
    assert (info.min_block_size, info.max_block_size) == (300, 4096)
    data = stream.to_bytes()
    decoded = decode_stream(parse_stream(data))
    assert np.array_equal(decoded, x)
    assert info.md5 == hashlib.md5(
        source.samples_to_le_bytes(x, 2)).digest()
    # clean-room decoder oracle (shares zero code with the writer)
    from flacenc_tpu import native
    if native.available():
        from flacenc_tpu.native import independent

        ind = independent.decode_stream(data)
        assert np.array_equal(
            ind.samples.reshape(-1, ind.channels).reshape(-1), x
        )


def test_variable_block_size_rejects_bad_sizes():
    from flacenc_tpu import config, source
    from flacenc_tpu.errors import RangeError
    from flacenc_tpu.models import reference_encoder as re

    src = source.MemSource(np.zeros(256, np.int32), 2, 16, 44100)
    cfg = config.Encoder().into_verified()
    with pytest.raises(RangeError):
        re.encode_with_variable_block_size(cfg, src, [])
    with pytest.raises(RangeError):
        re.encode_with_variable_block_size(cfg, src, [16])  # < MIN
