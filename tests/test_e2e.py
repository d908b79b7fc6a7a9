"""Integration tests: the integrity-test matrix of the reference
(``/root/reference/src/lib.rs:177-251`` and ``test_helper::integrity_test``)
— encode, serialize, re-parse with the independent parser, decode, compare
sample-exactly, and verify MD5."""

import hashlib

import numpy as np
import pytest

from flacenc_tpu import config, sigen, source
from flacenc_tpu.component import decode_stream, parse_stream
from flacenc_tpu.models import reference_encoder as re


def make_signal(channels: int, length: int, bps: int) -> np.ndarray:
    interleaved = np.zeros(length * channels, dtype=np.int32)
    for ch in range(channels):
        gen = sigen.Sine(128 >> ch if ch < 5 else 36, 0.4).noise_with_seed(
            100 + ch, 0.04
        )
        interleaved[ch::channels] = gen.to_vec_quantized(bps, length)
    return interleaved


CONFIGS = {
    "default": config.Encoder(),
    "no_lpc": None,  # filled below
    "bitcount": None,
    "rectangle_window": None,
    "mae": None,
}

_c = config.Encoder()
_c.subframe_coding.use_lpc = False
CONFIGS["no_lpc"] = _c

_c = config.Encoder()
_c.subframe_coding.fixed.order_sel = config.OrderSel.bit_count()
CONFIGS["bitcount"] = _c

_c = config.Encoder()
_c.subframe_coding.qlpc.window = config.Window.rectangle()
CONFIGS["rectangle_window"] = _c

_c = config.Encoder()
_c.subframe_coding.use_constant = False
_c.subframe_coding.use_fixed = False
CONFIGS["mae"] = _c


def integrity_test(cfg: config.Encoder, interleaved, channels, bps, rate, block_size):
    """Encode -> bytes -> independent parse -> decode -> exact compare.

    Two independent decode oracles: the Python component parser
    (CRC-verified) and the clean-room C++ decoder (native/decoder.cpp,
    zero shared code — the claxon analogue, test_helper.rs:131-185)."""
    src = source.MemSource(interleaved, channels, bps, rate)
    stream = re.encode_with_fixed_block_size(cfg.into_verified(), src, block_size)
    data = stream.to_bytes()
    parsed = parse_stream(data)  # CRC-verified
    decoded = decode_stream(parsed)
    assert np.array_equal(decoded, interleaved), "lossless round trip failed"
    md5 = hashlib.md5(
        source.samples_to_le_bytes(np.asarray(interleaved, np.int32), -(-bps // 8))
    ).digest()
    assert parsed.stream_info().md5 == md5
    from flacenc_tpu.native import independent

    if independent.available():
        dec = independent.decode_stream(data)
        assert np.array_equal(dec.samples, interleaved), (
            "clean-room decoder round trip failed"
        )
        assert dec.md5 == md5
        assert (dec.channels, dec.bits_per_sample) == (channels, bps)
    return len(data)


@pytest.mark.parametrize("channels", [1, 2, 3, 5, 8])
def test_integrity_channels(channels):
    interleaved = make_signal(channels, 3000, 16)
    integrity_test(config.Encoder(), interleaved, channels, 16, 16000, 1024)


@pytest.mark.parametrize("rate", [16000, 16001, 95800])
def test_integrity_sample_rates(rate):
    interleaved = make_signal(2, 2500, 16)
    integrity_test(config.Encoder(), interleaved, 2, 16, rate, 512)


@pytest.mark.parametrize("name", list(CONFIGS))
def test_integrity_configs(name):
    cfg = CONFIGS[name]
    interleaved = make_signal(2, 4500, 16)
    integrity_test(cfg, interleaved, 2, 16, 44100, 4096)


@pytest.mark.parametrize("bps", [8, 12, 16, 20, 24])
def test_integrity_bits_per_sample(bps):
    interleaved = make_signal(2, 3000, bps)
    integrity_test(config.Encoder(), interleaved, 2, bps, 44100, 1024)


def test_integrity_odd_block_sizes():
    interleaved = make_signal(2, 1000, 16)
    for block_size in (33, 100, 192, 1000):
        integrity_test(config.Encoder(), interleaved, 2, 16, 44100, block_size)


def test_compression_is_effective():
    # mostly-tonal signal must compress well below the ~12.2-bit noise floor
    n = 44100
    interleaved = np.zeros(2 * n, dtype=np.int32)
    for ch in range(2):
        gen = sigen.Sine(128 >> ch, 0.4).noise_with_seed(100 + ch, 0.01)
        interleaved[ch::2] = gen.to_vec_quantized(16, n)
    src = source.MemSource(interleaved, 2, 16, 44100)
    stream = re.encode_with_fixed_block_size(
        config.Encoder().into_verified(), src, 4096
    )
    ratio = len(stream.to_bytes()) / (len(interleaved) * 2)
    assert ratio < 0.70


REFERENCE_TOML_CONFIGS = [
    # verbatim from the reference's e2e matrix (lib.rs:177-194); note
    # `block_sizes` is an unknown key there too and is ignored by serde —
    # our TOML loader matches that tolerance
    "",
    "\nblock_sizes = [512]\n",
    "\nblock_sizes = [1024]\n[subframe_coding.qlpc]\nuse_direct_mse = true\nmae_optimization_steps = 2\n",
    "\nmultithread = false\n",
]


@pytest.mark.parametrize("toml_text", REFERENCE_TOML_CONFIGS)
@pytest.mark.parametrize("channels", [1, 3])
def test_e2e_reference_toml_matrix(toml_text, channels):
    """lib.rs:196-251 matrix (reduced grid), with the reference's verbatim
    TOML config strings parsed through our loader."""
    cfg = config.Encoder.from_toml(toml_text)
    signal_len = 4123
    interleaved = np.zeros(signal_len * channels, np.int32)
    for ch in range(channels):
        interleaved[ch::channels] = (
            sigen.Sine(36, 0.4).noise_with_seed(50 + ch, 0.04)
            .to_vec_quantized(16, signal_len)
        )
    integrity_test(cfg, interleaved, channels, 16, 16001, cfg.block_size)
