"""Packer-path parity: python oracle vs C++ ("native") vs decisions-only
C++ recompute ("native2", the default via packer="auto").

native2 never ships residuals over the device link — the C++ packer
recomputes stored channels (M/S) and the chosen predictor's residual from
the raw blocks (packer.cpp:flacenc_pack_frames_recompute), so its byte
output must match the oracle exactly, including when residuals exceed
int16 (the case the old "native" path flags with `fits16` and recomputes
in Python).
"""

import numpy as np
import pytest

from flacenc_tpu import config, native, sigen, source
from flacenc_tpu.component import decode_stream, parse_stream
from flacenc_tpu.models import batch_encoder as be

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native packer library unavailable"
)


def _stereo_signal(n, bps, noise=0.02):
    x = np.zeros(2 * n, np.int32)
    x[0::2] = sigen.Sine(128, 0.4).noise_with_seed(1, noise).to_vec_quantized(bps, n)
    x[1::2] = sigen.Sine(130, 0.4).noise_with_seed(2, noise).to_vec_quantized(bps, n)
    return x


@pytest.mark.parametrize("strict", [False, True])
def test_stereo_packer_matrix_byte_identical(strict):
    n = 1024 * 5 + 321  # exercises the ragged-tail host epilogue too
    x = _stereo_signal(n, 16)
    cfg = config.Encoder().into_verified()
    outs = {}
    for packer in ("python", "native", "native2"):
        s = be.encode_with_fixed_block_size(
            cfg, source.MemSource(x, 2, 16, 44100), 1024,
            batch_size=4, packer=packer, strict_lpc=strict,
        )
        outs[packer] = s.to_bytes()
    assert outs["python"] == outs["native"] == outs["native2"]
    assert np.array_equal(decode_stream(parse_stream(outs["native2"])), x)


@pytest.mark.parametrize("nch,bps", [(1, 16), (3, 8), (2, 24)])
def test_multichannel_and_bps_native2(nch, bps):
    n = 1024 * 3
    x = np.zeros(nch * n, np.int32)
    for ch in range(nch):
        x[ch::nch] = (
            sigen.Sine(97 + 5 * ch, 0.5)
            .noise_with_seed(ch, 0.05)
            .to_vec_quantized(bps, n)
        )
    cfg = config.Encoder().into_verified()
    d_py = be.encode_with_fixed_block_size(
        cfg, source.MemSource(x, nch, bps, 48000), 1024,
        batch_size=2, packer="python",
    ).to_bytes()
    d_n2 = be.encode_with_fixed_block_size(
        cfg, source.MemSource(x, nch, bps, 48000), 1024,
        batch_size=2, packer="native2",
    ).to_bytes()
    assert d_n2 == d_py
    assert np.array_equal(decode_stream(parse_stream(d_n2)), x)


def test_native2_handles_residuals_beyond_int16():
    """24-bit heavy noise drives side-channel residuals past int16 — the
    recompute path must stay byte-exact without any fallback."""
    n = 2048 * 2
    x = np.zeros(2 * n, np.int32)
    for ch in range(2):
        x[ch::2] = (
            sigen.Sine(97 + ch, 0.6).noise_with_seed(ch, 0.2)
            .to_vec_quantized(24, n)
        )
    cfg = config.Encoder().into_verified()
    d_py = be.encode_with_fixed_block_size(
        cfg, source.MemSource(x, 2, 24, 96000), 2048,
        batch_size=2, packer="python",
    ).to_bytes()
    d_n2 = be.encode_with_fixed_block_size(
        cfg, source.MemSource(x, 2, 24, 96000), 2048,
        batch_size=2, packer="native2",
    ).to_bytes()
    assert d_n2 == d_py
    assert np.array_equal(decode_stream(parse_stream(d_n2)), x)


def test_native2_bitcount_and_experimental_configs():
    n = 1024 * 3
    x = _stereo_signal(n, 16, noise=0.05)
    for toml in (
        "[subframe_coding.fixed.order_sel]\ntype = \"BitCount\"\n",
        "[subframe_coding.qlpc]\nuse_direct_mse = true\n",
        "[stereo_coding]\nuse_midside = false\n",
    ):
        cfg = config.Encoder.from_toml(toml).into_verified()
        d_py = be.encode_with_fixed_block_size(
            cfg, source.MemSource(x, 2, 16, 44100), 1024,
            batch_size=4, packer="python",
        ).to_bytes()
        d_n2 = be.encode_with_fixed_block_size(
            cfg, source.MemSource(x, 2, 16, 44100), 1024,
            batch_size=4, packer="native2",
        ).to_bytes()
        assert d_n2 == d_py, toml


def test_packed_upload_byte_identical_and_fallback():
    """12-bit delta wire format (ops/upack.py): streams are byte-identical
    to the raw-upload path; batches whose deltas overflow fall back to raw
    automatically (output never depends on the wire format)."""
    n = 1024 * 4 + 100
    x = _stereo_signal(n, 16, noise=0.01)  # smooth: deltas fit 12 bits
    cfg = config.Encoder().into_verified()
    raw = be.encode_with_fixed_block_size(
        cfg, source.MemSource(x, 2, 16, 44100), 1024,
        batch_size=4, upload_pack=False,
    ).to_bytes()
    packed = be.encode_with_fixed_block_size(
        cfg, source.MemSource(x, 2, 16, 44100), 1024,
        batch_size=4, upload_pack=True,
    ).to_bytes()
    assert packed == raw
    assert np.array_equal(decode_stream(parse_stream(packed)), x)

    # white noise at full scale: deltas overflow -> raw fallback, bytes equal
    rng = np.random.default_rng(3)
    y = rng.integers(-32768, 32768, 2 * 1024 * 3, dtype=np.int64).astype(np.int32)
    raw = be.encode_with_fixed_block_size(
        cfg, source.MemSource(y, 2, 16, 44100), 1024,
        batch_size=4, upload_pack=False,
    ).to_bytes()
    packed = be.encode_with_fixed_block_size(
        cfg, source.MemSource(y, 2, 16, 44100), 1024,
        batch_size=4, upload_pack=True,
    ).to_bytes()
    assert packed == raw


def test_upack_roundtrip_exact():
    """ops/upack.py codec: unpack(pack(x)) == x wherever fits(x)."""
    import jax

    from flacenc_tpu.ops import upack

    rng = np.random.default_rng(1)
    for shape in ((2, 2, 1024), (3, 1, 64)):
        # large first samples + extreme in-range deltas, clipped to int16
        # by CONSTRUCTION (clip can only shrink deltas, never grow them)
        d = rng.integers(-2048, 2048, shape, np.int32)
        d[..., 0] = 0
        x = rng.integers(-30000, 30000, shape[:-1] + (1,), np.int32) + np.cumsum(d, -1)
        x = np.clip(x, -32768, 32767)
        assert upack.fits(x)
        assert np.abs(x[..., 0]).max() > 2048  # real large-first coverage
        w, f = upack.pack(x)
        w2, f2 = upack.try_pack(x)
        assert np.array_equal(w, w2) and np.array_equal(f, f2)
        y = np.asarray(
            jax.jit(lambda w, f: upack.unpack(w, f, shape[-1]))(w, f)
        )
        assert np.array_equal(y, x)
    assert not upack.fits(np.array([[0, 5000] * 4], np.int32))
    assert upack.try_pack(np.array([[0, 5000] * 4], np.int32)) is None

    with pytest.raises(ValueError):
        be.BatchPipeline(
            config.Encoder(), 2, 24, 1024, 4, upload_pack=True
        )
    with pytest.raises(ValueError):
        be.BatchPipeline(
            config.Encoder(), 2, 16, 1023, 4, upload_pack=True
        )


def test_threaded_packer_byte_identical(monkeypatch):
    """FLACENC_PACK_THREADS: the region-split + compaction path must emit
    exactly the sequential bytes (frames are independent)."""
    from flacenc_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    n = 1024 * 7 + 11  # 7 full blocks + tail
    x = _stereo_signal(n, 16, noise=0.02)
    cfg = config.Encoder().into_verified()
    outs = {}
    for nt in ("1", "3"):
        monkeypatch.setenv("FLACENC_PACK_THREADS", nt)
        outs[nt] = be.encode_with_fixed_block_size(
            cfg, source.MemSource(x, 2, 16, 44100), 1024,
            batch_size=4, packer="native2",
        ).to_bytes()
    assert outs["1"] == outs["3"]


def test_strict_mode_packed_upload_byte_identical():
    """Strict-float mode composes with the packed wire format: the strict
    ext arrays ride the packed program and bytes match the raw path."""
    n = 1024 * 3 + 77
    x = _stereo_signal(n, 16, noise=0.01)
    cfg = config.Encoder().into_verified()
    a = be.encode_with_fixed_block_size(
        cfg, source.MemSource(x, 2, 16, 44100), 1024,
        batch_size=4, strict_lpc=True, upload_pack=False,
    ).to_bytes()
    b = be.encode_with_fixed_block_size(
        cfg, source.MemSource(x, 2, 16, 44100), 1024,
        batch_size=4, strict_lpc=True, upload_pack=True,
    ).to_bytes()
    assert a == b


def test_native_pack_upload12_parity():
    """C++ single-pass upload pack == numpy pack, incl. range edges and
    the wrapping-int32 delta semantics shared with the device cumsum."""
    from flacenc_tpu import native
    from flacenc_tpu.ops import upack

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    for shape in ((3, 2, 64), (1, 2, 4096), (5, 96)):
        d = rng.integers(-2048, 2048, shape, np.int32)
        x = np.cumsum(d, axis=-1).astype(np.int32)
        w_np, f_np = upack.pack(x)
        w_c, f_c = native.pack_upload12(x)
        assert np.array_equal(w_np, w_c) and np.array_equal(f_np, f_c)

    # range edges: ±2048 boundary per delta
    edge = np.zeros((1, 8), np.int32)
    edge[0, 1:] = 2047
    assert native.pack_upload12(edge) is not None and upack.fits(edge)
    edge[0, 1:] = 2048
    assert native.pack_upload12(edge) is None and not upack.fits(edge)
    edge[0, 1:] = -2048
    assert native.pack_upload12(edge) is not None and upack.fits(edge)

    # int32 extremes: numpy's diff wraps in int32 and the device-side
    # cumsum wraps back — the C++ pass must agree, not reject
    ext = np.zeros((1, 8), np.int32)
    ext[0, 0] = 2**31 - 1
    ext[0, 1:] = -(2**31)
    assert upack.fits(ext)
    w_c, f_c = native.pack_upload12(ext)
    w_np, f_np = upack.pack(ext)
    assert np.array_equal(w_np, w_c) and np.array_equal(f_np, f_c)


def test_upload_pack_env_modes(monkeypatch):
    """FLACENC_PACKED_UPLOAD: '1' on, '0' off, unset = adaptive probe."""
    from flacenc_tpu import native

    monkeypatch.setenv("FLACENC_PACKED_UPLOAD", "0")
    p = be.BatchPipeline(config.Encoder(), 2, 16, 1024, 4)
    assert not p.upload_pack and not p._probe_upload
    p.close()
    monkeypatch.setenv("FLACENC_PACKED_UPLOAD", "1")
    p = be.BatchPipeline(config.Encoder(), 2, 16, 1024, 4)
    assert p.upload_pack
    p.close()
    monkeypatch.delenv("FLACENC_PACKED_UPLOAD")
    p = be.BatchPipeline(config.Encoder(), 2, 16, 1024, 4)
    assert not p.upload_pack  # raw until the probe flips it
    assert p._probe_upload == native.available()
    p.close()
    # ineligible shapes never probe
    p = be.BatchPipeline(config.Encoder(), 2, 24, 1024, 4)
    assert not p.upload_pack and not p._probe_upload
    p.close()
