"""Pipeline-level properties: determinism, stats accounting, strict-mode
consistency on real audio, streaming == all-at-once."""

import os

import numpy as np
import pytest

from flacenc_tpu import config, sigen, source
from flacenc_tpu.component import decode_stream, parse_stream
from flacenc_tpu.models import batch_encoder as be
from flacenc_tpu.models import reference_encoder as re


def _signal(n=5000, bps=16):
    x = np.zeros(2 * n, np.int32)
    x[0::2] = sigen.Sine(128, 0.4).noise_with_seed(1, 0.01).to_vec_quantized(bps, n)
    x[1::2] = sigen.Sine(130, 0.4).noise_with_seed(2, 0.02).to_vec_quantized(bps, n)
    return x


def test_encode_deterministic():
    x = _signal()
    cfg = config.Encoder().into_verified()
    outs = set()
    for _ in range(2):
        s = be.encode_with_fixed_block_size(
            cfg, source.MemSource(x, 2, 16, 44100), 1024
        )
        outs.add(s.to_bytes())
    assert len(outs) == 1, "encoding must be deterministic"


def test_small_batch_size_equals_large():
    # streaming batch boundaries must not affect the stream
    x = _signal(n=1024 * 5 + 77)
    cfg = config.Encoder().into_verified()
    a = be.encode_with_fixed_block_size(
        cfg, source.MemSource(x, 2, 16, 44100), 1024, batch_size=2
    ).to_bytes()
    b = be.encode_with_fixed_block_size(
        cfg, source.MemSource(x, 2, 16, 44100), 1024, batch_size=64
    ).to_bytes()
    assert a == b


def test_corpus_stats_accounting():
    from flacenc_tpu.parallel import encode_corpus

    x1 = _signal(3000)
    x2 = _signal(1024)
    streams, stats = encode_corpus(
        [("a", source.MemSource(x1, 2, 16, 44100)),
         ("b", source.MemSource(x2, 2, 16, 44100))],
        config.Encoder().into_verified(), 1024,
    )
    assert stats.files == 2
    assert stats.frames == 3 + 1  # ceil(3000/1024)=3 frames + 1 frame
    assert stats.tail_frames == 1
    assert stats.batches >= 1


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/src/resource"),
    reason="reference resources not mounted",
)
def test_strict_mode_real_audio_lossless():
    from test_real_signals import load_signal

    l = load_signal("ras22", 0)
    r = load_signal("ras22", 1)
    x = np.empty(2 * len(l), np.int32)
    x[0::2] = l
    x[1::2] = r
    cfg = config.Encoder().into_verified()
    s = be.encode_with_fixed_block_size(
        cfg, source.MemSource(x, 2, 16, 44100), 4096, strict_lpc=True
    )
    assert np.array_equal(decode_stream(parse_stream(s.to_bytes())), x)


def test_corpus_rejects_out_of_range_samples():
    """r2 review finding: the corpus path must range-validate full blocks
    like the stream path (source.rs:262-277 verify_samples), not silently
    emit a lossy stream."""
    from flacenc_tpu.errors import VerifyError
    from flacenc_tpu.parallel import encode_corpus

    x = np.full(2 * 2048, 70000, np.int32)  # 17-bit values, declared 16-bit
    with pytest.raises(VerifyError):
        encode_corpus(
            [("bad", source.MemSource(x, 2, 16, 44100))],
            config.Encoder().into_verified(), 1024,
        )


def test_corpus_md5_worker_error_raises_not_hangs(monkeypatch):
    """r2 review finding: an exception on the MD5 thread must surface as an
    error, not deadlock the bounded queue."""
    from flacenc_tpu.parallel import encode_corpus
    from flacenc_tpu.parallel import pipeline as pl

    def boom(*a, **k):
        raise RuntimeError("md5 worker exploded")

    monkeypatch.setattr(pl, "samples_to_le_bytes", boom)
    x = _signal(4096)
    with pytest.raises(RuntimeError, match="md5 worker exploded"):
        encode_corpus(
            [("a", source.MemSource(x, 2, 16, 44100))],
            config.Encoder().into_verified(), 1024,
        )


def test_corpus_strict_mode_matches_stream_strict():
    """r2 review finding: encode_corpus honors strict_lpc / the env var."""
    from flacenc_tpu.parallel import encode_corpus

    x = _signal(3000)
    streams, _ = encode_corpus(
        [("a", source.MemSource(x, 2, 16, 44100))],
        config.Encoder().into_verified(), 1024, strict_lpc=True,
    )
    single = be.encode_with_fixed_block_size(
        config.Encoder().into_verified(),
        source.MemSource(x, 2, 16, 44100), 1024, strict_lpc=True,
    )
    assert streams["a"].to_bytes() == single.to_bytes()


def test_corpus_mismatched_sources_value_error():
    """Corpus homogeneity is enforced with a real exception, not a bare
    assert compiled out under `python -O` (VERDICT r3 weak #3)."""
    from flacenc_tpu.parallel import encode_corpus
    from flacenc_tpu.source import MemSource

    cfg = config.Encoder().into_verified()
    a = MemSource(_signal(600), 2, 16, 44100)
    b = MemSource(np.zeros(600, np.int32), 1, 16, 44100)  # channel mismatch
    with pytest.raises(ValueError, match="share channel count"):
        encode_corpus([("a", a), ("b", b)], cfg, 256)
    c = MemSource(np.zeros(1200, np.int32), 2, 8, 44100)  # bps mismatch
    with pytest.raises(ValueError, match="share channel count"):
        encode_corpus([("a", a), ("c", c)], cfg, 256)


def test_memsource_bulk_frame_count_in_blocks():
    from flacenc_tpu.source import AsyncContext, MemSource

    src = MemSource(_signal(1024 * 3), 2, 16, 44100)
    ctx = AsyncContext(16, 2)
    src.read_blocks_batch(8, 1024, ctx)
    assert ctx.current_frame_number() == 2  # 3 blocks -> last index 2
    ctx.finish()
