"""Corpus pipeline + mesh sharding tests (the par.rs test analogue —
channel-protocol tests become pipeline/ordering tests, par.rs:478-539)."""

import numpy as np
import pytest

from flacenc_tpu import config, sigen, source
from flacenc_tpu.component import decode_stream, parse_stream
from flacenc_tpu.parallel import encode_corpus


def _mem_source(seed, n, rate=44100):
    x = np.zeros(2 * n, np.int32)
    x[0::2] = sigen.Sine(90 + seed, 0.4).noise_with_seed(seed, 0.02).to_vec_quantized(16, n)
    x[1::2] = sigen.Sine(91 + seed, 0.4).noise_with_seed(seed + 100, 0.02).to_vec_quantized(16, n)
    return x, source.MemSource(x, 2, 16, rate)


def test_corpus_encode_ordered_and_lossless():
    block = 1024
    inputs = {}
    sources = []
    for i, n in enumerate((3000, 1024, 5000)):
        x, src = _mem_source(i, n)
        inputs[f"f{i}"] = x
        sources.append((f"f{i}", src))
    streams, stats = encode_corpus(sources, config.Encoder().into_verified(), block)
    assert stats.files == 3
    assert stats.frames == sum(-(-n // block) for n in (3000, 1024, 5000))
    for name, x in inputs.items():
        data = streams[name].to_bytes()
        decoded = decode_stream(parse_stream(data))
        assert np.array_equal(decoded, x), name
        # frame numbers sequential (ordered reassembly)
        for i, f in enumerate(streams[name].frames()):
            assert f.header().frame_number == i


def test_corpus_encode_mixed_rates():
    block = 1024
    _, s1 = _mem_source(1, 2500, rate=44100)
    x2, s2 = _mem_source(2, 2500, rate=48000)
    streams, _ = encode_corpus(
        [("a", s1), ("b", s2)], config.Encoder().into_verified(), block
    )
    assert streams["b"].stream_info().sample_rate == 48000
    assert np.array_equal(decode_stream(parse_stream(streams["b"].to_bytes())), x2)


def test_mesh_sharded_encoder_matches_single_device():
    import jax
    import jax.numpy as jnp

    from flacenc_tpu.models import batch_encoder as be
    from flacenc_tpu.parallel import block_mesh, shard_encoder_fn

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    cfg = config.Encoder()
    T = 512
    fn = be.build_encoder_fn(cfg, 2, 16, T)
    mesh = block_mesh(jax.devices()[:8])
    sharded = shard_encoder_fn(fn, mesh)
    rng = np.random.default_rng(0)
    blocks = jnp.asarray(rng.integers(-(1 << 12), 1 << 12, (16, 2, T), np.int32))
    single = jax.device_get(fn(blocks)._asdict())
    multi = jax.device_get(sharded(blocks)._asdict())
    for k in single:
        np.testing.assert_array_equal(single[k], multi[k], err_msg=k)


def test_shard_corpus_partition():
    from flacenc_tpu.parallel.mesh import shard_corpus

    paths = [f"f{i}" for i in range(10)]
    shards = [shard_corpus(paths, 3, h) for h in range(3)]
    assert sorted(sum(shards, [])) == sorted(paths)
    assert all(len(s) >= 3 for s in shards)


def test_corpus_streaming_bounded_inflight():
    """The corpus pipeline streams: raw PCM residency is bounded by the
    pipeline depth (par.rs:109-193's bounded refill queues), not by corpus
    size. A generator source proves no up-front materialization is needed;
    max_inflight_batches witnesses the bound; stats measure what they
    claim (VERDICT r1 weak #5)."""
    from flacenc_tpu import constants
    from flacenc_tpu.source import Source

    block, batch = 256, 4

    class GenSource(Source):
        """Synthesizes blocks on the fly — nothing is pre-materialized."""

        def __init__(self, seed, n):
            self._x = None
            self._seed, self._n, self._off = seed, n, 0

        def channels(self):
            return 2

        def bits_per_sample(self):
            return 16

        def sample_rate(self):
            return 44100

        def len_hint(self):
            return self._n

        def _chunk(self, begin, end):
            rng = np.random.default_rng(self._seed * 1000 + begin)
            return rng.integers(-2000, 2000, (end - begin) * 2, np.int32)

        def read_samples(self, block_size, dest):
            framebuf, context = dest if isinstance(dest, tuple) else (dest, None)
            end = min(self._off + block_size, self._n)
            if end == self._off:
                return 0
            chunk = self._chunk(self._off, end)
            framebuf.fill_interleaved(chunk)
            if context is not None:
                context.fill_interleaved(chunk)
            n = end - self._off
            self._off = end
            return n

    # 3 files x many batches each; total blocks >> depth * batch
    lens = (block * 40, block * 33 + 77, block * 29)
    sources = [(f"g{i}", GenSource(i, n)) for i, n in enumerate(lens)]
    streams, stats = encode_corpus(
        sources, config.Encoder().into_verified(), block, batch_size=batch
    )
    depth = constants.par.FRAMEBUF_MULTIPLICITY
    assert 1 <= stats.max_inflight_batches <= depth
    assert stats.batches >= sum(n // block for n in lens) // batch
    assert stats.read_s >= 0 and stats.device_wait_s >= 0 and stats.pack_s > 0

    # byte-equality with the single-stream encoder per file (and thus MD5)
    from flacenc_tpu.models import batch_encoder as be

    for i, n in enumerate(lens):
        single = be.encode_with_fixed_block_size(
            config.Encoder().into_verified(),
            GenSource(i, n), block, batch_size=batch,
        )
        assert streams[f"g{i}"].to_bytes() == single.to_bytes(), i


def test_stream_encoder_mesh_sharded_byte_identical():
    """encode_with_fixed_block_size with mesh="auto" (8 virtual devices)
    must produce byte-identical output to the single-device run — sharding
    the block axis is pure placement (no collectives in the hot path)."""
    import jax

    from flacenc_tpu.models import batch_encoder as be
    from flacenc_tpu.parallel import block_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    x, src1 = _mem_source(7, 4096)
    _, src2 = _mem_source(7, 4096)
    cfg = config.Encoder().into_verified()
    d_mesh = be.encode_with_fixed_block_size(
        cfg, src1, 512, batch_size=8, mesh=block_mesh(jax.devices()[:8])
    ).to_bytes()
    d_one = be.encode_with_fixed_block_size(
        cfg, src2, 512, batch_size=8, mesh=None
    ).to_bytes()
    assert d_mesh == d_one
    assert np.array_equal(decode_stream(parse_stream(d_mesh)), x)


def test_short_stream_clamp_respects_mesh_device_count():
    """The short-stream batch-size clamp must keep the batch a multiple
    of the mesh's device count (r5 review): a 3-full-block stream on a
    6-device explicit mesh used to clamp batch 64 -> 8, and device_put
    of an 8-row batch onto a 6-shard NamedSharding raises. Bytes must
    match the unsharded encode either way."""
    import jax

    from flacenc_tpu.models import batch_encoder as be
    from flacenc_tpu.parallel import block_mesh

    if len(jax.devices()) < 6:
        pytest.skip("needs >= 6 devices")
    n = 512 * 3 + 100  # 3 full blocks + ragged tail
    x, src1 = _mem_source(21, n)
    _, src2 = _mem_source(21, n)
    cfg = config.Encoder().into_verified()
    d_mesh = be.encode_with_fixed_block_size(
        cfg, src1, 512, batch_size=64, mesh=block_mesh(jax.devices()[:6])
    ).to_bytes()
    d_one = be.encode_with_fixed_block_size(
        cfg, src2, 512, batch_size=64, mesh=None
    ).to_bytes()
    assert d_mesh == d_one
    assert np.array_equal(decode_stream(parse_stream(d_mesh)), x)


def test_determine_worker_count_precedence(monkeypatch):
    """config.workers -> env FLACENC_WORKERS -> FLACENC_PACK_THREADS ->
    auto, with multithread=False forcing 1 (par.rs:328-339 precedence)."""
    import os

    from flacenc_tpu.parallel import determine_worker_count

    monkeypatch.delenv("FLACENC_WORKERS", raising=False)
    monkeypatch.delenv("FLACENC_PACK_THREADS", raising=False)
    auto = determine_worker_count()
    assert auto >= 1 and auto == (os.cpu_count() or 1)

    cfg = config.Encoder()
    assert determine_worker_count(cfg) == auto  # workers=None -> auto

    cfg.multithread = False
    assert determine_worker_count(cfg) == 1  # serial path wins everything
    cfg.workers = 7
    assert determine_worker_count(cfg) == 1  # multithread=False still wins

    cfg.multithread = True
    assert determine_worker_count(cfg) == 7  # config beats env

    monkeypatch.setenv("FLACENC_WORKERS", "3")
    assert determine_worker_count(cfg) == 7
    cfg.workers = None
    assert determine_worker_count(cfg) == 3  # env fallback
    assert determine_worker_count() == 3

    monkeypatch.setenv("FLACENC_PACK_THREADS", "5")
    assert determine_worker_count() == 3  # FLACENC_WORKERS beats it
    monkeypatch.delenv("FLACENC_WORKERS")
    assert determine_worker_count() == 5  # legacy override below config
    monkeypatch.setenv("FLACENC_PACK_THREADS", "junk")
    assert determine_worker_count() == auto


def test_sequential_packing_byte_identical():
    """Encoder(workers=1, multithread=False) forces sequential host
    packing and produces byte-identical output (par.rs:328-339)."""
    from flacenc_tpu.models import batch_encoder as be

    x, src1 = _mem_source(11, 6000)
    _, src2 = _mem_source(11, 6000)
    cfg_mt = config.Encoder().into_verified()
    cfg_st = config.Encoder(multithread=False, workers=1).into_verified()
    d_mt = be.encode_with_fixed_block_size(cfg_mt, src1, 1024).to_bytes()
    d_st = be.encode_with_fixed_block_size(cfg_st, src2, 1024).to_bytes()
    assert d_mt == d_st
    assert np.array_equal(decode_stream(parse_stream(d_st)), x)


def test_corpus_bulk_reads_byte_identical():
    """The corpus pipeline's bulk read path (read_blocks_batch + raw
    hash submits to the shared md5 thread) must produce byte-identical
    streams and digests to per-block reading, across mixed rates."""
    from flacenc_tpu.parallel import encode_corpus

    class NoBulk(source.MemSource):
        def read_blocks_batch(self, n_blocks, block_size, context):
            return None

    xs = {}
    fast_srcs, slow_srcs = [], []
    for name, seed, n, rate in (("a", 1, 3333, 44100), ("b", 2, 2500, 48000),
                                ("c", 3, 1024, 44100)):
        x, _ = _mem_source(seed, n, rate=rate)
        xs[name] = x
        fast_srcs.append((name, source.MemSource(x, 2, 16, rate)))
        slow_srcs.append((name, NoBulk(x, 2, 16, rate)))
    cfg = config.Encoder().into_verified()
    fast, _ = encode_corpus(fast_srcs, cfg, 512, batch_size=4)
    slow, _ = encode_corpus(slow_srcs, cfg, 512, batch_size=4)
    for name in xs:
        assert fast[name].to_bytes() == slow[name].to_bytes(), name
        from flacenc_tpu.component import decode_stream, parse_stream

        assert np.array_equal(
            decode_stream(parse_stream(fast[name].to_bytes())), xs[name]
        ), name
