"""Corpus-level throughput pipeline (the ``src/par.rs`` analogue).

The reference parallelizes one stream across worker threads fed by bounded
refill queues with a dedicated MD5 thread (par.rs:109-193, 196-277,
288-325). The TPU-native equivalent batches blocks from MANY files into
shared `(B, C, T)` device batches so a corpus encode keeps the chip full
regardless of file lengths, with the same boundedness properties:

- blocks are STREAMED from open sources into shared batches; at most
  `depth` batches (plus one partial batch per sample rate) of raw PCM are
  resident at any time — a corpus larger than RAM encodes fine;
- upload + device dispatch + decisions download run on a background
  thread (the refill-queue overlap of par.rs:288-325);
- MD5 runs on a dedicated thread consuming blocks through a bounded(16)
  queue with an overdue counter (par.rs:196-277, 411-421);
- ordered reassembly happens per file keyed by frame index (the `ParSink`
  BTreeMap analogue, par.rs:67-95).

Pipeline statistics measure what they claim: `read_s` is time inside
`Source.read_samples`, `device_wait_s` is time blocked on device results,
`pack_s` is host frame assembly, `md5_wait_s`/`md5_overdue` mirror
par-mode's md5_overdue JSONL counter (par.rs:414-421).
"""

from __future__ import annotations

import dataclasses
import queue as queue_mod
import threading
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .. import config as config_mod
from ..errors import Verified
from ..log import info_stats
from ..source import FrameBuf, Source, samples_to_le_bytes
from ..component.datatype import Stream

_MD5_QUEUE_BOUND = 16  # par.rs:210 bounded(16) channel


@dataclasses.dataclass
class PipelineStats:
    """Counters reported after a corpus encode (par.rs:414-421 analogue)."""

    files: int = 0
    frames: int = 0
    batches: int = 0
    read_s: float = 0.0         # time inside Source.read_samples
    device_wait_s: float = 0.0  # host blocked on device results (starvation)
    pack_s: float = 0.0         # host frame assembly (C++ packer + routing)
    md5_wait_s: float = 0.0     # waiting on the MD5 thread at finalization
    md5_overdue: int = 0        # producer stalls on the bounded MD5 queue
    tail_frames: int = 0
    max_inflight_batches: int = 0  # boundedness witness (<= pipeline depth)


class _Md5Thread:
    """Dedicated MD5 worker fed through a bounded queue (par.rs:196-277)."""

    def __init__(self, stats: PipelineStats):
        self._q: queue_mod.Queue = queue_mod.Queue(maxsize=_MD5_QUEUE_BOUND)
        self._stats = stats
        self._done: Dict[int, threading.Event] = {}
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        import hashlib  # noqa: F401  (hashes are passed in)

        while True:
            item = self._q.get()
            if item is None:
                return
            if isinstance(item, threading.Event):  # file-finalize fence
                item.set()
                continue
            h, samples, n, bytes_per = item
            interleaved = np.ascontiguousarray(samples[:, :n].T).reshape(-1)
            h.update(samples_to_le_bytes(interleaved, bytes_per))

    def submit(self, h, samples: np.ndarray, n: int, bytes_per: int):
        try:
            self._q.put_nowait((h, samples, n, bytes_per))
        except queue_mod.Full:
            self._stats.md5_overdue += 1
            self._q.put((h, samples, n, bytes_per))

    def fence(self) -> threading.Event:
        ev = threading.Event()
        self._q.put(ev)
        return ev

    def stop(self):
        self._q.put(None)
        self._thread.join()


def encode_corpus(
    sources: Sequence[Tuple[str, Source]],
    config: Verified[config_mod.Encoder] | config_mod.Encoder,
    block_size: int,
    batch_size: int = 64,
    packer: str = "auto",
    mesh="auto",
) -> Tuple[Dict[str, Stream], PipelineStats]:
    """Encodes many sources, streaming blocks into shared device batches.

    All sources must share (channels, bits_per_sample); sample rates may
    differ (the rate only affects frame headers; batches are grouped per
    rate). Memory stays bounded by the pipeline depth regardless of corpus
    size. `mesh` shards batches across local devices like
    `batch_encoder.encode_with_fixed_block_size`. Returns {name: Stream}
    plus pipeline stats.
    """
    import concurrent.futures

    import jax
    import jax.numpy as jnp

    from .. import constants, native
    from ..models import batch_encoder as be
    from ..models import reference_encoder as ref

    cfg = config.inner if isinstance(config, Verified) else config
    stats = PipelineStats(files=len(sources))
    if not sources:
        return {}, stats

    nch = sources[0][1].channels()
    bps = sources[0][1].bits_per_sample()
    for _, src in sources:
        assert (src.channels(), src.bits_per_sample()) == (nch, bps), (
            "corpus sources must share channel count and bits-per-sample"
        )
    bytes_per = -(-bps // 8)

    if packer == "auto":
        packer = "native2" if native.available() else "python"
    assemble = {
        "native2": be.pack_frames_decisions,
        "native": be.pack_frames_native,
        "python": be.frames_from_device,
    }[packer]
    fn = be._cached_encoder_fn(
        cfg.to_toml(), nch, bps, block_size,
        decisions_only=packer == "native2",
    )

    # per-file state
    frames_by_file: List[Dict[int, "Frame"]] = [dict() for _ in sources]
    n_full: List[int] = [0] * len(sources)
    tails: List[Optional[np.ndarray]] = [None] * len(sources)
    md5s = [__import__("hashlib").md5() for _ in sources]
    total_samples = [0] * len(sources)

    md5_thread = _Md5Thread(stats)
    io_pool = concurrent.futures.ThreadPoolExecutor(max_workers=2)
    depth = constants.par.FRAMEBUF_MULTIPLICITY
    in_flight: List[tuple] = []
    # pending blocks grouped by sample rate: rate -> (items, blocks)
    pending: Dict[int, List[Tuple[int, int, np.ndarray]]] = {}

    sharding = be._auto_mesh(mesh, batch_size)

    def upload_dispatch_fetch(chunk: np.ndarray):
        up = chunk.astype(np.int16) if bps <= 16 else chunk
        if sharding is not None:
            d = jax.device_put(up, sharding)
        else:
            d = jnp.asarray(up)
        enc = fn(d)
        return type(enc)(**jax.device_get(enc._asdict()))

    def drain_one():
        fut, chunk, items, rate = in_flight.pop(0)
        t0 = time.perf_counter()
        enc = fut.result()
        stats.device_wait_s += time.perf_counter() - t0
        t0 = time.perf_counter()
        nums = np.asarray(
            [it[1] for it in items] + [0] * (chunk.shape[0] - len(items))
        )
        frames = assemble(enc, chunk, nums, cfg, nch, bps, rate, block_size)
        for (fi, bi, _), frame in zip(items, frames[: len(items)]):
            frames_by_file[fi][bi] = frame
        stats.pack_s += time.perf_counter() - t0
        stats.batches += 1

    def submit(rate: int):
        items = pending.pop(rate)
        chunk = be._bucket_pad(np.stack([it[2] for it in items]), batch_size)
        fut = io_pool.submit(upload_dispatch_fetch, chunk)
        in_flight.append((fut, chunk, items, rate))
        stats.max_inflight_batches = max(
            stats.max_inflight_batches, len(in_flight)
        )
        if len(in_flight) >= depth:
            drain_one()

    try:
        for fi, (name, src) in enumerate(sources):
            rate = src.sample_rate()
            framebuf = FrameBuf(nch, block_size)
            while True:
                t0 = time.perf_counter()
                read = src.read_samples(block_size, framebuf)
                stats.read_s += time.perf_counter() - t0
                if read == 0:
                    break
                block = framebuf.samples[:, :read].copy()
                total_samples[fi] += read
                md5_thread.submit(md5s[fi], block, read, bytes_per)
                if read == block_size:
                    pending.setdefault(rate, []).append((fi, n_full[fi], block))
                    n_full[fi] += 1
                    if len(pending[rate]) == batch_size:
                        submit(rate)
                else:
                    tails[fi] = block
        for rate in list(pending):
            submit(rate)
        while in_flight:
            drain_one()
    finally:
        io_pool.shutdown(wait=False)
        t0 = time.perf_counter()
        fence = md5_thread.fence()
        fence.wait()
        md5_thread.stop()
        stats.md5_wait_s += time.perf_counter() - t0

    results: Dict[str, Stream] = {}
    for fi, (name, src) in enumerate(sources):
        stream = Stream(src.sample_rate(), nch, bps)
        for i in range(n_full[fi]):
            stream.add_frame(frames_by_file[fi][i])
            stats.frames += 1
        if tails[fi] is not None:
            tail = tails[fi]
            n_tail = total_samples[fi] - n_full[fi] * block_size
            fb = FrameBuf(nch, n_tail)
            fb.fill_interleaved(
                np.ascontiguousarray(tail[:, :n_tail].T).reshape(-1)
            )
            stream.add_frame(
                ref.encode_fixed_size_frame(
                    cfg, fb, n_full[fi], stream.stream_info()
                )
            )
            stats.frames += 1
            stats.tail_frames += 1
        if stream.frame_count() > 0:
            mx = stream.stream_info().max_block_size
            stream.stream_info_mut().set_block_sizes(mx, mx)
        stream.stream_info_mut().set_md5_digest(md5s[fi].digest())
        hint = src.len_hint()
        stream.stream_info_mut().set_total_samples(
            hint if hint is not None else total_samples[fi]
        )
        results[name] = stream

    info_stats(
        event="corpus_encode",
        files=stats.files,
        frames=stats.frames,
        batches=stats.batches,
        read_s=round(stats.read_s, 4),
        device_wait_s=round(stats.device_wait_s, 4),
        pack_s=round(stats.pack_s, 4),
        md5_wait_s=round(stats.md5_wait_s, 4),
        md5_overdue=stats.md5_overdue,
        tail_frames=stats.tail_frames,
        max_inflight_batches=stats.max_inflight_batches,
    )
    return results, stats
