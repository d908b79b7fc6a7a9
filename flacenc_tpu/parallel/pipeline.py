"""Corpus-level throughput pipeline (the ``src/par.rs`` analogue).

The reference parallelizes one stream across worker threads; the TPU-native
equivalent batches blocks from MANY files into shared `(B, C, T)` device
batches, so a corpus encode keeps the chip full regardless of file lengths.
Ordered reassembly happens per file (the `ParSink` BTreeMap analogue,
par.rs:67-95); MD5 runs on the host while the device encodes (the async MD5
pipeline analogue, par.rs:196-277). Pipeline statistics mirror par-mode's
`worker_starvation_count`/`md5_overdue` JSONL line (par.rs:414-421).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from .. import config as config_mod
from ..errors import Verified
from ..log import info_stats
from ..source import Context, FrameBuf, Source
from ..component.datatype import Stream


@dataclasses.dataclass
class PipelineStats:
    """Counters reported after a corpus encode."""

    files: int = 0
    frames: int = 0
    batches: int = 0
    device_wait_s: float = 0.0  # host blocked on device results (starvation)
    pack_s: float = 0.0
    md5_s: float = 0.0
    tail_frames: int = 0


def _read_all_blocks(src: Source, block_size: int):
    """Drains a source: (full_blocks (N,C,T), tail or None, context)."""
    nch = src.channels()
    framebuf = FrameBuf(nch, block_size)
    context = Context(src.bits_per_sample(), nch)
    full, tail = [], None
    while True:
        read = src.read_samples(block_size, (framebuf, context))
        if read == 0:
            break
        if read == block_size:
            full.append(framebuf.samples.copy())
        else:
            tail = framebuf.samples[:, :read].copy()
    return full, tail, context


def encode_corpus(
    sources: Sequence[Tuple[str, Source]],
    config: Verified[config_mod.Encoder] | config_mod.Encoder,
    block_size: int,
    batch_size: int = 64,
) -> Tuple[Dict[str, Stream], PipelineStats]:
    """Encodes many sources, batching blocks across files onto the device.

    All sources must share (channels, bits_per_sample); sample rates may
    differ (the rate only affects frame headers). Returns {name: Stream}
    plus pipeline stats.
    """
    from ..models import batch_encoder as be
    from ..models import reference_encoder as ref

    cfg = config.inner if isinstance(config, Verified) else config
    stats = PipelineStats(files=len(sources))
    t_md5 = time.perf_counter()

    per_file = []
    for name, src in sources:
        full, tail, context = _read_all_blocks(src, block_size)
        per_file.append(
            {
                "name": name,
                "nch": src.channels(),
                "bps": src.bits_per_sample(),
                "rate": src.sample_rate(),
                "full": full,
                "tail": tail,
                "context": context,
                "len_hint": src.len_hint(),
                "frames": {},
            }
        )
    stats.md5_s = time.perf_counter() - t_md5

    if per_file:
        nch = per_file[0]["nch"]
        bps = per_file[0]["bps"]
        for f in per_file:
            assert (f["nch"], f["bps"]) == (nch, bps), (
                "corpus sources must share channel count and bits-per-sample"
            )

        # global work list: (file_idx, frame_idx, block)
        work = [
            (fi, bi, block)
            for fi, f in enumerate(per_file)
            for bi, block in enumerate(f["full"])
        ]
        if work:
            # group by sample rate (frame headers encode it)
            by_rate: Dict[int, List] = {}
            for item in work:
                by_rate.setdefault(per_file[item[0]]["rate"], []).append(item)
            for rate, items in by_rate.items():
                fn = be._cached_encoder_fn(cfg.to_toml(), nch, bps, block_size)
                for start in range(0, len(items), batch_size):
                    group = items[start : start + batch_size]
                    chunk = be._bucket_pad(
                        np.stack([g[2] for g in group]), batch_size
                    )
                    n_valid = len(group)
                    t0 = time.perf_counter()
                    import jax.numpy as jnp

                    up = chunk.astype(np.int16) if bps <= 16 else chunk
                    enc = fn(jnp.asarray(up))
                    nums = np.asarray([g[1] for g in group] + [0] * (chunk.shape[0] - n_valid))
                    stats.device_wait_s += time.perf_counter() - t0
                    t0 = time.perf_counter()
                    from .. import native

                    assemble = (
                        be.pack_frames_native
                        if native.available()
                        else be.frames_from_device
                    )
                    frames = assemble(
                        enc, chunk, nums, cfg, nch, bps, rate, block_size
                    )
                    stats.pack_s += time.perf_counter() - t0
                    for g, frame in zip(group, frames[:n_valid]):
                        per_file[g[0]]["frames"][g[1]] = frame
                    stats.batches += 1

    results: Dict[str, Stream] = {}
    for f in per_file:
        stream = Stream(f["rate"], f["nch"], f["bps"])
        n_full = len(f["full"])
        for i in range(n_full):
            stream.add_frame(f["frames"][i])
            stats.frames += 1
        if f["tail"] is not None:
            fb = FrameBuf(f["nch"], f["tail"].shape[1])
            fb.fill_interleaved(np.ascontiguousarray(f["tail"].T).reshape(-1))
            stream.add_frame(
                ref.encode_fixed_size_frame(cfg, fb, n_full, stream.stream_info())
            )
            stats.frames += 1
            stats.tail_frames += 1
        if stream.frame_count() > 0:
            mx = stream.stream_info().max_block_size
            stream.stream_info_mut().set_block_sizes(mx, mx)
        stream.stream_info_mut().set_md5_digest(f["context"].md5_digest())
        total = f["len_hint"]
        stream.stream_info_mut().set_total_samples(
            total if total is not None else f["context"].total_samples()
        )
        results[f["name"]] = stream

    info_stats(
        event="corpus_encode",
        files=stats.files,
        frames=stats.frames,
        batches=stats.batches,
        device_wait_s=round(stats.device_wait_s, 4),
        pack_s=round(stats.pack_s, 4),
        md5_s=round(stats.md5_s, 4),
        tail_frames=stats.tail_frames,
    )
    return results, stats
