"""Packed host->device wire format for PCM uploads.

On link-starved hosts (e.g. tunneled devices at ~50 MB/s) the raw int16
PCM upload is the end-to-end ceiling. First-order deltas of typical music
fit 12 bits, so the host packs `d[t] = x[t] - x[t-1]` as little-endian
12-bit two's-complement fields (first sample shipped separately as i32)
and the device reconstructs exactly with static shifts + one int32 cumsum
— no gathers, no data-dependent shapes. 25% less upload than int16.

The transform is integer-exact: `unpack(pack(x)) == x` for every input
that fits (deltas in [-2048, 2047]); batches that don't fit fall back to
the raw path (models/batch_encoder.BatchPipeline decides per batch, so
output bytes never depend on the wire format).

The hot path is `native.pack_upload12` — a single-pass C++ sweep
(delta + range check + bit pack, no temporaries) measured 25x faster
than the numpy pack below (14 ms vs 358 ms per 512x2x4096 batch, one
core), i.e. ~3,300x realtime: the pack cost that used to cancel the
wire saving on single-core hosts is gone. Control: FLACENC_PACKED_UPLOAD
=1 forces on, =0 off; unset = adaptive — BatchPipeline probes the first
upload's bandwidth and enables packing only on slow links (< ~300 MB/s),
so PCIe-attached chips keep the raw path. The numpy implementation here
is the portable fallback and the parity oracle for the C++ pass.
"""

from __future__ import annotations

from typing import Tuple

from . import jax_env  # noqa: F401

import jax.numpy as jnp
import numpy as np

WIDTH = 12  # bits per delta field
_GROUP = 8  # lcm(12, 32) = 96 bits = 8 samples per 3 words
_WORDS_PER_GROUP = 3
_MASK = (1 << WIDTH) - 1
_SIGN = 1 << (WIDTH - 1)


GROUP = _GROUP  # sample-count divisibility requirement for block sizes


def fits(chunk: np.ndarray) -> bool:
    """True if every first-order delta fits WIDTH-bit two's complement."""
    d = np.diff(chunk.astype(np.int32), axis=-1)
    if d.size == 0:
        return True
    return bool((d >= -_SIGN).all() and (d <= _SIGN - 1).all())


def words_per_block(T: int) -> int:
    assert T % _GROUP == 0, f"block size must be a multiple of {_GROUP}"
    return (T // _GROUP) * _WORDS_PER_GROUP


def try_pack(chunk: np.ndarray):
    """One-pass pack-if-fits: ((..., W) uint32, (...,) int32) or None.

    Fast path: the native C++ single-pass packer (delta + range check +
    bit pack in one sweep, no temporaries). Falls back to numpy (which
    computes the delta stream once — the separate fits()+pack() sequence
    would diff the whole chunk twice)."""
    from .. import native

    out = native.pack_upload12(chunk)
    if out is not NotImplemented:
        return out
    x = chunk.astype(np.int32)
    d = np.zeros_like(x)
    d[..., 1:] = x[..., 1:] - x[..., :-1]
    if d.size and not ((d >= -_SIGN).all() and (d <= _SIGN - 1).all()):
        return None
    return _pack_deltas(d, np.ascontiguousarray(x[..., 0]))


def pack(chunk: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(..., T) int -> ((..., W) uint32 words, (...,) int32 first samples).

    Field j of each 8-sample group occupies bits [12j, 12j+12) of the
    96-bit group, little-endian across the 3 uint32 words.
    """
    x = chunk.astype(np.int32)
    d = np.zeros_like(x)
    d[..., 1:] = x[..., 1:] - x[..., :-1]
    return _pack_deltas(d, np.ascontiguousarray(x[..., 0]))


def _pack_deltas(d: np.ndarray, first: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    u = (d.astype(np.uint32) & _MASK).reshape(d.shape[:-1] + (-1, _GROUP))
    u64 = u.astype(np.uint64)
    # 96-bit group as lo64 | hi32: fields 0..4 fully in lo64 (bits 0..60),
    # field 5 straddles (bits 60..72), 6..7 in hi (bits 72..96)
    lo = (
        u64[..., 0]
        | (u64[..., 1] << 12) | (u64[..., 2] << 24) | (u64[..., 3] << 36)
        | (u64[..., 4] << 48) | (u64[..., 5] << 60)  # low 4 bits of field 5
    )
    hi = (
        (u64[..., 5] >> 4) | (u64[..., 6] << 8) | (u64[..., 7] << 20)
    ).astype(np.uint32)
    w0 = (lo & 0xFFFFFFFF).astype(np.uint32)
    w1 = ((lo >> 32) & 0xFFFFFFFF).astype(np.uint32)
    words = np.stack([w0, w1, hi], axis=-1).reshape(d.shape[:-1] + (-1,))
    return np.ascontiguousarray(words), first


def unpack(words: jnp.ndarray, first: jnp.ndarray, T: int) -> jnp.ndarray:
    """Device-side inverse of `pack`: (..., W) uint32 -> (..., T) int32."""
    g = words.reshape(words.shape[:-1] + (-1, _WORDS_PER_GROUP))
    w0 = g[..., 0]
    w1 = g[..., 1]
    w2 = g[..., 2]
    m = jnp.uint32(_MASK)
    fields = [
        w0 & m,
        (w0 >> 12) & m,
        (w0 >> 24) | ((w1 & jnp.uint32(0xF)) << 8),
        (w1 >> 4) & m,
        (w1 >> 16) & m,
        (w1 >> 28) | ((w2 & jnp.uint32(0xFF)) << 4),
        (w2 >> 8) & m,
        (w2 >> 20) & m,
    ]
    u = jnp.stack(fields, axis=-1).reshape(words.shape[:-1] + (T,))
    d = ((u ^ jnp.uint32(_SIGN)).astype(jnp.int32) - jnp.int32(_SIGN))
    x = first.astype(jnp.int32)[..., None] + jnp.cumsum(d, axis=-1)
    return x
