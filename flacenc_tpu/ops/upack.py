"""Packed host->device wire format for PCM uploads.

On link-starved hosts (e.g. tunneled devices at ~15-100 MB/s) the raw
int16 PCM upload is the end-to-end ceiling. The host packs fixed-order
delta residuals `d[t] = diff^order(x)[t]` (order 1 or 2) as little-endian
WIDTH-bit two's-complement fields (the first `order` samples ship
separately as int32), and the device reconstructs exactly with static
shifts + int32 cumsums — no gathers, no data-dependent shapes.

Per BATCH the narrowest fitting format is chosen from
order in {1, 2} x width in {8, 10, 12}: a C++ single-pass scan
(`native.scan_upload`) measures the d1/d2 ranges, then a single-pass pack
(`native.pack_upload`) emits the fields. Quiet/smooth material packs at
8-10 bits (0.5-0.625x the raw int16 bytes); the round-2 bench corpus
needs 12 (0.75x); full-scale noise overflows every width and falls back
to raw — output bytes NEVER depend on the wire format (the device
reconstruction is integer-exact, wrapping int32 like numpy's diff).

Width 16 is deliberately absent: for bps <= 16 inputs a 16-bit delta
field costs exactly the raw int16 upload, so raw is the 16-bit case.
Each (order, width) pair is one jit program variant; a stream that flips
formats compiles at most 7 variants (6 packed + raw), amortized by the
jit cache. The numpy implementations here are the portable fallback and
the parity oracle for the C++ passes.

Measured on the HTTP-tunneled v5e link (round 3): the transport itself
compresses payloads (~3.5x faster for zeros than for random bytes), so
the EFFECTIVE wire cost of any format is close to its entropy; fixed
12-bit fields land at ~1.40 B/sample effective vs 1.77 for raw int16 on
the bench corpus. The packing still pays on every link class because it
also cuts the pre-compression byte count (transport CPU) by 25-50%.
"""

from __future__ import annotations

from typing import Optional, Tuple

from . import jax_env  # noqa: F401

import jax.numpy as jnp
import numpy as np

WIDTHS = (8, 9, 10, 11, 12)  # allowed field widths, narrowest first
ORDERS = (1, 2)              # allowed delta orders
# sample-count divisibility for block sizes: even widths' bit-groups
# divide 16 samples, so T % 16 == 0 is the eligibility gate; the odd
# widths (9, 11) additionally require T % 32 == 0 and are skipped by
# scan() otherwise
GROUP = 16


def words_per_block(T: int, width: int) -> int:
    if T % GROUP != 0:
        raise ValueError(f"block size must be a multiple of {GROUP} (got {T})")
    return T * width // 32


def _deltas(x: np.ndarray, order: int) -> np.ndarray:
    """diff^order with the first `order` entries zeroed (wrapping int32)."""
    d = x.astype(np.int32)
    for _ in range(order):
        nxt = np.zeros_like(d)
        # numpy int32 subtraction wraps (C semantics) = the C++ pack and
        # the device's wrapping-int32 cumsum reconstruction exactly
        nxt[..., 1:] = d[..., 1:] - d[..., :-1]
        d = nxt
    d[..., :order] = 0
    return d


def scan(chunk: np.ndarray) -> Optional[Tuple[int, int]]:
    """Narrowest fitting (order, width) for the batch, or None (use raw).

    numpy fallback / oracle for `native.scan_upload`; ties prefer lower
    order (one cumsum on device instead of two)."""
    x = chunk.astype(np.int32)
    if x.shape[-1] < 2:
        return None
    T = x.shape[-1]
    best = None
    for order in ORDERS:
        d = _deltas(x, order)
        lo, hi = (int(d.min()), int(d.max())) if d.size else (0, 0)
        for w in WIDTHS:
            if (T * w) % 32 != 0:
                continue
            if lo >= -(1 << (w - 1)) and hi <= (1 << (w - 1)) - 1:
                if best is None or w < best[1]:
                    best = (order, w)
                break
    return best


def pack(chunk: np.ndarray, order: int, width: int) -> Tuple[np.ndarray, np.ndarray]:
    """(..., T) int -> ((..., T*width/32) uint32 words, (..., 2) int32
    firsts). Field t occupies bits [t*width, (t+1)*width) of the row's
    little-endian bitstream. numpy fallback / oracle for
    `native.pack_upload`."""
    x = chunk.astype(np.int32)
    T = x.shape[-1]
    W = words_per_block(T, width)
    d = _deltas(x, order)
    u = d.astype(np.uint32) & np.uint32((1 << width) - 1)
    # expand each field to its bit positions via a (T*width, ) bit matrix:
    # vectorized as per-group word assembly (group = lcm(width,32)/width)
    G = np.lcm(width, 32) // width
    Wg = G * width // 32
    ug = u.reshape(u.shape[:-1] + (-1, G)).astype(np.uint64)
    words = np.zeros(ug.shape[:-1] + (Wg,), np.uint64)
    for j in range(G):
        bit = j * width
        k, off = bit // 32, bit % 32
        words[..., k] |= (ug[..., j] << off) & np.uint64(0xFFFFFFFF)
        if off + width > 32:
            words[..., k + 1] |= ug[..., j] >> (32 - off)
    words = words.astype(np.uint32).reshape(x.shape[:-1] + (W,))
    firsts = np.zeros(x.shape[:-1] + (2,), np.int32)
    firsts[..., 0] = x[..., 0]
    firsts[..., 1] = x[..., 1] if T > 1 else x[..., 0]
    return np.ascontiguousarray(words), firsts


def try_pack(chunk: np.ndarray):
    """Adaptive one-call pack: ((words, firsts), order, width) or None.

    Fast path: C++ single-pass scan + single-pass pack (both release the
    GIL); numpy fallback otherwise."""
    from .. import native

    out = native.scan_upload(chunk)
    if out is NotImplemented:
        fmt = scan(chunk)
        if fmt is None:
            return None
        return pack(chunk, *fmt) + fmt
    if out is None:
        return None
    order, width = out
    words, firsts = native.pack_upload(chunk, order, width)
    return words, firsts, order, width


def unpack(words: jnp.ndarray, firsts: jnp.ndarray, T: int,
           order: int = 1, width: int = 12) -> jnp.ndarray:
    """Device-side inverse of `pack`: (..., W) uint32 -> (..., T) int32.

    Static shifts + int32 cumsum(s); the order-2 closed form
    x[t] = x0 + t*(x1-x0) + cumsum(cumsum(d))[t] is exact in wrapping
    int32 arithmetic (the true x fits int32, so mod-2^32 equality is
    equality)."""
    G = int(np.lcm(width, 32)) // width
    Wg = G * width // 32
    g = words.reshape(words.shape[:-1] + (-1, Wg))
    m = jnp.uint32((1 << width) - 1)
    fields = []
    for j in range(G):
        bit = j * width
        k, off = bit // 32, bit % 32
        v = g[..., k] >> jnp.uint32(off) if off else g[..., k]
        if off + width > 32:
            v = v | (g[..., k + 1] << jnp.uint32(32 - off))
        fields.append(v & m)
    u = jnp.stack(fields, axis=-1).reshape(words.shape[:-1] + (T,))
    sign = 1 << (width - 1)
    d = (u ^ jnp.uint32(sign)).astype(jnp.int32) - jnp.int32(sign)
    x0 = firsts[..., 0].astype(jnp.int32)[..., None]
    if order == 1:
        return x0 + jnp.cumsum(d, axis=-1)
    x1 = firsts[..., 1].astype(jnp.int32)[..., None]
    t = jnp.arange(T, dtype=jnp.int32)
    return x0 + t * (x1 - x0) + jnp.cumsum(jnp.cumsum(d, axis=-1), axis=-1)
