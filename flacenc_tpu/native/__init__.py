"""ctypes bindings for the native FLAC frame packer.

The packer consumes batch arrays straight from the device pipeline and
emits FLAC frame bytes in one call per batch (the bit-serial stage the
reference implements in ``src/bitsink.rs``/``bitrepr.rs``). Falls back to
the Python component serializer when the shared library cannot be built.
"""

from __future__ import annotations

import ctypes
import threading
from typing import List, Optional, Tuple

import numpy as np

# Reusable per-thread output buffer for pack_frames_recompute: a fresh
# ~10 MB np.empty per batch costs several ms of page faults INSIDE the
# C++ pack (first touch of every 4 KB page); reusing keeps the pages hot.
# Thread-local because the packer may run concurrently from io threads.
_pack_scratch = threading.local()


def _scratch_out(capacity: int) -> np.ndarray:
    buf = getattr(_pack_scratch, "out", None)
    if buf is None or buf.size < capacity:
        buf = np.empty(capacity, dtype=np.uint8)
        _pack_scratch.out = buf
    return buf

_lib = None
_load_error: Optional[Exception] = None


def _load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        from .build import build

        path = build()
        lib = ctypes.CDLL(path)
        lib.flacenc_pack_frames.restype = ctypes.c_int64
        lib.flacenc_pack_frames.argtypes = [
            ctypes.POINTER(ctypes.c_int32),  # signal
            ctypes.POINTER(ctypes.c_int32),  # errors
            ctypes.POINTER(ctypes.c_int32),  # sf_type
            ctypes.POINTER(ctypes.c_int32),  # order
            ctypes.POINTER(ctypes.c_int32),  # qcoefs
            ctypes.POINTER(ctypes.c_int32),  # shift
            ctypes.POINTER(ctypes.c_int32),  # rice_order
            ctypes.POINTER(ctypes.c_int32),  # rice_params
            ctypes.POINTER(ctypes.c_int32),  # ch_tag
            ctypes.POINTER(ctypes.c_int64),  # frame_numbers
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain missing
        _load_error = e
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def pack_frames(
    signal: np.ndarray,        # (F, C, T) int32
    errors: np.ndarray,        # (F, C, T) int32
    sf_type: np.ndarray,       # (F, C) int32
    order: np.ndarray,         # (F, C) int32
    qcoefs: np.ndarray,        # (F, C, 24) int32
    shift: np.ndarray,         # (F, C) int32
    rice_order: np.ndarray,    # (F, C) int32
    rice_params: np.ndarray,   # (F, C, P) int32
    ch_tag: np.ndarray,        # (F,) int32
    frame_numbers: np.ndarray, # (F,) int64
    bps_base: int,
    precision: int,
    bs_spec: Tuple[int, int, int],  # (tag, extra_bits, extra_val)
    sr_spec: Tuple[int, int, int],
    ss_tag: int,
) -> Tuple[bytes, np.ndarray]:
    """Packs a batch of frames; returns (concatenated bytes, per-frame sizes)."""
    lib = _load()
    assert lib is not None, f"native packer unavailable: {_load_error}"
    F, C, T = signal.shape
    P = rice_params.shape[-1]

    def c32(a):
        return np.ascontiguousarray(a, dtype=np.int32)

    signal = c32(signal); errors = c32(errors); sf_type = c32(sf_type)
    order = c32(order); qcoefs = c32(qcoefs); shift = c32(shift)
    rice_order = c32(rice_order); rice_params = c32(rice_params)
    ch_tag = c32(ch_tag)
    frame_numbers = np.ascontiguousarray(frame_numbers, dtype=np.int64)

    capacity = F * (64 + C * (T * 5 + 64))
    out = _scratch_out(capacity)
    sizes = np.zeros(F, dtype=np.int64)
    total = lib.flacenc_pack_frames(
        _ptr(signal, ctypes.c_int32), _ptr(errors, ctypes.c_int32),
        _ptr(sf_type, ctypes.c_int32), _ptr(order, ctypes.c_int32),
        _ptr(qcoefs, ctypes.c_int32), _ptr(shift, ctypes.c_int32),
        _ptr(rice_order, ctypes.c_int32), _ptr(rice_params, ctypes.c_int32),
        _ptr(ch_tag, ctypes.c_int32), _ptr(frame_numbers, ctypes.c_int64),
        F, C, T, P, bps_base, precision,
        bs_spec[0], bs_spec[1], bs_spec[2],
        sr_spec[0], sr_spec[1], sr_spec[2],
        ss_tag,
        _ptr(out, ctypes.c_uint8), capacity,
        _ptr(sizes, ctypes.c_int64),
    )
    assert total >= 0, "native packer capacity exceeded"
    return out[:total].tobytes(), sizes


def pack_frames_recompute(
    blocks: np.ndarray,        # (F, C, T) int32 raw input channels
    assign: np.ndarray,        # (F,) int32 stereo assignment code
    sf_type: np.ndarray,       # (F, C) int32
    order: np.ndarray,         # (F, C) int32
    qcoefs: np.ndarray,        # (F, C, 24) int32
    shift: np.ndarray,         # (F, C) int32
    rice_order: np.ndarray,    # (F, C) int32
    rice_params: np.ndarray,   # (F, C, P) int32
    ch_tag: np.ndarray,        # (F,) int32
    frame_numbers: np.ndarray, # (F,) int64
    bps_base: int,
    precision: int,
    bs_spec: Tuple[int, int, int],
    sr_spec: Tuple[int, int, int],
    ss_tag: int,
    n_threads: int = 0,
) -> Tuple[bytes, np.ndarray]:
    """Packs frames from device DECISIONS only.

    Stored channels (M/S) and chosen-predictor residuals are recomputed in
    C++ from the raw input blocks — residuals never cross the device link.

    Frames are independent, so the batch is packed by `n_threads` worker
    threads (callers resolve it via `parallel.determine_worker_count`:
    config.workers -> env FLACENC_WORKERS -> FLACENC_PACK_THREADS -> all
    cores; 1 = sequential) into worst-case regions compacted in order
    afterward — bytes are identical either way.
    """
    lib = _load()
    assert lib is not None, f"native packer unavailable: {_load_error}"
    # int16 blocks take the `16` entry point (bps<=16 fast path: raw
    # channels are sign-extended inline in C++, so no int32 copy of the
    # batch is ever materialized); any other dtype widens to int32.
    narrow = blocks.dtype == np.int16
    entry = (lib.flacenc_pack_frames_recompute16 if narrow
             else lib.flacenc_pack_frames_recompute)
    blk_ctype = ctypes.c_int16 if narrow else ctypes.c_int32
    if getattr(entry, "argtypes", None) is None:
        entry.restype = ctypes.c_int64
        entry.argtypes = (
            [ctypes.POINTER(blk_ctype)]
            + [ctypes.POINTER(ctypes.c_int32)] * 8
            + [ctypes.POINTER(ctypes.c_int64)]
            + [ctypes.c_int32] * 13
            + [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
               ctypes.POINTER(ctypes.c_int64), ctypes.c_int32]
        )
    if n_threads < 1:
        from ..parallel import determine_worker_count

        n_threads = determine_worker_count()
    n_threads = min(n_threads, 64)  # worker spawn is per call; cap fan-out
    F, C, T = blocks.shape
    P = rice_params.shape[-1]

    def c32(a):
        return np.ascontiguousarray(a, dtype=np.int32)

    blocks = (np.ascontiguousarray(blocks) if narrow else c32(blocks))
    assign = c32(assign); sf_type = c32(sf_type)
    order = c32(order); qcoefs = c32(qcoefs); shift = c32(shift)
    rice_order = c32(rice_order); rice_params = c32(rice_params)
    ch_tag = c32(ch_tag)
    frame_numbers = np.ascontiguousarray(frame_numbers, dtype=np.int64)

    capacity = F * (64 + C * (T * 5 + 64))
    out = _scratch_out(capacity)
    sizes = np.zeros(F, dtype=np.int64)
    total = entry(
        _ptr(blocks, blk_ctype), _ptr(assign, ctypes.c_int32),
        _ptr(sf_type, ctypes.c_int32), _ptr(order, ctypes.c_int32),
        _ptr(qcoefs, ctypes.c_int32), _ptr(shift, ctypes.c_int32),
        _ptr(rice_order, ctypes.c_int32), _ptr(rice_params, ctypes.c_int32),
        _ptr(ch_tag, ctypes.c_int32), _ptr(frame_numbers, ctypes.c_int64),
        F, C, T, P, bps_base, precision,
        bs_spec[0], bs_spec[1], bs_spec[2],
        sr_spec[0], sr_spec[1], sr_spec[2],
        ss_tag,
        _ptr(out, ctypes.c_uint8), capacity,
        _ptr(sizes, ctypes.c_int64), n_threads,
    )
    assert total >= 0, "native packer capacity exceeded"
    return out[:total].tobytes(), sizes


def estimate_entropy_strict(
    errors: np.ndarray, warmup: int, partitions: int
) -> Optional[int]:
    """Sequential-f32 entropy estimate (reference stable-build semantics)."""
    lib = _load()
    if lib is None:
        return None
    fn = lib.flacenc_estimate_entropy
    if getattr(fn, "argtypes", None) is None:
        fn.restype = ctypes.c_int64
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ]
    err = np.ascontiguousarray(errors, np.int32)
    return int(fn(_ptr(err, ctypes.c_int32), len(err), warmup, partitions))


def strict_fixed_order(
    signals: np.ndarray, bps: np.ndarray, max_order: int, partitions: int
):
    """Strict ApproxEnt fixed-LPC order selection for N channels.

    signals (N, T) int32, bps (N,) int32 ->
    (order (N,) int32, est_bits (N,) int64); None if the lib is missing.
    """
    lib = _load()
    if lib is None:
        return None
    fn = lib.flacenc_strict_fixed_order
    if getattr(fn, "argtypes", None) is None:
        fn.restype = None
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ]
    signals = np.ascontiguousarray(signals, np.int32)
    bps = np.ascontiguousarray(bps, np.int32)
    N, T = signals.shape
    order = np.zeros(N, np.int32)
    est = np.zeros(N, np.int64)
    fn(
        _ptr(signals, ctypes.c_int32), _ptr(bps, ctypes.c_int32),
        N, T, max_order, partitions,
        _ptr(order, ctypes.c_int32), _ptr(est, ctypes.c_int64),
    )
    return order, est


def lpc_synthesis(
    warm_up: np.ndarray, coefs: np.ndarray, shift: int, residual: np.ndarray
) -> Optional[np.ndarray]:
    """C++ IIR synthesis for the decoder; None when the lib is missing."""
    lib = _load()
    if lib is None:
        return None
    if getattr(lib.flacenc_lpc_synthesis, "argtypes", None) is None:
        lib.flacenc_lpc_synthesis.restype = None
        lib.flacenc_lpc_synthesis.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32,
        ]
    n = len(residual)
    order = len(coefs)
    out = np.zeros(n, dtype=np.int32)
    out[:order] = np.asarray(warm_up[:order], np.int32)
    res = np.ascontiguousarray(residual, np.int32)
    cfs = np.ascontiguousarray(coefs, np.int32)
    lib.flacenc_lpc_synthesis(
        _ptr(out, ctypes.c_int32), _ptr(res, ctypes.c_int32),
        _ptr(cfs, ctypes.c_int32), order, shift, n,
    )
    return out


def strict_qlpc(
    signals: np.ndarray, window: np.ndarray, lpc_order: int, precision: int
):
    """Strict-float QLPC (stable-reference semantics) for N channels.

    signals (N, T) int32, window (T,) float32 ->
    (qcoefs (N, 24) int32, order (N,) int32, shift (N,) int32).
    Returns None when the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    if getattr(lib.flacenc_strict_qlpc, "argtypes", None) is None:
        lib.flacenc_strict_qlpc.restype = None
        lib.flacenc_strict_qlpc.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
    signals = np.ascontiguousarray(signals, np.int32)
    window = np.ascontiguousarray(window, np.float32)
    N, T = signals.shape
    qcoefs = np.zeros((N, 24), np.int32)
    order = np.zeros(N, np.int32)
    shift = np.zeros(N, np.int32)
    lib.flacenc_strict_qlpc(
        _ptr(signals, ctypes.c_int32), _ptr(window, ctypes.c_float),
        N, T, lpc_order, precision,
        _ptr(qcoefs, ctypes.c_int32), _ptr(order, ctypes.c_int32),
        _ptr(shift, ctypes.c_int32),
    )
    return qcoefs, order, shift


def scan_upload(chunk: np.ndarray):
    """C++ single-pass (order, width) selection for the packed-upload
    wire format (ops/upack.py): measures the batch's d1/d2 ranges and
    returns the narrowest fitting format, None if nothing under 16 bits
    fits (caller uploads raw), or NotImplemented when the native library
    is unavailable."""
    lib = _load()
    if lib is None:
        return NotImplemented
    fn = lib.flacenc_scan_upload
    if getattr(fn, "argtypes", None) is None:
        fn.restype = ctypes.c_int32
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
    x = np.ascontiguousarray(chunk, dtype=np.int32)
    T = x.shape[-1]
    rows = x.size // T if T else 0
    meta = np.zeros(2, np.int32)
    ok = fn(_ptr(x, ctypes.c_int32), rows, T, _ptr(meta, ctypes.c_int32))
    return (int(meta[0]), int(meta[1])) if ok else None


def pack_upload(chunk: np.ndarray, order: int, width: int):
    """C++ single-pass delta pack at a FIXED (order, width) chosen by
    `scan_upload` (or forced by tests): (..., T) int, T % 16 == 0 ->
    ((..., T*width/32) uint32 words, (..., 2) int32 firsts)."""
    lib = _load()
    assert lib is not None, f"native packer unavailable: {_load_error}"
    narrow = chunk.dtype == np.int16
    fn = lib.flacenc_pack_upload16 if narrow else lib.flacenc_pack_upload
    in_ctype = ctypes.c_int16 if narrow else ctypes.c_int32
    if getattr(fn, "argtypes", None) is None:
        fn.restype = None
        fn.argtypes = [
            ctypes.POINTER(in_ctype), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
        ]
    x = (np.ascontiguousarray(chunk) if narrow
         else np.ascontiguousarray(chunk, dtype=np.int32))
    T = x.shape[-1]
    assert T % 16 == 0 and T * width % 32 == 0, (T, width)
    rows = x.size // T if T else 0
    words = np.empty(x.shape[:-1] + (T * width // 32,), np.uint32)
    firsts = np.empty(x.shape[:-1] + (2,), np.int32)
    fn(
        _ptr(x, in_ctype), rows, T, order, width,
        _ptr(words, ctypes.c_uint32), _ptr(firsts, ctypes.c_int32),
    )
    return words, firsts


def scan_rice(chunk: np.ndarray):
    """C++ single-pass rice-wire statistics: (rows, 2, 26) int64 partial
    sums S[r][order-1][p] = sum_t(zigzag(delta_order)[t] >> p), or
    NotImplemented when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return NotImplemented
    fn = lib.flacenc_scan_rice
    if getattr(fn, "argtypes", None) is None:
        fn.restype = None
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
    x = np.ascontiguousarray(chunk, dtype=np.int32)
    T = x.shape[-1]
    rows = x.size // T if T else 0
    sums = np.zeros((rows, 2, 26), np.int64)
    fn(_ptr(x, ctypes.c_int32), rows, T, _ptr(sums, ctypes.c_int64))
    return sums.reshape(x.shape[:-1] + (2, 26))


def rice4_supported() -> bool:
    """True when the loaded library carries the order-3/4 wire ABI
    (4-order scan + 4-lane warm-up firsts in pack_rice). A stale cached
    .so returns False and the wire degrades to orders 1-2."""
    lib = _load()
    return lib is not None and hasattr(lib, "flacenc_scan_wire4")


def scan_wire(chunk: np.ndarray, stride: int = 1):
    """C++ FUSED wire scan — one pass over the batch returning both
    upload-wire statistics: ((rows, NORD, 26) int64 rice partial sums,
    (4,) int32 [d1_min, d1_max, d2_min, d2_max]), or NotImplemented when
    the native library is unavailable. NORD is 4 (delta orders 1-4) with
    a current build, 2 with a stale cached library — `rice_plan` adapts
    to either shape. Replaces the separate `scan_upload` + `scan_rice`
    passes on the hot path (~3x less single-core host CPU per batch);
    those remain exported as oracles.

    `stride` > 1 SAMPLES the rice partial sums (every stride-th sample;
    UNSCALED — callers multiply by stride and pad the unary budget): the
    per-p sum passes are most of the scan's cost and only steer the
    (order, p) choice. The delta min/max stay exact regardless."""
    lib = _load()
    if lib is None or not hasattr(lib, "flacenc_scan_wire"):
        return NotImplemented
    narrow = chunk.dtype == np.int16
    four = hasattr(lib, "flacenc_scan_wire4")
    if four:
        fn = lib.flacenc_scan_wire16_4 if narrow else lib.flacenc_scan_wire4
    else:
        fn = lib.flacenc_scan_wire16 if narrow else lib.flacenc_scan_wire
    in_ctype = ctypes.c_int16 if narrow else ctypes.c_int32
    if getattr(fn, "argtypes", None) is None:
        fn.restype = None
        fn.argtypes = [
            ctypes.POINTER(in_ctype), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ]
    x = (np.ascontiguousarray(chunk) if narrow
         else np.ascontiguousarray(chunk, dtype=np.int32))
    T = x.shape[-1]
    rows = x.size // T if T else 0
    nord = 4 if four else 2
    sums = np.zeros((rows, nord, 26), np.int64)
    mm = np.zeros(4, np.int32)
    fn(_ptr(x, in_ctype), rows, T, stride,
       _ptr(sums, ctypes.c_int64), _ptr(mm, ctypes.c_int32))
    return sums.reshape(x.shape[:-1] + (nord, 26)), mm


def pack_rice(chunk: np.ndarray, order: int, p: int, wu: int):
    """C++ single-pass rice-wire pack at fixed (order, p) with a static
    per-row unary word budget `wu`: (..., T) int ->
    (lo (..., T*p/32) u32, unary (..., wu) u32,
    firsts (..., 2 or 4) i32 — [x0, x1] for orders 1-2, the four
    difference warm-ups for orders 3-4), or None if a row overflows the
    unary budget (caller falls back). Orders 3-4 require the rice4 ABI
    (`rice4_supported`); callers dispatch to the numpy oracle otherwise."""
    lib = _load()
    assert lib is not None, f"native packer unavailable: {_load_error}"
    assert order <= 2 or rice4_supported(), "stale library: no rice4 ABI"
    narrow = chunk.dtype == np.int16
    fn = lib.flacenc_pack_rice16 if narrow else lib.flacenc_pack_rice
    in_ctype = ctypes.c_int16 if narrow else ctypes.c_int32
    if getattr(fn, "argtypes", None) is None:
        fn.restype = ctypes.c_int32
        fn.argtypes = [
            ctypes.POINTER(in_ctype), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_int32),
        ]
    x = (np.ascontiguousarray(chunk) if narrow
         else np.ascontiguousarray(chunk, dtype=np.int32))
    T = x.shape[-1]
    assert T * p % 32 == 0, (T, p)
    rows = x.size // T if T else 0
    lo = np.empty(x.shape[:-1] + (T * p // 32,), np.uint32)
    unary = np.empty(x.shape[:-1] + (wu,), np.uint32)
    firsts = np.empty(x.shape[:-1] + (2 if order <= 2 else 4,), np.int32)
    ok = fn(
        _ptr(x, in_ctype), rows, T, order, p, wu,
        _ptr(lo, ctypes.c_uint32), _ptr(unary, ctypes.c_uint32),
        _ptr(firsts, ctypes.c_int32),
    )
    return (lo, unary, firsts) if ok else None


def parse_samples(data, bit_offset: int, count: int, bps: int):
    """C++ fixed-width signed sample run (the parser's verbatim/warm-up
    fast path): returns (new_bit_offset, (count,) int32 samples), None
    when the native library is unavailable; raises ValueError on
    truncation."""
    lib = _load()
    if lib is None:
        return None
    fn = lib.flacenc_parse_samples
    if getattr(fn, "argtypes", None) is None:
        fn.restype = ctypes.c_int64
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ]
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(count, np.int32)
    new_pos = fn(
        _ptr(buf, ctypes.c_uint8), len(data) * 8, bit_offset,
        count, bps, _ptr(out, ctypes.c_int32),
    )
    if new_pos < 0:
        raise ValueError("truncated sample run")
    return int(new_pos), out


def compute_errors(
    signals: np.ndarray, is_lpc: np.ndarray, order: np.ndarray,
    qcoefs: np.ndarray, shift: np.ndarray,
):
    """Batched exact residual recompute (fixed cascade / QLPC FIR) for
    overflow channels: signals (N, T) int32 -> (N, T) int32 errors.
    Returns None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    fn = lib.flacenc_compute_errors
    if getattr(fn, "argtypes", None) is None:
        fn.restype = None
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]

    def c32(a):
        return np.ascontiguousarray(a, dtype=np.int32)

    signals = c32(signals)
    N, T = signals.shape
    is_lpc = c32(is_lpc); order = c32(order); shift = c32(shift)
    qcoefs = c32(qcoefs)
    assert qcoefs.shape == (N, 24), qcoefs.shape
    err = np.empty((N, T), np.int32)
    fn(
        _ptr(signals, ctypes.c_int32), N, T,
        _ptr(is_lpc, ctypes.c_int32), _ptr(order, ctypes.c_int32),
        _ptr(qcoefs, ctypes.c_int32), _ptr(shift, ctypes.c_int32),
        _ptr(err, ctypes.c_int32),
    )
    return err


def parse_residual(data: bytes, bit_offset: int, block_size: int, warmup: int):
    """C++ residual parse; returns (new_offset, order, params, q, r) or
    None when the native library is unavailable. Raises ValueError on
    malformed input (matching the Python parser's ParseError conditions)."""
    lib = _load()
    if lib is None:
        return None
    fn = lib.flacenc_parse_residual
    if getattr(fn, "argtypes", None) is None:
        fn.restype = ctypes.c_int64
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
        ]
    buf = np.frombuffer(data, dtype=np.uint8)
    order = np.zeros(1, np.int32)
    params = np.zeros(1 << 15, np.int32)
    q = np.zeros(block_size, np.uint32)
    r = np.zeros(block_size, np.uint32)
    new_pos = fn(
        _ptr(buf, ctypes.c_uint8), len(data) * 8, bit_offset,
        block_size, warmup,
        _ptr(order, ctypes.c_int32), _ptr(params, ctypes.c_int32),
        _ptr(q, ctypes.c_uint32), _ptr(r, ctypes.c_uint32),
    )
    if new_pos < 0:
        raise ValueError("malformed residual")
    nparts = 1 << int(order[0])
    return int(new_pos), int(order[0]), params[:nparts].copy(), q, r
