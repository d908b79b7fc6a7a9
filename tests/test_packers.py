"""Packer-path parity: python oracle vs C++ ("native") vs decisions-only
C++ recompute ("native2", the default via packer="auto").

native2 never ships residuals over the device link — the C++ packer
recomputes stored channels (M/S) and the chosen predictor's residual from
the raw blocks (packer.cpp:flacenc_pack_frames_recompute), so its byte
output must match the oracle exactly, including when residuals exceed
int16 (the case the old "native" path flags with `fits16` and recomputes
in Python).
"""

import time

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
    """Adaptive delta wire format (ops/upack.py): streams are byte-
    identical to the raw-upload path; batches whose deltas overflow every
    width fall back to raw automatically (output never depends on the
    wire format)."""
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
    """ops/upack.py codec: unpack(pack(x, order, width)) == x for every
    (order, width) in the adaptive matrix, incl. int32 wrap extremes."""
    import jax

    from flacenc_tpu.ops import upack

    rng = np.random.default_rng(1)
    for order in upack.ORDERS:
        for width in upack.WIDTHS:
            T = 512 if width % 2 else 1024  # odd widths need T % 32 == 0
            lim = 1 << (width - 1)
            d = rng.integers(-lim, lim, (3, 2, T), np.int64)
            d[..., :order] = 0
            x = d.copy()
            for _ in range(order):
                x = np.cumsum(x, -1)
            x = (x + rng.integers(-20000, 20000, (3, 2, 1))).astype(np.int32)
            fmt = upack.scan(x)
            assert fmt is not None and fmt[1] <= width, (order, width, fmt)
            w, f = upack.pack(x, order, width)
            y = np.asarray(jax.jit(
                lambda w, f, o=order, wd=width, t=T: upack.unpack(w, f, t, o, wd)
            )(w, f))
            assert np.array_equal(y, x), (order, width)

    # int32 extremes: numpy's diff wraps in int32 and the device-side
    # cumsum wraps back — exactness holds at the representation edges
    ext = np.zeros((1, 32), np.int32)
    ext[0, 0] = 2**31 - 1
    ext[0, 1:] = -(2**31)
    w, f = upack.pack(ext, 1, 8)
    y = np.asarray(jax.jit(lambda w, f: upack.unpack(w, f, 32, 1, 8))(w, f))
    assert np.array_equal(y, ext)

    # full-scale 16-bit noise: scan finds a wide (hi-res) field, but
    # try_pack rejects anything that does not beat the raw int16 upload
    noise = rng.integers(-32768, 32768, (2, 2, 64)).astype(np.int32)
    fmt = upack.scan(noise)
    assert fmt is None or fmt[1] > 12, fmt  # never a narrow lie
    assert upack.try_pack(noise, 16) is None
    assert upack.try_pack(
        np.tile(np.array([-32768, 32767], np.int32), 32)[None]
    ) is None
    # ... while 24-bit content uses exactly those wide widths
    hi = (noise.astype(np.int64) << 8).astype(np.int32)
    out = upack.try_pack(hi, 24)
    assert out is not None and out[0][0] in ("w", "r"), out and out[0]
    assert sum(a.nbytes for a in out[1]) < hi.size * 4

    # hi-res (17..24-bit) is now wire-eligible; above that the rice
    # zigzag would overflow uint32, so the explicit request must raise
    p24 = be.BatchPipeline(config.Encoder(), 2, 24, 1024, 4, upload_pack=True)
    assert p24.upload_mode == "on" and not p24._delta_eligible
    with pytest.raises(ValueError):
        be.BatchPipeline(
            config.Encoder(), 2, 32, 1024, 4, upload_pack=True
        )
    with pytest.raises(ValueError):
        be.BatchPipeline(
            config.Encoder(), 2, 16, 1016, 4, upload_pack=True
        )
    # the delta16 wire cannot represent hi-res samples
    with pytest.raises(ValueError):
        be.BatchPipeline(
            config.Encoder(), 2, 24, 1024, 4, upload_pack="delta"
        )


def test_delta_wire_roundtrip_and_pipeline():
    """The ("d", order) delta16 wire: unpack_delta(pack_delta(x)) == x for
    both orders incl. full-scale int16 extremes (wrapping int16 deltas
    reconstruct exactly because mod-2^16 equality is equality for
    bps <= 16), and FLACENC_PACKED_UPLOAD=d streams are byte-identical
    to raw."""
    import jax

    from flacenc_tpu.ops import upack

    rng = np.random.default_rng(3)
    cases = [
        np.cumsum(rng.integers(-300, 301, (3, 2, 256)), -1)
        .clip(-32768, 32767).astype(np.int32),
        rng.integers(-32768, 32768, (2, 2, 256)).astype(np.int32),  # noise
        np.tile(np.array([-32768, 32767], np.int32), 128)[None, None],
    ]
    for order in (1, 2):
        for x in cases:
            wire, (d, f) = upack.pack_delta(x, order)
            assert wire == ("d", order) and d.dtype == np.int16
            y = np.asarray(jax.jit(
                lambda d, f, o=order, t=x.shape[-1]:
                    upack.unpack_delta(d, f, t, o)
            )(d, f))
            assert np.array_equal(y, x), (order, x[0, 0, :4])

    # pipeline: forced delta wire, bytes identical to forced raw
    blocks = [
        np.cumsum(rng.integers(-120, 121, (2, 512)), -1).astype(np.int32)
        for _ in range(4)
    ]

    def run(upload_pack):
        p = be.BatchPipeline(config.Encoder(), 2, 16, 512, 2,
                             upload_pack=upload_pack)
        frames = []
        for i, blk in enumerate(blocks):
            r = p.submit([blk], np.asarray([i]), rate=44100)
            if r:
                frames.extend(r.frames)
        for r in p.drain_all():
            frames.extend(r.frames)
        wire_kinds = {(k[0] if k else None) for k in p.wire_counts}
        p.close()
        return b"".join(f.precomputed_bitstream for f in frames), wire_kinds

    data_d, kinds_d = run("delta")
    data_raw, kinds_raw = run(False)
    assert kinds_d == {"d"} and kinds_raw == {None}
    assert data_d == data_raw


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


def test_native_upload_scan_pack_parity():
    """C++ single-pass scan + pack == numpy scan/pack across the adaptive
    matrix, incl. range edges and the wrapping-int32 delta semantics
    shared with the device cumsum."""
    from flacenc_tpu import native
    from flacenc_tpu.ops import upack

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    # random scales sweep scan's chosen widths; include a T % 32 != 0
    # shape (odd widths gated) and a big one
    for shape in ((3, 2, 112), (1, 2, 4096), (5, 96)):
        for scale in (60, 120, 250, 500, 1000, 2000, 5000):
            d = rng.integers(-scale, scale, shape, np.int32)
            x = np.clip(np.cumsum(d, axis=-1), -(2**28), 2**28).astype(np.int32)
            fmt_np = upack.scan(x)
            fmt_c = native.scan_upload(x)
            assert fmt_c == fmt_np, (shape, scale, fmt_c, fmt_np)
            if fmt_c is None:
                continue
            w_np, f_np = upack.pack(x, *fmt_c)
            w_c, f_c = native.pack_upload(x, *fmt_c)
            assert np.array_equal(w_np, w_c) and np.array_equal(f_np, f_c)

    # range edges: the +-2^(w-1) boundary per width
    for w in upack.WIDTHS:
        edge = np.zeros((1, 32), np.int32)
        lim = 1 << (w - 1)
        edge[0, 1::2] = lim - 1  # alternating -> |d1| = lim-1, |d2| large
        assert native.scan_upload(edge) == upack.scan(edge)

    # int32 extremes wrap identically
    ext = np.zeros((1, 32), np.int32)
    ext[0, 0] = 2**31 - 1
    ext[0, 1:] = -(2**31)
    assert native.scan_upload(ext) == upack.scan(ext) == (1, 8)
    w_c, f_c = native.pack_upload(ext, 1, 8)
    w_np, f_np = upack.pack(ext, 1, 8)
    assert np.array_equal(w_np, w_c) and np.array_equal(f_np, f_c)


def test_link_estimator_racer():
    """LinkEstimator racer: cold-starts on raw, skips exploring packed
    wires on a fast link, explores + converges on a slow one, and flips
    within a few batches after a mid-stream regime change."""
    KINDS = ("raw", "d", "pack")
    # fast link: raw measured at ~2 GB/s -> never leaves raw
    est = be.LinkEstimator()
    assert est.choose(KINDS, "raw") == "raw"  # unknown -> raw first
    for _ in range(3):
        est.update(4_000_000, 0.002, "raw")
    assert est.choose(KINDS, "raw") == "raw"

    # slow link: raw gap 200 ms -> explores "d" then "pack", each probe
    # holding _PROBE_LEN consecutive batches (the homogeneous-pair rule
    # means only the 2nd batch of a probe produces a clean gap sample),
    # then races: pack (80 ms) beats d (110 ms) beats raw
    est = be.LinkEstimator()
    assert est.choose(KINDS, "raw") == "raw"
    est.update(4_000_000, 0.2, "raw")
    for _ in range(be._PROBE_LEN):
        assert est.choose(KINDS, "raw") == "d"
    est.update(4_000_000, 0.11, "d")
    for _ in range(be._PROBE_LEN):
        assert est.choose(KINDS, "d") == "pack"
    est.update(2_600_000, 0.08, "pack")
    assert est.choose(KINDS, "pack") == "pack"

    # hysteresis: a <10% predicted improvement keeps the incumbent
    est.update(4_000_000, 0.051, "d")  # d EWMA ~0.075: better, within 10%
    assert est.secs["d"] < est.secs["pack"]
    assert est.choose(KINDS, "pack") == "pack"

    # regime change: the link opens up and pack's gap shrinks; the stale
    # raw estimate ages per decision and is re-probed on the
    # bytes-predicted schedule (raw predicts 4 MB/(2.6 MB/0.03 s) ≈
    # 1.5x the incumbent: clearly losing, so it waits 2*_EXPLORE_EVERY),
    # and a fresh winning probe takes over after the debounce votes
    KINDS_RP = ("raw", "pack")
    probed = None
    for _ in range(2 * be._EXPLORE_EVERY + 2):
        est.update(2_600_000, 0.03, "pack")
        k = est.choose(KINDS_RP, "pack")
        if k != "pack":
            probed = k
            break
    assert probed == "raw"
    est.update(4_000_000, 0.01, "raw")   # probe reads the fast link
    assert est.choose(KINDS_RP, "pack") == "raw"  # probe holds a 2nd batch
    est.update(4_000_000, 0.01, "raw")
    # debounce: the challenger must win _SWITCH_VOTES consecutive
    # decisions before it takes over from the incumbent
    for _ in range(be._SWITCH_VOTES - 1):
        assert est.choose(KINDS_RP, "pack") == "pack"
    assert est.choose(KINDS_RP, "pack") == "raw"  # raw wins after the votes


def test_stale_fast_estimate_cannot_capture_choice():
    """REGRESSION (r4): an estimate sampled in a previous bandwidth
    window (stale by wall clock) must not win a switch — measured on the
    tunneled v5e, a stale-fast raw estimate captured 19 of 26 batches of
    an 8 MB/s window at ~5x the optimal wire's cost before its EWMA
    caught up. Stale kinds are only reachable through probes."""
    KINDS = ("raw", "d", "pack")
    est = be.LinkEstimator()
    est.update(4_000_000, 0.01, "raw")    # sampled in a fast window
    est.update(4_000_000, 0.30, "d")
    est.update(2_600_000, 0.05, "pack")
    # the window changed: raw's and d's samples are now 20 s old
    est.t_sample["raw"] -= 20.0
    est.t_sample["d"] -= 20.0
    for _ in range(5):
        est.update(2_600_000, 0.05, "pack")
        assert est.choose(KINDS, "pack") == "pack"


def test_initial_kind_bytes_ranked():
    """A new pipeline's starting wire comes from the estimator's
    window-invariant bytes ranking: raw when unproven or fast-link, the
    smallest-bytes measured kind on a known-slow link (a new encode
    often starts in a different bandwidth window than the last ended in,
    so seconds estimates are not trustworthy across the boundary)."""
    KINDS = ("raw", "d", "pack")
    est = be.LinkEstimator()
    assert est.initial_kind(KINDS) == "raw"          # unproven
    est.update(4_000_000, 0.002, "raw")              # ~2 GB/s: fast link
    assert est.initial_kind(KINDS) == "raw"
    est2 = be.LinkEstimator()
    est2.update(4_000_000, 0.2, "raw")               # 20 MB/s: slow
    est2.update(4_000_000, 0.11, "d")
    est2.update(2_600_000, 0.08, "pack")
    assert est2.initial_kind(KINDS) == "pack"        # smallest bytes


def test_link_estimator_debounce_resists_single_lucky_sample():
    """A one-off fast gap sample for a losing wire must not dethrone the
    incumbent unless the advantage persists across _SWITCH_VOTES
    consecutive decisions (mixed-window gaps produce exactly such
    one-off artifacts)."""
    KINDS = ("raw", "d", "pack")
    est = be.LinkEstimator()
    est.update(4_000_000, 0.2, "raw")
    est.update(4_000_000, 0.15, "d")
    est.update(2_600_000, 0.06, "pack")
    for _ in range(3):
        est.update(2_600_000, 0.06, "pack")
        assert est.choose(KINDS, "pack") == "pack"
    # one lucky raw sample: raw's EWMA now predicts a >10% win
    est.update(4_000_000, 0.02, "raw")
    assert est.secs["raw"] < est.secs["pack"] * 0.9
    assert est.choose(KINDS, "pack") == "pack"  # vote 1: held
    # the advantage evaporates before the second vote (it was a stall
    # artifact): the vote resets and no switch ever happens
    est.update(4_000_000, 0.4, "raw")
    assert est.choose(KINDS, "pack") == "pack"
    assert est._vote is None
    # but a SUSTAINED advantage does switch after the votes
    est.update(4_000_000, 0.01, "raw")
    est.update(4_000_000, 0.01, "raw")
    for _ in range(be._SWITCH_VOTES - 1):
        assert est.choose(KINDS, "pack") == "pack"
    assert est.choose(KINDS, "pack") == "raw"


def test_drain_gap_attribution_homogeneous_pairs(monkeypatch):
    """drain_one feeds the racer only when the drained batch and its
    predecessor share a wire kind — a gap spanning a wire flip measures
    the mixed in-flight window, not either wire."""
    from concurrent.futures import Future

    p = be.BatchPipeline(config.Encoder(), 2, 16, 256, 2, upload_pack=False)
    try:
        recorded = []
        monkeypatch.setattr(
            p._est, "update", lambda nb, s, k="raw": recorded.append(k)
        )
        nums = np.arange(2)
        for kind in ("raw", "raw", "pack", "d", "d", "d"):
            fut = Future()
            fut.set_result(([], 0.0))  # (frames, pack_s) from the io task
            p._in_flight.append((fut, nums, 2, None, 100, kind))
        while p._in_flight:
            p.drain_one()
        # raw-raw pair at drain 2, d-d pair at drain 5 (drain 6 is no
        # longer saturated); flips at drains 3 and 4 are never fed
        assert recorded == ["raw", "d"]
    finally:
        p.close()


def test_rice_plan_cache_reuse_and_rescan(monkeypatch):
    """_try_pack_cached reuses the previous rice plan without re-scanning,
    rescans when the cached plan's unary budget overflows, and rescans
    after _PLAN_RESCAN_EVERY batches."""
    from flacenc_tpu.ops import upack

    p = be.BatchPipeline(config.Encoder(), 2, 16, 512, 4, upload_pack="auto")
    try:
        rng = np.random.default_rng(7)
        quiet = np.cumsum(
            rng.integers(-50, 51, (4, 2, 512)), -1
        ).astype(np.int32)
        # sparse spikes: a fixed-width wire would need >=15-bit fields,
        # rice absorbs them in the unary plane -> the scan picks "r".
        # Per-channel DIFFERENT spike positions keep the channels
        # decorrelated so the mid/side candidate loses the byte race
        # (common-mode spikes would cancel in the s plane and flip the
        # scan to the "m" wire, which has its own cache test)
        quiet[:, 0, ::97] += 9000
        quiet[:, 1, 31::89] -= 9000
        scans = []
        real_try_pack = upack.try_pack
        monkeypatch.setattr(
            upack, "try_pack",
            lambda *a, **k: scans.append(1) or real_try_pack(*a, **k),
        )
        wire1, payload1 = p._try_pack_cached(quiet)
        assert wire1[0] == "r" and p._rice_plan == wire1 and len(scans) == 1
        # steady content: the cached plan packs without a scan, and the
        # payload is bit-identical to a from-scratch pack of that plan
        wire2, payload2 = p._try_pack_cached(quiet)
        assert wire2 == wire1 and len(scans) == 1
        oracle = upack.pack_rice(quiet, *wire1[1:])
        assert all(np.array_equal(a, b) for a, b in zip(payload2, oracle))
        # unary-budget overflow (full-scale noise) forces a rescan
        loud = rng.integers(-30000, 30000, (4, 2, 512)).astype(np.int32)
        p._try_pack_cached(loud)
        assert len(scans) == 2
        # periodic rescan bounds byte drift on evolving content
        p._try_pack_cached(quiet)  # rescan (plan is now loud's/None)
        base = len(scans)
        p._rice_plan_age = be._PLAN_RESCAN_EVERY - 1
        p._try_pack_cached(quiet)
        assert len(scans) == base + 1
    finally:
        p.close()


def test_upload_pack_env_modes(monkeypatch):
    """FLACENC_PACKED_UPLOAD: '1' on, '0' off, unset = rolling-adaptive."""
    monkeypatch.setenv("FLACENC_PACKED_UPLOAD", "0")
    p = be.BatchPipeline(config.Encoder(), 2, 16, 1024, 4)
    assert not p.upload_pack and p.upload_mode == "off"
    p.close()
    monkeypatch.setenv("FLACENC_PACKED_UPLOAD", "1")
    p = be.BatchPipeline(config.Encoder(), 2, 16, 1024, 4)
    assert p.upload_pack and p.upload_mode == "on"
    p.close()
    monkeypatch.setenv("FLACENC_PACKED_UPLOAD", "d")
    p = be.BatchPipeline(config.Encoder(), 2, 16, 1024, 4)
    assert p.upload_mode == "delta" and p._wire_kind == "d"
    p.close()
    monkeypatch.delenv("FLACENC_PACKED_UPLOAD")
    from flacenc_tpu import native

    import jax as _jax

    p = be.BatchPipeline(config.Encoder(), 2, 16, 1024, 4)
    if native.available():
        # env-auto races only when a real link exists; host-local
        # backends (tests) stay raw — upload_pack="auto" forces the racer
        want = "off" if _jax.devices()[0].platform == "cpu" else "auto"
        assert p.upload_mode == want
    p.close()
    if native.available():
        p = be.BatchPipeline(config.Encoder(), 2, 16, 1024, 4,
                             upload_pack="auto")
        assert p.upload_mode == "auto"
        p.close()
    # ineligible shapes never adapt
    p = be.BatchPipeline(config.Encoder(), 2, 24, 1024, 4)
    assert not p.upload_pack and p.upload_mode == "off"
    p.close()


def test_pipeline_wire_flip_byte_identical(monkeypatch):
    """A mid-stream racer flip (raw -> packed -> delta -> raw) changes
    only the wire, never the bytes: drive BatchPipeline directly,
    rewriting the process-wide estimator's verdict between submits."""
    from flacenc_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    blocks = [
        np.cumsum(rng.integers(-120, 121, (2, 512)), -1).astype(np.int32)
        for _ in range(8)
    ]
    cfg = config.Encoder()

    def seed(est, fastest):
        """Pin per-kind estimates so `choose` deterministically returns
        `fastest` (fresh ages: no stale re-probe interference; vote
        pre-seeded past the switch debounce; no probe in progress)."""
        base = {"raw": 1.0, "d": 1.0, "pack": 1.0}
        base[fastest] = 0.1
        est.secs = dict(base)
        est.nbytes = {k: 1_000_000 for k in base}
        est.age = {k: 0 for k in base}
        est.t_sample = {k: time.perf_counter() for k in base}
        est.mbps = 10.0
        est._vote = (fastest, be._SWITCH_VOTES - 1)
        est._probe = None

    def run(schedule):
        monkeypatch.setattr(be, "_LINK_ESTS", {})
        p = be.BatchPipeline(cfg, 2, 16, 512, 2, upload_pack="auto")
        est = p._est
        assert p.upload_mode == "auto"
        p.async_compile = False  # deterministic wires (no warm-up race)
        frames = []
        wires = []
        for i, blk in enumerate(blocks):
            seed(est, schedule(i))
            r = p.submit([blk], np.asarray([i]), rate=44100)
            wires.append(p._wire_kind)
            if r:
                frames.extend(r.frames)
        for r in p.drain_all():
            frames.extend(r.frames)
        p.close()
        return b"".join(f.precomputed_bitstream for f in frames), wires

    schedule = lambda i: {2: "pack", 3: "pack", 4: "d", 5: "d"}.get(i, "raw")
    data_flip, wires = run(schedule)
    data_raw, wires_raw = run(lambda i: "raw")
    assert wires[2] == "pack" and wires[4] == "d"
    assert wires[0] == "raw" and wires[7] == "raw"
    assert all(w == "raw" for w in wires_raw)
    assert data_flip == data_raw


def test_async_wire_compile_fallback(monkeypatch):
    """auto-mode exploration never compiles a wire variant inline: the
    first batch that picks an uncompiled wire ships on a warm fallback
    (raw) while the variant compiles in the background; once the warm
    future resolves the wire engages — bytes identical throughout."""
    from flacenc_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(9)
    blocks = [
        np.cumsum(rng.integers(-120, 121, (2, 512)), -1).astype(np.int32)
        for _ in range(6)
    ]
    cfg = config.Encoder()
    monkeypatch.setattr(be, "_LINK_ESTS", {})
    p = be.BatchPipeline(cfg, 2, 16, 512, 2, upload_pack="auto")
    est = p._est
    # pin the racer to "pack" from the start
    est.secs = {"raw": 1.0, "d": 1.0, "pack": 0.1}
    est.nbytes = {k: 1_000_000 for k in est.secs}
    est.age = {k: 0 for k in est.secs}
    est.t_sample = {k: time.perf_counter() for k in est.secs}
    assert p.async_compile
    frames, wires = [], []

    def sub(i):
        r = p.submit([blocks[i]], np.asarray([i]), rate=44100)
        wires.append(p._wire_kind)
        if r:
            frames.extend(r.frames)

    sub(0)
    # warming (the pre-warm set: delta16 + the scanned dense wire), not
    # stalled — the batch itself shipped raw
    assert wires[0] == "raw" and len(p._warming) == 2
    for fut in list(p._warming.values()):
        fut.result(timeout=120)  # background compile completes
    for i in range(1, 6):
        sub(i)
    for r in p.drain_all():
        frames.extend(r.frames)
    p.close()
    assert "pack" in wires[1:]
    data = b"".join(f.precomputed_bitstream for f in frames)

    p2 = be.BatchPipeline(cfg, 2, 16, 512, 2, upload_pack=False)
    frames2 = []
    for i, blk in enumerate(blocks):
        r = p2.submit([blk], np.asarray([i]), rate=44100)
        if r:
            frames2.extend(r.frames)
    for r in p2.drain_all():
        frames2.extend(r.frames)
    p2.close()
    assert data == b"".join(f.precomputed_bitstream for f in frames2)


def test_host_errors_batched_native_recompute(monkeypatch):
    """Overflowing (beyond-int16) residual channels are recomputed by ONE
    batched C++ call (native.compute_errors) on the residual-shipping
    packer paths — byte-identical to the scalar-oracle fallback and to
    the native path (VERDICT r2 weak #4)."""
    n = 2048 * 2
    x = np.zeros(2 * n, np.int32)
    for ch in range(2):
        x[ch::2] = (
            sigen.Sine(41 + ch, 0.6).noise_with_seed(7 + ch, 0.25)
            .to_vec_quantized(24, n)
        )
    cfg = config.Encoder().into_verified()

    def run(packer):
        return be.encode_with_fixed_block_size(
            cfg, source.MemSource(x, 2, 24, 96000), 2048,
            batch_size=2, packer=packer,
        ).to_bytes()

    d_native = run("native")
    d_py = run("python")
    # force the scalar ref_np fallback and require identical bytes
    monkeypatch.setattr(native, "compute_errors", lambda *a, **k: None)
    assert run("python") == d_py == d_native
    assert np.array_equal(decode_stream(parse_stream(d_py)), x)


def test_native_compute_errors_matches_oracle():
    """native.compute_errors == ref_np kernels over a random channel
    batch (both fixed cascades and QLPC FIRs, 24-bit-scale values)."""
    from flacenc_tpu.ops import ref_np

    rng = np.random.default_rng(11)
    N, T = 6, 256
    sig = rng.integers(-(2**23), 2**23, (N, T)).astype(np.int32)
    is_lpc = np.array([0, 1, 0, 1, 1, 0], np.int32)
    order = np.array([2, 8, 4, 1, 12, 0], np.int32)
    qcoefs = rng.integers(-(2**14), 2**14, (N, 24)).astype(np.int32)
    shift = rng.integers(0, 15, N).astype(np.int32)
    got = native.compute_errors(sig, is_lpc, order, qcoefs, shift)
    assert got is not None
    for i in range(N):
        if is_lpc[i]:
            want = ref_np.compute_error(
                qcoefs[i, : order[i]].astype(np.int16), int(shift[i]), sig[i]
            )
        else:
            want = ref_np.fixed_lpc_errors(sig[i])[order[i]]
        assert np.array_equal(got[i], want), i


def test_rice_wire_parity_and_roundtrip():
    """Rice-coded upload wire: C++ scan/pack == numpy oracle, device
    unpack is integer-exact, and try_pack picks rice when entropy coding
    beats every fixed width (musical content)."""
    import jax

    from flacenc_tpu.ops import upack

    rng = np.random.default_rng(21)
    for order in (1, 2):
        for p in (0, 3, 4, 8):
            T = 512 if (512 * p) % 32 == 0 else 1024
            if (T * p) % 32:
                continue
            scale = max(1, 3 << max(p - 1, 0))
            x = np.clip(
                np.cumsum(rng.integers(-scale, scale, (3, 2, T)), -1),
                -32768, 32767,
            ).astype(np.int32)
            assert np.array_equal(
                native.scan_rice(x), upack.scan_rice_np(x, orders=2)
            ), (order, p)
            sums = upack.scan_rice_np(x, orders=2).reshape(-1, 2, 26)
            wu = -(-int((sums[:, order - 1, p] + T).max()) // 32)
            wu = -(-wu // 16) * 16
            got_c = native.pack_rice(x, order, p, wu)
            got_np = upack.pack_rice(x, order, p, wu)
            assert got_c is not None and got_np is not None
            for a, b in zip(got_c, got_np):
                assert np.array_equal(a, b), (order, p)
            y = np.asarray(jax.jit(
                lambda l, u, f, o=order, pp=p, t=T: upack.unpack_rice(
                    l, u, f, t, o, pp)
            )(*got_c))
            assert np.array_equal(y, x), (order, p)

    # smooth musical content -> try_pack picks the rice wire and the
    # payload is smaller than the best fixed width
    t = np.arange(4 * 1024, dtype=np.float64)
    tone = np.round(
        18000 * np.sin(2 * np.pi * 220 / 44100 * t)
        + 40 * np.sin(2 * np.pi * 6000 / 44100 * t)
    ).astype(np.int32)
    blocks = tone.reshape(4, 1, 1024)
    wire, payload = upack.try_pack(blocks)
    assert wire[0] == "r", wire
    fmt = upack.scan(blocks)
    width_bytes = blocks.size // 1024 * ((1024 * fmt[1] // 32) * 4 + 8)
    assert sum(a.nbytes for a in payload) < width_bytes

    # unary budget overflow inside pack -> None (callers fall back)
    assert native.pack_rice(blocks, 1, 0, 16) is None
    assert upack.pack_rice(blocks, 1, 0, 16) is None


def test_rice_wire_pipeline_byte_identical():
    """End-to-end: tonal stream (rice wire) forced packed == raw bytes."""
    n = 1024 * 5
    t = np.arange(n, dtype=np.float64)
    x = np.zeros(2 * n, np.int32)
    x[0::2] = np.round(15000 * np.sin(2 * np.pi * 180 / 44100 * t)).astype(np.int32)
    x[1::2] = np.round(12000 * np.sin(2 * np.pi * 300 / 44100 * t)).astype(np.int32)
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


def test_hires_wire_pipeline_byte_identical():
    """24-bit PCM rides the packed wire (wide widths / high rice p) and
    stays byte-identical to the raw int32 upload; the wire actually
    engages (try_pack returns non-None for this content)."""
    from flacenc_tpu.ops import upack

    n = 1024 * 5
    t = np.arange(n, dtype=np.float64)
    rng = np.random.default_rng(5)
    x = np.zeros(2 * n, np.int32)
    base = 4_000_000 * np.sin(2 * np.pi * 200 / 44100 * t)
    x[0::2] = np.round(base + rng.integers(-3000, 3000, n)).astype(np.int32)
    x[1::2] = np.round(0.7 * base + rng.integers(-3000, 3000, n)).astype(np.int32)
    blocks = x.reshape(-1, 2).T.reshape(2, -1, 1024).transpose(1, 0, 2)
    out = upack.try_pack(np.ascontiguousarray(blocks), 24)
    assert out is not None, "24-bit tonal content must pick a packed wire"
    assert sum(a.nbytes for a in out[1]) < x.size * 4
    cfg = config.Encoder().into_verified()
    raw = be.encode_with_fixed_block_size(
        cfg, source.MemSource(x, 2, 24, 44100), 1024,
        batch_size=4, upload_pack=False,
    ).to_bytes()
    packed = be.encode_with_fixed_block_size(
        cfg, source.MemSource(x, 2, 24, 44100), 1024,
        batch_size=4, upload_pack=True,
    ).to_bytes()
    assert packed == raw
    assert np.array_equal(decode_stream(parse_stream(packed)), x)


def test_scan_wire_stride_and_wu_margin():
    """The sampled-scan surface (kept off the hot path): strided sums
    approximate the exact ones after rescaling, min/max stay EXACT at any
    stride, and rice_plan's wu_margin pads only the unary budget of the
    format chosen by unpadded ranking."""
    from flacenc_tpu.ops import upack

    rng = np.random.default_rng(9)
    x = np.cumsum(rng.integers(-90, 91, (4, 2, 1024)), -1).astype(np.int32)
    exact, mm1 = native.scan_wire(x, 1)
    sampled, mm4 = native.scan_wire(x, 4)
    assert np.array_equal(np.asarray(mm1), np.asarray(mm4))  # exact minmax
    exact = np.asarray(exact).astype(np.float64)
    sampled = np.asarray(sampled).astype(np.float64) * 4
    big = exact > 4096  # relative error only meaningful off the tail
    assert np.all(np.abs(sampled[big] - exact[big]) <= 0.25 * exact[big])

    plain = upack.rice_plan(np.asarray(native.scan_wire(x, 1)[0]), 1024)
    padded = upack.rice_plan(
        np.asarray(native.scan_wire(x, 1)[0]), 1024, wu_margin=1.25
    )
    assert plain[:2] == padded[:2]      # same (order, p) choice
    assert padded[2] >= plain[2]        # only the budget grows


def test_link_estimators_bucketed_by_payload_shape(monkeypatch):
    """A batch-64 stream and a batch-256 corpus in one process must not
    cross-pollute gap estimates (VERDICT r3 weak #6): estimators are
    keyed by log2(samples/batch), and a new pipeline of a different
    shape converges on its own measurements within ~3 batches."""
    monkeypatch.setattr(be, "_LINK_ESTS", {})
    cfg = config.Encoder()
    p64 = be.BatchPipeline(cfg, 2, 16, 4096, 64, upload_pack="auto")
    p256 = be.BatchPipeline(cfg, 2, 16, 4096, 256, upload_pack="auto")
    p64b = be.BatchPipeline(cfg, 2, 16, 4096, 64, upload_pack="auto")
    try:
        assert p64._est is not p256._est          # different buckets
        assert p64._est is p64b._est              # same shape -> shared

        # simulate: on the small batches the "pack" wire wins decisively
        # (the switch debounce takes _SWITCH_VOTES consecutive decisions)
        for _ in range(3):
            p64._est.update(1_000_000, 1.0, "raw")
            p64._est.update(1_000_000, 0.1, "pack")
        for _ in range(be._SWITCH_VOTES - 1):
            assert p64._est.choose(("raw", "pack"), "raw") == "raw"
        assert p64._est.choose(("raw", "pack"), "raw") == "pack"
        # ...but the big-batch estimator saw none of it: cold start
        # still measures raw first instead of inheriting "pack"
        assert p256._est.choose(("raw", "pack"), "raw") == "raw"
        assert not p256._est.secs

        # the 256-batch pipeline then converges on its own evidence
        # within ~3 batches: raw is faster there (fast link regime)
        p256._est.update(4_000_000, 1.0, "pack")
        p256._est.update(4_000_000, 0.005, "raw")   # > _FAST_LINK_MBPS
        p256._est.update(4_000_000, 0.005, "raw")
        for _ in range(be._SWITCH_VOTES - 1):
            assert p256._est.choose(("raw", "pack"), "pack") == "pack"
        assert p256._est.choose(("raw", "pack"), "pack") == "raw"
        # and the small-batch verdict is untouched
        assert p64._est.choose(("raw", "pack"), "pack") == "pack"
    finally:
        p64.close(); p256.close(); p64b.close()


def test_long_unary_pairs_byte_identical():
    """Forced rice parameter 0 (prc.max_parameter=0) over a signal with
    adjacent large spikes exercises every branch of the paired rice
    emitter: fused pairs, a <=56-bit single next to an over-56 partner,
    and the put_zeros long-unary fallback — bytes must match the Python
    serializer exactly."""
    rng = np.random.default_rng(21)
    n = 4096 * 2
    x = rng.integers(-4, 5, 2 * n).astype(np.int32)
    # adjacent spike pairs (both channels) of varying magnitude: singles
    # beyond 56 bits, pairs straddling the 56-bit fuse threshold
    for pos, mag in ((300, 20), (301, 24), (900, 2000), (901, 1800),
                     (2048, 60), (2049, 3), (5000, 4000), (7777, 12)):
        x[2 * pos] = mag
        x[2 * pos + 1] = -mag
    c = config.Encoder()
    c.subframe_coding.prc.max_parameter = 0
    cfg = c.into_verified()
    d_py = be.encode_with_fixed_block_size(
        cfg, source.MemSource(x, 2, 16, 44100), 4096,
        batch_size=2, packer="python",
    ).to_bytes()
    d_n2 = be.encode_with_fixed_block_size(
        cfg, source.MemSource(x, 2, 16, 44100), 4096,
        batch_size=2, packer="native2",
    ).to_bytes()
    assert d_n2 == d_py
    assert np.array_equal(decode_stream(parse_stream(d_n2)), x)


def test_grouped_fetch_byte_identical(monkeypatch):
    """FLACENC_FETCH_GROUP=G runs G batches through ONE device
    roundtrip (stacked upload + lax.map program + one (G, B, F)
    fetch); bytes must equal the per-batch path across every sub-path:
    the warm-up batch shipped before the grouped program compiles,
    full groups, and the partial tail group flushed by drain_all
    (which dispatches per batch)."""
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    blocks = [
        np.cumsum(rng.integers(-120, 121, (2, 512)), -1).astype(np.int32)
        for _ in range(11)
    ]
    cfg = config.Encoder()

    def run(group, depth=None):
        monkeypatch.setenv("FLACENC_FETCH_GROUP", str(group))
        p = be.BatchPipeline(cfg, 2, 16, 512, 1, upload_pack=False)
        if depth is not None:
            p.depth = depth
        frames = []
        try:
            for i, blk in enumerate(blocks):
                r = p.submit([blk], np.asarray([i]), rate=44100)
                if r:
                    frames.extend(r.frames)
                if i == 0 and group > 1:
                    # deterministic: wait for the background grouped
                    # compile so batches 1.. take the grouped path
                    assert p._group_warm is not None
                    p._group_warm.result(timeout=120)
            for r in p.drain_all():
                frames.extend(r.frames)
        finally:
            p.close()
        return b"".join(f.precomputed_bitstream for f in frames), p

    base, p1 = run(1)
    assert p1.grouped_batches == 0
    grouped, p4 = run(4)
    # batch 0 warms (per-batch); batches 1..10 group as 4 + 4 + 2 (tail)
    assert p4.grouped_batches == 10
    assert grouped == base
    # depth < group: drain_one force-flushes the open group mid-stream
    forced, pf = run(4, depth=2)
    assert pf.grouped_batches == 10
    assert forced == base


def test_auto_group_ewma_deescalates(monkeypatch):
    """Auto-mode grouping must NOT be a one-way ratchet (advisor r4,
    medium): `_roundtrip_group` feeds the per-batch share of the grouped
    fetch wall back into `_fetch_ewma`, so a link that recovers drives
    the EWMA back under `_GROUP_FETCH_MIN_S` and `_group_target` falls
    back to per-batch roundtrips. Seeds a pathologically slow EWMA,
    runs one full grouped trip, and asserts (a) the grouped path updated
    the EWMA (the regression: it used to update only on the per-batch
    path) and (b) a recovered EWMA actually de-escalates."""
    monkeypatch.delenv("FLACENC_FETCH_GROUP", raising=False)
    rng = np.random.default_rng(13)
    blocks = [
        np.cumsum(rng.integers(-120, 121, (2, 512)), -1).astype(np.int32)
        for _ in range(9)
    ]
    cfg = config.Encoder()
    p = be.BatchPipeline(cfg, 2, 16, 512, 1, upload_pack=False)
    assert p.fetch_group == 0  # auto mode
    p._fetch_ewma = 10.0  # pretend the link was measured very slow
    frames = []
    try:
        # batch 0: per-batch warm-up; kicks the grouped background compile
        r = p.submit([blocks[0]], np.asarray([0]), rate=44100)
        if r:
            frames.extend(r.frames)
        assert p._group_warm is not None
        p._group_warm.result(timeout=120)
        # batches 1..4: one FULL group (G=4) -> one grouped roundtrip
        for i in range(1, 5):
            r = p.submit([blocks[i]], np.asarray([i]), rate=44100)
            if r:
                frames.extend(r.frames)
        for r in p.drain_all():
            frames.extend(r.frames)
        assert p.grouped_batches == 4
        # (a) the grouped trip updated the EWMA: 0.7*10 + 0.3*dt with any
        # sane dt (<< 10 s for five 512-sample blocks) lands well under 8
        assert p._fetch_ewma is not None and p._fetch_ewma < 8.0
        # (b) recovered link (EWMA under the engage threshold):
        # subsequent batches must take the per-batch path again. Raise
        # the threshold so the per-batch fetches' own EWMA updates
        # (real wall times on a possibly-loaded CI box) cannot
        # re-escalate mid-phase and flake the count.
        monkeypatch.setattr(be, "_GROUP_FETCH_MIN_S", 1e9)
        p._fetch_ewma = 1.0  # any value <= the raised threshold
        for i in range(5, 9):
            r = p.submit([blocks[i]], np.asarray([i]), rate=44100)
            if r:
                frames.extend(r.frames)
        for r in p.drain_all():
            frames.extend(r.frames)
        assert p.grouped_batches == 4  # unchanged: de-escalated
    finally:
        p.close()
    assert len(frames) == len(blocks)


def _correlated_stereo_blocks(B, T, bps=16, seed=7, spread=40):
    """(B, 2, T) int32 blocks whose channels share a base tone: the side
    channel is small, so the mid/side wire should win the byte race."""
    rng = np.random.default_rng(seed)
    t = np.arange(T) / 44100.0
    amp = (1 << (bps - 1)) * 0.4
    base = (amp * np.sin(
        2 * np.pi * 331 * t[None, :] * (1 + 0.002 * rng.standard_normal((B, 1)))
    )).astype(np.int32)
    l = base + rng.integers(-spread, spread, (B, T)).astype(np.int32)
    r = base + rng.integers(-spread, spread, (B, T)).astype(np.int32)
    lim = 1 << (bps - 1)
    return np.clip(np.stack([l, r], axis=1), -lim, lim - 1).astype(np.int32)


def test_ms_wire_roundtrip_exact():
    """Mid/side wire codec: unpack_ms(pack_ms(x)) == x, including the
    parity edge cases of the (l+r)>>1 floor and full-scale extremes; the
    sticky-floor re-pad is decode-inert."""
    import jax

    from flacenc_tpu.ops import upack

    T = 512
    cases = [_correlated_stereo_blocks(3, T)]
    # full-scale anti-correlated extremes: s = l - r spans 17 bits
    ext = np.zeros((1, 2, T), np.int32)
    ext[0, 0, 0::2] = 32767
    ext[0, 1, 0::2] = -32768
    ext[0, 0, 1::2] = -32768
    ext[0, 1, 1::2] = 32767
    cases.append(ext)
    # 24-bit correlated content (hi-res side channel spans 25 bits)
    cases.append(_correlated_stereo_blocks(2, T, bps=24, spread=5000))
    for x in cases:
        m, s = upack.ms_planes(x)
        # exact invertibility of the transform itself
        l2 = m + ((s + (s & 1)) >> 1)
        assert np.array_equal(np.stack([l2, l2 - s], 1), x)
        sums_m = upack.scan_rice_np(m)
        sums_s = upack.scan_rice_np(s)
        plans = upack.plan_ms(sums_m, sums_s, T)
        assert plans is not None
        (om, pm, wum), (os2, ps, wus), _ = plans
        payload = upack.pack_ms(x, om, pm, wum, os2, ps, wus)
        assert payload is not None
        fn = jax.jit(lambda lo, u, f: upack.unpack_ms(
            lo, u, f, T, om, pm, wum, os2, ps, wus))
        y = np.asarray(fn(*payload))
        assert np.array_equal(y, x)
        # sticky-floor pad: zero words past each plane's terminators
        fm, fs = wum + 16, wus + 48
        padded = upack.pad_ms_unary(payload, wum, wus, fm, fs)
        fn2 = jax.jit(lambda lo, u, f: upack.unpack_ms(
            lo, u, f, T, om, pm, fm, os2, ps, fs))
        assert np.array_equal(np.asarray(fn2(*padded)), x)


def test_try_pack_prefers_ms_on_correlated_stereo():
    """try_pack picks the ("m", ...) wire exactly when the per-plane byte
    total beats the joint formats, and never offers it off-stereo."""
    from flacenc_tpu.ops import upack

    T = 1024
    corr = _correlated_stereo_blocks(4, T)
    out = upack.try_pack(corr, 16)
    assert out is not None and out[0][0] == "m", out and out[0]
    ms_bytes = sum(a.nbytes for a in out[1])
    joint = upack.rice_plan(upack.scan_rice_np(corr), T)
    assert ms_bytes < joint[3]  # the win try_pack acted on

    # mono chunk: ms ineligible, joint formats still work
    mono = corr[:, :1, :]
    out_mono = upack.try_pack(mono, 16)
    assert out_mono is None or out_mono[0][0] in ("r", "w")


def test_ms_wire_pipeline_byte_identical():
    """Forced packed upload on correlated stereo engages the ms wire in
    the real pipeline; bytes match the raw-wire encode exactly, including
    across a loud->quiet batch sequence that exercises the per-plane
    sticky unary floors."""
    rng = np.random.default_rng(11)
    quiet = _correlated_stereo_blocks(4, 512, seed=1, spread=12)
    loud = _correlated_stereo_blocks(4, 512, seed=2, spread=300)
    seq = [quiet[i] for i in range(4)] + [loud[i] for i in range(4)] \
        + [quiet[(i + 1) % 4] for i in range(4)]

    def run(upload_pack):
        p = be.BatchPipeline(config.Encoder(), 2, 16, 512, 2,
                             upload_pack=upload_pack)
        frames = []
        for i, blk in enumerate(seq):
            r = p.submit([blk], np.asarray([i]), rate=44100)
            if r:
                frames.extend(r.frames)
        for r in p.drain_all():
            frames.extend(r.frames)
        kinds = {(k[0] if k else None) for k in p.wire_counts}
        p.close()
        return b"".join(f.precomputed_bitstream for f in frames), kinds

    data_ms, kinds_ms = run(True)
    data_raw, kinds_raw = run(False)
    assert "m" in kinds_ms, kinds_ms
    assert kinds_raw == {None}
    assert data_ms == data_raw


def test_ms_plan_cache_reuse_and_overflow_rescan(monkeypatch):
    """_try_pack_cached reuses an ms plan without re-scanning on steady
    content and falls back to the full rescan when a louder batch
    overflows either plane's unary budget."""
    from flacenc_tpu.ops import upack

    p = be.BatchPipeline(config.Encoder(), 2, 16, 512, 4,
                         upload_pack="auto")
    quiet = _correlated_stereo_blocks(4, 512, seed=3, spread=10)
    loud = _correlated_stereo_blocks(4, 512, seed=4, spread=4000)

    scans = []
    real_try_pack = upack.try_pack
    monkeypatch.setattr(
        upack, "try_pack",
        lambda *a, **k: scans.append(1) or real_try_pack(*a, **k),
    )
    wire1, payload1 = p._try_pack_cached(quiet)
    assert wire1[0] == "m" and len(scans) == 1
    wire2, payload2 = p._try_pack_cached(quiet)
    assert wire2 == wire1 and len(scans) == 1  # cache hit, no rescan
    p._try_pack_cached(loud)   # overflows the quiet plan -> rescan
    assert len(scans) == 2


def test_rice_wire_orders_3_4():
    """Delta orders 3-4 (the hi-res upload wire, VERDICT r4 #5): C++
    scan/pack == numpy oracle, the warm-up firsts layout decodes
    integer-exactly on device (iterative cumsum reconstruction), and the
    plan picks order 3 on oversampled smooth content where it cuts the
    wire by ~25%."""
    import jax

    from flacenc_tpu.ops import upack

    T = 512
    rng = np.random.default_rng(33)
    t = np.arange(T * 6) / 96000.0
    # oversampled tone bank + tiny noise: d3 is far below d2
    sig = np.round(
        4e6 * np.sin(2 * np.pi * 196 * t) + 2e6 * np.sin(2 * np.pi * 392.7 * t)
    ).astype(np.int64) + rng.integers(-12, 13, T * 6)
    x = np.clip(sig, -(1 << 23), (1 << 23) - 1).astype(np.int32).reshape(6, 1, T)

    sums = upack.scan_rice_np(x)
    assert sums.shape[-2] == 4
    if native.available():
        nat, _ = native.scan_wire(x)
        assert np.array_equal(np.asarray(nat), sums)

    for order in (3, 4):
        plan = None
        best = None
        for p in range(26):
            if (T * p) % 32:
                continue
            rb = int(sums[..., order - 1, p].max()) + T
            wu = -(-(-(-rb // 32)) // 16) * 16
            nb = (T * p // 32) * 4 + wu * 4
            if best is None or nb < best[2]:
                best = (p, wu, nb)
        p, wu, _ = best
        got_np = upack.pack_rice(x, order, p, wu)
        assert got_np is not None
        assert got_np[2].shape[-1] == 4  # warm-up firsts lanes
        if native.available() and native.rice4_supported():
            got_c = native.pack_rice(x, order, p, wu)
            for a, b in zip(got_c, got_np):
                assert np.array_equal(a, b), order
        y = np.asarray(jax.jit(
            lambda l, u, f, o=order, pp=p: upack.unpack_rice(l, u, f, T, o, pp)
        )(*got_np))
        assert np.array_equal(y, x), order

    # the full plan ranks order 3 ahead of 1/2 on this content
    chosen = upack.rice_plan(sums, T)
    assert chosen is not None and chosen[0] == 3, chosen
    wire, payload = upack.try_pack(x, 24)
    assert wire[0] == "r" and wire[1] == 3, wire


def test_ms_wire_mixed_plane_orders():
    """Mid/side wire with DIFFERENT per-plane orders and firsts widths
    (m plane order 3 -> 4 warm-up lanes, s plane order 1 -> 2 lanes):
    the concatenated payload decodes exactly through unpack_ms."""
    import jax

    from flacenc_tpu.ops import upack

    T = 512
    rng = np.random.default_rng(44)
    t = np.arange(T * 4) / 96000.0
    base = np.round(3e6 * np.sin(2 * np.pi * 220 * t)).astype(np.int64)
    l = np.clip(base + rng.integers(-9, 10, T * 4), -(1 << 23),
                (1 << 23) - 1).astype(np.int32)
    r = np.clip(base + rng.integers(-9, 10, T * 4), -(1 << 23),
                (1 << 23) - 1).astype(np.int32)
    x = np.stack([l.reshape(4, T), r.reshape(4, T)], axis=1)

    m, s = upack.ms_planes(x)
    pm_plan = upack.rice_plan(upack.scan_rice_np(m), T)
    ps_plan = upack.rice_plan(upack.scan_rice_np(s), T)
    om, pmv, wum, _ = pm_plan
    os2, psv, wus, _ = ps_plan
    assert om >= 3, pm_plan      # tonal mid plane picks a high order
    assert os2 <= 2, ps_plan     # noisy side plane stays low
    payload = upack.pack_ms(x, om, pmv, wum, os2, psv, wus)
    assert payload is not None
    assert payload[2].shape[-1] == (
        upack.firsts_width(om) + upack.firsts_width(os2)
    )
    y = np.asarray(jax.jit(lambda lo, u, f: upack.unpack_ms(
        lo, u, f, T, om, pmv, wum, os2, psv, wus))(*payload))
    assert np.array_equal(y, x)
