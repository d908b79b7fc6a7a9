"""Benchmark: x-realtime FLAC encode per chip (16-bit/44.1 kHz stereo,
block=4096, default config — the reference's headline configuration).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "x_realtime", "vs_baseline": N}

Baseline: flacenc-rs default (8 threads, nightly SIMD) = 1309.5x realtime
on a GCE c2-standard-8 (BASELINE.md).

Methodology notes:
- `value` is honest end-to-end wall time: host PCM in RAM -> FLAC bytes,
  including host->device upload, the jitted search program, decisions
  download, and C++ residual-recompute + bit packing.
- `device_step_x_realtime` times the jitted device program by chaining N
  dispatches and fetching only the last tiny output (TPU executes
  in-order, so the last result bounds all N); the difference between two
  chain lengths removes the per-fetch link latency, which on tunneled
  devices is ~30-70 ms and would otherwise dominate (round-1's lower
  bound measured exactly that artifact).
- `ref_bits_per_sample_same_corpus` encodes the identical signal through
  this repo's strict mode (byte-level reference-stable float semantics;
  see DESIGN.md), the same-inputs methodology of the reference's
  pytools/reporter.py:27-73. BASELINE.md's 8.4424 bits/sample is
  cross-corpus context only (wikimedia WAVs).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_X_REALTIME = 1309.5
REF_BITS_PER_SAMPLE_WIKIMEDIA = 0.5276489 * 16  # cross-corpus (BASELINE.md)


def make_audio(seconds: float, rate: int = 44100) -> np.ndarray:
    """Realistic-ish stereo program material: multi-partial tones + noise
    floor + slow amplitude modulation (keeps all predictor paths busy)."""
    n = int(seconds * rate)
    t = np.arange(n, dtype=np.float64) / rate
    rng = np.random.default_rng(1234)
    chans = []
    for ch in range(2):
        sig = np.zeros(n)
        for f0, amp in ((220.0 + 3 * ch, 0.30), (440.0, 0.18), (881.5, 0.09),
                        (1763.0, 0.05), (3526.0, 0.02)):
            sig += amp * np.sin(2 * np.pi * f0 * t + ch + rng.uniform(0, 6.28))
        sig *= 0.6 + 0.4 * np.sin(2 * np.pi * 0.3 * t + ch)
        sig += 0.003 * rng.standard_normal(n)  # ~ -50 dB noise floor
        chans.append(np.clip(np.round(sig * 20000.0), -32768, 32767).astype(np.int32))
    interleaved = np.empty(2 * n, dtype=np.int32)
    interleaved[0::2] = chans[0]
    interleaved[1::2] = chans[1]
    return interleaved


def _watchdog(minutes: float = 40.0) -> None:
    """Hard exit if the bench wedges (a dead TPU tunnel blocks inside the
    runtime where no Python exception can fire) — the driver gets a JSON
    error line instead of an infinite hang."""
    import threading

    def fire():
        print(json.dumps({
            "metric": "x-realtime encode per chip (16/44.1 stereo, block=4096)",
            "value": 0.0,
            "unit": "x_realtime",
            "vs_baseline": 0.0,
            "extra": {"error": f"bench watchdog fired after {minutes} min "
                               "(device backend unresponsive)"},
        }), flush=True)
        os._exit(3)

    t = threading.Timer(minutes * 60.0, fire)
    t.daemon = True
    t.start()


def _supervise() -> int:
    """Run the measurement in a worker SUBPROCESS and retry on hang/crash.

    The tunneled device backend intermittently dies mid-process
    (FailedPrecondition) or stalls for minutes; a dead backend never
    recovers within a process, but a FRESH process a minute later
    usually finds a healthy tunnel. The supervisor turns those windows
    into a retry instead of a 0.0 result line. The first worker attempt
    that prints a valid result wins; after BENCH_ATTEMPTS (default 3)
    failures the last error line (or a synthesized one) is printed."""
    import subprocess
    import signal
    import time as _time

    attempts = int(os.environ.get("BENCH_ATTEMPTS", "3"))
    timeout_s = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT_S", "1500"))
    # total wall budget: the previous single-process watchdog emitted its
    # error line at 40 min and the driver tolerated that; never exceed it
    budget_s = float(os.environ.get("BENCH_TOTAL_BUDGET_S", "2280"))
    t_start = _time.monotonic()
    last_line = None
    for i in range(attempts):
        if i:
            _time.sleep(float(os.environ.get("BENCH_RETRY_GAP_S", "45")))
        remaining = budget_s - (_time.monotonic() - t_start)
        if remaining < 120:
            print(f"# total budget {budget_s:.0f}s exhausted before "
                  f"attempt {i + 1}", file=sys.stderr, flush=True)
            break
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            stdout=subprocess.PIPE, text=True, start_new_session=True,
        )
        try:
            out, _ = proc.communicate(timeout=min(timeout_s, remaining))
        except subprocess.TimeoutExpired:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except OSError:
                pass
            proc.wait()
            print(f"# attempt {i + 1}/{attempts}: worker hung after "
                  f"{timeout_s:.0f}s (device backend stalled), retrying",
                  file=sys.stderr, flush=True)
            continue
        for line in (out or "").splitlines():
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                last_line = line
        if last_line is not None:
            try:
                ok = json.loads(last_line).get("value", 0) > 0
            except ValueError:
                ok = False
            if ok:
                print(last_line, flush=True)
                return 0
        print(f"# attempt {i + 1}/{attempts}: worker exited rc={proc.returncode} "
              "without a result, retrying", file=sys.stderr, flush=True)
    print(last_line or json.dumps({
        "metric": "x-realtime encode per chip (16/44.1 stereo, block=4096)",
        "value": 0.0,
        "unit": "x_realtime",
        "vs_baseline": 0.0,
        "extra": {"error": f"all {attempts} bench attempts failed "
                           "(device backend unavailable)"},
    }), flush=True)
    return 3


def main() -> None:
    from flacenc_tpu import config
    from flacenc_tpu.models import batch_encoder as be
    from flacenc_tpu.source import MemSource

    _watchdog(float(os.environ.get("BENCH_WATCHDOG_MINUTES", "40")))

    rate, bps, block = 44100, 16, 4096
    # warmup covers compiles AND >= 2 steady-state batches so the wire
    # racer's link estimates are warm before the first timed trial
    warm_seconds = float(os.environ.get("BENCH_WARM_SECONDS", "60"))
    # 900 s = ~38 batches at batch 256: steady state dominates the
    # pipeline fill/drain (300 s was only ~13 batches - half fill)
    seconds = float(os.environ.get("BENCH_SECONDS", "900"))
    # 256 measured best on v5e: ~12 us/frame device step (vs ~15 at 128,
    # ~17 at 512 where the program spills), smoother pipeline, half the
    # tail-padding waste of 512
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    packer = os.environ.get("BENCH_PACKER", "auto")
    # best-of-3: a trial costs ~1-2 s while the tunneled link swings
    # minute to minute; the extra trial is the cheapest variance cut
    trials = int(os.environ.get("BENCH_TRIALS", "3"))

    cfg = config.Encoder().into_verified()

    # warmup: compile the device program + native packer + first-exec warmup
    warm = make_audio(warm_seconds, rate)
    be.encode_with_fixed_block_size(
        cfg, MemSource(warm, 2, bps, rate), block, batch_size=batch, packer=packer
    )

    audio = make_audio(seconds, rate)
    best = None
    for i in range(trials):
        if i:
            # the tunneled link swings minute to minute; spacing the
            # trials samples distinct bandwidth windows instead of
            # replaying one bad one three times
            time.sleep(float(os.environ.get("BENCH_TRIAL_GAP_S", "20")))
        src = MemSource(audio, 2, bps, rate)
        t0 = time.perf_counter()
        stream = be.encode_with_fixed_block_size(
            cfg, src, block, batch_size=batch, packer=packer
        )
        data = stream.to_bytes()
        elapsed = time.perf_counter() - t0
        if best is None or elapsed < best:
            best = elapsed

    n_samples = len(audio) // 2
    x_realtime = (n_samples / rate) / best
    bits_per_sample = len(data) * 8 / len(audio)

    # same-corpus reference proxy: strict mode reproduces the reference
    # STABLE build's float semantics byte-for-byte for this config
    src = MemSource(audio, 2, bps, rate)
    strict_stream = be.encode_with_fixed_block_size(
        cfg, src, block, batch_size=batch, packer=packer, strict_lpc=True
    )
    strict_bytes = strict_stream.to_bytes()
    ref_bits_same = len(strict_bytes) * 8 / len(audio)

    # device-program throughput: chained dispatches, one fetch of the last
    # tiny field; two chain lengths remove the fixed per-fetch latency
    import jax
    import jax.numpy as jnp

    fn = be._cached_encoder_fn(
        cfg.inner.to_toml(), 2, bps, block, decisions_only=True
    )
    total_blocks = (len(audio) // 2) // block
    dev_batch = min(batch, 256, total_blocks)  # device-step shape (on device)
    blocks = np.stack(
        [audio.reshape(-1, 2).T[:, i * block: (i + 1) * block]
         for i in range(dev_batch)]
    ).astype(np.int16)
    dblocks = jnp.asarray(blocks)
    # decisions-only fn returns ONE coalesced (B, F) int32 buffer
    jax.device_get(fn(dblocks))  # compile + warm
    chain = {}
    for reps in (10, 50):
        t0 = time.perf_counter()
        outs = [fn(dblocks) for _ in range(reps)]
        jax.device_get(outs[-1])
        chain[reps] = time.perf_counter() - t0
    per_step = max((chain[50] - chain[10]) / 40, 1e-9)
    device_x = (dev_batch * block / rate) / per_step

    print(json.dumps({
        "metric": "x-realtime encode per chip (16/44.1 stereo, block=4096)",
        "value": round(x_realtime, 1),
        "unit": "x_realtime",
        "vs_baseline": round(x_realtime / BASELINE_X_REALTIME, 4),
        "extra": {
            "bits_per_sample": round(bits_per_sample, 4),
            "ref_bits_per_sample_same_corpus": round(ref_bits_same, 4),
            "ref_bits_per_sample_wikimedia_crosscorpus": round(
                REF_BITS_PER_SAMPLE_WIKIMEDIA, 4
            ),
            "seconds_encoded": seconds,
            "encoded_bytes": len(data),
            "batch": batch,
            "packer": packer,
            "device_step_x_realtime": round(device_x, 1),
            "device_step_ms_per_batch": round(per_step * 1e3, 3),
            "device_step_batch": dev_batch,
            "note": (
                "value = end-to-end incl. host<->device transport; on "
                "tunneled devices the link (fixed ~70ms/transfer + "
                "~30-50 MB/s), not the chip, is the ceiling. "
                "device_step_x_realtime is the jitted search program alone "
                "(chained dispatch, in-order execution, latency removed)."
            ),
        },
    }))


if __name__ == "__main__":
    if "--worker" in sys.argv or os.environ.get("BENCH_NO_SUPERVISOR"):
        main()
    else:
        sys.exit(_supervise())
