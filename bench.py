"""Benchmark: x-realtime FLAC encode per chip (16-bit/44.1 kHz stereo,
block=4096, default config — the reference's headline configuration).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "x_realtime", "vs_baseline": N}

Baseline: flacenc-rs default (8 threads, nightly SIMD) = 1309.5x realtime
on a GCE c2-standard-8 (BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_X_REALTIME = 1309.5
REF_BITS_PER_SAMPLE = 0.5276489 * 16  # flacenc default compression (BASELINE.md)


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


def main() -> None:
    from flacenc_tpu import config
    from flacenc_tpu.models import batch_encoder as be
    from flacenc_tpu.source import MemSource

    rate, bps, block = 44100, 16, 4096
    warm_seconds = float(os.environ.get("BENCH_WARM_SECONDS", "8"))
    seconds = float(os.environ.get("BENCH_SECONDS", "300"))
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    packer = os.environ.get("BENCH_PACKER", "auto")
    trials = int(os.environ.get("BENCH_TRIALS", "2"))

    cfg = config.Encoder().into_verified()

    # warmup: compile the device program + native packer + first-exec warmup
    warm = make_audio(warm_seconds, rate)
    be.encode_with_fixed_block_size(
        cfg, MemSource(warm, 2, bps, rate), block, batch_size=batch, packer=packer
    )

    audio = make_audio(seconds, rate)
    best = None
    for _ in range(trials):
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

    # device-only throughput lower bound: one jitted step + a minimal fetch
    # (shows the compute headroom when the host link is the bottleneck)
    import jax
    import jax.numpy as jnp

    fn = be._cached_encoder_fn(cfg.inner.to_toml(), 2, bps, block)
    blocks = np.stack(
        [audio.reshape(-1, 2).T[:, i * block : (i + 1) * block] for i in range(batch)]
    ).astype(np.int16)
    dblocks = jnp.asarray(blocks)
    jax.device_get(fn(dblocks).sf_bits)
    t0 = time.perf_counter()
    reps = 20  # chain dispatches; one fetch amortizes transport round trips
    outs = [fn(dblocks) for _ in range(reps)]
    for r in outs:
        jax.device_get(r.sf_bits)
    dev_elapsed = (time.perf_counter() - t0) / reps
    device_x = (batch * block / rate) / dev_elapsed

    print(json.dumps({
        "metric": "x-realtime encode per chip (16/44.1 stereo, block=4096)",
        "value": round(x_realtime, 1),
        "unit": "x_realtime",
        "vs_baseline": round(x_realtime / BASELINE_X_REALTIME, 4),
        "extra": {
            "bits_per_sample": round(bits_per_sample, 4),
            "ref_bits_per_sample_flacenc_default": round(REF_BITS_PER_SAMPLE, 4),
            "seconds_encoded": seconds,
            "encoded_bytes": len(data),
            "batch": batch,
            "packer": packer,
            "device_step_x_realtime_lower_bound": round(device_x, 1),
            "note": (
                "end-to-end rate includes host<->device transport; on "
                "tunneled devices the link, not the chip, is the ceiling"
            ),
        },
    }))


if __name__ == "__main__":
    main()
