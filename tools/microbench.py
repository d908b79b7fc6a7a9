"""Per-kernel microbenchmarks (the reference's ``#[bench]`` suite analogue,
e.g. report/bench_results.txt entries).

Times each device kernel standalone on the current backend (per-frame cost
at batch 64, block 4096) plus the host packer and MD5. Run:
    python tools/microbench.py [--batch 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--block", type=int, default=4096)
    args = ap.parse_args()
    B, T = args.batch, args.block

    import jax
    import jax.numpy as jnp

    from flacenc_tpu import config
    from flacenc_tpu.config import Window
    from flacenc_tpu.ops import fixed as oF, lpc as oL, rice as oR
    from flacenc_tpu.ops.windows import get_window

    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.integers(-(1 << 14), 1 << 14, (B, 4, T), np.int32))
    win = get_window(Window(), T)
    warm = jnp.full((B, 4), 10, jnp.int32)

    def bench(name, fn, *fargs):
        f = jax.jit(lambda *a: jax.tree.map(lambda x: x.sum(), fn(*a)))
        jax.device_get(f(*fargs))  # compile + warm
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            r = jax.device_get(f(*fargs))
        dt = (time.perf_counter() - t0) / reps
        per_frame_us = dt / B * 1e6
        print(f"{name:34s} {dt*1e3:8.2f} ms/batch  {per_frame_us:8.2f} us/frame")

    print(f"# device kernels (batch={B}, 4 candidate channels, T={T})")
    bench("fixed_lpc_errors (5 orders)", oF.fixed_lpc_errors, sig)
    bench("estimate_entropy x5", lambda s: [
        oF.estimate_entropy(s, warm, 16, T) for _ in range(5)
    ], sig)
    bench("windowing f32", lambda s: oL.apply_window(s, win), sig)
    bench("autocorr f64 (order 10)",
          lambda s: oL.auto_correlation(oL.apply_window(s, win), 10), sig)
    bench("levinson f64 (order 10)",
          lambda s: oL.levinson(oL.auto_correlation(oL.apply_window(s, win), 10), 10), sig)
    qc = jnp.asarray(rng.integers(-16000, 16000, (B, 4, 24), np.int32))
    order = jnp.full((B, 4), 10, jnp.int32)
    shift = jnp.full((B, 4), 12, jnp.int32)
    bench("compute_error i64 FIR", oL.compute_error, qc, order, shift, sig)
    bench("rice search (full)", lambda e: oR.find_partitioned_rice_parameters(
        e, warm, T, 30), sig)
    bench("direct-MSE LPC (order 10)",
          lambda s: oL.lpc_direct_mse(oL.apply_window(s, win), 10), sig)

    # host-side stages
    from flacenc_tpu import native
    from flacenc_tpu.models import batch_encoder as be

    cfg = config.Encoder()
    fn = be.build_encoder_fn(cfg, 2, 16, T)
    blocks = rng.integers(-(1 << 14), 1 << 14, (B, 2, T), np.int32)
    enc = fn(jnp.asarray(blocks.astype(np.int16)))
    jax.device_get(enc.sf_bits)
    t0 = time.perf_counter()
    frames = be.pack_frames_native(enc, blocks, np.arange(B), cfg, 2, 16, 44100, T) \
        if native.available() else None
    dt = time.perf_counter() - t0
    if frames:
        print(f"\n# host packer: {dt*1e3:.2f} ms/batch "
              f"({B*T/44100/dt:.0f}x realtime standalone)")

    import hashlib

    pcm = blocks.astype("<i2").tobytes()
    t0 = time.perf_counter()
    hashlib.md5(pcm).digest()
    dt = time.perf_counter() - t0
    print(f"# md5: {len(pcm)/dt/1e6:.0f} MB/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
