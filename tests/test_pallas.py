"""Pallas fused Rice cost-table kernel: parity with the XLA path and
reference-exact u32 saturation semantics.

Skipped when the backend can't compile Mosaic kernels (e.g. plain CPU
without interpret mode — then we run in interpret mode instead)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flacenc_tpu.ops import rice as oR


def _run_kernel(errors, warmup, T, finest):
    from flacenc_tpu.ops import pallas_rice

    try:
        return jax.device_get(
            pallas_rice.rice_cost_tables_pallas(
                jnp.asarray(errors), jnp.asarray(warmup), T, finest
            )
        )
    except Exception as e:  # Mosaic unavailable on this backend
        pytest.skip(f"pallas unavailable: {type(e).__name__}")


def test_pallas_tables_match_xla():
    rng = np.random.default_rng(0)
    B, K, T = 4, 4, 4096
    errors = rng.integers(-3000, 3000, (B, K, T)).astype(np.int32)
    warmup = rng.integers(0, 12, (B, K)).astype(np.int32)
    finest = oR.finest_partition_order(T, 64)
    got = _run_kernel(errors, warmup, T, finest)

    z = jax.device_get(oR.encode_signbit(jnp.asarray(errors)))
    nparts = 1 << finest
    plen = T // nparts
    t_idx = np.arange(T)
    zm = np.where(
        t_idx[None, None, :] < warmup[..., None], 0, z
    ).reshape(B, K, nparts, plen)
    exp = np.zeros((B, K, nparts, 32), np.int64)
    for p in range(32):
        exp[..., p] = np.minimum(
            (zm.astype(np.int64) >> p).sum(-1), oR.MAX_P_TO_BITS
        )
    assert np.array_equal(got.astype(np.int64), exp)


def test_pallas_saturation_without_wrap():
    # 8 samples of |e| = 2^27 in partition 0: first 16-chunk sum = 2^31
    # (negative as i32) -> clamps to MAX and stays there (rice.rs:92-98)
    T = 4096
    finest = oR.finest_partition_order(T, 64)
    errors = np.zeros((1, 1, T), np.int32)
    errors[0, 0, :8] = -(1 << 27)
    got = _run_kernel(errors, np.zeros((1, 1), np.int32), T, finest)
    assert int(got[0, 0, 0, 0]) == oR.MAX_P_TO_BITS
    # untouched partitions are all zero
    assert int(got[0, 0, 1, 0]) == 0
