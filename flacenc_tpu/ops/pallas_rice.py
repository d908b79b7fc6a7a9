"""Pallas TPU kernel: fused zigzag + finest-partition Rice cost tables.

The XLA formulation of ``ops/rice._finest_tables`` performs 31 separate
shift+reduce passes over the `(B, K, T)` zigzag array (one per candidate
Rice parameter), re-reading the residuals from HBM each time. This kernel
reads each residual tile from HBM **once**, computes the zigzag mapping and
all 32 shifted sums in VMEM, and writes the `(nparts, 32)` cost table
directly — the TPU analogue of the reference keeping its cost table in two
u32x16 registers while streaming the errors (rice.rs:30-103).

Pallas TPU has no 64-bit types, so sums use the reference's own u32
arithmetic: wrapping accumulation clamped to (1<<27)-1 after every
16-sample chunk (rice.rs:75-98) — on pathological inputs this is actually
*more* faithful to the reference than the XLA path's i64+clamp (chunk
boundaries align to partition starts rather than to the reference's
post-warmup starts; both differences are unreachable for valid audio, see
DESIGN.md).

Grid: one program per (batch, channel). Tables are bit-identical to the
XLA path for all non-saturating inputs (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

from . import jax_env  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rice import MAX_P_TO_BITS

_N_P = 32
_CHUNK = 16  # PRC_BIT_TABLE_FROM_ERRORS_UNROLL_N (rice.rs:54)


def _kernel(err_ref, warmup_ref, out_ref, *, nparts: int, part_len: int):
    """blocks: err (1, nparts, part_len) int32; warmup (1,1,1) SMEM;
    out (1, nparts, 32) int32 (values <= (1<<27)-1)."""
    warm = warmup_ref[0, 0, 0]
    err = err_ref[0]
    t_idx = (
        jax.lax.broadcasted_iota(jnp.int32, (nparts, part_len), 0) * part_len
        + jax.lax.broadcasted_iota(jnp.int32, (nparts, part_len), 1)
    )
    # Mosaic supports neither 64-bit types nor unsigned reductions, so the
    # u32 zigzag values live in int32 registers (same bits; int adds wrap
    # identically) with logical shifts and sign-aware unsigned clamping.
    one = jnp.int32(1)
    neg = err < jnp.int32(0)
    mag = jnp.where(neg, -(err + one), err)  # |e|-1 for e<0; fits i32
    z = (mag << one) + neg.astype(jnp.int32)  # zigzag bit pattern
    z = jnp.where(t_idx < warm, jnp.int32(0), z)

    nchunks = (part_len + _CHUNK - 1) // _CHUNK
    maxv = jnp.int32(MAX_P_TO_BITS)
    for p in range(_N_P):
        shifted = jax.lax.shift_right_logical(z, jnp.int32(p))
        acc = jnp.zeros((nparts,), jnp.int32)
        for c in range(nchunks):  # saturating chain (rice.rs:75-98)
            lo = c * _CHUNK
            hi = min(part_len, lo + _CHUNK)
            a = acc + shifted[:, lo:hi].sum(axis=1, dtype=jnp.int32)
            # unsigned min(a, MAX): u32(a) > MAX iff a < 0 or a > MAX
            acc = jnp.where((a >= jnp.int32(0)) & (a <= maxv), a, maxv)
        out_ref[0, :, p] = acc


@functools.partial(jax.jit, static_argnames=("block_size", "finest_order"))
def rice_cost_tables_pallas(
    errors: jnp.ndarray,  # (B, K, T) int32
    warmup: jnp.ndarray,  # (B, K) int32
    block_size: int,
    finest_order: int,
) -> jnp.ndarray:
    """(B, K, nparts, 32) int32 clamped shifted sums (no length terms)."""
    B, K, T = errors.shape
    nparts = 1 << finest_order
    part_len = block_size // nparts
    flat_err = errors.reshape(B * K, nparts, part_len)
    flat_warm = warmup.reshape(B * K, 1, 1).astype(jnp.int32)

    backend = jax.default_backend()
    out = pl.pallas_call(
        functools.partial(_kernel, nparts=nparts, part_len=part_len),
        grid=(B * K,),
        interpret=backend not in ("tpu", "axon"),  # CPU CI runs interpreted
        in_specs=[
            pl.BlockSpec(
                (1, nparts, part_len), lambda i: (i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, 1), lambda i: (i, i * 0, i * 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, nparts, _N_P), lambda i: (i, i * 0, i * 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * K, nparts, _N_P), jnp.int32),
    )(flat_err, flat_warm)
    return out.reshape(B, K, nparts, _N_P)
