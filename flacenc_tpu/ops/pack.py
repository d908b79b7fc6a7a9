"""Device-side Rice bitstream packing.

The reference writes residual bits one sample at a time on the CPU
(``src/component/bitrepr.rs:530-597``). Here the whole residual payload —
the 6-bit method+order header, interleaved 4/5-bit partition parameters,
and every sample's Rice code — is bit-packed *on the TPU* as a data-parallel
computation:

1. every payload entry gets (total_len, tail_len, tail_value): a Rice code
   is `q` implicit zero bits followed by a (p+1)-bit tail `(1<<p)|r`;
2. an inclusive cumsum of lengths gives each entry's end-bit position;
3. each 32-bit output word finds the entries whose tails intersect it via
   binary search over the (sorted) end positions and ORs their shifted tail
   bits — a bounded gather loop, fully vectorized over (B, C, words).

Zero runs need no writes (words start zeroed), so each output word touches
at most 33 entries regardless of quotient magnitude. Output words are
big-bit-endian (bit 31 = first bit), so the host packer can blit them into
the frame with a shifting copy. This removes the per-sample residual
stream from the device->host transfer entirely: only finished payload bits
(+ tiny metadata) leave the chip.
"""

from __future__ import annotations

from typing import Tuple

from . import jax_env  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

# max payload entries whose tails can intersect one 32-bit window:
# tails are disjoint and >= 1 bit, so <= 32 plus edge partials.
_K_INTERSECT = 34


def words_budget(block_size: int, bps: int) -> int:
    """Static per-channel word budget; selection guarantees chosen subframe
    payloads stay below verbatim size (coding.rs:403-417)."""
    return (block_size * (bps + 2) + 64 * 5 + 6) // 32 + 16


def pack_residual_payload(
    errors: jnp.ndarray,      # (B, C, T) int32
    rice_order: jnp.ndarray,  # (B, C) int32
    rice_params: jnp.ndarray, # (B, C, P) int32
    warmup: jnp.ndarray,      # (B, C) int32
    use_rice2: jnp.ndarray,   # (B, C) bool
    active: jnp.ndarray,      # (B, C) bool — False => zero-length payload
    block_size: int,
    bps: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (words (B, C, W) uint32, total_bits (B, C) int64)."""
    B, C, T = errors.shape
    P = rice_params.shape[-1]
    W = words_budget(block_size, bps)
    S = T + P + 1  # header + params + samples

    nparts = (1 << rice_order).astype(jnp.int32)  # (B, C)
    part_len = (block_size // nparts).astype(jnp.int32)
    param_bits = jnp.where(use_rice2, 5, 4).astype(jnp.int32)

    # ---- per-sample rice codes ----
    t_idx = jnp.arange(T, dtype=jnp.int32)
    pidx = (t_idx[None, None, :] * nparts[..., None]) // block_size
    p_t = jnp.take_along_axis(rice_params, pidx, axis=-1).astype(jnp.uint32)
    v64 = jnp.abs(errors.astype(jnp.int64))
    z = ((v64 << 1) - (errors < 0)).astype(jnp.uint32)
    in_warm = t_idx[None, None, :] < warmup[..., None]
    q = jnp.where(in_warm, 0, (z >> p_t)).astype(jnp.int64)
    tail_val_s = jnp.where(
        in_warm, 0, (z & ((jnp.uint32(1) << p_t) - 1)) | (jnp.uint32(1) << p_t)
    ).astype(jnp.uint32)
    tail_len_s = jnp.where(in_warm, 0, p_t.astype(jnp.int32) + 1)
    total_len_s = jnp.where(in_warm, 0, q + p_t.astype(jnp.int64) + 1)

    # ---- entry table: slot 0 = 6-bit header, then [param][samples]* ----
    k = jnp.arange(S, dtype=jnp.int32)
    kp = k - 1
    stride = part_len[..., None] + 1  # (B, C, 1)
    j = kp[None, None, :] // stride
    r = kp[None, None, :] % stride
    is_header = (k == 0)[None, None, :]
    in_range = (kp[None, None, :] >= 0) & (j < nparts[..., None])
    is_param = in_range & (r == 0)
    samp_t = j * part_len[..., None] + (r - 1)
    is_samp = in_range & (r > 0) & (samp_t < T)
    samp_t = jnp.clip(samp_t, 0, T - 1)

    param_at_j = jnp.take_along_axis(
        rice_params, jnp.clip(j, 0, P - 1), axis=-1
    ).astype(jnp.uint32)
    header_val = (
        (jnp.where(use_rice2, 1, 0) << 4) | rice_order
    ).astype(jnp.uint32)[..., None]

    gat = lambda a: jnp.take_along_axis(a, samp_t, axis=-1)
    tail_val = jnp.where(
        is_header, header_val,
        jnp.where(is_param, param_at_j, jnp.where(is_samp, gat(tail_val_s), 0)),
    ).astype(jnp.uint32)
    tail_len = jnp.where(
        is_header, 6,
        jnp.where(is_param, param_bits[..., None],
                  jnp.where(is_samp, gat(tail_len_s), 0)),
    ).astype(jnp.int32)
    total_len = jnp.where(
        is_header, jnp.int64(6),
        jnp.where(is_param, param_bits[..., None].astype(jnp.int64),
                  jnp.where(is_samp, gat(total_len_s), 0)),
    )
    # inactive channels (constant/verbatim) produce no payload
    act = active[..., None]
    tail_len = jnp.where(act, tail_len, 0)
    total_len = jnp.where(act, total_len, 0)

    ends = jnp.cumsum(total_len, axis=-1)  # (B, C, S) inclusive
    total_bits = ends[..., -1]

    # ---- word assembly ----
    word_starts = (jnp.arange(W, dtype=jnp.int64) * 32)  # (W,)

    def search(ends_1d, targets):
        return jnp.searchsorted(ends_1d, targets, side="right")

    i0 = jax.vmap(jax.vmap(lambda e: search(e, word_starts)))(ends)  # (B,C,W)
    i0 = i0.astype(jnp.int32)

    words = jnp.zeros((B, C, W), dtype=jnp.uint32)
    win_end = word_starts[None, None, :] + 32  # (1,1,W)
    for kk in range(_K_INTERSECT):
        idx = jnp.clip(i0 + kk, 0, S - 1)
        e_i = jnp.take_along_axis(ends, idx.astype(jnp.int32), axis=-1)
        l_i = jnp.take_along_axis(tail_len, idx, axis=-1).astype(jnp.int64)
        v_i = jnp.take_along_axis(tail_val, idx, axis=-1)
        ok = (
            (i0 + kk < S)
            & (e_i > word_starts[None, None, :])
            & (e_i - l_i < win_end)
            & (l_i > 0)
        )
        # tails are <= 31 bits, so when the code ends inside this window the
        # left shift is < 32 (bits pushed past 2^32 belong to the previous
        # word and are dropped); when it ends beyond, the right shift is
        # < tail_len <= 31 — u32 shifts suffice throughout.
        shift = win_end - e_i
        left = jnp.clip(shift, 0, 31).astype(jnp.uint32)
        right = jnp.clip(-shift, 0, 31).astype(jnp.uint32)
        contrib = jnp.where(shift >= 0, v_i << left, v_i >> right)
        words = words | jnp.where(ok, contrib, jnp.uint32(0))
    return words, total_bits


def compact_payloads(
    words: jnp.ndarray,       # (B, C, W) uint32
    word_counts: jnp.ndarray, # (B, C) int32
    offsets: jnp.ndarray,     # (B, C) int32 word offsets into flat output
    budget: int,
) -> jnp.ndarray:
    """Scatter per-channel used words into one flat (budget,) buffer.

    The host computes offsets (exclusive cumsum of ceil(bits/32)) from the
    already-fetched total_bits, so the download shrinks from the static
    per-channel budget to the true payload size (bucketed).
    """
    B, C, W = words.shape
    w_idx = jnp.arange(W, dtype=jnp.int32)
    valid = w_idx[None, None, :] < word_counts[..., None]
    target = offsets[..., None] + w_idx[None, None, :]
    target = jnp.where(valid, target, budget)  # out-of-range drops
    flat = jnp.zeros((budget + 1,), dtype=jnp.uint32)
    flat = flat.at[target.reshape(-1)].max(words.reshape(-1), mode="drop")
    return flat[:budget]
