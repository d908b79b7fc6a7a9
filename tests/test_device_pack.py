"""Device-side Rice bit packing: payload parity vs the oracle serializer
and end-to-end byte equality through the device-pack encode path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flacenc_tpu import config, sigen, source
from flacenc_tpu.bitio import BitSink
from flacenc_tpu.component import decode_stream, parse_stream
from flacenc_tpu.component.datatype import Residual
from flacenc_tpu.models import batch_encoder as be
from flacenc_tpu.ops import pack as opack
from flacenc_tpu.ops import ref_np

T = 1024


def _payload_case(rng, scale, warmup):
    errors = rng.integers(-scale, scale + 1, T).astype(np.int32)
    prc = ref_np.find_partitioned_rice_parameter(errors, warmup, 30)
    return errors, prc


def test_pack_payload_matches_oracle_serializer():
    rng = np.random.default_rng(0)
    B, C = 2, 2
    errors = np.zeros((B, C, T), np.int32)
    rice_order = np.zeros((B, C), np.int32)
    params = np.zeros((B, C, 16), np.int32)
    warmup = np.zeros((B, C), np.int32)
    scales = [[3, 200], [8000, 30]]
    for b in range(B):
        for c in range(C):
            warmup[b, c] = (b * 2 + c) % 5
            e, prc = _payload_case(rng, scales[b][c], int(warmup[b, c]))
            errors[b, c] = e
            rice_order[b, c] = prc.order
            params[b, c, : len(prc.ps)] = prc.ps
    # pathological huge quotient exercises the implicit-zero spans
    errors[0, 1, 100] = 2 ** 27
    prc = ref_np.find_partitioned_rice_parameter(errors[0, 1], int(warmup[0, 1]), 30)
    rice_order[0, 1] = prc.order
    params[0, 1] = 0
    params[0, 1, : len(prc.ps)] = prc.ps

    use_rice2 = (params > 14).any(axis=-1)
    active = np.ones((B, C), bool)
    f = jax.jit(
        lambda e, ro, p, w, u, a: opack.pack_residual_payload(
            e, ro, p, w, u, a, T, 16
        )
    )
    words, total_bits = jax.device_get(
        f(errors, rice_order, params, warmup, use_rice2, active)
    )
    for b in range(B):
        for c in range(C):
            nparts = 1 << rice_order[b, c]
            q, r = ref_np.quotients_and_remainders(
                errors[b, c],
                ref_np.PrcParameter(
                    int(rice_order[b, c]), params[b, c, :nparts].astype(np.uint8), 0
                ),
                int(warmup[b, c]),
            )
            res = Residual(
                int(rice_order[b, c]), T, int(warmup[b, c]),
                params[b, c, :nparts].astype(np.uint8), q, r,
            )
            sink = BitSink()
            res.write(sink)
            nbits = len(sink)
            assert nbits == int(total_bits[b, c])
            sink.align_to_byte()
            expect = sink.as_bytes()
            got = b"".join(
                int(x).to_bytes(4, "big") for x in words[b, c][: (nbits + 31) // 32]
            )
            nb, rem = nbits // 8, nbits % 8
            assert got[:nb] == expect[:nb]
            if rem:
                mask = (0xFF << (8 - rem)) & 0xFF
                assert (got[nb] & mask) == (expect[nb] & mask)


def test_device_pack_encode_byte_equal():
    n = T * 3 + 111
    x = np.zeros(2 * n, np.int32)
    x[0::2] = sigen.Sine(128, 0.4).noise_with_seed(1, 0.01).to_vec_quantized(16, n)
    x[1::2] = sigen.Sine(130, 0.4).noise_with_seed(2, 0.02).to_vec_quantized(16, n)
    cfg = config.Encoder().into_verified()
    d_py = be.encode_with_fixed_block_size(
        cfg, source.MemSource(x, 2, 16, 44100), T, packer="python"
    ).to_bytes()
    d_dev = be.encode_with_fixed_block_size(
        cfg, source.MemSource(x, 2, 16, 44100), T, packer="device"
    ).to_bytes()
    assert d_dev == d_py
    assert np.array_equal(decode_stream(parse_stream(d_dev)), x)
