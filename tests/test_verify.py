"""Tests for the component verification subsystem (verify.rs analogue)."""

import numpy as np
import pytest

from flacenc_tpu import config, sigen, source
from flacenc_tpu.component import verify as V
from flacenc_tpu.errors import VerifyError
from flacenc_tpu.models import reference_encoder as re

from test_component import make_random_residual


def _encoded_stream():
    n = 3000
    x = np.zeros(2 * n, np.int32)
    x[0::2] = sigen.Sine(90, 0.4).noise_with_seed(1, 0.02).to_vec_quantized(16, n)
    x[1::2] = sigen.Sine(91, 0.4).noise_with_seed(2, 0.02).to_vec_quantized(16, n)
    src = source.MemSource(x, 2, 16, 44100)
    return re.encode_with_fixed_block_size(config.Encoder().into_verified(), src, 1024)


def test_encoded_stream_verifies():
    V.verify_stream(_encoded_stream())


def test_residual_verify_catches_corruption():
    rng = np.random.default_rng(0)
    res = make_random_residual(rng, 4)
    V.verify_residual(res)
    # corrupt a warmup quotient
    res.quotients[0] = 5
    with pytest.raises(VerifyError):
        V.verify_residual(res)


def test_residual_verify_catches_remainder_overflow():
    rng = np.random.default_rng(1)
    res = make_random_residual(rng, 0)
    p0 = int(res.rice_params[0])
    res.remainders[10] = 1 << p0  # exceeds parameter range
    with pytest.raises(VerifyError):
        V.verify_residual(res)


def test_frame_verify_detects_stale_bitstream():
    stream = _encoded_stream()
    frame = stream.frames()[0]
    frame.precompute_bitstream()
    V.verify_frame(frame)
    frame.precomputed_bitstream = frame.precomputed_bitstream[:-1] + b"\x00"
    with pytest.raises(VerifyError):
        V.verify_frame(frame)


def test_stream_verify_detects_bad_frame_numbers():
    stream = _encoded_stream()
    stream.frames()[1].header_mut().set_frame_number(5)
    with pytest.raises(VerifyError):
        V.verify_stream(stream)


def test_lpc_coef_precision_check():
    stream = _encoded_stream()
    from flacenc_tpu.component import Lpc

    for f in stream.frames():
        for s in f.subframes():
            if isinstance(s, Lpc):
                s.parameters.coefs[0] = 1 << 14  # >= 2^(precision-1) for precision 15
                with pytest.raises(VerifyError):
                    V.verify_subframe(s)
                return
    pytest.skip("no LPC subframe found")
