"""Strict-float QLPC mode: exact stable-reference float semantics via the
native sequential-FMA chain. The strict path must agree with the numpy
oracle on quantized outputs (differences absorbed by quantization) and
produce valid, lossless streams."""

import numpy as np
import pytest

from flacenc_tpu import config, native, sigen, source
from flacenc_tpu.component import decode_stream, parse_stream
from flacenc_tpu.config import Window
from flacenc_tpu.models import reference_encoder as re
from flacenc_tpu.ops import ref_np
from flacenc_tpu.ops.windows import get_window

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_strict_qlpc_matches_numpy_oracle_quantized():
    T = 2048
    w = get_window(Window(), T)
    sigs = np.stack([
        sigen.Sine(100 + s, 0.4).noise_with_seed(s, 0.02).to_vec_quantized(16, T)
        for s in range(6)
    ])
    q, o, sh = native.strict_qlpc(sigs, w, 10, 15)
    for i in range(6):
        coefs = ref_np.lpc_from_autocorr(sigs[i], Window(), 10)
        q2, o2, s2 = ref_np.quantize_parameters(coefs, 15)
        assert o[i] == o2 and sh[i] == s2
        assert np.array_equal(q[i, :o2], q2)


def test_strict_qlpc_silence_and_dc():
    T = 512
    w = get_window(Window.rectangle(), T)
    sigs = np.stack([
        np.zeros(T, np.int32),                      # silence
        np.concatenate([np.array([5], np.int32), np.zeros(T - 1, np.int32)]),
    ])
    q, o, sh = native.strict_qlpc(sigs, w, 8, 15)
    assert o[0] == 1 and np.all(q[0] == 0)  # silence -> zero coefs, order 1


def test_strict_oracle_stream_lossless():
    n = 3000
    x = np.zeros(2 * n, np.int32)
    x[0::2] = sigen.Sine(90, 0.4).noise_with_seed(1, 0.02).to_vec_quantized(16, n)
    x[1::2] = sigen.Sine(91, 0.4).noise_with_seed(2, 0.02).to_vec_quantized(16, n)
    src = source.MemSource(x, 2, 16, 44100)
    stream = re.encode_with_fixed_block_size(
        config.Encoder().into_verified(), src, 1024
    )
    # strict oracle: rebuild each frame with strict subframes and compare
    from flacenc_tpu.source import FrameBuf

    fb = FrameBuf(2, 1024)
    fb.fill_interleaved(x[: 2 * 1024])
    f_strict = re.encode_fixed_size_frame(
        config.Encoder().into_verified(), fb, 0, stream.stream_info(),
        strict_lpc=True,
    )
    f_norm = stream.frames()[0]
    assert f_strict.to_frame_bytes() == f_norm.to_frame_bytes()
