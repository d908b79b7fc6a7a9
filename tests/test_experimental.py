"""Experimental LPC estimation modes (direct-MSE, IRLS-MAE) — numpy oracle
semantics, device parity, and end-to-end losslessness.

Goldens from the reference's `experimental`-feature tests in
``/root/reference/src/lpc.rs``.
"""

import numpy as np
import pytest

from flacenc_tpu import config, sigen, source
from flacenc_tpu.component import decode_stream, parse_stream
from flacenc_tpu.config import Window
from flacenc_tpu.models import batch_encoder as be
from flacenc_tpu.models import reference_encoder as re
from flacenc_tpu.ops import ref_np


def test_lagged_outer_prod_sum_golden():
    # lpc.rs:1342-1360
    signal = np.array([4.0, -4.0, 3.0, -3.0, 2.0, -2.0, 1.0, -1.0], np.float32)
    M = ref_np.weighted_lagged_outer_prod_sum(2, signal, None, 0)
    assert M[0, 0] == float(16 + 9 + 9 + 4 + 4 + 1 + 1)
    assert M[0, 1] == float(-16 - 12 - 9 - 6 - 4 - 2 - 1)
    assert M[1, 1] == float(16 + 16 + 9 + 9 + 4 + 4 + 1)
    assert M[1, 0] == M[0, 1]


def test_direct_mse_recovers_known_coefs():
    # lpc.rs:1195-1212: AR filter [1, -1, 0.5] recovered more accurately
    signal = np.array(
        [0, -512, 0, 512, 256, -256, -256, 128, 256, 0, -192, -64, 128, 96,
         -64, -96, 16, 80, 16, -56, -32, 32, 36, -12],
        np.int32,
    )
    coefs = ref_np.lpc_with_direct_mse(signal, Window.rectangle(), 3)
    assert 0.9 < coefs[0] < 1.1
    assert -1.1 < coefs[1] < -0.9
    assert 0.4 < coefs[2] < 0.6


def test_direct_mse_beats_autocorr_snr():
    # lpc.rs:1298-1337 structure (with sigen-based signal)
    signal = sigen.Sine(25, 0.7).noise_with_seed(5, 0.05).to_vec_quantized(16, 128)
    order = 16
    c_auto = ref_np.lpc_from_autocorr(signal, Window.tukey(0.1), order)
    c_mse = ref_np.lpc_with_direct_mse(signal, Window.rectangle(), order)
    e_auto = ref_np.compute_raw_errors(signal, c_auto)
    e_mse = ref_np.compute_raw_errors(signal, c_mse)
    assert np.sum(e_mse[order:] ** 2) <= np.sum(e_auto[order:] ** 2)


def test_irls_mae_not_worse_than_mse():
    # lpc.rs:1448-1486
    signal = sigen.Sine(40, 0.6).noise_with_seed(9, 0.1).to_vec_quantized(16, 512)
    order = 16
    c_mse = ref_np.lpc_with_direct_mse(signal, Window.rectangle(), order)
    c_mae = ref_np.lpc_with_irls_mae(signal, Window.rectangle(), order, 4)
    mae_mse = np.abs(ref_np.compute_raw_errors(signal, c_mse)).mean()
    mae_mae = np.abs(ref_np.compute_raw_errors(signal, c_mae)).mean()
    assert mae_mse >= mae_mae - 1e-3


def _experimental_cfg(mae_steps=0):
    cfg = config.Encoder()
    cfg.subframe_coding.qlpc.use_direct_mse = True
    cfg.subframe_coding.qlpc.mae_optimization_steps = mae_steps
    cfg.subframe_coding.qlpc.window = Window.rectangle()
    return cfg


@pytest.mark.parametrize("mae_steps", [0, 2])
def test_experimental_config_lossless_oracle(mae_steps):
    n = 2000
    x = np.zeros(2 * n, np.int32)
    x[0::2] = sigen.Sine(90, 0.4).noise_with_seed(1, 0.02).to_vec_quantized(16, n)
    x[1::2] = sigen.Sine(91, 0.4).noise_with_seed(2, 0.02).to_vec_quantized(16, n)
    src = source.MemSource(x, 2, 16, 44100)
    stream = re.encode_with_fixed_block_size(
        _experimental_cfg(mae_steps).into_verified(), src, 1024
    )
    decoded = decode_stream(parse_stream(stream.to_bytes()))
    assert np.array_equal(decoded, x)


def test_experimental_device_matches_oracle():
    n = 1024 * 2 + 100
    x = np.zeros(2 * n, np.int32)
    x[0::2] = sigen.Sine(90, 0.4).noise_with_seed(1, 0.01).to_vec_quantized(16, n)
    x[1::2] = sigen.Sine(91, 0.4).noise_with_seed(2, 0.01).to_vec_quantized(16, n)
    cfg = _experimental_cfg().into_verified()
    d = be.encode_with_fixed_block_size(
        cfg, source.MemSource(x, 2, 16, 44100), 1024
    ).to_bytes()
    r = re.encode_with_fixed_block_size(
        cfg, source.MemSource(x, 2, 16, 44100), 1024
    ).to_bytes()
    assert d == r
    assert np.array_equal(decode_stream(parse_stream(d)), x)
