"""Unit tests for windowing, autocorrelation, Levinson, quantization.

Goldens come from the reference's colocated tests in
``/root/reference/src/lpc.rs`` (SURVEY.md §4 tier 1).
"""

import math

import numpy as np
import pytest

from flacenc_tpu.config import Window
from flacenc_tpu.ops import ref_np
from flacenc_tpu.ops.windows import get_window, window_weights
from flacenc_tpu import sigen


def test_tukey_window_golden():
    # scipy.signal.windows.tukey(32, 0.3) golden from lpc.rs:1215-1228
    reference = [
        0., 0.1098376, 0.39109322, 0.720197, 0.95255725, 1., 1., 1., 1., 1.,
        1., 1., 1., 1., 1., 1., 1., 1., 1., 1., 1., 1., 1., 1., 1., 1., 1.,
        0.95255725, 0.720197, 0.39109322, 0.1098376, 0.,
    ]
    w = get_window(Window.tukey(0.3), len(reference))
    np.testing.assert_allclose(w, reference, atol=1e-6)


def test_tukey_window_range():
    for alpha in (0.0, 0.3, 0.5, 0.8, 1.0):
        w = get_window(Window.tukey(alpha), 4096)
        assert np.all(np.isfinite(w))
        assert np.all((w >= 0.0) & (w <= 1.0))


def test_rectangle_window():
    w = window_weights(Window.rectangle(), 128)
    assert np.all(w == 1.0)
    w0 = window_weights(Window.tukey(0.0), 64)
    assert np.all(w0 == 1.0)


def test_auto_correlation_sine_extrema():
    # lpc.rs:998-1022
    t = np.arange(128, dtype=np.float32)
    signal = (np.sin(t / 32.0 * 2.0 * np.pi) * 1024.0).astype(np.float32)
    corr = ref_np.auto_correlation(32, signal)
    assert int(np.argmax(corr[:32])) == 0
    assert int(np.argmin(corr[:32])) == 16


def test_auto_correlation_known_samples():
    # lpc.rs:1024-1041 (warm-up exclusion semantics)
    signal = np.array(
        [0.0] * 8
        + [1, 1, 1, 1, -1, -1, -1, -1, 1, 1, -1, -1, 1, 1, -1, -1,
           1, -1, 1, -1, 1, -1, 1, -1]
        + [1, -1, 1, -1, 1, -1, 1, -1, 1, 1, -1, -1, 1, 1, -1, -1,
           1, 1, 1, 1, -1, -1, -1, -1]
        + [0.0] * 8,
        dtype=np.float32,
    )
    corr = ref_np.auto_correlation(33, signal)
    assert corr[0] == 24.0
    assert corr[1] == -4.0
    assert corr[2] == 2.0
    assert corr[32] == 0.0


def test_symmetric_levinson_known_solutions():
    # lpc.rs:1044-1066
    coefs = np.array([1.0, 0.5, 0.0, 0.25])
    ys = np.array([1.0, -1.0, 1.0, -1.0])
    xs = ref_np.symmetric_levinson_recursion(coefs, ys)
    np.testing.assert_allclose(xs, [8.0, -10.0, 10.0, -8.0], rtol=1e-10)

    coefs = np.array([1.0, -0.5, -1.0, -0.5, 0.5])
    ys = np.array([1.0, 0.5, 0.25, 0.125, 0.0625])
    xs = ref_np.symmetric_levinson_recursion(coefs, ys)
    np.testing.assert_allclose(
        xs, [0.80833, -0.26458, -0.36667, -0.45208, -1.06667], atol=1e-4
    )


def test_shift_finder():
    # lpc.rs:1069-1074
    assert ref_np.find_shift(np.array([0.25, 0.125, 0.000001, 0.0]), 8) == 9


def test_parameter_quantizer():
    # lpc.rs:1077-1086
    q, order, shift = ref_np.quantize_parameters(np.array([0.0, 0.5, 0.1]), 4)
    assert list(q) == [0, 7, 2]

    q, order, shift = ref_np.quantize_parameters(np.array([1.0, -0.5, 0.5]), 2)
    assert list(q) == [1, -1, 1]
    deq = q.astype(np.float64) / (2.0 ** shift)
    np.testing.assert_allclose(deq, [0.5, -0.5, 0.5])


def test_qlpc_auto_truncation():
    # lpc.rs:1089-1093
    q, order, shift = ref_np.quantize_parameters(np.array([1.0, 0.5, 0.0, 0.0]), 8)
    assert order == 2


@pytest.mark.parametrize("lpc_order", [2, 12, 24])
def test_qlpc_recovery(lpc_order):
    # lpc.rs:1095-1143: prediction efficiency + exact error identity
    signal = sigen.Sine(32, 0.8).noise_with_seed(123, 0.01).to_vec_quantized(16, 1024)
    coefs = ref_np.lpc_from_autocorr(signal, Window.tukey(0.1), lpc_order)
    assert np.all(np.isfinite(coefs))
    q, order, shift = ref_np.quantize_parameters(coefs[:lpc_order], 15)
    assert len(q) <= lpc_order
    errors = ref_np.compute_error(q, shift, signal)

    se = float(np.sum(signal[lpc_order:].astype(np.float64) ** 2))
    ee = float(np.sum(errors[lpc_order:].astype(np.float64) ** 2))
    assert ee < se

    # exact reconstruction identity (int semantics)
    x = signal.astype(np.int64)
    for t in range(lpc_order, len(signal)):
        pred = sum(int(q[k]) * int(x[t - k - 1]) for k in range(order)) >> shift
        assert errors[t] + pred == signal[t], f"failed at t={t}"


def test_lpc_with_pure_dc():
    # lpc.rs:1145-1169
    signal = np.array([12345] * 7, dtype=np.int32)
    sf = signal.astype(np.float32)
    corr = ref_np.auto_correlation(2, sf)
    coefs = ref_np.symmetric_levinson_recursion(corr[0:1], corr[1:2])
    assert abs(coefs[0] - 1.0) < 1e-6
    q, order, shift = ref_np.quantize_parameters(coefs, 15)
    errors = ref_np.compute_error(q, shift, signal)
    assert np.all(errors < 2)


def test_order_zero_lpc():
    # lpc.rs:1431-1446
    signal = np.zeros(64, dtype=np.int32)
    coefs = ref_np.lpc_from_autocorr(signal, Window.rectangle(), 0)
    q, order, shift = ref_np.quantize_parameters(coefs, 13)
    errors = ref_np.compute_error(q, shift, signal)
    assert np.array_equal(errors, np.zeros(64, dtype=np.int32))


def test_overflow_patterns():
    # lpc.rs:1415-1429: i64 fallback path must not crash and must wrap like i32
    signal = np.array([127] * 33 + [29] + [0] * 30, dtype=np.int32)
    coefs = ref_np.lpc_from_autocorr(signal, Window.rectangle(), 15)
    q, order, shift = ref_np.quantize_parameters(coefs[:15], 13)
    errors = ref_np.compute_error(q, shift, signal)
    assert errors.dtype == np.int32


def test_compute_error_matches_reference_scalar_loop():
    rng = np.random.default_rng(0)
    signal = rng.integers(-(1 << 15), 1 << 15, 256).astype(np.int32)
    q = np.array([9123, -5000, 1234, -789], dtype=np.int16)
    shift = 12
    errors = ref_np.compute_error(q, shift, signal)
    # scalar reference loop
    for t in range(4, 256):
        acc = sum(int(q[k]) * int(signal[t - 1 - k]) for k in range(4))
        expect = int(signal[t]) - (acc >> shift)
        assert errors[t] == np.int32(expect)
    assert np.all(errors[:4] == 0)


def test_levinson_zero_denominator_skips_order():
    """lpc.rs:664-683 compiled semantics: the reference's `continue` on a
    zero reflection denominator binds to the inner `for n` loop (its
    `#[allow(clippy::never_loop)]` proves the outer loop never repeats),
    so the failing order is SKIPPED and diagonal loading never applies.
    A constant signal (rectangle window) makes error == ±1.0 exactly:
    the solution must stay at the order-1 result [1, 0, ...]."""
    import numpy as np

    from flacenc_tpu.ops import ref_np

    sig = np.full(1024, 777.0)
    corr = np.asarray(
        [float(np.dot(sig[10:], sig[10 - t : 1024 - t])) for t in range(11)]
    )
    co = ref_np.symmetric_levinson_recursion(corr[:10], corr[1:11])
    assert co[0] == 1.0 and np.all(co[1:] == 0.0), co

    # device kernel agrees elementwise on the same degenerate input
    import jax.numpy as jnp

    from flacenc_tpu.ops import lpc as oL

    dev = np.asarray(oL.levinson(jnp.asarray(corr)[None, :], 10))[0]
    assert np.array_equal(dev, co)


def test_explicit_strict_with_experimental_config_raises():
    """strict_lpc=True + direct-MSE must error, not silently downgrade."""
    import numpy as np
    import pytest as _pytest

    from flacenc_tpu import config, source
    from flacenc_tpu.models import batch_encoder as be

    cfg = config.Encoder()
    cfg.subframe_coding.qlpc.use_direct_mse = True
    x = np.zeros(2 * 256, np.int32)
    with _pytest.raises(ValueError, match="strict_lpc"):
        be.encode_with_fixed_block_size(
            cfg.into_verified(), source.MemSource(x, 2, 16, 44100), 256,
            batch_size=2, strict_lpc=True,
        )
