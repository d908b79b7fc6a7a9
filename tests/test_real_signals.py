"""Integrity tests over the reference's embedded real-audio test signals
(16-bit LE, ``/root/reference/src/resource/``; read in place, test-only
fixtures — test_helper.rs:81-125). Skipped when the reference checkout is
not mounted."""

import hashlib
import os

import numpy as np
import pytest

from flacenc_tpu import config, source
from flacenc_tpu.component import decode_stream, parse_stream
from flacenc_tpu.models import reference_encoder as re

RESOURCE_DIR = "/root/reference/src/resource"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RESOURCE_DIR), reason="reference resources not mounted"
)


def load_signal(name: str, ch: int) -> np.ndarray:
    path = os.path.join(RESOURCE_DIR, f"testsignal.{name}.ch{ch}.bin")
    with open(path, "rb") as f:
        return np.frombuffer(f.read(), dtype="<i2").astype(np.int32)


@pytest.mark.parametrize("name", ["sus109", "sus6", "ras22", "ras103"])
def test_stereo_integrity_on_real_audio(name):
    l = load_signal(name, 0)
    r = load_signal(name, 1)
    interleaved = np.empty(2 * len(l), np.int32)
    interleaved[0::2] = l
    interleaved[1::2] = r
    src = source.MemSource(interleaved, 2, 16, 44100)
    stream = re.encode_with_fixed_block_size(
        config.Encoder().into_verified(), src, 4096
    )
    data = stream.to_bytes()
    decoded = decode_stream(parse_stream(data))
    assert np.array_equal(decoded, interleaved)
    md5 = hashlib.md5(source.samples_to_le_bytes(interleaved, 2)).digest()
    assert stream.stream_info().md5 == md5
    # real audio must compress
    assert len(data) < len(interleaved) * 2


def test_qlpc_efficiency_on_real_audio():
    # lpc.rs:1259-1295: QLPC must achieve prediction gain on sus109
    from flacenc_tpu.config import Window
    from flacenc_tpu.ops import ref_np

    signal = load_signal("sus109", 0)[:4096]
    coefs = ref_np.lpc_from_autocorr(signal, Window.tukey(0.1), 8)
    q, order, shift = ref_np.quantize_parameters(coefs, 12)
    assert order == 8
    errors = ref_np.compute_error(q, shift, signal)
    se = float(np.sum(signal[8:].astype(np.float64) ** 2))
    ee = float(np.sum(errors[8:].astype(np.float64) ** 2))
    assert ee < se
