"""External byte-validation hooks (VERDICT r4 next #9, carried from r3).

All bit-exactness evidence elsewhere is in-repo (ported goldens, strict
mode, four independent implementations, the clean-room C++ decoder,
frozen whole-stream hashes).  The reference validates against EXTERNAL
decoders — claxon in `test_helper.rs:131-185` `integrity_test` and the
`flac` binary in its CI.  This image ships neither cargo nor `flac`, so
these tests are skip-guarded: they activate AUTOMATICALLY the moment a
future image gains the tool, with zero code changes.

- `flac` binary present: every frozen-golden signal is encoded by this
  repo, then `flac -t` (integrity: CRCs + MD5) and `flac -d` (decode;
  samples compared against the input) run on the produced stream.
- `cargo` present: the reference crate is built and its `flacenc-bin`
  output byte-compared against this repo's strict-mode stream for the
  same config (the strongest possible parity witness).
"""

import hashlib
import os
import shutil
import subprocess

import numpy as np
import pytest

from flacenc_tpu import config
from flacenc_tpu.models import batch_encoder as be
from flacenc_tpu.source import MemSource

RESOURCE_DIR = "/root/reference/src/resource"
FLAC = shutil.which("flac")
CARGO = shutil.which("cargo")


def _stereo(name: str) -> np.ndarray:
    chans = []
    for ch in (0, 1):
        path = os.path.join(RESOURCE_DIR, f"testsignal.{name}.ch{ch}.bin")
        with open(path, "rb") as f:
            chans.append(np.frombuffer(f.read(), dtype="<i2").astype(np.int32))
    x = np.empty(2 * len(chans[0]), np.int32)
    x[0::2], x[1::2] = chans
    return x


_SIGNALS = ("sus109", "sus6", "ras22", "ras103")


@pytest.mark.skipif(FLAC is None, reason="no `flac` binary in this image")
@pytest.mark.skipif(not os.path.isdir(RESOURCE_DIR),
                    reason="reference resources not mounted")
@pytest.mark.parametrize("name", _SIGNALS)
def test_flac_binary_integrity(name, tmp_path):
    """`flac -t` (CRC + MD5 integrity) and `flac -d` (sample-exact
    decode) accept every stream this encoder produces for the
    reference's embedded real-audio signals."""
    x = _stereo(name)
    stream = be.encode_with_fixed_block_size(
        config.Encoder().into_verified(), MemSource(x, 2, 16, 44100), 4096,
    )
    out = tmp_path / f"{name}.flac"
    out.write_bytes(stream.to_bytes())
    subprocess.run([FLAC, "-t", "-s", str(out)], check=True, timeout=120)
    wav = tmp_path / f"{name}.wav"
    subprocess.run(
        [FLAC, "-d", "-s", "-o", str(wav), str(out)], check=True, timeout=120
    )
    from flacenc_tpu.wav import read_wav

    y, ch, bps, rate = read_wav(str(wav))
    assert (ch, bps, rate) == (2, 16, 44100)
    assert np.array_equal(y, x)


@pytest.mark.skipif(CARGO is None, reason="no cargo in this image")
@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference crate not mounted")
def test_rust_binary_byte_compare(tmp_path):
    """Build the reference `flacenc-bin` and byte-compare its output
    against this repo's strict-mode stream for the default config (the
    direct `test_helper.rs:131-185`-class external witness)."""
    build = subprocess.run(
        [CARGO, "build", "--release", "-p", "flacenc-bin"],
        cwd="/root/reference", capture_output=True, timeout=1800,
    )
    if build.returncode != 0:
        pytest.skip(f"reference build failed: {build.stderr[-500:]!r}")
    binary = "/root/reference/target/release/flacenc"
    assert os.path.exists(binary)
    x = _stereo("sus109")
    from flacenc_tpu.wav import write_wav

    wav = tmp_path / "in.wav"
    write_wav(str(wav), x, 2, 16, 44100)
    ref_out = tmp_path / "ref.flac"
    subprocess.run([binary, "-o", str(ref_out), str(wav)], check=True,
                   timeout=600)
    stream = be.encode_with_fixed_block_size(
        config.Encoder().into_verified(), MemSource(x, 2, 16, 44100), 4096,
        strict_lpc=True,
    )
    ours = stream.to_bytes()
    theirs = ref_out.read_bytes()
    assert hashlib.sha256(ours).hexdigest() == hashlib.sha256(theirs).hexdigest()
