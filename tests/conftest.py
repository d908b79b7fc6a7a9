"""Test configuration.

Tests always run on a virtual 8-device CPU mesh: fast, deterministic, and
exercises the full multi-chip sharding path without TPU hardware. On boxes
where a TPU-tunnel plugin (axon) hijacks platform selection, it is stripped
from the import path so `JAX_PLATFORMS=cpu` is honored. Real-hardware
execution is covered by bench.py and the driver's entry checks.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# strip TPU-tunnel plugins that override JAX_PLATFORMS (must happen before
# the first `import jax` anywhere in the test session)
sys.path[:] = [p for p in sys.path if "axon" not in p]
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":") if p and "axon" not in p
)

# a tunnel sitecustomize may have imported jax at interpreter start, in
# which case jax captured JAX_PLATFORMS from the old environment — override
# the live config too (before any backend initializes)
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_cross_stream_ewma_seed():
    """Keep tests hermetic w.r.t. the process-wide fetch-EWMA seed
    (batch_encoder._LAST_FETCH_EWMA): production pipelines inherit the
    last stream's link measurement so short streams group immediately
    on slow links, but a test must not see grouping decisions driven by
    whichever test happened to run before it."""
    try:
        from flacenc_tpu.models import batch_encoder as _be

        _be._LAST_FETCH_EWMA = None
    except Exception:
        pass
    yield
