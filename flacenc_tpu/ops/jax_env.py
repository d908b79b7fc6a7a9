"""JAX environment setup for the device compute path.

f64 is required: the reference computes autocorrelation and Levinson in f64
(``/root/reference/src/lpc.rs:916``), and quantization must see the same
precision. Importing this module (done by every device op module) enables
x64 before any tracing happens.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: encoder programs are specialized per
# (config, block_size, batch) and reused across processes.
# keyed per requested platform AND host-CPU feature fingerprint:
# persistent CPU artifacts compiled under a different host-feature
# profile load with "could SIGILL" warnings (cpu_aot_loader) when the
# cache directory moves between machines — a fresh dir is cheaper than
# a crashed bench fallback
def _requested_platforms() -> str:
    """The requested platform at import time: the live jax config wins
    (the documented CPU-pinning dance is `jax.config.update` BEFORE
    importing flacenc_tpu — the axon sitecustomize also pins this way,
    overriding the env), then the env var, else "default"."""
    try:
        live = jax.config.jax_platforms  # context-managed flag attribute
        if live:
            return str(live)
    except Exception:  # pragma: no cover - config key rename resilience
        pass
    return os.environ.get("JAX_PLATFORMS", "default") or "auto"


_platform_tag = _requested_platforms().replace(",", "_")


def _host_fingerprint() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform

    return platform.machine() or "unknown"


# only CPU artifacts embed host-ISA code; every other tag — including
# "default"/"auto" (JAX_PLATFORMS unset usually resolves to the device
# backend here) — keeps its stable name so compiled TPU programs
# survive across sessions. A stale default-tag CPU artifact merely
# warns-and-recompiles; discarding the whole TPU cache costs minutes.
_tag = (
    f"{_platform_tag}_{_host_fingerprint()}" if "cpu" in _platform_tag
    else _platform_tag
)
_cache_dir = os.environ.get(
    "FLACENC_TPU_JAX_CACHE",
    os.path.expanduser(f"~/.cache/flacenc_tpu_jax_{_tag}"),
)
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass
