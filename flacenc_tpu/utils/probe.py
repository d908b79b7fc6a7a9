"""Bounded liveness probe of the default jax backend.

The tunneled device transport wedges inside the C++ runtime where no
Python exception can fire, so the only reliable detection is running
the first op on a daemon thread and timing out. Shared by the CLI
(pre-compile wedge fallback, reference product surface
flacenc-bin/src/main.rs:151-155) and bench.py's supervisor; keeping ONE
implementation means a future change to probe semantics (e.g. handling
a wedge inside backend init) applies to both liveness verdicts.
"""

from __future__ import annotations

import threading
from typing import Callable, Optional


def probe_device(timeout_s: float = 75.0,
                 on_error: Optional[Callable[[str], None]] = None) -> bool:
    """True when the default jax backend answers a tiny op within
    `timeout_s` seconds. The op runs on a daemon thread: a wedged
    backend blocks that thread forever (it may hold backend-init state,
    so callers that need a working backend afterwards must re-exec or
    pin a different platform rather than retry in-process). `on_error`
    receives a message for in-thread exceptions (backend init failures
    that DO raise)."""
    import numpy as np

    ok = []

    def run():
        try:
            import jax.numpy as jnp

            ok.append(bool(np.asarray(jnp.arange(64) + 1)[3] == 4))
        except Exception as e:  # noqa: BLE001 - any backend failure
            if on_error is not None:
                on_error(f"device probe error: {e!r}")

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)
