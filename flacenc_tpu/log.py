"""Logging/observability (the reference's `log` feature analogue).

`FLACENC_LOG` selects the level like the reference CLI's env_logger wiring
(``/root/reference/flacenc-bin/src/main.rs:430``); run statistics are
emitted as single JSONL lines like par-mode's counters
(``/root/reference/src/par.rs:414-421``).
"""

from __future__ import annotations

import json
import logging
import os

logger = logging.getLogger("flacenc_tpu")

_level = os.environ.get("FLACENC_LOG", "").upper()
if _level:
    logging.basicConfig(level=getattr(logging, _level, logging.INFO))
    logger.setLevel(getattr(logging, _level, logging.INFO))


def info_stats(**stats) -> None:
    """Emit a one-line JSON stats record at INFO level."""
    if logger.isEnabledFor(logging.INFO):
        logger.info(json.dumps(stats, sort_keys=True))
