"""Structured logging (SURVEY.md §5: replace the reference's bare prints).

Tagged, timestamped, level-filtered logs via the stdlib logging module, with
the reference's familiar ``[FastEditor]``-style component tags preserved.
Level set via FASTEDIT_LOG_LEVEL (default INFO).
"""

from __future__ import annotations

import logging
import os
import sys

_CONFIGURED = False


def get_logger(component: str) -> logging.Logger:
    global _CONFIGURED
    if not _CONFIGURED:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(
            logging.Formatter("%(asctime)s [%(name)s] %(message)s", "%H:%M:%S")
        )
        root = logging.getLogger("fastedit")
        root.addHandler(handler)
        root.setLevel(os.environ.get("FASTEDIT_LOG_LEVEL", "INFO").upper())
        root.propagate = False
        _CONFIGURED = True
    return logging.getLogger(f"fastedit.{component}")
