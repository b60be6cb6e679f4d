"""Datalake root discovery — parity with the reference's config resolution
(scripts/config.py:38-81): walk up from cwd looking for a ``datalake.json``
marker, then environment variable, then an explicit default.
"""

from __future__ import annotations

import json
import os

MARKER = "datalake.json"
ENV_VAR = "SCIENCE_DATALAKE_ROOT"


def find_datalake_root(start: str | None = None, default: str | None = None) -> str | None:
    """Resolution order: marker-file walk-up → $SCIENCE_DATALAKE_ROOT →
    default. Returns None if nothing resolves."""
    cur = os.path.abspath(start or os.getcwd())
    while True:
        if os.path.exists(os.path.join(cur, MARKER)):
            return cur
        parent = os.path.dirname(cur)
        if parent == cur:
            break
        cur = parent
    env = os.environ.get(ENV_VAR)
    if env and os.path.isdir(env):
        return env
    return default


def load_config(root: str) -> dict:
    path = os.path.join(root, MARKER)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}
