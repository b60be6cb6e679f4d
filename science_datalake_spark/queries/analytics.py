"""Operator-inventory queries (SURVEY §2.2-2.8) over the driver testdata.

Filled in incrementally; each query maps 1:1 to a SURVEY §2 row.
"""

from __future__ import annotations
