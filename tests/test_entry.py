"""Smoke test of the driver contract in __spark_entry__.py."""

from __future__ import annotations

import importlib
import sys


def _entry_module():
    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__spark_entry__")


def test_entry_runs(spark):
    mod = _entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "total_revenue" in df.columns


def test_query_oracle_keys_align(spark):
    mod = _entry_module()
    qs = mod.queries()
    oracle = mod.oracle_sql()
    assert set(oracle) <= set(qs)
    assert len(qs) > 0
