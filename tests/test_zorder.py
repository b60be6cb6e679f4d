"""Z-order clustering (operators/zorder.py): Morton interleave correctness
against a pure-Python mirror, the locality property that justifies the
layout (every clustered column gets bounded per-file spread, where a
lexicographic sort leaves the secondary column spanning everything), and
the write path's per-file parquet min/max tightness."""

from __future__ import annotations

import pyspark.sql.functions as F

from science_datalake_spark.operators.zorder import (
    interleave_bits,
    write_zordered,
    zorder_key,
)


def _morton(vals: list[int], bits: int) -> int:
    out = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            out |= ((v >> i) & 1) << (i * len(vals) + j)
    return out


def test_interleave_matches_pure_python(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = df.select(
        "x", "y", interleave_bits([F.col("x"), F.col("y")], 3).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton([r["x"], r["y"]], 3), (r["x"], r["y"], r["z"])


def test_zorder_bounds_spread_on_both_columns(spark):
    """Sort a 64x64 grid by the z-key and cut it into 16 equal chunks: the
    max per-chunk spread of EACH column must be far below the full range
    (a lexicographic (x, y) sort leaves y spanning the full 0..63 in every
    chunk). This is the pruning property: chunk == file, spread == the
    min/max window a scan must consider."""
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, ["x", "y"])
    keyed, z = zorder_key(df, ["x", "y"], bits=6)
    ordered = keyed.orderBy(z).collect()
    n = len(ordered)
    chunk = n // 16
    worst_x = worst_y = 0
    for c in range(16):
        part = ordered[c * chunk : (c + 1) * chunk]
        xs = [r["x"] for r in part]
        ys = [r["y"] for r in part]
        worst_x = max(worst_x, max(xs) - min(xs))
        worst_y = max(worst_y, max(ys) - min(ys))
    # a 16-chunk Z-curve over a 64x64 grid keeps each dim within a
    # 16..32-wide band per chunk; lexicographic would give worst_y == 63
    assert worst_x <= 32 and worst_y <= 32, (worst_x, worst_y)


def test_write_zordered_gives_tight_per_file_minmax(spark, tmp_path):
    """Every written file must cover a narrow window of BOTH columns —
    checked through the actual parquet footers via per-file min/max."""
    import pyarrow.parquet as pq
    import os

    rows = [(x, y, f"p{x}-{y}") for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, ["x", "y", "payload"])
    out = str(tmp_path / "z")
    write_zordered(df, out, ["x", "y"], num_files=16, bits=6)
    files = [
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    ]
    assert len(files) >= 8
    for fp in files:
        md = pq.read_metadata(fp)
        spans = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name not in ("x", "y"):
                    continue
                st = col.statistics
                lo, hi = spans.get(name, (st.min, st.max))
                spans[name] = (min(lo, st.min), max(hi, st.max))
        for name, (lo, hi) in spans.items():
            assert hi - lo <= 32, (fp, name, lo, hi)


def test_zorder_key_handles_dates_and_nulls(spark):
    """DateType clustered columns must work (a direct double cast is an
    analysis error under ANSI) and NULLs must land at the curve origin
    rather than producing a NULL key that escapes the layout."""
    import datetime

    rows = [
        (datetime.date(2020, 1, 1) + datetime.timedelta(days=d), v)
        for d in range(16)
        for v in range(16)
    ] + [(None, None), (datetime.date(2020, 1, 5), None)]
    df = spark.createDataFrame(rows, ["day", "v"])
    keyed, z = zorder_key(df, ["day", "v"], bits=4)
    got = keyed.select(z).collect()
    assert all(r[z] is not None for r in got)
    # the all-NULL row sits at the curve origin
    origin = keyed.filter(F.col("day").isNull()).select(z).first()[z]
    assert origin == 0
