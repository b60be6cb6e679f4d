"""Z-order (Morton) multi-column clustering for data-skipping layouts.

The sinks already range-cluster on ONE key (sorted files → tight per-file
min/max → row-group skipping on that key). A 100 TB table queried on TWO
OR MORE independent columns (e.g. events by time AND user, documents by
source AND length) can't serve both from one sort order: the secondary
column's min/max spans every file. Z-ordering interleaves the bits of the
normalized keys so rows close in ANY clustered dimension land close in
the file order — every clustered column gets usable min/max pruning,
degraded gracefully (each of k columns keeps ~bits/k effective prefix
bits per file). This is Delta Lake's OPTIMIZE ZORDER / the classic Morton
curve, expressed as plain codegen'd column arithmetic — no shuffle beyond
the one range repartition the write needs anyway.

Normalization: rank-free min/max scaling via a broadcast 1-row aggregate
(lazy — no job runs building the expression). Min/max scaling is the
standard cheap variant; heavily skewed columns can pre-transform (ln) at
the call site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: list[F.Column], bits: int) -> F.Column:
    """Morton-interleave k non-negative integer columns, ``bits`` low bits
    each, into one BIGINT: output bit (i*k + j) = bit i of cols[j].
    Requires k*bits <= 63. Pure shift/and/or chain — whole-stage codegen,
    no UDF."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} columns x {bits} bits exceeds a signed long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long").bitwiseAND(F.lit(1 << i)), i)
            out = out.bitwiseOR(F.shiftleft(bit, i * k + j))
    return out


def _numeric_view(df: DataFrame, c: str) -> F.Column:
    """``cols[c]`` as a double, handling temporal types explicitly: a
    DateType cannot be cast to double (analysis error under Spark's ANSI
    default), so dates go through day-since-epoch and timestamps through
    the (legal) seconds cast."""
    dt = dict(df.dtypes).get(c, "")
    if dt == "date":
        return F.datediff(F.col(c), F.lit("1970-01-01")).cast("double")
    if dt.startswith("timestamp"):
        return F.col(c).cast("double")
    return F.col(c).cast("double")


def zorder_key(
    df: DataFrame, cols: list[str], bits: int | None = None
) -> tuple[DataFrame, str]:
    """Attach a ``__z`` Morton key over ``cols`` (numeric/date/timestamp;
    dates are converted to day-since-epoch first — a direct double cast is
    an analysis error), each min/max-normalized to an unsigned
    ``bits``-bit integer via a broadcast 1-row min/max aggregate (lazy —
    zero jobs here). NULLs in a clustered column normalize to the curve
    origin (bucket 0) rather than producing a NULL key — every row gets a
    layout position. Returns (df_with_key, key_col_name). Default
    bits = 63 // k (the widest that fits a long)."""
    k = len(cols)
    if k < 2:
        raise ValueError("z-ordering needs >= 2 columns (use range clustering for 1)")
    if bits is None:
        bits = 63 // k
    aggs = []
    for c in cols:
        v = _numeric_view(df, c)
        aggs += [F.min(v).alias(f"__min_{c}"), F.max(v).alias(f"__max_{c}")]
    stats = df.agg(*aggs)
    staged = df.crossJoin(F.broadcast(stats))
    scale = float((1 << bits) - 1)
    normed = []
    for c in cols:
        v = _numeric_view(df, c)
        lo, hi = F.col(f"__min_{c}"), F.col(f"__max_{c}")
        frac = F.coalesce(
            F.when(hi > lo, (v - lo) / (hi - lo)).otherwise(F.lit(0.0)),
            F.lit(0.0),
        )
        normed.append(F.round(frac * F.lit(scale)).cast("long"))
    keyed = staged.withColumn("__z", interleave_bits(normed, bits)).drop(
        *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols]
    )
    return keyed, "__z"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int,
    bits: int | None = None,
) -> None:
    """Write parquet z-ordered on ``cols``: one range repartition on the
    Morton key + in-partition sort, so every output file covers a compact
    Z-curve segment — tight min/max on EVERY clustered column. The key is
    dropped from the files (it is a layout device, not data)."""
    keyed, z = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(num_files, F.col(z))
        .sortWithinPartitions(z)
        .drop(z)
        .write.mode("overwrite")
        .parquet(path)
    )
