"""Range / interval joins: banded (bucketed) overlap joins that scale.

The naive interval-overlap join is a theta join (``l.start <= r.end AND
r.start <= l.end``) — Spark can only execute that as a broadcast
nested-loop or cartesian product, O(|L|·|R|) at any cluster size. The
banded strategy turns it into an EQUI join Catalyst can shuffle-hash:

1. chop the number line into fixed-width buckets;
2. each interval emits one row per bucket it touches (``sequence`` +
   ``explode`` — map-side, no shuffle);
3. equi-join on (keys…, bucket) — co-partitioned, AQE-skew-splittable;
4. keep pairs that truly overlap, and keep each pair ONCE by accepting
   it only in the FIRST bucket both intervals share —
   ``greatest(floor(l.start/w), floor(r.start/w))`` — so no distinct
   pass is needed (the dedup is a map-side predicate, not a shuffle).

Skew/scale guards:
- bucket fan-out is ``span/width + 1`` rows per interval — pick
  ``bucket_width`` near the TYPICAL span so fan-out is O(1). Intervals
  spanning more than ``long_span_buckets`` buckets would explode the
  band index, so they are split out and joined by the plain theta
  predicate instead (with equi keys when given): the assumption —
  asserted nowhere but documented here — is that pathological-length
  intervals are RARE (calendar outliers, open-ended sessions), so the
  fallback side stays broadcast-small. The two paths partition the
  pair space exactly: short×short (banded) ∪ long×all ∪ short×long.
- with ``on`` keys the band join is additionally keyed, so group
  cardinality bounds the worst-case pair count per bucket.

Reference surface: the reference engine's analytic joins are plain SQL
theta joins executed in-process (app.py query runner); this module is
the additive distributed-scale counterpart.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket(col: Column, width: float) -> Column:
    return F.floor(col / F.lit(width)).cast("long")


def _grouped_arrow_fn(
    keys: list[str],
    l_items: list[str],
    r_items: list[str],
    ls: str,
    le: str,
    rs: str,
    re_: str,
    self_join: bool,
    max_candidates: int = 4_000_000,
):
    """Build the mapInArrow function for ``strategy="grouped_arrow"``.

    Input batches arrive key-contiguous (the caller established hash
    partitioning + an in-partition sort on the keys, plus ``__side`` for
    two-sided joins). Groups may straddle Arrow batch boundaries, so the
    tail group of every batch is carried into the next one and flushed
    at end of partition. Inside a group, ALL ordered candidate pairs are
    enumerated with numpy index arrays over the group's SHARED column
    buffers — the per-pair array copy that sank the JVM ``grouped``
    strategy (unsafe-row format has no array sharing) never happens; the
    only per-pair materialization is the final ``take`` of surviving
    pairs. ``max_candidates`` chunks the enumeration (at group-row
    granularity on the left index) so peak memory stays bounded even for
    groups near the routing cap.

    Null semantics mirror the equi-join paths exactly: bounds are read
    as float64 with nulls as NaN, and every NaN comparison is False, so
    a null-bounded interval pairs with nothing — same as the banded
    join's three-valued overlap predicate. (Bounds are numeric by the
    operator contract; integral bounds ride through float64 here just as
    they ride through double division in the banded bucketing.)
    """

    def fn(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        key_cols = list(keys)

        def change_flags(tbl: "pa.Table"):
            # bool numpy array, True where row i starts a new key group
            # (row 0 excluded — callers add it). Keys are non-null by
            # construction (filtered upstream); fill_null(False) is
            # belt-and-braces for the slice compare.
            n = tbl.num_rows
            out = np.zeros(max(n - 1, 0), dtype=bool)
            for k in key_cols:
                col = tbl.column(k).chunk(0)
                neq = pc.fill_null(
                    pc.not_equal(col.slice(1, n - 1), col.slice(0, n - 1)),
                    False,
                )
                out |= neq.to_numpy(zero_copy_only=False).astype(bool)
            return out

        def f64(arr: "pa.Array"):
            a = pc.cast(arr, pa.float64())
            if a.null_count:
                a = pc.fill_null(a, float("nan"))
            return a.to_numpy(zero_copy_only=False)

        def emit(tbl: "pa.Table"):
            n = tbl.num_rows
            if n == 0:
                return
            flags = change_flags(tbl)
            starts = np.concatenate(([0], np.flatnonzero(flags) + 1))
            sizes = np.diff(np.append(starts, n))
            s_l = f64(tbl.column(ls).chunk(0))
            e_l = f64(tbl.column(le).chunk(0))
            if self_join:
                s_r, e_r = s_l, e_l
                # every row is a LEFT row paired against its whole group
                row_cnt = np.repeat(sizes, sizes)
                row_off = np.repeat(starts, sizes)
            else:
                s_r = f64(tbl.column(rs).chunk(0))
                e_r = f64(tbl.column(re_).chunk(0))
                # rows are sorted (keys, __side): left block then right
                # block inside each group. Left rows pair against the
                # right block; right rows contribute no pairs as LEFT.
                side = tbl.column("__side").chunk(0).to_numpy(
                    zero_copy_only=False
                )
                gidx = np.repeat(np.arange(starts.size), sizes)
                n_left = np.bincount(
                    gidx, weights=(side == 0), minlength=starts.size
                ).astype(np.int64)
                row_cnt = np.where(
                    side == 0, np.repeat(sizes - n_left, sizes), 0
                ).astype(np.int64)
                row_off = np.repeat(starts + n_left, sizes)
            csum = np.cumsum(row_cnt)
            out_cols = [tbl.column(c).chunk(0) for c in key_cols]
            l_cols = [tbl.column(c).chunk(0) for c in l_items]
            # self-join: right-side VALUES come from the left columns —
            # only the output names carry the right suffix
            r_cols = [
                tbl.column(c).chunk(0)
                for c in (l_items if self_join else r_items)
            ]
            lo = 0
            base = 0
            while lo < n:
                hi = int(np.searchsorted(csum, base + max_candidates)) + 1
                hi = min(max(hi, lo + 1), n)
                cnt = row_cnt[lo:hi]
                total = int(csum[hi - 1] - base)
                base = int(csum[hi - 1])
                if total == 0:
                    lo = hi
                    continue
                left = np.repeat(np.arange(lo, hi, dtype=np.int64), cnt)
                bs = np.concatenate(([0], np.cumsum(cnt)[:-1]))
                right = (
                    np.arange(total, dtype=np.int64)
                    - np.repeat(bs, cnt)
                    + np.repeat(row_off[lo:hi], cnt)
                )
                mask = (s_l[left] <= e_r[right]) & (s_r[right] <= e_l[left])
                li = pa.array(left[mask], type=pa.int64())
                ri = pa.array(right[mask], type=pa.int64())
                arrays = [c.take(li) for c in out_cols]
                arrays += [c.take(li) for c in l_cols]
                arrays += [c.take(ri) for c in r_cols]
                yield pa.RecordBatch.from_arrays(
                    arrays, names=[*key_cols, *l_items, *r_items]
                )
                lo = hi

        carry = None
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            if carry is not None:
                tbl = pa.concat_tables([carry, tbl])
            tbl = tbl.combine_chunks()
            n = tbl.num_rows
            if n == 0:
                carry = None
                continue
            flags = change_flags(tbl)
            idx = np.flatnonzero(flags)
            split = int(idx[-1]) + 1 if idx.size else 0
            head, carry = tbl.slice(0, split), tbl.slice(split)
            # slices of a combined table are still single-chunk views
            yield from emit(head)
        if carry is not None and carry.num_rows:
            yield from emit(carry.combine_chunks())

    return fn


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    bucket_width: float,
    on: list[str] | None = None,
    left_bounds: tuple[str, str] = ("start", "end"),
    right_bounds: tuple[str, str] = ("start", "end"),
    right_suffix: str = "_r",
    long_span_buckets: int | None = 64,
    strategy: str = "banded",
    share_scan: bool = False,
    keyed_join: str = "sort_merge",
    banded_join: str = "sort_merge",
    persist_handles: list | None = None,
    grouped_max_size: int | None = 4096,
) -> DataFrame:
    """Inner join of interval pairs that OVERLAP (closed intervals:
    ``l.start <= r.end AND r.start <= l.end``), optionally also equi-keyed
    on ``on``. Bounds columns are numeric (cast dates to epoch days /
    timestamps to epoch seconds first). Right-side non-key columns that
    clash with left names come back suffixed with ``right_suffix``.

    Each surviving pair is emitted exactly once (first-common-bucket
    predicate — see module docstring), so downstream needs no dedup.

    ``long_span_buckets=None`` disables the long-interval split: the
    banded path is CORRECT for any span (the split is purely a cost
    guard against band fan-out), so callers whose spans are bounded by
    construction (e.g. span <= data-model constant << width *
    long_span_buckets) skip the two fallback join branches and their
    extra input scans entirely — one banded join, one scan per side.

    ``strategy="keyed"`` (requires ``on``) skips banding entirely: a
    plain hash equi-join on the keys with the overlap predicate as a
    post-join filter — DuckDB's plan for the same query. This is the
    RIGHT plan when key-group cardinality is bounded (per-group pair
    count ~ g² with small g: the join itself limits the blowup, and
    banding only adds explode fan-out + a wider join key on top).
    Measured at sf3 on the 18M-interval (partkey, suppkey)-keyed
    self-join (~7-row groups): banded 11.4 s -> keyed 3.3 s, results
    identical. Banding remains the default because it is the only plan
    that scales when there are NO keys (an unkeyed theta join is a
    cartesian product) or when a key group can be corpus-sized.

    ``strategy="grouped"`` (requires ``on``; round 14) replaces the
    banded SHORT×SHORT engine with per-key interval lists: one
    ``collect_list`` shuffle builds the groups, then pairs are
    enumerated map-side inside each list (the cooccurrence generator
    pattern) and overlap-filtered — no band explode, no join exchange
    on the pair stream, and for a self-join no second scan of the
    input. Span length is irrelevant inside a group, so the engine is
    insensitive to bucket_width; the ``long_span_buckets`` theta legs
    are kept unchanged (they bound the BANDED fallback and keep the
    three-way pair-space partition intact). ``grouped_max_size`` guards
    the quadratic in-list blowup: key groups larger than the cap route
    to the banded engine (a group is entirely small or entirely big and
    pairs only exist within a group, so the two legs partition the pair
    space exactly); ``None`` trusts the caller's data model. MEASURED
    AND NOT ADOPTED for the sf3 spans self-join (the r13 verdict-#7
    experiment, interleaved same-session A/B): grouped 12.8-16.3 s vs
    banded 6-7.4 s — the in-list enumeration copies the group array
    into every outer pair row (unsafe-row format has no array sharing)
    and emits BOTH pair orderings to honor the operator contract, so
    its streamed volume exceeds the band-colocated pair stream it
    replaces whenever typical spans are narrow relative to
    bucket_width. Kept opt-in for the shape it fits: wide/irregular
    span distributions where band fan-out explodes (grouped is
    span-insensitive) and group lists are small.

    ``share_scan``: the banded + long-span layout reads LEFT three times
    (short band, short theta probe, long build) and RIGHT three times —
    six scans of the source for a self-join. With ``share_scan=True``
    each input is persisted ONCE (MEMORY_AND_DISK — columnar
    InMemoryTableScan re-reads; a self-join where ``right is left``
    persists a single relation) and every leg reads the cache. Opt-in
    because the caller must judge that its projected interval relation
    fits cluster storage (spills to disk past memory; project to the
    key/bound columns BEFORE calling). The round-13 decomposition
    (tools/decompose_rangejoin.py, BENCH_NOTES r13): persist+width
    retune took the sf3 driver query 11.6 -> 5.4 s; the same
    materialization as a localCheckpoint measured 19.6 s — checkpoint
    blocks are row-serialized and this relation is read 6x (the
    pagerank lesson). No-op under strategy="keyed" or
    long_span_buckets=None (each side is read once there).

    ``keyed_join="shuffle_hash"`` (keyed strategy only): hash instead of
    sort-merge — the overlap post-filter consumes the join unordered, so
    SMJ's two full sorts are pure overhead whenever the per-partition
    build fits memory (Spark >=3.2 SHJ spills). Measured sf3 on the
    18M-interval keyed self-join: 3.92 -> 2.74 s, rows identical. Stays
    opt-in because forcing a hash build on an arbitrary right side is
    the caller's memory call (the banded-leg SHJ experiment OOM'd an 8g
    heap at 32 partitions — widen exchanges first when the build side is
    exploded or huge).

    Cache lifetime under ``share_scan=True``: the persists are NOT
    unpersisted by this function (the join is lazy — releasing before
    the caller materializes would defeat the sharing), so each DISTINCT
    input plan pins a CacheManager entry until session end. CacheManager
    deduplicates by canonical plan, so re-running the same query does
    not accumulate copies, but long sessions joining many distinct
    relations should pass ``persist_handles=[]``: the persisted
    DataFrames are appended to it, and the caller unpersists them once
    results are materialized (r13 advice)."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    if strategy not in ("banded", "keyed", "grouped", "grouped_arrow"):
        raise ValueError(
            "strategy must be 'banded', 'keyed', 'grouped' or "
            f"'grouped_arrow', got {strategy!r}"
        )
    if strategy in ("keyed", "grouped", "grouped_arrow") and not on:
        raise ValueError(f"strategy={strategy!r} requires equi keys (on=...)")
    if keyed_join not in ("sort_merge", "shuffle_hash"):
        raise ValueError(
            f"keyed_join must be 'sort_merge' or 'shuffle_hash', got {keyed_join!r}"
        )
    if banded_join not in ("sort_merge", "shuffle_hash"):
        raise ValueError(
            f"banded_join must be 'sort_merge' or 'shuffle_hash', got {banded_join!r}"
        )
    if grouped_max_size is not None and grouped_max_size < 1:
        raise ValueError("grouped_max_size must be >= 1 (or None to disable)")
    on = list(on or [])
    ls, le = left_bounds
    rs, re_ = right_bounds
    self_join = right is left

    if (
        share_scan
        and strategy in ("banded", "grouped", "grouped_arrow")
        and long_span_buckets is not None
    ):
        from pyspark import StorageLevel

        left = left.persist(StorageLevel.MEMORY_AND_DISK)
        right = left if self_join else right.persist(StorageLevel.MEMORY_AND_DISK)
        if persist_handles is not None:
            persist_handles.append(left)
            if not self_join:
                persist_handles.append(right)

    # suffix right-side columns that clash (keys keep their names)
    clash = (set(left.columns) & set(right.columns)) - set(on)
    renames = {c: c + right_suffix for c in right.columns if c in clash}
    right = right.select(
        *[F.col(c).alias(renames.get(c, c)) for c in right.columns]
    )
    rs, re_ = renames.get(rs, rs), renames.get(re_, re_)

    overlap = (F.col(ls) <= F.col(re_)) & (F.col(rs) <= F.col(le))

    if strategy == "keyed":
        if keyed_join == "shuffle_hash":
            right = right.hint("shuffle_hash")
        return left.join(right, on=on).filter(overlap)

    def split(df: DataFrame, s: str, e: str):
        if long_span_buckets is None:
            return df, None
        span_buckets = _bucket(F.col(e), bucket_width) - _bucket(
            F.col(s), bucket_width
        )
        short = df.filter(span_buckets < long_span_buckets)
        long = df.filter(span_buckets >= long_span_buckets)
        return short, long

    l_short, l_long = split(left, ls, le)
    r_short, r_long = split(right, rs, re_)

    def banded_leg(ldf: DataFrame, rdf: DataFrame) -> DataFrame:
        # banded engine for a short×short pair space: band explode + equi
        # join + first-common-bucket dedup (module docstring)
        lb = ldf.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    _bucket(F.col(ls), bucket_width), _bucket(F.col(le), bucket_width)
                )
            ),
        )
        rb = rdf.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    _bucket(F.col(rs), bucket_width), _bucket(F.col(re_), bucket_width)
                )
            ),
        )
        first_common = F.greatest(
            _bucket(F.col(ls), bucket_width), _bucket(F.col(rs), bucket_width)
        )
        if banded_join == "shuffle_hash":
            # the overlap + first-common-bucket post-filter consumes the
            # join UNORDERED, so sort-merge's two full sorts of the
            # exploded band streams are pure overhead whenever the
            # per-partition build fits memory (the keyed strategy's r13
            # lesson, applied to the banded engine in r15). Opt-in: the
            # build side is the EXPLODED band relation — band fan-out
            # multiplies it, so callers must have sized bucket_width
            # (fan-out ~1) and their exchanges first (the r13 W=16
            # experiment OOM'd exactly here).
            rb = rb.hint("shuffle_hash")
        return (
            lb.join(rb, on=[*on, "__bucket"])
            .filter(overlap & (F.col("__bucket") == first_common))
            .drop("__bucket")
        )

    if strategy == "grouped":
        # short×short via per-key interval lists: ONE shuffle builds the
        # group lists, pairs are enumerated map-side inside each list (the
        # cooccurrence generator pattern) — no band explode, no join
        # exchange on the pair stream. Oversized groups (quadratic in-list
        # blowup) route to the banded engine; groups are entirely small or
        # entirely big, and pairs only exist WITHIN a key group, so the
        # two legs partition the short×short pair space exactly. NULL-key
        # rows are excluded up front to mirror equi-join semantics (a
        # NULL key never joins on any path).
        l_items = [c for c in left.columns if c not in on]
        nn = l_short
        for k_ in on:
            nn = nn.filter(F.col(k_).isNotNull())
        g = nn.groupBy(*on).agg(F.collect_list(F.struct(*l_items)).alias("__g"))
        if grouped_max_size is not None:
            g_small = g.filter(F.size("__g") <= grouped_max_size)
            big_l = g.filter(F.size("__g") > grouped_max_size).select(
                *on, F.explode("__g").alias("__x")
            )
            big_l = big_l.select(
                *on, *[F.col("__x").getField(c).alias(c) for c in l_items]
            )
        else:
            g_small, big_l = g, None
        if self_join:
            ex = g_small.select(*on, "__g", F.explode("__g").alias("__a"))
            pp = ex.select(*on, "__a", F.explode("__g").alias("__b"))
            sel = [*[F.col(k_) for k_ in on]]
            sel += [F.col("__a").getField(c).alias(c) for c in l_items]
            sel += [
                F.col("__b").getField(c).alias(renames.get(c, c)) for c in l_items
            ]
            shortshort = pp.select(*sel).filter(overlap)
        else:
            paired = r_short.join(g_small, on=on)
            pp = paired.select(*r_short.columns, F.explode("__g").alias("__a"))
            sel = [*[F.col(k_) for k_ in on]]
            sel += [F.col("__a").getField(c).alias(c) for c in l_items]
            sel += [F.col(c) for c in r_short.columns if c not in on]
            shortshort = pp.select(*sel).filter(overlap)
        if big_l is not None:
            big_r = (
                big_l.select(
                    *on, *[F.col(c).alias(renames.get(c, c)) for c in l_items]
                )
                if self_join
                else r_short
            )
            shortshort = shortshort.unionByName(banded_leg(big_l, big_r))
        banded = shortshort
    elif strategy == "grouped_arrow":
        # short×short via ONE key-clustered stage + Arrow pair
        # enumeration (round 15, the round-14 verdict's retry of the
        # grouped idea at the Arrow layer): a single exchange
        # establishes hash partitioning on the keys, a window count
        # sizes every group in the same pass (its sort makes groups
        # contiguous), and a mapInArrow stage enumerates each group's
        # candidate pairs with shared numpy index arrays — the per-pair
        # group-array copy that made the JVM "grouped" strategy 2x
        # SLOWER than banded (unsafe rows cannot share arrays) does not
        # exist in this representation. No band explode, no join
        # exchange on the pair stream. Oversized groups (>
        # grouped_max_size rows across both sides, per key) route to
        # the banded engine, which prunes candidate pairs by bucket
        # colocation — the right plan when one giant group's intervals
        # are spread over time; routing is per KEY, so the two legs
        # partition the pair space exactly. NULL-key rows are excluded
        # up front to mirror equi-join semantics.
        from pyspark.sql.types import StructField, StructType

        l_items = [c for c in left.columns if c not in on]
        r_items = [c for c in right.columns if c not in on]
        nn_l = l_short
        for k_ in on:
            nn_l = nn_l.filter(F.col(k_).isNotNull())
        if self_join:
            u = nn_l
        else:
            nn_r = r_short
            for k_ in on:
                nn_r = nn_r.filter(F.col(k_).isNotNull())
            u = nn_l.select(
                *on,
                F.lit(0).alias("__side"),
                *[F.col(c) for c in l_items],
                *[
                    F.lit(None).cast(right.schema[c].dataType).alias(c)
                    for c in r_items
                ],
            ).unionByName(
                nn_r.select(
                    *on,
                    F.lit(1).alias("__side"),
                    *[
                        F.lit(None).cast(left.schema[c].dataType).alias(c)
                        for c in l_items
                    ],
                    *[F.col(c) for c in r_items],
                )
            )
        if grouped_max_size is not None:
            w = Window.partitionBy(*on)
            sized = u.withColumn("__gsz", F.count(F.lit(1)).over(w))
            small = sized.filter(F.col("__gsz") <= grouped_max_size).drop("__gsz")
            big = sized.filter(F.col("__gsz") > grouped_max_size).drop("__gsz")
        else:
            small = u.repartition(*on).sortWithinPartitions(*on)
            big = None
        if not self_join:
            # left block before right block inside each key group (the
            # window's sort covers the keys; __side needs one more sort
            # level, still inside the same stage — no extra exchange)
            small = small.sortWithinPartitions(*on, "__side")
        fields = [StructField(k_, left.schema[k_].dataType, True) for k_ in on]
        fields += [StructField(c, left.schema[c].dataType, True) for c in l_items]
        fields += [StructField(c, right.schema[c].dataType, True) for c in r_items]
        pair_fn = _grouped_arrow_fn(
            on, l_items, r_items, ls, le, rs, re_, self_join
        )
        shortshort = small.mapInArrow(pair_fn, StructType(fields))
        if big is not None:
            if self_join:
                big_l = big
                big_r = big.select(
                    *on, *[F.col(c).alias(renames.get(c, c)) for c in l_items]
                )
            else:
                big_l = big.filter(F.col("__side") == 0).select(*on, *l_items)
                big_r = big.filter(F.col("__side") == 1).select(*on, *r_items)
            shortshort = shortshort.unionByName(banded_leg(big_l, big_r))
        banded = shortshort
    else:
        banded = banded_leg(l_short, r_short)

    # theta fallback: long×all plus short×long. The LONG side is the
    # documented-rare one, so it is the broadcast side — the plan
    # becomes BroadcastNestedLoopJoin with a small build, never a
    # CartesianProduct of two big relations (with keys Catalyst still
    # gets an equi component to hash on instead)
    def theta(big: DataFrame, rare: DataFrame, rare_is_right: bool) -> DataFrame:
        a, b = (big, F.broadcast(rare)) if rare_is_right else (
            F.broadcast(rare),
            big,
        )
        if on:
            return a.join(b, on=on).filter(overlap)
        return a.join(b, overlap)

    if long_span_buckets is None:
        return banded
    out = banded
    for part in (
        theta(right, l_long, rare_is_right=False),
        theta(l_short, r_long, rare_is_right=True),
    ):
        out = out.unionByName(part)
    return out


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    bucket_width: float,
    point_col: str,
    bounds: tuple[str, str] = ("start", "end"),
    on: list[str] | None = None,
    right_suffix: str = "_r",
    long_span_buckets: int | None = 64,
) -> DataFrame:
    """Join each point to every interval CONTAINING it (closed bounds).
    A point lives in exactly one bucket, so no pair dedup is needed —
    only the interval side explodes. Same long-interval theta fallback
    (and same ``long_span_buckets=None`` banded-only bypass for
    bounded-span callers) as ``interval_overlap_join``. Interval-side
    non-key columns that clash with point names come back suffixed
    with ``right_suffix`` (same contract as the overlap join)."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    on = list(on or [])
    s, e = bounds

    clash = (set(points.columns) & set(intervals.columns)) - set(on)
    renames = {c: c + right_suffix for c in intervals.columns if c in clash}
    intervals = intervals.select(
        *[F.col(c).alias(renames.get(c, c)) for c in intervals.columns]
    )
    s, e = renames.get(s, s), renames.get(e, e)
    contains = (F.col(s) <= F.col(point_col)) & (F.col(point_col) <= F.col(e))

    if long_span_buckets is None:
        i_short, i_long = intervals, None
    else:
        span_buckets = _bucket(F.col(e), bucket_width) - _bucket(
            F.col(s), bucket_width
        )
        i_short = intervals.filter(span_buckets < long_span_buckets)
        i_long = intervals.filter(span_buckets >= long_span_buckets)

    pb = points.withColumn("__bucket", _bucket(F.col(point_col), bucket_width))
    ib = i_short.withColumn(
        "__bucket",
        F.explode(
            F.sequence(_bucket(F.col(s), bucket_width), _bucket(F.col(e), bucket_width))
        ),
    )
    banded = pb.join(ib, on=[*on, "__bucket"]).filter(contains).drop("__bucket")
    if long_span_buckets is None:
        return banded
    if on:
        fallback = points.join(i_long, on=on).filter(contains)
    else:
        # long intervals are the documented-rare side -> broadcast build
        fallback = points.join(F.broadcast(i_long), contains)
    return banded.unionByName(fallback)
