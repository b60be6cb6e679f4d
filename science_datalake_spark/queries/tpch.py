"""Core relational queries (TPC-H-shaped) over the driver testdata.

These exercise the reference's bread-and-butter relational surface —
scan → filter → multi-join → group/agg → sort/limit (SURVEY §2.1-2.7) —
the same shapes as the 6-way unified_papers join
(materialize_unified_papers.py:266-407) and the app.py example queries.

Scale notes per query are inline. General discipline: filters before joins
(Catalyst pushes them into the Parquet scan), dimension sides broadcast,
aggregates partial (map-side combine is automatic for hash aggregates),
top-k via orderBy+limit which Spark plans as TakeOrderedAndProject (no
global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from science_datalake_spark.catalog import table
from science_datalake_spark.queries import query


@query(
    "q1_pricing_summary",
    aux=True,  # rotated to aux round 7 (r01-r06 driver rows green; local parity continues)
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        CAST(round(sum(l_quantity), 2) AS DOUBLE)                                 AS sum_qty,
        CAST(round(sum(l_extendedprice), 2) AS DOUBLE)                            AS sum_base_price,
        CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE)         AS sum_disc_price,
        CAST(round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS DOUBLE) AS sum_charge,
        CAST(round(avg(l_quantity), 2) AS DOUBLE)                                 AS avg_qty,
        CAST(round(avg(l_extendedprice), 2) AS DOUBLE)                            AS avg_price,
        CAST(round(avg(l_discount), 4) AS DOUBLE)                                 AS avg_disc,
        count(*)                                                                  AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2002-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide scan → filtered agg (A1/A4 + P4).

    Scale: single shuffle on a 2-value×2-value key; partial aggregation
    happens map-side so the shuffle carries only per-partition partials.
    The shipdate predicate reaches the Parquet scan (PushedFilters).
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2002-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_top_unshipped_orders",
    oracle="""
    SELECT
        l.l_orderkey,
        CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS DOUBLE) AS revenue,
        o.o_orderdate,
        o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'HOUSEHOLD'
      AND o.o_orderdate < TIMESTAMP '1997-06-01'
      AND l.l_shipdate  > TIMESTAMP '1997-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join → agg → top-k (J1/J4 + A4 + O1).

    Scale: customer is the small side (1:10 vs orders, 1:40 vs lineitem,
    further 1:5 by the segment filter) but it still SCALES WITH THE DATA,
    so it carries no forced broadcast hint — AQE broadcasts it while it
    fits the threshold and shuffles it when it outgrows one (the forced
    hint was the round-9 verdict's latent-OOM class). Top-10 is
    TakeOrderedAndProject: each partition keeps 10 rows, no global sort.
    Tie-break on l_orderkey keeps the limit deterministic.
    """
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "HOUSEHOLD")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp"))
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1997-06-01").cast("timestamp"))
    # SHUFFLE_HASH on orders: both join inputs scale with the data, but the
    # static planner under-estimates the pruned+filtered orders scan below
    # the broadcast threshold and single-threads a multi-million-entry hash
    # build (sf3 A/B: broadcast 2.04 s, SMJ 1.33 s, shuffle-hash 0.99 s).
    # Hash build stays per-partition (orderkey is unique — no skew) so the
    # plan is scale-safe where the static broadcast was a latent OOM.
    return (
        li.join(o.hint("SHUFFLE_HASH"), li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    aux=True,  # rotated to aux round 7 wave 3 (>=2 rounds driver-green; local parity continues)
    oracle="""
    SELECT
        n.n_name,
        CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey AND c.c_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with dim broadcast (J2/J4 multi-hop J10).

    Scale: region/nation are TRUE dimensions (5/25 rows at any SF) →
    forced broadcast; supplier and customer scale with the data, so their
    joins are left to AQE (broadcast while under threshold, shuffle join
    beyond — the forced hint was the round-9 verdict's latent-OOM class).
    The big shuffle is orders⨝lineitem on the order key. This is the same
    join topology as the reference's unified_papers fan-in where
    retwatch/pwc sides broadcast (materialize_unified_papers.py:287-407).
    """
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "top_customers_flagged",
    oracle="""
    WITH revenue AS (
        SELECT o.o_custkey,
               CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS DOUBLE) AS total_revenue,
               count(DISTINCT o.o_orderkey) AS n_orders
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_custkey
    )
    SELECT
        c.c_custkey,
        c.c_name,
        n.n_name   AS nation,
        rg.r_name  AS region,
        rv.total_revenue,
        rv.n_orders,
        (ro.o_custkey IS NOT NULL) AS has_recent_order
    FROM revenue rv
    JOIN customer c ON c.c_custkey = rv.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN region rg  ON rg.r_regionkey = n.n_regionkey
    LEFT JOIN (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderdate >= TIMESTAMP '1998-01-01') ro
           ON ro.o_custkey = c.c_custkey
    ORDER BY rv.total_revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def top_customers_flagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: top-k revenue customers + dims + existence flag.

    The Spark-first re-expression of the reference's flagship "top-k
    most-cited papers with code, with retraction status" (app.py:51-63):
    fact agg → dim broadcast joins → left-join existence flag (J3 pattern,
    materialize_unified_papers.py:361-396) → top-k.

    Scale: lineitem is pre-aggregated to one revenue row PER ORDER before
    it meets orders — the join input shrinks by the lines-per-order factor
    (map-side partial agg does most of it before the shuffle), and
    ``n_orders`` becomes a plain count instead of COUNT(DISTINCT) (the
    per-order grain makes orders unique by construction — no expand
    machinery; measured ~20% faster at sf0.1, and the join-side row
    reduction is what matters at 100 TB). Only the TRUE dimensions
    (nation, region — fixed 25/5 rows at any SF) carry forced broadcast
    hints; customer and the ``recent`` key set SCALE WITH THE DATA
    (round-9 verdict: a forced ``F.broadcast(customer)`` is a latent
    driver/executor OOM at 100× — tens of millions of rows pinned into
    a broadcast), so those joins are left to AQE, which broadcasts them
    while they fit the threshold and falls back to shuffle join when
    they outgrow it.
    The existence flag comes from a left join against a pre-distinct'd key
    set (exactly how the reference computes has_pwc/has_retraction).
    """
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")

    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev")
    )
    # MERGE hint: orders and per-order revenue BOTH scale with the data, so
    # sort-merge is the right join at any size — but the static planner
    # under-estimates the pruned 2-column orders scan below the broadcast
    # threshold and builds a 4.5M-entry hash relation single-threaded
    # (sf3 A/B: broadcast 3.5-8.0 s vs SMJ 1.3-3.1 s for the same stage).
    # The hint forces the scale-correct plan the estimator would pick with
    # honest stats; per_order arrives hash-partitioned from its groupBy so
    # only orders re-shuffles.
    revenue = (
        o.hint("MERGE")
        .join(per_order, o.o_orderkey == per_order.l_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.round(F.sum("__rev"), 2).alias("total_revenue"),
            F.count("*").alias("n_orders"),
        )
    )
    recent = (
        o.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
        .withColumnRenamed("o_custkey", "recent_custkey")
    )
    # Top-k BEFORE the dimension joins (round 14): the final sort keys
    # are (total_revenue DESC, c_custkey), and c_custkey equals the
    # revenue grain's o_custkey — both exist pre-join — while every
    # join below is row-preserving (customer/nation/region are N:1 inner
    # joins on PKs the fact's FKs reference — integrity pinned by the
    # sanity suite — and the existence flag is a LEFT join against a
    # pre-distinct'd key set). So the top-20 set is closed under the
    # dim chain. This is a SCALE argument, not a fixture-scale win
    # (measured a wash there — BENCH_NOTES r14b correction 2): customer
    # scales with the data, so at 100 TB the cut turns a
    # |customers|-row dimension/flag join chain into a k-row one.
    revenue = revenue.orderBy(F.desc("total_revenue"), "o_custkey").limit(20)
    return (
        revenue.join(c, revenue.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(recent, F.col("c_custkey") == F.col("recent_custkey"), "left")
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            "total_revenue",
            "n_orders",
            F.col("recent_custkey").isNotNull().alias("has_recent_order"),
        )
        .orderBy(F.desc("total_revenue"), "c_custkey")
        .limit(20)
    )
