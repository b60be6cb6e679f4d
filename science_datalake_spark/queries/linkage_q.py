"""Linkage queries: fuzzy Jaro-Winkler join and embedding-kNN best-match,
bound to the driver testdata (SURVEY §2.3 J6-J8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from science_datalake_spark.catalog import table
from science_datalake_spark.operators.linkage import fuzzy_label_join, knn_embedding_join
from science_datalake_spark.queries import query


@query(
    "linkage_fuzzy_jw",
    oracle="""
    SELECT s.s_suppkey, c.c_custkey,
           CAST(round(jaro_winkler_similarity(lower(s.s_name), lower(c.c_name)), 6) AS DOUBLE)
               AS similarity
    FROM (SELECT * FROM supplier WHERE s_suppkey < 100) s
    CROSS JOIN (SELECT * FROM customer WHERE c_custkey < 100) c
    WHERE jaro_winkler_similarity(lower(s.s_name), lower(c.c_name)) >= 0.75
    ORDER BY s_suppkey, c_custkey
    """,
)
def linkage_fuzzy_jw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: guarded fuzzy similarity θ-join. The pandas-UDF Jaro-Winkler is
    bit-identical to DuckDB's jaro_winkler_similarity, so this is a strict
    oracle check of the custom operator (build_ontology_linkage.py:126-161).
    """
    s = table(spark, sf_dir, "supplier").filter(F.col("s_suppkey") < 100)
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    # right_count: key-range filter bounds the right side by construction,
    # so the guard's probe job is skipped (catalog-statistics pattern)
    joined = fuzzy_label_join(s, c, "s_name", "c_name", threshold=0.75, right_count=99)
    return (
        joined.select("s_suppkey", "c_custkey", F.round("similarity", 6).alias("similarity"))
        .orderBy("s_suppkey", "c_custkey")
    )


@query(
    "linkage_knn_best_match",
    aux=True,  # rested round 10 (>=2 rounds driver-green; eval_alignment_strata runs the identical kNN best-match pipeline as its input)
    oracle="""
    WITH l AS (SELECT vec_id AS left_id, embedding::DOUBLE[] AS lv
               FROM embeddings WHERE vec_id < 10),
    r AS (SELECT vec_id AS right_id, embedding::DOUBLE[] AS rv
          FROM embeddings WHERE vec_id >= 10),
    scored AS (
        SELECT left_id, right_id,
               CAST(round(list_dot_product(lv, rv) /
                    sqrt(list_dot_product(lv, lv) * list_dot_product(rv, rv)), 6) AS DOUBLE)
                   AS similarity
        FROM l CROSS JOIN r
    ),
    kept AS (SELECT * FROM scored WHERE similarity >= 0.2),
    best AS (
        SELECT left_id, right_id, similarity,
               row_number() OVER (PARTITION BY left_id
                                  ORDER BY similarity DESC, right_id) AS rn
        FROM kept
    )
    SELECT left_id, right_id, similarity FROM best WHERE rn = 1
    ORDER BY left_id
    """,
)
def linkage_knn_best_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: embedding kNN linkage — cosine threshold + best-match-per-left
    (the reference's BGE/FAISS alignment as a broadcast DataFrame plan,
    build_embedding_linkage.py:496-538)."""
    e = table(spark, sf_dir, "embeddings")
    left = e.filter(F.col("vec_id") < 10)
    right = e.filter(F.col("vec_id") >= 10)
    out = knn_embedding_join(
        left, right, "vec_id", "vec_id", "embedding", "embedding", threshold=0.2
    )
    return out.select("left_id", "right_id", "similarity").orderBy("left_id")


@query(
    "eval_alignment_strata",
    # rotated INTO driver round 10 wave 1 (driver evidence derived by tools/rotation_audit.py)
    oracle="""
    WITH l AS (SELECT vec_id AS left_id, embedding::DOUBLE[] AS lv
               FROM embeddings WHERE vec_id < 40),
    r AS (SELECT vec_id AS right_id, embedding::DOUBLE[] AS rv
          FROM embeddings WHERE vec_id >= 40),
    scored AS (
        SELECT left_id, right_id,
               CAST(round(list_dot_product(lv, rv) /
                    sqrt(list_dot_product(lv, lv) * list_dot_product(rv, rv)), 6)
                    AS DOUBLE) AS s
        FROM l CROSS JOIN r
    ),
    kept AS (SELECT * FROM scored WHERE s >= 0.2),
    best AS (
        SELECT left_id, right_id, s,
               row_number() OVER (PARTITION BY left_id
                                  ORDER BY s DESC, right_id) AS rn
        FROM kept
    ),
    ann AS (
        SELECT round(least(0.6 + (s - 0.28) * 2.0, 1.0), 6) AS sim,
               CASE WHEN (left_id * 7 + right_id) % 10 < 6 THEN 'correct'
                    WHEN (left_id * 7 + right_id) % 10 < 9 THEN 'partial'
                    ELSE 'incorrect' END AS label
        FROM best WHERE rn = 1
    ),
    st AS (
        SELECT CASE WHEN sim >= 0.95 THEN 'exact'
                    WHEN sim >= 0.85 THEN 'high'
                    WHEN sim >= 0.75 THEN 'mid'
                    WHEN sim >= 0.65 THEN 'borderline'
                    ELSE 'below' END AS stratum, sim, label
        FROM ann
    ),
    blockA AS (
        SELECT 'stratum:' || stratum AS kind,
               count(*) AS n,
               CAST(sum(CASE WHEN label = 'correct' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_correct,
               CAST(sum(CASE WHEN label = 'partial' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_partial,
               CAST(sum(CASE WHEN label = 'incorrect' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_incorrect,
               CAST(round(CAST(sum(CASE WHEN label = 'correct' THEN 1 ELSE 0 END)
                               AS DOUBLE) / count(*), 4) AS DOUBLE) AS precision,
               CAST(NULL AS DOUBLE) AS recall,
               CAST(NULL AS DOUBLE) AS f1
        FROM st GROUP BY stratum
    ),
    tot AS (SELECT sum(CASE WHEN label = 'correct' THEN 1 ELSE 0 END) AS t FROM ann),
    grid AS (SELECT unnest([0.65, 0.75, 0.85, 0.95]) AS threshold),
    agg AS (
        SELECT g.threshold, count(a.sim) AS n,
               sum(CASE WHEN a.label = 'correct' THEN 1 ELSE 0 END) AS tp
        FROM grid g LEFT JOIN ann a ON a.sim >= g.threshold
        GROUP BY g.threshold
    ),
    blockB AS (
        SELECT 'thr:' || CAST(threshold AS VARCHAR) AS kind,
               n,
               CAST(NULL AS BIGINT) AS n_correct,
               CAST(NULL AS BIGINT) AS n_partial,
               CAST(NULL AS BIGINT) AS n_incorrect,
               CAST(round(CASE WHEN n > 0 THEN CAST(tp AS DOUBLE) / n
                               ELSE 0.0 END, 4) AS DOUBLE) AS precision,
               CAST(round(CASE WHEN n > 0 AND t > 0 THEN CAST(tp AS DOUBLE) / t
                               ELSE 0.0 END, 4) AS DOUBLE) AS recall,
               CAST(round(CASE WHEN (CASE WHEN n > 0 THEN CAST(tp AS DOUBLE) / n
                                          ELSE 0.0 END)
                               + (CASE WHEN n > 0 AND t > 0 THEN CAST(tp AS DOUBLE) / t
                                       ELSE 0.0 END) > 0
                          THEN 2 * (CASE WHEN n > 0 THEN CAST(tp AS DOUBLE) / n
                                         ELSE 0.0 END)
                                 * (CASE WHEN n > 0 AND t > 0 THEN CAST(tp AS DOUBLE) / t
                                         ELSE 0.0 END)
                               / ((CASE WHEN n > 0 THEN CAST(tp AS DOUBLE) / n
                                        ELSE 0.0 END)
                                + (CASE WHEN n > 0 AND t > 0 THEN CAST(tp AS DOUBLE) / t
                                        ELSE 0.0 END))
                          ELSE 0.0 END, 4) AS DOUBLE) AS f1
        FROM agg CROSS JOIN tot
    )
    SELECT * FROM blockA
    UNION ALL
    SELECT * FROM blockB
    ORDER BY kind
    """,
)
def eval_alignment_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full gold-standard evaluator shape
    (evaluate_ontology_alignment.py:259-307, round-9 verdict item 7) as
    ONE oracle-checked result: per-stratum counts + precision over the
    reference's similarity tiers, unioned with the threshold-block
    P/R/F1 at .65/.75/.85/.95 (evaluation.annotated_stratum_metrics /
    annotated_threshold_metrics — both single-aggregation plans; the
    threshold block joins the constant grid once instead of scanning
    per threshold). Input is the kNN best-match linkage output; the
    fixture has no human annotations, so the pair set carries a
    deterministic pseudo-annotation (60/30/10 correct/partial/incorrect
    by id hash) and an affine similarity stretch into the tier bands —
    both mirrored verbatim in the twin; the METRIC ARITHMETIC is what is
    under oracle check. The PR-sweep variant of the same engine is
    pinned by tests/test_ontology_graph.py against hand-computed
    values."""
    from science_datalake_spark.evaluation import (
        annotated_stratum_metrics,
        annotated_threshold_metrics,
    )
    from science_datalake_spark.operators.sampling import similarity_tiers

    e = table(spark, sf_dir, "embeddings")
    left = e.filter(F.col("vec_id") < 40)
    right = e.filter(F.col("vec_id") >= 40)
    m = knn_embedding_join(
        left, right, "vec_id", "vec_id", "embedding", "embedding", threshold=0.2
    )
    lab = (F.col("left_id") * 7 + F.col("right_id")) % 10
    ann = m.select(
        F.round(
            F.least(F.lit(0.6) + (F.col("similarity") - 0.28) * 2.0, F.lit(1.0)), 6
        ).alias("similarity"),
        F.when(lab < 6, "correct")
        .when(lab < 9, "partial")
        .otherwise("incorrect")
        .alias("label"),
    ).withColumn("stratum", similarity_tiers(F.col("similarity")))
    # The evaluator reads ann THREE times (stratum block, threshold-sweep
    # total, threshold-sweep grid join); without a cut each leg re-runs
    # the whole kNN cosine pipeline (the corpus_release lesson: score
    # once, read thrice). ann is ≤40 rows by construction (best-match
    # per left id < 40), so a localCheckpoint materializes the expensive
    # part exactly once at negligible storage. LAZY (eager=False), the
    # graph-operator pattern: query CONSTRUCTION stays job-free — the
    # first consumer's action materializes it — so timings that separate
    # plan build from execution aren't skewed by a definition-time kNN
    # job (round-12 advice).
    ann = ann.localCheckpoint(eager=False)

    a = annotated_stratum_metrics(ann).select(
        F.concat(F.lit("stratum:"), F.col("stratum")).alias("kind"),
        "n",
        "n_correct",
        "n_partial",
        "n_incorrect",
        "precision",
        F.lit(None).cast("double").alias("recall"),
        F.lit(None).cast("double").alias("f1"),
    )
    b = annotated_threshold_metrics(ann).select(
        F.concat(F.lit("thr:"), F.col("threshold").cast("string")).alias("kind"),
        "n",
        F.lit(None).cast("long").alias("n_correct"),
        F.lit(None).cast("long").alias("n_partial"),
        F.lit(None).cast("long").alias("n_incorrect"),
        "precision",
        "recall",
        "f1",
    )
    return a.unionByName(b).orderBy("kind")
