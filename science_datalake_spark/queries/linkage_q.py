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
