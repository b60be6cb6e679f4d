"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023): select pretraining documents from a large RAW pool so the selected
set matches a small TARGET distribution (e.g. high-quality English prose),
using importance weights computed on hashed n-gram bag-of-words features.

The published recipe, re-expressed Spark-first:

1. Featurize every document as a bag of hashed unigram buckets
   (``num_buckets`` total — the paper uses 10k; hashing makes the feature
   space FIXED-SIZE regardless of vocabulary, which is what makes the
   method run on 100 TB: the per-corpus feature distribution aggregates to
   at most ``num_buckets`` rows with full map-side combine).
2. Fit smoothed categorical distributions p_target / p_raw over buckets.
3. Per raw document: log importance weight = Σ_tokens
   log p_target(bucket) − log p_raw(bucket).
4. Resample without replacement via the Gumbel top-k trick: rank by
   log_weight + Gumbel noise; the top-k is a sample from the
   softmax(log_weight) distribution without replacement.

Determinism & oracle portability: both the feature hash and the Gumbel
noise derive from md5 (first 8 hex chars → uint32), never from rand() or
xxhash64 — a pure function of (data, seed) under any partitioning, and
computable verbatim by the DuckDB twin (``('0x' || substr(md5(..),1,8))
::BIGINT``).

Scale shape: two bounded aggregations (≤ num_buckets rows each, map-side
combined), then scoring. The default ``score_strategy="join"`` broadcasts
the ≤num_buckets-row ratio onto the token stream (one data-sized per-doc
shuffle); ``score_strategy="vocab"`` hashes features once per DISTINCT
token and scores through a token-keyed join. See dsir_log_weights for
the measured trade-offs — the join default stands only under proper scan
fan-out (files.openCostInBytes small enough that the map-only hash pass
parallelizes; session.SCAN_OPEN_COST_BYTES).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hashed_token_bucket(tok: F.Column, num_buckets: int) -> F.Column:
    """Oracle-portable hashed feature id: md5 first 8 hex chars as uint32,
    mod ``num_buckets``. (uint32 is non-negative, so % == pmod.)"""
    u32 = F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("bigint")
    return (u32 % num_buckets).alias("__b")


def _token_buckets(df: DataFrame, id_col: str, text_col: str, num_buckets: int) -> DataFrame:
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("__tok"),
    )
    return toks.select(id_col, hashed_token_bucket(F.col("__tok"), num_buckets))


def feature_counts(
    df: DataFrame, id_col: str, text_col: str, num_buckets: int
) -> DataFrame:
    """Hashed-unigram feature distribution: (bucket, count) — at most
    ``num_buckets`` rows, fully map-side combinable."""
    return _token_buckets(df, id_col, text_col, num_buckets).groupBy("__b").agg(
        F.count("*").alias("__ct")
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    num_buckets: int = 1024,
    alpha: float = 0.5,
    persist_tokens: bool | str = True,
    score_strategy: str = "join",
) -> DataFrame:
    """Per-raw-document DSIR log importance weight.

    Returns (id_col, n_tokens, log_weight) where
    ``log_weight = Σ_tokens [ln(ct_b+α) − ln(T+αB) − ln(cr_b+α) + ln(R+αB)]``
    with ct/cr the target/raw bucket counts, T/R the corpora token totals,
    B = num_buckets, α additive smoothing. The four-term form (instead of
    ln of a precomputed ratio) keeps each term exactly reproducible by the
    SQL twin.

    Two result-identical scoring shapes (pinned by test):

    - ``score_strategy="join"`` (default): md5 every token occurrence
      into a persisted (id, array<bucket>) relation, broadcast the ≤B-row
      ratio onto the exploded stream, sum per doc. Map-only hashing —
      immune to adversarial vocabularies, and the fastest shape whenever
      the scan fans out enough for the hash pass to parallelize.
    - ``score_strategy="vocab"``: hash features per DISTINCT token — a
      word-count aggregation (map-side-combined, zipf-compressed far
      below token count) materialized once as a small (token, count,
      bucket) relation; md5/bucketing runs once per vocabulary entry, and
      per-doc scoring joins the token stream to the vocabulary's (token,
      log-ratio) relation — SHUFFLE_HASH-hinted, never force-broadcast
      (vocabularies are data-sized in the worst case); AQE still promotes
      the join to broadcast while the vocabulary fits.

    MEASUREMENT CAVEAT (round 14, committed as a correction): vocab was
    briefly adopted as the default on an A/B whose session LACKED the
    bench's ``files.openCostInBytes`` scan fan-out — with the small-file
    scan pinned to ~2 tasks, the per-occurrence md5 chain measured as
    ~60% of the operator and the vocab dedup of that work won (sf1 1.59
    vs 2.50). Re-measured under the true session config (fan-out
    restored) the ranking INVERTS at every scale (sf0.1 1.10 vs 1.23,
    sf1 1.24 vs 1.43, sf3 1.42 vs 1.59 best-of-3 interleaved): a
    map-only pass that parallelizes beats hash-dedup + an extra join.
    The strategy choice is a function of scan parallelism, not corpus
    zipf alone.

    A third shape — collect the bounded ratio and fold map-only over the
    bucket arrays via element_at, eliminating the per-doc shuffle — was
    measured and REJECTED: higher-order-function evaluation is
    CodegenFallback (interpreted per element), and it lost ~0.3-0.5 s to
    the codegen'd broadcast-probe+hash-agg at sf1/sf3 (BENCH_NOTES
    round 14). ``dsir_score_with_model`` keeps that shape for what it is
    uniquely good at: stateless map-only scoring of NEW batches/streams
    against a frozen model.

    In the join strategy the raw corpus is needed TWICE (its feature
    distribution, then per-doc scoring); ``persist_tokens=True``
    materializes the hashed token stream ONCE into a persisted skinny
    (id, array<bucket>) relation (~8 bytes/token, MEMORY_AND_DISK blocks
    so it spills instead of OOMing) so the md5 tokenization doesn't run
    twice — the same work shape a columnar engine gets by materializing
    the twice-referenced CTE. Pass False to recompute when the token
    stream exceeds what the cluster wants to hold. The vocab strategy
    instead materializes the small vocabulary relation (consumed by both
    the bucket counts and the scoring join) and deliberately recomputes
    the split+explode token stream — cheaper than checkpointing
    corpus-sized exploded rows, since there is no per-token md5 to save.

    Cache lifetime: the materialization is a lazy ``localCheckpoint``,
    not a CacheManager persist — ContextCleaner releases the blocks once
    the query's handles are garbage-collected, so repeated scoring runs
    in one session cannot accumulate corpus-sized cache entries (the
    r11 advisor finding). TRADE-OFF (Spark's own localCheckpoint
    warning): checkpoint blocks TRUNCATE lineage, so losing an executor
    (dynamic allocation, spot preemption) between the two consumers
    makes the relation unrecoverable and FAILS the job, where a persist
    would transparently recompute. On clusters with executor churn pass
    ``persist_tokens="persist"`` to keep the recomputable
    MEMORY_AND_DISK persist instead — accepting that the CacheManager
    entry outlives the query until unpersisted (round-12 advice).
    """
    if score_strategy not in ("vocab", "join"):
        raise ValueError(
            f"score_strategy must be 'vocab' or 'join', got {score_strategy!r}"
        )
    if isinstance(persist_tokens, str) and persist_tokens != "persist":
        # any other truthy string ("Persist", "cache") would silently fall
        # through to the localCheckpoint branch, defeating the
        # executor-churn-safe mode the caller asked for (r13 advice)
        raise ValueError(
            f"persist_tokens must be a bool or 'persist', got {persist_tokens!r}"
        )
    if score_strategy == "vocab":
        return _log_weights_vocab(raw, target, id_col, text_col, num_buckets, alpha)
    rtoks_arr = raw.select(
        F.col(id_col),
        F.transform(
            F.split(F.trim(F.col(text_col)), r"\s+"),
            lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint")
            % num_buckets,
        ).alias("__bs"),
    )
    if persist_tokens == "persist":
        # executor-churn-safe mode: recomputable lineage kept (see the
        # docstring trade-off)
        from pyspark import StorageLevel

        rtoks_arr = rtoks_arr.persist(StorageLevel.MEMORY_AND_DISK)
    elif persist_tokens:
        # localCheckpoint, NOT persist: blocks default to MEMORY_AND_DISK
        # like the cache, but ContextCleaner releases them when the query's
        # handles are GC'd — a CacheManager entry would outlive the query
        # and accumulate corpus-sized cache across a long session (r11
        # advisor finding). Lazy: the first consumer's action materializes.
        rtoks_arr = rtoks_arr.localCheckpoint(eager=False)
    rtoks = rtoks_arr.select(id_col, F.explode("__bs").alias("__b"))
    tc = feature_counts(target, id_col, text_col, num_buckets)
    rc = rtoks.groupBy("__b").agg(F.count("*").alias("__ct"))
    ratio = _ratio_relation(tc, rc, num_buckets, alpha)
    scored = rtoks.join(F.broadcast(ratio), "__b")
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"), F.sum("__lr").alias("log_weight")
    )


def _ratio_relation(tc: DataFrame, rc: DataFrame, num_buckets: int, alpha: float) -> DataFrame:
    """The fitted per-bucket log ratio: full-outer join of the two ≤B-row
    count aggregates with the 1-row totals attached via broadcast."""
    t_total = tc.agg(F.sum("__ct").alias("__T"))
    r_total = rc.agg(F.sum("__ct").alias("__R"))
    return (
        tc.withColumnRenamed("__ct", "__tc")
        .join(rc.withColumnRenamed("__ct", "__rc"), "__b", "full_outer")
        .crossJoin(F.broadcast(t_total))
        .crossJoin(F.broadcast(r_total))
        .select(
            "__b",
            (
                F.log(F.coalesce(F.col("__tc"), F.lit(0)).cast("double") + F.lit(alpha))
                - F.log(F.col("__T").cast("double") + F.lit(alpha * num_buckets))
                - F.log(F.coalesce(F.col("__rc"), F.lit(0)).cast("double") + F.lit(alpha))
                + F.log(F.col("__R").cast("double") + F.lit(alpha * num_buckets))
            ).alias("__lr"),
        )
    )


def _log_weights_vocab(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    num_buckets: int,
    alpha: float,
) -> DataFrame:
    """The vocab scoring shape (see dsir_log_weights): md5/bucket once per
    DISTINCT token, score through a token-keyed join."""

    def toks(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("__tok"),
        )

    rtoks = toks(raw)
    # (token, occurrences, bucket): word-count agg, md5 per distinct token.
    # Materialized once — consumed by BOTH the bucket counts and the
    # scoring join; lazy localCheckpoint so ContextCleaner releases the
    # (vocabulary-sized, zipf-small) blocks with the query's handles.
    vb = (
        rtoks.groupBy("__tok")
        .agg(F.count("*").alias("__n"))
        .select("__tok", "__n", hashed_token_bucket(F.col("__tok"), num_buckets))
        .localCheckpoint(eager=False)
    )
    # the target leg gets the same per-distinct-token treatment (counts
    # identical to feature_counts — pinned by the mirror test); its vocab
    # relation is consumed once, so no materialization
    tc = (
        toks(target)
        .groupBy("__tok")
        .agg(F.count("*").alias("__n"))
        .select("__n", hashed_token_bucket(F.col("__tok"), num_buckets))
        .groupBy("__b")
        .agg(F.sum("__n").alias("__ct"))
    )
    rc = vb.groupBy("__b").agg(F.sum("__n").alias("__ct"))
    ratio = _ratio_relation(tc, rc, num_buckets, alpha)
    # ratio is ≤B rows by construction → bounded broadcast. The vocabulary
    # relation is NOT force-broadcast (data-sized in the worst case); it
    # carries a SHUFFLE_HASH hint instead: without it the static planner
    # broadcasts the WRONG side — it under-estimates the exploded token
    # stream from the parquet scan stats and builds a corpus-sized
    # single-threaded hash relation (measured 5.3 s vs 1.6 s at sf3, the
    # round-11 top_customers_flagged trap) — while the checkpointed vocab
    # side has no stats at all. The hint makes the vocab side the build
    # (its per-partition hash build is vocab-bounded), the per-doc
    # consumer is order-free so SMJ's sorts buy nothing, and AQE still
    # promotes the join to broadcast at runtime when the vocabulary fits.
    vocab_lr = vb.join(F.broadcast(ratio), "__b").select("__tok", "__lr")
    scored = rtoks.join(vocab_lr.hint("shuffle_hash"), "__tok")
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"), F.sum("__lr").alias("log_weight")
    )


def gumbel_noise(key: F.Column, seed: int = 42) -> F.Column:
    """Deterministic standard-Gumbel draw keyed by md5 of the row key:
    g = −ln(−ln(u)), u = (uint32 + 0.5) / 2^32 ∈ (0,1) strictly (the +0.5
    keeps u off both endpoints where the double ln chain diverges)."""
    u32 = F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(f":g{seed}"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    u = (u32.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    return -F.log(-F.log(u))


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    num_buckets: int = 1024,
    alpha: float = 0.5,
    seed: int = 42,
    persist_tokens: bool = True,
    score_strategy: str = "join",
) -> DataFrame:
    """Gumbel top-k resampling over DSIR log weights: a without-replacement
    sample of ``n`` raw documents distributed as softmax(log_weight).
    Returns (id_col, n_tokens, log_weight, score) sorted by score desc.

    Plan: dsir_log_weights (default join strategy: one data-sized per-doc
    shuffle) + map-only Gumbel perturbation + TakeOrderedAndProject.
    """
    w = dsir_log_weights(
        raw,
        target,
        id_col,
        text_col,
        num_buckets,
        alpha,
        persist_tokens,
        score_strategy,
    )
    scored = w.withColumn("score", F.col("log_weight") + gumbel_noise(F.col(id_col), seed))
    return scored.orderBy(F.desc("score"), id_col).limit(n)


# ---------------------------------------------------------------------------
# Durable DSIR model artifact + map-only scoring (the streaming-safe tier)
# ---------------------------------------------------------------------------
#
# The fitted model IS the bucket->log-ratio relation — at most num_buckets
# rows regardless of corpus size — so it persists as a tiny parquet table
# and scoring NEW documents (the next crawl batch, or a stream) needs no
# corpus aggregation at all: one in-row fold per document over an
# element_at lookup into the collected model array (a single wide array
# literal, NOT num_buckets chained CASEs — the ARCHITECTURE #14 rule).
# Buckets never seen while fitting score the closed-form smoothed default
# ln(a/(T+aB)) - ln(a/(R+aB)).


def dsir_model_write(
    raw,
    target,
    id_col: str,
    text_col: str,
    path: str,
    num_buckets: int = 1024,
    alpha: float = 0.5,
) -> None:
    """Fit the DSIR feature model and persist it: rows (__b, __lr) for
    every bucket seen in either corpus, plus one __b = -1 row carrying the
    unseen-bucket default. <= num_buckets + 1 rows at ANY corpus size."""
    tc = feature_counts(target, id_col, text_col, num_buckets)
    rc = feature_counts(raw, id_col, text_col, num_buckets)
    t_total = tc.agg(F.sum("__ct").alias("__T"))
    r_total = rc.agg(F.sum("__ct").alias("__R"))
    joined = (
        tc.withColumnRenamed("__ct", "__tc")
        .join(rc.withColumnRenamed("__ct", "__rc"), "__b", "full_outer")
        .crossJoin(F.broadcast(t_total))
        .crossJoin(F.broadcast(r_total))
    )
    lr = (
        F.log(F.coalesce(F.col("__tc"), F.lit(0)).cast("double") + F.lit(alpha))
        - F.log(F.col("__T").cast("double") + F.lit(alpha * num_buckets))
        - F.log(F.coalesce(F.col("__rc"), F.lit(0)).cast("double") + F.lit(alpha))
        + F.log(F.col("__R").cast("double") + F.lit(alpha * num_buckets))
    )
    default = (
        F.log(F.lit(float(alpha)))
        - F.log(F.col("__T").cast("double") + F.lit(alpha * num_buckets))
        - F.log(F.lit(float(alpha)))
        + F.log(F.col("__R").cast("double") + F.lit(alpha * num_buckets))
    )
    rows = joined.select("__b", lr.alias("__lr"))
    default_row = (
        t_total.crossJoin(F.broadcast(r_total))
        .select(F.lit(-1).cast("bigint").alias("__b"), default.alias("__lr"))
    )
    rows.unionByName(default_row).coalesce(1).write.mode("overwrite").parquet(path)


def dsir_model_read(spark, path: str, num_buckets: int = 1024) -> list[float]:
    """Load the model as a dense bucket->log-ratio list (index = bucket;
    unseen buckets filled with the stored default). The collect is bounded
    by num_buckets + 1 rows BY CONSTRUCTION — this is the same bounded-
    artifact contract as bloom_read."""
    rows = spark.read.parquet(path).collect()
    default = next(r["__lr"] for r in rows if r["__b"] == -1)
    out = [default] * num_buckets
    for r in rows:
        if r["__b"] >= 0:
            out[int(r["__b"])] = r["__lr"]
    return out


def dsir_score_with_model(
    df,
    id_col: str,
    text_col: str,
    model: list[float],
) -> DataFrame:
    """Score documents against a fitted model MAP-ONLY: per-doc log weight
    = in-row fold over element_at(<array literal>, bucket(token)+1). No
    shuffle, no aggregation state — the plan runs unchanged on a stream
    (stateless projection), which is how the next crawl batch gets scored
    against a frozen target distribution. Returns (id, n_tokens,
    log_weight) with log_weight UNROUNDED (callers round at the edge)."""
    num_buckets = len(model)
    # one ArrayType Literal, not CreateArray-of-B-literals (never folded)
    arr = F.lit([float(v) for v in model])
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    per_tok = F.transform(
        toks,
        lambda t: F.element_at(
            arr,
            (
                (F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint") % num_buckets)
                + 1
            ).cast("int"),
        ),
    )
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.aggregate(per_tok, F.lit(0.0), lambda a, x: a + x).alias("log_weight"),
    )
