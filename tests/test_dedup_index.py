"""Durable LSH band index: incremental dedup equals the full-corpus
batch run restricted to cross/new pairs, survivors-only appends, and
multi-batch chaining."""

from __future__ import annotations

from pyspark.sql import functions as F

from science_datalake_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
)
from science_datalake_spark.operators.dedup_index import (
    dedup_candidates_against_index,
    incremental_dedup_minhash,
    lsh_index_write,
)

_LOREM = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew strong potions under a silver moon beside the ancient river"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _batch_a(spark):
    return _docs(
        spark,
        [
            (1, _LOREM),
            (2, "completely different words about spark catalyst optimizer plans and shuffle exchanges in distributed engines"),
            (3, "a third unrelated document mentioning minhash signatures banding buckets and jaccard similarity estimation theory"),
        ],
    )


def _batch_b(spark):
    return _docs(
        spark,
        [
            (10, _LOREM),  # near-dup of doc 1 (identical text)
            (11, "fresh content on public suffix lists registrable domains and wildcard exception rules for curation"),
            (12, "fresh content on public suffix lists registrable domains and wildcard exception rules for curation"),  # internal dup of 11
            (13, "entirely novel sentences regarding streaming watermarks stateful sessionization and late data handling"),
        ],
    )


def test_incremental_matches_full_batch_run(spark, tmp_path):
    idx = str(tmp_path / "lsh_index")
    a, b = _batch_a(spark), _batch_b(spark)
    sigs_a = minhash_signatures(a, "doc_id", "text", hash_fn="xxhash64")
    lsh_index_write(sigs_a, "doc_id", idx)

    accepted, pairs = incremental_dedup_minhash(
        spark, b, "doc_id", "text", idx
    )
    got_pairs = {(r["id_dropped"], r["id_kept"]) for r in pairs.collect()}

    # ground truth: full-corpus LSH over A ∪ B
    full = lsh_candidate_pairs(
        minhash_signatures(
            a.unionByName(b), "doc_id", "text", hash_fn="xxhash64"
        ),
        "doc_id",
    )
    full_pairs = {(r["id_a"], r["id_b"]) for r in full.collect()}
    a_ids = {1, 2, 3}
    want = set()
    for x, y in full_pairs:
        if x in a_ids and y in a_ids:
            continue  # history-internal: not this batch's business
        if x in a_ids or y in a_ids:
            new, old = (y, x) if x in a_ids else (x, y)
            want.add((new, old))  # vs history: new drops
        else:
            want.add((max(x, y), min(x, y)))  # internal: higher drops
    assert got_pairs == want
    assert {r["doc_id"] for r in accepted.collect()} == {11, 13}


def test_index_contains_only_survivors(spark, tmp_path):
    idx = str(tmp_path / "lsh_index")
    a, b = _batch_a(spark), _batch_b(spark)
    lsh_index_write(
        minhash_signatures(a, "doc_id", "text", hash_fn="xxhash64"),
        "doc_id",
        idx,
    )
    incremental_dedup_minhash(spark, b, "doc_id", "text", idx)
    indexed = {
        r["id"] for r in spark.read.parquet(idx).select("id").distinct().collect()
    }
    assert indexed == {1, 2, 3, 11, 13}  # rejected 10 and 12 never indexed


def test_second_batch_sees_first_batch_survivors(spark, tmp_path):
    idx = str(tmp_path / "lsh_index")
    lsh_index_write(
        minhash_signatures(_batch_a(spark), "doc_id", "text", hash_fn="xxhash64"),
        "doc_id",
        idx,
    )
    incremental_dedup_minhash(spark, _batch_b(spark), "doc_id", "text", idx)
    # batch C: dup of B-survivor 11, dup of original A doc 1, one fresh
    c = _docs(
        spark,
        [
            (20, "fresh content on public suffix lists registrable domains and wildcard exception rules for curation"),
            (21, _LOREM),
            (22, "genuinely new material about banded interval joins bucket fanout and broadcast nested loop fallbacks"),
        ],
    )
    accepted, pairs = incremental_dedup_minhash(spark, c, "doc_id", "text", idx)
    kept_for = {
        r["id_dropped"]: r["id_kept"] for r in pairs.collect()
    }
    assert kept_for[20] == 11  # vouched by a batch-B survivor
    assert kept_for[21] == 1  # vouched by original history
    assert {r["doc_id"] for r in accepted.collect()} == {22}


def test_probe_without_accept_is_read_only(spark, tmp_path):
    idx = str(tmp_path / "lsh_index")
    a = _batch_a(spark)
    lsh_index_write(
        minhash_signatures(a, "doc_id", "text", hash_fn="xxhash64"),
        "doc_id",
        idx,
    )
    sigs_b = minhash_signatures(
        _batch_b(spark), "doc_id", "text", hash_fn="xxhash64"
    )
    hits = dedup_candidates_against_index(spark, sigs_b, "doc_id", idx)
    assert {(r["id_new"], r["id_old"]) for r in hits.collect()} == {(10, 1)}
    # pure probe: the index is untouched
    assert {
        r["id"] for r in spark.read.parquet(idx).select("id").distinct().collect()
    } == {1, 2, 3}


def test_replay_after_index_append_converges(spark, tmp_path):
    """At-least-once replay: when a batch's bands already reached the
    index (crash after the append), re-running the same batch must
    produce the SAME accepted set — the self-pair guard keeps a doc
    from being dropped as a near-dup of itself."""
    idx = str(tmp_path / "lsh_index")
    b = _batch_b(spark)
    acc1, p1 = incremental_dedup_minhash(spark, b, "doc_id", "text", idx)
    want = {r["doc_id"] for r in acc1.collect()}
    p1.unpersist()
    assert want == {10, 11, 13}

    acc2, p2 = incremental_dedup_minhash(spark, b, "doc_id", "text", idx)
    got = {r["doc_id"] for r in acc2.collect()}
    pairs2 = {(r["id_dropped"], r["id_kept"]) for r in p2.collect()}
    p2.unpersist()
    assert got == want
    assert (10, 10) not in pairs2 and (11, 11) not in pairs2


def test_accept_hook_runs_before_index_append(spark, tmp_path):
    """The accept hook fires while the index still lacks the batch's
    bands — the ordering the streaming sink's crash-safety relies on."""
    import os

    idx = str(tmp_path / "lsh_index")
    seen: list[bool] = []

    def probe_hook(accepted):
        seen.append(os.path.exists(idx))

    _, p = incremental_dedup_minhash(
        spark, _batch_a(spark), "doc_id", "text", idx, accept=probe_hook
    )
    p.unpersist()
    assert seen == [False]  # hook ran before any index write
    # and the append still happened afterwards
    assert {
        r["id"] for r in spark.read.parquet(idx).select("id").distinct().collect()
    } == {1, 2, 3}
