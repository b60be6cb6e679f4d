import sys, time, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F, Window
from science_datalake_spark.catalog import table
from science_datalake_spark.session import get_spark, suggest_shuffle_partitions, suggest_aqe, SCAN_OPEN_COST_BYTES
from science_datalake_spark.operators.ranking import doc_lengths, BM25_K1, BM25_B

sf_dir = sys.argv[1]; reps = int(sys.argv[2])
parts = suggest_shuffle_partitions(sf_dir)
spark = get_spark("ab-bm25-repart", **{"spark.sql.shuffle.partitions": str(parts),
    "spark.sql.files.openCostInBytes": str(SCAN_OPEN_COST_BYTES),
    "spark.sql.adaptive.enabled": suggest_aqe(sf_dir)})

def query(colocate):
    k1, b = BM25_K1, BM25_B
    d = table(spark, sf_dir, "documents")
    qdocs = d.filter((F.col("doc_id") % 25 == 0) & (F.col("doc_id") < 5000)).select(
        F.col("doc_id").alias("qid"),
        F.slice(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 1, 5).alias("__qw"))
    qterms = qdocs.select("qid", F.explode("__qw").alias("term")).select(
        "qid", F.lower(F.col("term")).alias("term")).distinct()
    terms = qterms.select("term").distinct()
    doclen = doc_lengths(d, "doc_id", "text")
    consts = doclen.agg(F.count("*").alias("__n_docs"), F.avg("dl").alias("__avgdl"))
    toks = d.select(F.col("doc_id"), F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"))
    q = toks.join(F.broadcast(terms), "term").groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    if colocate:
        q = q.repartition(F.col("doc_id"))
    dfreq = q.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = dfreq.crossJoin(F.broadcast(consts)).select(
        "term", F.log((F.col("__n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0).alias("idf"), "__avgdl")
    scored = (q.join(F.broadcast(qterms), "term").join(F.broadcast(idf), "term").join(doclen, "doc_id")
        .withColumn("__ts", F.col("idf") * (F.col("tf") * (k1 + 1)) /
            (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("__avgdl")))))
    scores = scored.groupBy("qid", "doc_id").agg(F.round(F.sum("__ts"), 4).alias("bm25"))
    w = Window.partitionBy("qid").orderBy(F.desc("bm25"), "doc_id")
    negs = (scores.filter(F.col("doc_id") != F.col("qid"))
            .withColumn("neg_rank", F.row_number().over(w)).filter(F.col("neg_rank") <= 3))
    return negs.select("qid", "neg_rank", "doc_id", "bm25").orderBy("qid", "neg_rank")

a = query(False).toPandas(); bdf = query(True).toPandas()
assert a.equals(bdf), "differ!"
print("# identity OK", file=sys.stderr)
out = {"no_colocate": [], "colocate": []}
for rep in range(reps):
    for name, flag in (("no_colocate", False), ("colocate", True)):
        df = query(flag)
        t0 = time.perf_counter(); df.toPandas()
        out[name].append(round(time.perf_counter() - t0, 3))
print(json.dumps({"sf": sf_dir, "reps": out, "best": {k: min(v) for k, v in out.items()}}))
