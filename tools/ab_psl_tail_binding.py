import sys, time, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from science_datalake_spark.operators import psl
from science_datalake_spark.operators.web import url_host
from science_datalake_spark.catalog import table
from science_datalake_spark.session import get_spark, suggest_shuffle_partitions, suggest_aqe, SCAN_OPEN_COST_BYTES

sf_dir = "/root/repo/.fixtures/sf3"
parts = suggest_shuffle_partitions(sf_dir)
spark = get_spark("ab-psl-tails", **{"spark.sql.shuffle.partitions": str(parts),
    "spark.sql.files.openCostInBytes": str(SCAN_OPEN_COST_BYTES),
    "spark.sql.adaptive.enabled": suggest_aqe(sf_dir)})

def suffix_len_old(labels, n, rules):
    def tail(j):
        return F.when(n >= j, F.array_join(F.slice(labels, -j, j), ".")).otherwise(F.lit(""))
    cands = [F.lit(1)]
    for j, s in rules.exact.items():
        if j >= 2:
            cands.append(F.when(tail(j).isin(*sorted(s)), F.lit(j)).otherwise(F.lit(1)))
    for j, s in rules.wildcard.items():
        cands.append(F.when((n >= j + 1) & tail(j).isin(*sorted(s)), F.lit(j + 1)).otherwise(F.lit(1)))
    prevailing = F.greatest(*cands) if len(cands) > 1 else cands[0]
    out = prevailing
    for j in sorted(rules.exception):
        out = F.when(tail(j).isin(*sorted(rules.exception[j])), F.lit(j - 1)).otherwise(out)
    return out

new_impl = psl._suffix_len

def urls():
    d = table(spark, sf_dir, "documents")
    k = (F.col("doc_id") % 12).cast("string")
    i = (F.col("doc_id") % 4 + 1).cast("int")
    ident = F.col("doc_id").cast("string")
    pre = F.element_at(F.lit(["https://www.", "HTTP://", "", "https://cdn."]), i)
    site = F.when(i == 2, F.concat(F.lit("SITE"), k, F.lit(".COM"))).otherwise(
        F.concat(F.lit("site"), k, F.lit(".com")))
    post = F.element_at(F.lit(["", "/", "?utm=x", "#frag"]), i)
    return d.select("doc_id", F.concat(pre, site, F.lit("/page/"), ident, post).alias("url"))

from science_datalake_spark.operators.web import registrable_domain

def build(impl):
    psl._suffix_len = impl
    try:
        u = urls()
        dom = registrable_domain(url_host(F.col("url")))
        return u.select(F.xxhash64(dom).alias("h")).agg(F.sum("h"))
    finally:
        psl._suffix_len = new_impl

# identity
a = build(suffix_len_old).collect()[0][0]
b = build(new_impl).collect()[0][0]
assert a == b, (a, b)
out = {"old": [], "new": []}
for rep in range(5):
    for name, impl in (("old", suffix_len_old), ("new", new_impl)):
        df = build(impl)
        t0 = time.perf_counter(); df.collect()
        out[name].append(round(time.perf_counter() - t0, 3))
import statistics
print(json.dumps({"reps": out, "best": {k: min(v) for k, v in out.items()},
                  "median": {k: statistics.median(v) for k, v in out.items()}}))
