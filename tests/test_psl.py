"""Public Suffix List engine: the upstream checkPublicSuffix test
vectors (publicsuffix.org/list/ — the canonical test_psl.txt cases,
MPL 2.0 data), evaluated through the Spark expression in one pass, plus
rule-file loader unit checks and the map-only plan property."""

from __future__ import annotations

import pyspark.sql.functions as F

from science_datalake_spark.operators.psl import (
    load_psl_rules,
    public_suffix_registrable,
)

# (input, expected registrable domain) — verbatim from the upstream
# checkPublicSuffix suite; None == no registrable domain
VECTORS = [
    # null input is covered separately (NULL column row below)
    # Mixed case.
    ("COM", None),
    ("example.COM", "example.com"),
    ("WwW.example.COM", "example.com"),
    # Leading dot.
    (".com", None),
    (".example", None),
    (".example.com", None),
    (".example.example", None),
    # Unlisted TLD.
    ("example", None),
    ("example.example", "example.example"),
    ("b.example.example", "example.example"),
    ("a.b.example.example", "example.example"),
    # TLD with only 1 rule.
    ("biz", None),
    ("domain.biz", "domain.biz"),
    ("b.domain.biz", "domain.biz"),
    ("a.b.domain.biz", "domain.biz"),
    # TLD with some 2-level rules.
    ("com", None),
    ("example.com", "example.com"),
    ("b.example.com", "example.com"),
    ("a.b.example.com", "example.com"),
    ("uk.com", None),
    ("example.uk.com", "example.uk.com"),
    ("b.example.uk.com", "example.uk.com"),
    ("a.b.example.uk.com", "example.uk.com"),
    ("test.ac", "test.ac"),
    # TLD with only 1 (wildcard) rule.
    ("mm", None),
    ("c.mm", None),
    ("b.c.mm", "b.c.mm"),
    ("a.b.c.mm", "b.c.mm"),
    # More complex TLD.
    ("jp", None),
    ("test.jp", "test.jp"),
    ("www.test.jp", "test.jp"),
    ("ac.jp", None),
    ("test.ac.jp", "test.ac.jp"),
    ("www.test.ac.jp", "test.ac.jp"),
    ("kyoto.jp", None),
    ("test.kyoto.jp", "test.kyoto.jp"),
    ("ide.kyoto.jp", None),
    ("b.ide.kyoto.jp", "b.ide.kyoto.jp"),
    ("a.b.ide.kyoto.jp", "b.ide.kyoto.jp"),
    ("c.kobe.jp", None),
    ("b.c.kobe.jp", "b.c.kobe.jp"),
    ("a.b.c.kobe.jp", "b.c.kobe.jp"),
    ("city.kobe.jp", "city.kobe.jp"),
    ("www.city.kobe.jp", "city.kobe.jp"),
    # TLD with a wildcard rule and exceptions.
    ("ck", None),
    ("test.ck", None),
    ("b.test.ck", "b.test.ck"),
    ("a.b.test.ck", "b.test.ck"),
    ("www.ck", "www.ck"),
    ("www.www.ck", "www.ck"),
    # US K12.
    ("us", None),
    ("test.us", "test.us"),
    ("www.test.us", "test.us"),
    ("ak.us", None),
    ("test.ak.us", "test.ak.us"),
    ("www.test.ak.us", "test.ak.us"),
    ("k12.ak.us", None),
    ("test.k12.ak.us", "test.k12.ak.us"),
    ("www.test.k12.ak.us", "test.k12.ak.us"),
    # the round-8 completed cc./lib. state sub-spaces (every k12 state
    # now carries all three formulaic registries, like upstream)
    ("cc.ma.us", None),
    ("college.cc.ma.us", "college.cc.ma.us"),
    ("www.college.cc.ma.us", "college.cc.ma.us"),
    ("lib.nv.us", None),
    ("branch.lib.nv.us", "branch.lib.nv.us"),
    ("www.branch.lib.nv.us", "branch.lib.nv.us"),
    # IDN labels.
    ("食狮.com.cn", "食狮.com.cn"),
    ("食狮.公司.cn", "食狮.公司.cn"),
    ("www.食狮.公司.cn", "食狮.公司.cn"),
    ("shishi.公司.cn", "shishi.公司.cn"),
    ("公司.cn", None),
    ("食狮.中国", "食狮.中国"),
    ("www.食狮.中国", "食狮.中国"),
    ("shishi.中国", "shishi.中国"),
    ("中国", None),
    # Same as above, but punycoded.
    ("xn--85x722f.com.cn", "xn--85x722f.com.cn"),
    ("xn--85x722f.xn--55qx5d.cn", "xn--85x722f.xn--55qx5d.cn"),
    ("www.xn--85x722f.xn--55qx5d.cn", "xn--85x722f.xn--55qx5d.cn"),
    ("shishi.xn--55qx5d.cn", "shishi.xn--55qx5d.cn"),
    ("xn--55qx5d.cn", None),
    ("xn--85x722f.xn--fiqs8s", "xn--85x722f.xn--fiqs8s"),
    ("www.xn--85x722f.xn--fiqs8s", "xn--85x722f.xn--fiqs8s"),
    ("shishi.xn--fiqs8s", "shishi.xn--fiqs8s"),
    ("xn--fiqs8s", None),
]


def test_upstream_check_public_suffix_vectors(spark):
    rows = [(h, want) for h, want in VECTORS] + [(None, None)]  # null input
    df = spark.createDataFrame(rows, "host STRING, want STRING")
    got = df.select(
        "host", "want", public_suffix_registrable(F.col("host")).alias("d")
    ).collect()
    bad = [(r["host"], r["d"], r["want"]) for r in got if r["d"] != r["want"]]
    assert not bad, f"{len(bad)} vector failures: {bad[:10]}"


def test_loader_rule_classes():
    rules = load_psl_rules()
    assert "co.uk" in rules.exact[2]
    assert "k12.ak.us" in rules.exact[3]
    assert "global.ssl.fastly.net" in rules.exact[4]  # deep private rule
    assert "kobe.jp" in rules.wildcard[2] and "mm" in rules.wildcard[1]
    assert "city.kobe.jp" in rules.exception[3] and "www.ck" in rules.exception[2]
    # IDN rules carry punycode twins
    assert "公司.cn" in rules.exact[2] and "xn--55qx5d.cn" in rules.exact[2]


def test_deep_private_rule_and_wildcard_tld(spark):
    """A 4-label private rule (global.ssl.fastly.net) and a wildcard
    TLD (*.bd) both group correctly through the curation-facing
    registrable_domain (host fallback, never NULL)."""
    from science_datalake_spark.operators.web import registrable_domain

    df = spark.createDataFrame(
        [
            ("foo.global.ssl.fastly.net", "foo.global.ssl.fastly.net"),
            ("a.b.foo.global.ssl.fastly.net", "foo.global.ssl.fastly.net"),
            ("shop.example.com.bd", "example.com.bd"),  # *.bd wildcard
            ("com.bd", "com.bd"),  # IS a public suffix -> host fallback
            ("localhost", "localhost"),
        ],
        "host STRING, want STRING",
    )
    got = df.select(
        "want", registrable_domain(F.col("host")).alias("d")
    ).collect()
    for r in got:
        assert r["d"] == r["want"], r


def test_plan_is_map_only(spark):
    """The whole PSL lowers to a constant-folded map expression: no
    join, no exchange, no UDF in the plan."""
    df = spark.range(10).select(
        F.concat(F.lit("a.b.site"), F.col("id").cast("string"), F.lit(".co.uk")).alias(
            "host"
        )
    )
    out = df.select(public_suffix_registrable(F.col("host")).alias("d"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    for bad in ("Join", "Exchange", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, plan


def test_wildcard_base_host_keeps_registrable(spark):
    """A host that IS a wildcard rule's base must not match the wildcard
    (*.kobe.jp has 3 labels; the 2-label host 'kobe.jp' matches only the
    default rule, so its registrable domain is itself) — review
    finding."""
    df = spark.createDataFrame([("kobe.jp",), ("mm",), ("c.mm",)], "host STRING")
    got = {
        r["host"]: r["d"]
        for r in df.select(
            "host", public_suffix_registrable(F.col("host")).alias("d")
        ).collect()
    }
    assert got["kobe.jp"] == "kobe.jp"
    assert got["mm"] is None and got["c.mm"] is None  # vectors unchanged


def test_overlapping_exceptions_longest_wins(spark, tmp_path):
    """With two exception rules of different depths matching one host,
    the LONGER rule prevails (review finding: the wrap order previously
    inverted this); IDN exception rules keep their '!' semantics in the
    punycode twin (review finding: the marker was punycoded into the
    label)."""
    dat = tmp_path / "rules.dat"
    dat.write_text("*.ck\n!b.ck\n!a.b.ck\n*.example\n!食狮.example\n")
    rules = load_psl_rules(str(dat))
    assert "xn--85x722f.example" in rules.exception[2]  # twin classified right
    df = spark.createDataFrame(
        [
            ("x.a.b.ck", "a.b.ck"),  # !a.b.ck (ps=b.ck) beats !b.ck (ps=ck)
            ("x.b.ck", "b.ck"),  # only !b.ck matches -> ps=ck
            ("xn--85x722f.example", "xn--85x722f.example"),  # punycode exc
            ("www.食狮.example", "食狮.example"),  # unicode exc
        ],
        "host STRING, want STRING",
    )
    got = df.select(
        "want", public_suffix_registrable(F.col("host"), rules).alias("d")
    ).collect()
    for r in got:
        assert r["d"] == r["want"], r
