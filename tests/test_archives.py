"""JATS-archive source: tar.gz of XML → article rows via mapInPandas."""

from __future__ import annotations

import io
import tarfile

import pyspark.sql.functions as F

from science_datalake_spark.sources.archives import read_jats_archives

ARTICLE_TMPL = """<?xml version="1.0"?>
<article>
  <front>
    <article-meta>
      <article-id pub-id-type="doi">https://doi.org/10.{n}/JATS.{n}</article-id>
      <article-id pub-id-type="pmc">{n}00</article-id>
      <title-group><article-title>Article <italic>number</italic> {n}</article-title></title-group>
      <abstract><p>Abstract for {n}.</p></abstract>
      <permissions><license xlink:href="https://creativecommons.org/licenses/by/4.0/"
        xmlns:xlink="http://www.w3.org/1999/xlink"/></permissions>
      <pub-date><year>{year}</year></pub-date>
    </article-meta>
  </front>
  <body><p>First paragraph {n}.</p><p>Second <b>bold</b> paragraph.</p></body>
</article>
"""


def _make_archive(path, n_articles, start=0):
    with tarfile.open(path, "w:gz") as tf:
        for i in range(start, start + n_articles):
            xml = ARTICLE_TMPL.format(n=i, year=2000 + i % 20).encode()
            info = tarfile.TarInfo(name=f"articles/art-{i}.xml")
            info.size = len(xml)
            tf.addfile(info, io.BytesIO(xml))
        junk = b"not xml at all"
        info = tarfile.TarInfo(name="README.txt")
        info.size = len(junk)
        tf.addfile(info, io.BytesIO(junk))


def test_jats_archive_extraction(spark, tmp_path):
    _make_archive(str(tmp_path / "batch-0.tar.gz"), 5)
    _make_archive(str(tmp_path / "batch-1.tar.gz"), 3, start=100)
    df = read_jats_archives(spark, str(tmp_path)).cache()
    assert df.count() == 8  # README.txt skipped
    row = df.filter(F.col("member") == "articles/art-0.xml").first()
    assert row["doi"] == "10.0/jats.0"  # resolver prefix stripped, lowercased
    assert row["title"] == "Article number 0"  # inner tags flattened via itertext
    assert row["abstract"] == "Abstract for 0."
    assert row["body"] == "First paragraph 0.\n\nSecond bold paragraph."
    assert row["license"] == "https://creativecommons.org/licenses/by/4.0/"
    assert row["year"] == 2000
    assert row["source_id"] == "PMC000"
    # both archives contributed
    assert df.select("archive").distinct().count() == 2


def test_jats_archive_malformed_members(spark, tmp_path):
    """A truncated member is salvaged by the regex fallback when it still
    carries front-matter, and dropped when it carries nothing — either
    way the job survives (reference: None on XMLSyntaxError)."""
    with tarfile.open(str(tmp_path / "bad.tar.gz"), "w:gz") as tf:
        for name, payload in [
            ("bad.xml", b"<article><front>truncated"),
            (
                "salvage.xml",
                b'<article><article-id pub-id-type="doi">10.9/x</article-id>'
                b"<article-title>Salvaged</article-title><p>unclosed",
            ),
            ("ok.xml", ARTICLE_TMPL.format(n=7, year=2010).encode()),
        ]:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    df = read_jats_archives(spark, str(tmp_path)).cache()
    assert df.count() == 2  # bad.xml dropped, salvage.xml + ok.xml kept
    salvaged = df.filter(F.col("member") == "salvage.xml").first()
    assert salvaged["doi"] == "10.9/x" and salvaged["title"] == "Salvaged"


def test_jats_namespaced_article(spark, tmp_path):
    """Default-namespace JATS (the reference's ns_prefix path,
    convert_fulltext.py:355-373) parses identically."""
    xml = ARTICLE_TMPL.format(n=3, year=2015).replace(
        "<article>", '<article xmlns="https://jats.nlm.nih.gov">'
    ).encode()
    with tarfile.open(str(tmp_path / "ns.tar.gz"), "w:gz") as tf:
        info = tarfile.TarInfo(name="ns.xml")
        info.size = len(xml)
        tf.addfile(info, io.BytesIO(xml))
    row = read_jats_archives(spark, str(tmp_path)).first()
    assert row["doi"] == "10.3/jats.3"
    assert row["body"] == "First paragraph 3.\n\nSecond bold paragraph."
    assert row["year"] == 2015


CITATION_ONLY_TITLE = """<?xml version="1.0"?>
<article>
  <front>
    <article-meta>
      <article-id pub-id-type="doi">10.9999/NO.TITLE</article-id>
    </article-meta>
  </front>
  <body><p>Body text.</p></body>
  <back>
    <ref-list>
      <ref><element-citation>
        <article-title>Somebody Else's Cited Paper</article-title>
      </element-citation></ref>
    </ref-list>
  </back>
</article>
"""


def test_jats_title_never_taken_from_citations():
    """An article with no front-matter title must yield title=None — not
    the first bibliography entry's <article-title> (round-3 advice)."""
    from science_datalake_spark.sources.archives import (
        _parse_article_regex,
        _parse_article_xml,
    )

    row = _parse_article_xml(CITATION_ONLY_TITLE)
    assert row is not None and row["doi"] == "10.9999/no.title"
    assert row["title"] is None

    # the regex salvage path applies the same front-matter scoping
    broken = CITATION_ONLY_TITLE.replace("</article>", "")  # unclosed root
    row2 = _parse_article_regex(broken)
    assert row2 is not None and row2["title"] is None
