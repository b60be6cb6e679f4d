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
      <article-id pub-id-type="doi">10.{n}/jats.{n}</article-id>
      <title-group><article-title>Article <italic>number</italic> {n}</article-title></title-group>
      <abstract><p>Abstract for {n}.</p></abstract>
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
    assert row["doi"] == "10.0/jats.0"
    assert row["title"] == "Article number 0"  # inner tags stripped
    assert row["abstract"] == "Abstract for 0."
    assert row["body"] == "First paragraph 0. Second bold paragraph."
    assert row["year"] == 2000
    # both archives contributed
    assert df.select("archive").distinct().count() == 2


def test_jats_archive_malformed_members(spark, tmp_path):
    with tarfile.open(str(tmp_path / "bad.tar.gz"), "w:gz") as tf:
        bad = b"<article><front>truncated"
        info = tarfile.TarInfo(name="bad.xml")
        info.size = len(bad)
        tf.addfile(info, io.BytesIO(bad))
        ok = ARTICLE_TMPL.format(n=7, year=2010).encode()
        info = tarfile.TarInfo(name="ok.xml")
        info.size = len(ok)
        tf.addfile(info, io.BytesIO(ok))
    df = read_jats_archives(spark, str(tmp_path))
    assert df.count() == 1  # malformed member dropped, job survives
