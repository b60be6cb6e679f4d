"""Archive corpus source: tar(.gz) of XML articles → structured rows
(SURVEY §2.1 S5 — the JATS-in-tar.gz full-text converter).

Reference parallel: convert_fulltext.py:340-563 iterates tar members and
lxml-parses each JATS article into (doi, title, abstract, body, license,
year, pmcid). Spark-first shape: read archives as ``binaryFile`` rows
(one row per archive, payload = bytes), then ``mapInPandas`` opens each
tar in-executor and yields one row per member article — archives
parallelize across executors, members stream within one task.

lxml is not in this container, so extraction uses a small regex-based
JATS-subset parser (front-matter DOI/title/abstract + body paragraphs).
It handles the well-formed subset the tests generate; a production build
would swap ``_parse_article`` for an lxml implementation — the Spark-side
plumbing (binaryFile → mapInPandas → rows) is identical.

Scale: one archive = one task's streaming work; thousands of archives
spread across the cluster. Fat text output → write with small row groups
(sinks.ROW_GROUP_FAT_TEXT).
"""

from __future__ import annotations

import io
import re
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

ARTICLE_SCHEMA = StructType(
    [
        StructField("archive", StringType()),
        StructField("member", StringType()),
        StructField("doi", StringType()),
        StructField("title", StringType()),
        StructField("abstract", StringType()),
        StructField("body", StringType()),
        StructField("year", IntegerType()),
    ]
)

_DOI_RE = re.compile(r'<article-id[^>]*pub-id-type="doi"[^>]*>([^<]+)</article-id>')
_TITLE_RE = re.compile(r"<article-title[^>]*>(.*?)</article-title>", re.DOTALL)
_ABSTRACT_RE = re.compile(r"<abstract[^>]*>(.*?)</abstract>", re.DOTALL)
_BODY_RE = re.compile(r"<body[^>]*>(.*?)</body>", re.DOTALL)
_P_RE = re.compile(r"<p[^>]*>(.*?)</p>", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_YEAR_RE = re.compile(r"<year>(\d{4})</year>")


def _strip(xml_fragment: str) -> str:
    return re.sub(r"\s+", " ", _TAG_RE.sub("", xml_fragment)).strip()


def _parse_article(xml: str) -> dict | None:
    """JATS-subset extraction (regex stand-in for the lxml parser)."""
    doi_m = _DOI_RE.search(xml)
    title_m = _TITLE_RE.search(xml)
    if not doi_m and not title_m:
        return None
    abstract_m = _ABSTRACT_RE.search(xml)
    body_m = _BODY_RE.search(xml)
    body = " ".join(_strip(p) for p in _P_RE.findall(body_m.group(1))) if body_m else None
    year_m = _YEAR_RE.search(xml)
    return {
        "doi": _strip(doi_m.group(1)).lower() if doi_m else None,
        "title": _strip(title_m.group(1)) if title_m else None,
        "abstract": _strip(abstract_m.group(1)) if abstract_m else None,
        "body": body,
        "year": int(year_m.group(1)) if year_m else None,
    }


def read_jats_archives(spark: SparkSession, path: str) -> DataFrame:
    """tar(.gz) archives under ``path`` → one row per contained article."""
    archives = spark.read.format("binaryFile").option("pathGlobFilter", "*.tar*").load(path)

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for apath, content in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(content), mode="r:*") as tf:
                    for member in tf.getmembers():
                        if not member.isfile() or not member.name.endswith(".xml"):
                            continue
                        fh = tf.extractfile(member)
                        if fh is None:
                            continue
                        parsed = _parse_article(fh.read().decode("utf-8", errors="replace"))
                        if parsed is None:
                            continue
                        rows.append({"archive": apath, "member": member.name, **parsed})
            yield pd.DataFrame(rows, columns=[f.name for f in ARTICLE_SCHEMA.fields])

    return archives.select("path", "content").mapInPandas(expand, schema=ARTICLE_SCHEMA)
