"""Archive corpus source: tar(.gz) of XML articles → structured rows
(SURVEY §2.1 S5 — the JATS-in-tar.gz full-text converter).

Reference parallel: convert_fulltext.py:340-563 iterates tar members and
lxml-parses each JATS article into (doi, title, abstract, body, license,
year, pmcid). Spark-first shape: read archives as ``binaryFile`` rows
(one row per archive, payload = bytes), then ``mapInPandas`` opens each
tar in-executor and yields one row per member article — archives
parallelize across executors, members stream within one task.

Parsing: primary path is a real XML parse via stdlib ElementTree with the
reference's namespace-tolerant lookups and ``itertext`` flattening
(convert_fulltext.py:355-380 semantics; lxml is not in this container and
is not needed for these operations — swap ``ET.fromstring`` for
``lxml.etree.fromstring`` when it is). Members that fail XML parsing fall
back to a regex JATS subset before being dropped, so a single corrupt
member never fails the archive (the reference returns None on
XMLSyntaxError, convert_fulltext.py:351-353).

Scale: one archive = one task's streaming work; thousands of archives
spread across the cluster. Fat text output → write with small row groups
(sinks.ROW_GROUP_FAT_TEXT).
"""

from __future__ import annotations

import io
import re
import tarfile
import xml.etree.ElementTree as ET
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
        StructField("license", StringType()),
        StructField("year", IntegerType()),
        StructField("source_id", StringType()),
    ]
)

_XLINK_HREF = "{http://www.w3.org/1999/xlink}href"


def _clean_doi(doi: str) -> str:
    """Reference DOI normalization (convert_fulltext.py:391-400): lowercase,
    strip resolver prefixes, keep the tail of malformed embedded DOIs."""
    doi = doi.strip().lower()
    for prefix in ("https://doi.org/", "http://doi.org/", "http://dx.doi.org/"):
        if doi.startswith(prefix):
            doi = doi[len(prefix) :]
            break
    if "doi.org/" in doi:
        doi = doi.split("doi.org/")[-1]
    return doi


def _parse_article_xml(xml: str) -> dict | None:
    """JATS extraction via a real XML parse (ElementTree), mirroring the
    reference's lxml walk: namespace-tolerant find, itertext flattening,
    body = all <p> under <body>, license from xlink:href or text, year
    from the first parseable pub-date."""
    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return None

    ns_prefix = root.tag[: root.tag.index("}") + 1] if root.tag.startswith("{") else ""

    def findall(path: str) -> list[ET.Element]:
        els = root.findall(f".//{ns_prefix}{path}") if ns_prefix else []
        return els or root.findall(f".//{path}")

    def find(path: str) -> ET.Element | None:
        els = findall(path)
        return els[0] if els else None

    def text_of(el: ET.Element | None) -> str | None:
        if el is None:
            return None
        t = re.sub(r"\s+", " ", "".join(el.itertext())).strip()
        return t or None

    doi = None
    pmcid = None
    for aid in findall("article-id"):
        kind = aid.get("pub-id-type")
        if kind == "doi" and aid.text and doi is None:
            doi = _clean_doi(aid.text)
        elif kind == "pmc" and aid.text and pmcid is None:
            pmcid = aid.text.strip()

    # Title must come from the article's FRONT MATTER. A bare
    # .//article-title search also matches the <article-title> inside
    # every <element-citation> in the bibliography, so an article with no
    # title of its own would silently inherit its first reference's title
    # (round-3 advice finding). JATS scoping: the real title lives in
    # <front>/<article-meta>/<title-group>; citations never carry a
    # <title-group>.
    def _scoped(base: ET.Element, path: str) -> list[ET.Element]:
        els = base.findall(f".//{ns_prefix}{path}") if ns_prefix else []
        return els or base.findall(f".//{path}")

    title = None
    title_groups = findall("title-group")
    if title_groups:
        articles = _scoped(title_groups[0], "article-title")
        title = text_of(articles[0] if articles else None)
    else:
        fronts = findall("front")
        if fronts:
            articles = _scoped(fronts[0], "article-title")
            title = text_of(articles[0] if articles else None)
    if doi is None and title is None:
        return None

    body_el = find("body")
    body_parts: list[str] = []
    if body_el is not None:
        for el in body_el.iter():
            if el.tag == f"{ns_prefix}p" or el.tag == "p":
                t = text_of(el)
                if t:
                    body_parts.append(t)

    license_el = find("license")
    license_str = None
    if license_el is not None:
        license_str = license_el.get(_XLINK_HREF) or text_of(license_el)

    year = None
    for pub_date in findall("pub-date"):
        year_el = pub_date.find(f"{ns_prefix}year") if ns_prefix else None
        if year_el is None:
            year_el = pub_date.find("year")
        if year_el is not None and year_el.text:
            try:
                year = int(year_el.text)
                break
            except ValueError:
                pass

    return {
        "doi": doi,
        "title": title,
        "abstract": text_of(find("abstract")),
        "body": "\n\n".join(body_parts) or None,
        "license": license_str,
        "year": year,
        "source_id": f"PMC{pmcid}" if pmcid else None,
    }


# --- regex fallback (non-well-formed members only) -------------------------

_DOI_RE = re.compile(r'<article-id[^>]*pub-id-type="doi"[^>]*>([^<]+)</article-id>')
_TITLE_RE = re.compile(r"<article-title[^>]*>(.*?)</article-title>", re.DOTALL)
_ABSTRACT_RE = re.compile(r"<abstract[^>]*>(.*?)</abstract>", re.DOTALL)
_BODY_RE = re.compile(r"<body[^>]*>(.*?)</body>", re.DOTALL)
_P_RE = re.compile(r"<p[^>]*>(.*?)</p>", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_YEAR_RE = re.compile(r"<year>(\d{4})</year>")


def _strip(xml_fragment: str) -> str:
    return re.sub(r"\s+", " ", _TAG_RE.sub("", xml_fragment)).strip()


def _parse_article_regex(xml: str) -> dict | None:
    """Regex JATS subset — salvage path for members ElementTree rejects
    (truncated/misnested markup). Same field semantics, best-effort."""
    doi_m = _DOI_RE.search(xml)
    # citations live in <back><ref-list> and also contain <article-title>;
    # only the front-matter slice may supply the title (same scoping rule
    # as the ElementTree path)
    title_m = _TITLE_RE.search(xml.split("<back", 1)[0])
    if not doi_m and not title_m:
        return None
    abstract_m = _ABSTRACT_RE.search(xml)
    body_m = _BODY_RE.search(xml)
    body = (
        "\n\n".join(_strip(p) for p in _P_RE.findall(body_m.group(1))) if body_m else None
    )
    year_m = _YEAR_RE.search(xml)
    return {
        "doi": _clean_doi(_strip(doi_m.group(1))) if doi_m else None,
        "title": _strip(title_m.group(1)) if title_m else None,
        "abstract": _strip(abstract_m.group(1)) if abstract_m else None,
        "body": body or None,
        "license": None,
        "year": int(year_m.group(1)) if year_m else None,
        "source_id": None,
    }


def _parse_article(xml: str) -> dict | None:
    return _parse_article_xml(xml) or _parse_article_regex(xml)


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
