"""Manifest acquisition: atomicity, resume, verification, retry, state
persistence — all against a filesystem fetcher (no network)."""

from __future__ import annotations

import hashlib
import json
import os

from science_datalake_spark.acquisition import (
    AcquisitionReport,
    ManifestAcquirer,
    ManifestItem,
    ontology_manifest,
)


def _source_tree(tmp_path):
    src = tmp_path / "remote"
    src.mkdir()
    files = {}
    for name, payload in [("a.obo", b"term data " * 100), ("b.nt", b"<s> <p> <o> .\n" * 50)]:
        (src / name).write_bytes(payload)
        files[name] = payload
    return src, files


def _copy_fetcher(src_dir):
    def fetch(url: str, part_path: str) -> None:
        with open(os.path.join(src_dir, url), "rb") as f:
            data = f.read()
        with open(part_path, "wb") as f:
            f.write(data)

    return fetch


def test_fetch_verify_resume(tmp_path):
    src, files = _source_tree(tmp_path)
    dest = tmp_path / "local"
    items = [
        ManifestItem(
            "a.obo", "a.obo",
            expected_size=len(files["a.obo"]),
            sha256=hashlib.sha256(files["a.obo"]).hexdigest(),
        ),
        ManifestItem("b.nt", "b.nt", expected_size=len(files["b.nt"])),
    ]
    acq = ManifestAcquirer(str(dest), _copy_fetcher(str(src)))
    rep = acq.run(items)
    assert rep.ok and rep.done == ["a.obo", "b.nt"] and rep.skipped == []
    assert (dest / "a.obo").read_bytes() == files["a.obo"]
    assert not list(dest.glob("*.part"))  # nothing left un-published

    # second run: everything verifies in place, fetcher never called
    def exploding(url, part):
        raise AssertionError("refetched a verified file")

    rep2 = ManifestAcquirer(str(dest), exploding).run(items)
    assert rep2.ok and rep2.skipped == ["a.obo", "b.nt"] and rep2.done == []

    # state file records completion
    state = json.loads((dest / "_acquisition_state.json").read_text())
    assert state["a.obo"]["status"] == "done"


def test_truncated_fetch_fails_verification_and_retries(tmp_path):
    src, files = _source_tree(tmp_path)
    dest = tmp_path / "local"
    calls = []

    def flaky(url, part_path):
        calls.append(url)
        data = open(os.path.join(str(src), url), "rb").read()
        # first attempt truncates; second succeeds
        with open(part_path, "wb") as f:
            f.write(data if len(calls) > 1 else data[:10])

    items = [ManifestItem("a.obo", "a.obo", expected_size=len(files["a.obo"]))]
    rep = ManifestAcquirer(str(dest), flaky).run(items)
    assert rep.ok and rep.done == ["a.obo"]
    assert len(calls) == 2  # truncated attempt verified-failed, then retried
    assert (dest / "a.obo").read_bytes() == files["a.obo"]


def test_permanent_failure_recorded_and_dest_untouched(tmp_path):
    dest = tmp_path / "local"

    def always_down(url, part_path):
        raise OSError("connection refused")

    items = [ManifestItem("a.obo", "a.obo")]
    rep = ManifestAcquirer(str(dest), always_down, max_attempts=2).run(items)
    assert not rep.ok and rep.failed == ["a.obo"]
    assert not (dest / "a.obo").exists() and not (dest / "a.obo.part").exists()
    state = json.loads((dest / "_acquisition_state.json").read_text())
    assert state["a.obo"]["status"] == "failed"
    assert state["a.obo"]["attempts"] == 2
    assert "connection refused" in state["a.obo"]["error"]


def test_corrupt_existing_dest_is_refetched(tmp_path):
    """A dest that exists but fails verification is NOT skipped."""
    src, files = _source_tree(tmp_path)
    dest = tmp_path / "local"
    dest.mkdir()
    (dest / "a.obo").write_bytes(b"corrupt")
    items = [ManifestItem("a.obo", "a.obo", expected_size=len(files["a.obo"]))]
    rep = ManifestAcquirer(str(dest), _copy_fetcher(str(src))).run(items)
    assert rep.done == ["a.obo"]
    assert (dest / "a.obo").read_bytes() == files["a.obo"]


def test_part_file_survives_fetch_failure_for_cross_run_resume(tmp_path):
    """A fetch failure keeps the .part bytes; a new run's fetcher receives
    the same path and may append (HTTP Range semantics). Only VERIFY
    failures invalidate the partial file."""
    dest = tmp_path / "local"
    payload = b"0123456789" * 10

    def first_half_then_die(url, part_path):
        with open(part_path, "wb") as f:
            f.write(payload[:50])
        raise OSError("connection reset")

    items = [ManifestItem("a.obo", "a.obo", expected_size=len(payload))]
    rep = ManifestAcquirer(str(dest), first_half_then_die, max_attempts=1).run(items)
    assert rep.failed == ["a.obo"]
    assert (dest / "a.obo.part").read_bytes() == payload[:50]  # kept

    def resume_rest(url, part_path):
        with open(part_path, "ab") as f:  # append = Range resume
            f.write(payload[os.path.getsize(part_path):])

    rep2 = ManifestAcquirer(str(dest), resume_rest).run(items)
    assert rep2.done == ["a.obo"]
    assert (dest / "a.obo").read_bytes() == payload


def test_ontology_manifest_covers_registry():
    m = ontology_manifest()
    # 12 fetchable (CSO is manual-download and excluded), urls are the
    # DIRECT data-file urls, never homepages
    assert len(m) == 12
    assert {i.filename for i in m} >= {"go-basic.obo", "MSC_2020.csv", "physh.ttl"}
    assert all(i.url.startswith("http") for i in m)
    assert not any(i.url.rstrip("/").endswith((".gov", ".org", ".eu")) for i in m)
    assert isinstance(AcquisitionReport().ok, bool)
