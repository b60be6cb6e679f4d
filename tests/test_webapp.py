"""Web SQL console: guard integration, result shaping, HTTP round-trip
on a loopback socket (no external network)."""

from __future__ import annotations

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import pytest

from science_datalake_spark.catalog import register_views
from science_datalake_spark.webapp import (
    EXAMPLE_QUERIES,
    QueryService,
    make_handler,
)


@pytest.fixture(scope="module")
def service(spark, sf_oracle):
    register_views(spark, sf_oracle)
    return QueryService(spark, row_cap=100)


def test_select_returns_rows_and_status(service):
    res = service.run("SELECT r_name FROM region ORDER BY r_name")
    assert res.error == ""
    assert res.columns == ["r_name"]
    assert [r[0] for r in res.rows] == ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    assert "5 rows" in res.status


def test_guard_rejects_ddl(service):
    res = service.run("DROP TABLE region")
    assert res.rows == [] and "rejected" in res.error


def test_row_cap_truncation_notice(service):
    res = service.run("SELECT o_orderkey FROM orders")
    assert len(res.rows) == 100  # capped by injected LIMIT
    assert "[truncated to 100]" in res.status


def test_sql_error_surfaces(service):
    res = service.run("SELECT no_such_column FROM region")
    assert "SQL error" in res.error


def test_examples_are_guard_clean_and_runnable(service):
    """Every gallery entry must pass the guard and execute (reference
    app.py gallery is always runnable)."""
    for name, sql in EXAMPLE_QUERIES.items():
        res = service.run(sql)
        assert res.error == "", f"{name}: {res.error}"
        assert res.columns, name


def test_http_roundtrip(service):
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        page = urllib.request.urlopen(f"{base}/").read().decode()
        assert "Science Datalake Explorer" in page

        ex = json.loads(urllib.request.urlopen(f"{base}/api/examples").read())
        assert set(ex) == set(EXAMPLE_QUERIES)

        tabs = json.loads(urllib.request.urlopen(f"{base}/api/tables").read())
        assert "region" in tabs and "r_name" in tabs["region"]

        req = urllib.request.Request(
            f"{base}/api/query",
            data=json.dumps({"sql": "SELECT COUNT(*) AS n FROM nation"}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        res = json.loads(urllib.request.urlopen(req).read())
        assert res["columns"] == ["n"] and res["rows"][0][0] == 25

        bad = urllib.request.Request(
            f"{base}/api/query",
            data=json.dumps({"sql": "DELETE FROM nation"}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(bad)
        assert exc.value.code == 400
        assert "rejected" in json.loads(exc.value.read())["error"]
    finally:
        server.shutdown()
        server.server_close()
