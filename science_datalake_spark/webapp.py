"""Web SQL console — the engine's second query surface.

Re-expresses the reference's Gradio explorer (app.py:221-254: SQL box,
example-query gallery app.py:39-151, result table, truncation notice,
row cap) over the existing ``cli.guard_sql`` gate and a SparkSession,
using only stdlib ``http.server`` (no Gradio in this container; the
surface is the same: POST a query, get a capped tabular result).

Design: ``QueryService`` is the transport-free core (guard → spark.sql →
rows + status), so tests exercise guard integration without sockets; the
HTTP layer is a thin JSON adapter around it. Concurrency: Spark sessions
are thread-safe for read queries, and ThreadingHTTPServer gives one
thread per request — fine for a console; a production deployment would
front this with Spark Connect instead.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from science_datalake_spark.cli import DEFAULT_ROW_CAP, UnsafeSQLError, guard_sql

#: Example gallery (reference app.py:39-151), adapted to the testdata
#: tables the catalog registers.
EXAMPLE_QUERIES: dict[str, str] = {
    "Quick overview: row counts per dataset": """
SELECT 'orders' AS dataset, COUNT(*) AS n_rows FROM orders
UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
UNION ALL SELECT 'customer', COUNT(*) FROM customer
UNION ALL SELECT 'documents', COUNT(*) FROM documents
UNION ALL SELECT 'events', COUNT(*) FROM events
ORDER BY n_rows DESC
""",
    "Top 10 customers by revenue": """
SELECT c.c_name, ROUND(SUM(o.o_totalprice), 2) AS revenue, COUNT(*) AS n_orders
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_name
ORDER BY revenue DESC
LIMIT 10
""",
    "Order status by year": """
SELECT year(o_orderdate) AS yr, o_orderstatus, COUNT(*) AS n
FROM orders
GROUP BY yr, o_orderstatus
ORDER BY yr, o_orderstatus
""",
    "Documents per source and language": """
SELECT source, lang, COUNT(*) AS n_docs, ROUND(AVG(n_chars), 1) AS avg_chars
FROM documents
GROUP BY source, lang
ORDER BY n_docs DESC
""",
    "Recent high-value orders (convenience view)": """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM recent_orders
WHERE o_totalprice > 400000
ORDER BY o_totalprice DESC
LIMIT 25
""",
    "Hourly event volume (one day)": """
SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n_events
FROM events
WHERE ts >= TIMESTAMP '2024-03-01 00:00:00' AND ts < TIMESTAMP '2024-03-02 00:00:00'
GROUP BY hour
ORDER BY hour
""",
}


@dataclass
class QueryResult:
    columns: list[str] = field(default_factory=list)
    rows: list[list[object]] = field(default_factory=list)
    status: str = ""
    error: str = ""

    def to_dict(self) -> dict[str, object]:
        return {
            "columns": self.columns,
            "rows": self.rows,
            "status": self.status,
            "error": self.error,
        }


class QueryService:
    """Transport-free console core: guard → execute → capped result."""

    def __init__(self, spark: SparkSession, row_cap: int = DEFAULT_ROW_CAP):
        self.spark = spark
        self.row_cap = row_cap

    def tables(self) -> dict[str, list[str]]:
        return {
            t.name: [f.name for f in self.spark.table(t.name).schema.fields]
            for t in self.spark.catalog.listTables()
        }

    def run(self, sql: str) -> QueryResult:
        try:
            safe = guard_sql(sql, self.row_cap)
        except UnsafeSQLError as e:
            return QueryResult(error=f"rejected: {e}")
        t0 = time.perf_counter()
        try:
            df = self.spark.sql(safe)
            rows = df.collect()
        except Exception as e:  # Spark analysis/runtime errors back to the user
            return QueryResult(error=f"SQL error: {e}", status=f"({time.perf_counter() - t0:.2f}s)")
        elapsed = time.perf_counter() - t0
        status = f"{len(rows):,} rows ({elapsed:.2f}s)"
        if len(rows) >= self.row_cap:
            status += f" [truncated to {self.row_cap}]"  # reference app.py:247
        return QueryResult(
            columns=list(df.columns),
            rows=[[_jsonable(v) for v in r] for r in rows],
            status=status,
        )


def _jsonable(v: object) -> object:
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if hasattr(v, "asDict"):
        return {k: _jsonable(x) for k, x in v.asDict().items()}
    return str(v)


_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>Science Datalake Explorer</title>
<style>
 body{font-family:system-ui,sans-serif;margin:2rem;max-width:70rem}
 textarea{width:100%;height:8rem;font-family:monospace}
 table{border-collapse:collapse;margin-top:1rem}
 td,th{border:1px solid #ccc;padding:.25rem .5rem;font-size:.85rem}
 #status{color:#555;margin-left:1rem} #error{color:#b00}
 select{max-width:100%}
</style></head><body>
<h1>Science Datalake Explorer</h1>
<p>Read-only SQL over the registered Parquet views. Results capped; a
trailing LIMIT is injected automatically.</p>
<select id="examples"><option value="">— example queries —</option></select>
<textarea id="sql">SELECT 'orders' AS dataset, COUNT(*) AS n_rows FROM orders</textarea><br>
<button onclick="runQuery()">Run</button><span id="status"></span>
<div id="error"></div><div id="result"></div>
<script>
fetch('api/examples').then(r=>r.json()).then(ex=>{
  const sel=document.getElementById('examples');
  for(const name in ex){const o=document.createElement('option');o.value=ex[name];o.textContent=name;sel.appendChild(o);}
  sel.onchange=()=>{if(sel.value)document.getElementById('sql').value=sel.value.trim();};
});
function runQuery(){
  const sql=document.getElementById('sql').value;
  document.getElementById('status').textContent='running…';
  fetch('api/query',{method:'POST',headers:{'Content-Type':'application/json'},body:JSON.stringify({sql})})
  .then(r=>r.json()).then(res=>{
    document.getElementById('status').textContent=res.status||'';
    document.getElementById('error').textContent=res.error||'';
    const div=document.getElementById('result');div.innerHTML='';
    if(!res.columns||!res.columns.length)return;
    // DOM construction with textContent — result cells are arbitrary
    // corpus text and must never be parsed as HTML
    const tbl=document.createElement('table');
    const hr=tbl.insertRow();
    for(const c of res.columns){const th=document.createElement('th');th.textContent=c;hr.appendChild(th);}
    for(const r of res.rows){
      const tr=tbl.insertRow();
      for(const v of r){tr.insertCell().textContent=(v===null?'∅':String(v));}
    }
    div.appendChild(tbl);
  });
}
</script></body></html>
"""


def make_handler(service: QueryService) -> type[BaseHTTPRequestHandler]:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt: str, *args: object) -> None:  # quiet
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, obj: object, code: int = 200) -> None:
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self) -> None:
            if self.path in ("/", "/index.html"):
                self._send(200, _PAGE.encode(), "text/html; charset=utf-8")
            elif self.path == "/api/examples":
                self._send_json(EXAMPLE_QUERIES)
            elif self.path == "/api/tables":
                self._send_json(service.tables())
            else:
                self._send_json({"error": "not found"}, 404)

        def do_POST(self) -> None:
            if self.path != "/api/query":
                self._send_json({"error": "not found"}, 404)
                return
            length = int(self.headers.get("Content-Length", "0"))
            try:
                payload = json.loads(self.rfile.read(length) or b"{}")
                sql = str(payload.get("sql", ""))
            except (ValueError, UnicodeDecodeError):
                self._send_json({"error": "invalid JSON body"}, 400)
                return
            result = service.run(sql)
            self._send_json(result.to_dict(), 200 if not result.error else 400)

    return Handler


def serve(
    sf_dir: str = "/root/testdata/sf0.01",
    host: str = "127.0.0.1",
    port: int = 7860,
    row_cap: int = DEFAULT_ROW_CAP,
) -> None:
    """Bootstrap a session + views and serve the console (blocking)."""
    from science_datalake_spark.catalog import bootstrap_session, register_views
    from science_datalake_spark.session import get_spark

    spark = bootstrap_session(get_spark("sds-webapp"), sf_dir)
    register_views(spark, sf_dir)
    service = QueryService(spark, row_cap=row_cap)
    server = ThreadingHTTPServer((host, port), make_handler(service))
    print(f"console: http://{host}:{server.server_address[1]}/  (sf_dir={sf_dir})")
    server.serve_forever()


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description="science-datalake web SQL console")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--row-cap", type=int, default=DEFAULT_ROW_CAP)
    a = p.parse_args()
    serve(a.sf_dir, a.host, a.port, a.row_cap)
