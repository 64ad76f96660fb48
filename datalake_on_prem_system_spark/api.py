"""HTTP facade over :class:`LakeEngine` — the reference's FastAPI app
(api_poc.py:12, endpoints :208-823) re-expressed on the stdlib HTTP server
(no web framework in this environment; the routing table is 1:1).

| reference (api_poc.py)                     | here                          |
|--------------------------------------------|-------------------------------|
| GET  / home portal (:125-206)              | GET  /                        |
| GET  /sql-workspace?query= (:208-263)      | GET  /sql-workspace?query=    |
| GET  /tables (:274-284)                    | GET  /tables                  |
| GET  /data/{t}?limit= (:286-298)           | GET  /data/{t}?limit=         |
| POST /upload/{t} mode=direct|cdc (:300-360)| POST /upload/{t}?mode=&pk=    |
| GET  /view/{t}?search=&snapshot= (:362-646)| GET  /view/{t}?search=&snapshot= |
| GET  /edit/{t}/{id} (:648-726)             | GET  /edit/{t}/{id}           |
| POST /update/{t}/{id} (:728-761)           | POST /update/{t}/{id}         |
| POST /insert/{t} (:763-801)                | POST /insert/{t}              |
| POST /delete/{t}/{id} (:803-823)           | POST /delete/{t}/{id}         |

The reference returns server-rendered HTML for the portal/dashboard pages
and JSON for the API routes; here every data route returns JSON (the
portal returns a minimal HTML shell listing tables, matching the home
page's role). Result payloads are produced via ``DataFrame.toJSON`` so
Spark's own JSON encoding handles dates/decimals/arrays/structs.

Scale note: the server is a thin driver-side control plane — every data
operation is a Spark job; nothing row-sized is held beyond the JSON page
being returned (``limit`` defaults mirror the reference's ``LIMIT 10``).
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

from pyspark.sql import DataFrame

from .engine import LakeEngine

_DEFAULT_LIMIT = 10  # api_poc.py:287 `limit: int = 10`
_DIFF_LIMIT = 100  # /diff + /changes page size (api_poc.py:436 LIMIT-100 diff)


def _df_rows(df: DataFrame, limit: int | None = None) -> list[dict]:
    if limit is not None:
        df = df.limit(limit)
    return [json.loads(s) for s in df.toJSON().collect()]


class _Handler(BaseHTTPRequestHandler):
    engine: LakeEngine  # set on the subclass by make_server

    # ------------------------------------------------------------ plumbing

    def log_message(self, fmt, *args):  # quiet: tests drive many requests
        pass

    def _send(self, code: int, payload: dict | str, content_type: str = "application/json") -> None:
        body = (
            payload.encode() if isinstance(payload, str) else json.dumps(payload).encode()
        )
        self.send_response(code)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _error(self, code: int, msg: str) -> None:
        self._send(code, {"detail": msg})

    def _body(self) -> bytes:
        n = int(self.headers.get("Content-Length") or 0)
        return self.rfile.read(n) if n else b""

    def _json_body(self) -> dict:
        raw = self._body()
        data = json.loads(raw.decode()) if raw else {}
        if not isinstance(data, dict):
            raise ValueError("body must be a JSON object")
        out: dict = {}
        for k, v in data.items():
            if isinstance(v, (dict, list)):
                # str() would silently commit the Python repr as the cell
                raise ValueError(f"column {k!r}: nested JSON values are not supported")
            out[k] = None if v is None else str(v)
        return out

    # ------------------------------------------------------------- routes

    def do_GET(self) -> None:  # noqa: N802 (stdlib casing)
        url = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(url.query).items()}
        # percent-decode segments: /edit/t/John%20Doe must address pk
        # 'John Doe' (parse_qs already decodes the query side)
        parts = [unquote(p) for p in url.path.split("/") if p]
        try:
            if not parts:
                return self._portal()
            if parts[0] == "tables" and len(parts) == 1:
                return self._send(200, {"tables": self.engine.list_tables()})
            if parts[0] == "data" and len(parts) == 2:
                return self._data(parts[1], q)
            if parts[0] == "sql-workspace" and len(parts) == 1:
                return self._sql(q)
            if parts[0] == "view" and len(parts) == 2:
                return self._view(parts[1], q)
            if parts[0] == "history" and len(parts) == 2:
                return self._send(
                    200, {"table": parts[1], "snapshots": _df_rows(self.engine.history(parts[1]))}
                )
            if parts[0] == "diff" and len(parts) == 2:
                # page-bounded like the reference's LIMIT-scoped diff
                # (api_poc.py:436): an unbounded diff of two large versions
                # would collect the whole table into one HTTP response.
                # Ordered by pk so pages are deterministic (TakeOrdered —
                # no full sort materializes)
                limit = int(q.get("limit", _DIFF_LIMIT))
                d = self.engine.diff(parts[1], int(q["v_old"]), int(q["v_new"]))
                d = d.orderBy(d.columns[0])
                return self._send(
                    200, {"table": parts[1], "diff": _df_rows(d, limit=limit)}
                )
            if parts[0] == "changes" and len(parts) == 2:
                limit = int(q.get("limit", _DIFF_LIMIT))
                c = self.engine.changes(parts[1], int(q["v_from"]), int(q["v_to"]))
                c = c.drop("changed_cells").orderBy("_commit_version", c.columns[0])
                return self._send(
                    200, {"table": parts[1], "changes": _df_rows(c, limit=limit)}
                )
            if parts[0] == "branches" and len(parts) == 2:
                return self._send(
                    200, {"table": parts[1], "branches": self.engine.branches(parts[1])}
                )
            if parts[0] == "branch" and len(parts) == 3:
                limit = int(q.get("limit", _DEFAULT_LIMIT))
                df = self.engine.read_branch(
                    parts[1], parts[2], version=q.get("version")
                )
                # deterministic page, like /data: first-column order +
                # TakeOrdered (an unordered .limit is an arbitrary
                # partition sample that changes between requests)
                df = df.orderBy(df.columns[0]).limit(limit)
                return self._send(
                    200,
                    {
                        "table": parts[1],
                        "branch": parts[2],
                        "columns": df.columns,
                        "rows": _df_rows(df),
                    },
                )
            if parts[0] == "edit" and len(parts) == 3:
                return self._edit(parts[1], parts[2])
            return self._error(404, f"no route: {url.path}")
        except KeyError as e:
            return self._error(400, f"missing parameter: {e}")
        except ValueError as e:
            return self._error(400, str(e))
        except Exception as e:  # unknown table, Spark analysis errors, ...
            return self._error(404, str(e).splitlines()[0][:300])

    def do_POST(self) -> None:  # noqa: N802
        url = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(url.query).items()}
        parts = [unquote(p) for p in url.path.split("/") if p]
        try:
            if parts[0:1] == ["upload"] and len(parts) == 2:
                return self._upload(parts[1], q)
            if parts[0:1] == ["insert"] and len(parts) == 2:
                self.engine.insert(parts[1], self._json_body())
                return self._send(200, {"status": "inserted", "table": parts[1]})
            if parts[0:1] == ["update"] and len(parts) == 3:
                self.engine.update(parts[1], parts[2], self._json_body())
                return self._send(200, {"status": "updated", "table": parts[1], "id": parts[2]})
            if parts[0:1] == ["delete"] and len(parts) == 3:
                self.engine.delete(parts[1], parts[2])
                return self._send(200, {"status": "deleted", "table": parts[1], "id": parts[2]})
            if parts[0:1] == ["clone"] and len(parts) == 3:
                version = int(q["version"]) if "version" in q else None
                self.engine.clone(parts[1], parts[2], version=version)
                return self._send(
                    200, {"status": "cloned", "table": parts[1], "dest": parts[2]}
                )
            if parts[0:1] == ["branch"] and len(parts) == 4 and parts[2] == "create":
                v = self.engine.create_branch(
                    parts[1], parts[3],
                    version=int(q["version"]) if "version" in q else None,
                )
                return self._send(
                    200,
                    {"status": "branched", "table": parts[1], "branch": parts[3], "fork_version": v},
                )
            if parts[0:1] == ["branch"] and len(parts) == 4 and parts[2] == "merge":
                v = self.engine.merge_branch(parts[1], parts[3])
                return self._send(
                    200,
                    {"status": "merged", "table": parts[1], "branch": parts[3], "version": v},
                )
            if parts[0:1] == ["branch"] and len(parts) == 4 and parts[2] == "delete":
                existed = self.engine.delete_branch(parts[1], parts[3])
                return self._send(
                    200,
                    {"status": "deleted" if existed else "absent", "table": parts[1], "branch": parts[3]},
                )
            if parts[0:1] == ["restore"] and len(parts) == 3:
                self.engine.restore(parts[1], int(parts[2]))
                return self._send(
                    200,
                    {"status": "restored", "table": parts[1], "version": int(parts[2])},
                )
            return self._error(404, f"no route: {url.path}")
        except ValueError as e:
            return self._error(400, str(e))
        except Exception as e:
            return self._error(404, str(e).splitlines()[0][:300])

    # ------------------------------------------------------------ handlers

    def _portal(self) -> None:
        """Home portal (api_poc.py:125-206): table list + route index."""
        rows = "".join(
            f'<li><a href="/view/{t}">{t}</a></li>' for t in self.engine.list_tables()
        )
        html = (
            "<html><head><title>Lakehouse Portal</title></head><body>"
            "<h1>Lakehouse Portal</h1>"
            f"<ul>{rows}</ul>"
            '<p><a href="/tables">tables</a> · <a href="/sql-workspace">sql</a></p>'
            "</body></html>"
        )
        self._send(200, html, content_type="text/html")

    def _data(self, table: str, q: dict[str, str]) -> None:
        limit = int(q.get("limit", _DEFAULT_LIMIT))
        df = self.engine.read(table, limit=limit)
        self._send(200, {"table": table, "columns": df.columns, "rows": _df_rows(df)})

    def _sql(self, q: dict[str, str]) -> None:
        """SQL workspace (api_poc.py:208-263): no query → empty workspace;
        a query → rows (errors surface as 400, matching the page's
        inline-error behavior)."""
        sql = q.get("query")
        if not sql:
            return self._send(200, {"rows": [], "columns": []})
        try:
            df = self.engine.query(sql)
            self._send(200, {"columns": df.columns, "rows": _df_rows(df, limit=1000)})
        except Exception as e:
            self._error(400, str(e).splitlines()[0][:300])

    def _view(self, table: str, q: dict[str, str]) -> None:
        """Dashboard view (api_poc.py:362-646): optional full-text search,
        optional snapshot (time travel; expired → latest fallback)."""
        limit = int(q.get("limit", "50"))
        if "snapshot" in q:
            # raw string through: digit strings resolve as versions,
            # anything else as a tag name (resolve_ref)
            df = self.engine.time_travel(table, q["snapshot"])
        elif "search" in q and q["search"]:
            df = self.engine.search(table, q["search"])
        else:
            # latest-first page like /data — engine.read(limit=) orders by
            # pk desc; without it the page is an arbitrary partition sample
            df = self.engine.read(table, limit=limit)
        self._send(
            200,
            {
                "table": table,
                "columns": df.columns,
                "rows": _df_rows(df, limit=limit),
                "snapshots": _df_rows(self.engine.history(table)),
            },
        )

    def _edit(self, table: str, rec_id: str) -> None:
        """Edit-record data (api_poc.py:648-726): the row by pk."""
        pk = self.engine.id_col(table)
        rows = _df_rows(self.engine.read(table, filter_col=pk, filter_val=rec_id))
        if not rows:
            return self._error(404, f"{table}: no row with {pk}={rec_id}")
        self._send(200, {"table": table, "pk": pk, "row": rows[0]})

    def _upload(self, table: str, q: dict[str, str]) -> None:
        """CSV upload+ingest (api_poc.py:300-360): body = raw CSV bytes;
        mode=direct (default) batch-ingests (keyed upsert when pk given),
        mode=cdc streams a Debezium-envelope file through the CDC merger."""
        mode = q.get("mode", "direct")
        suffix = ".csv" if mode == "direct" else ".json"
        body = self._body()
        if not body:
            return self._error(400, "empty upload body")
        work = tempfile.mkdtemp(prefix="api_upload_")
        path = os.path.join(work, f"upload{suffix}")
        try:
            with open(path, "wb") as fh:
                fh.write(body)
            if mode == "cdc":
                self.engine.ingest(
                    table,
                    work,  # the CDC file stream reads a directory
                    mode="cdc",
                    pk=q.get("pk"),
                    row_ddl=q.get("row_ddl"),
                    checkpoint_dir=os.path.join(work, "_ck"),
                    order_cols=q["order_cols"].split(",") if q.get("order_cols") else None,
                )
            else:
                self.engine.ingest(table, path, mode="direct", pk=q.get("pk"))
            # count-verify from commit metadata (O(1); history resolves the
            # rare unknown lazily) — not an O(table) scan per upload
            hist = _df_rows(self.engine.history(table), limit=1)
            n = hist[0]["n_rows"] if hist else 0
            if n is None or n < 0:
                n = self.engine.read(table).count()
            self._send(200, {"status": "ingested", "table": table, "mode": mode, "rows": n})
        finally:
            # the upload body and CDC checkpoint are dead once ingested — a
            # long-running server must not accumulate one dir per request
            import shutil

            shutil.rmtree(work, ignore_errors=True)


def make_server(engine: LakeEngine, host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """Build (don't start) the HTTP server bound to ``engine``. port=0
    picks a free port — read it back from ``server.server_address``."""
    handler = type("LakeApiHandler", (_Handler,), {"engine": engine})
    return ThreadingHTTPServer((host, port), handler)


class LakeApiServer:
    """Lifecycle wrapper: serve in a daemon thread (the Spark driver owns
    the process; requests become Spark jobs on the shared session)."""

    def __init__(self, engine: LakeEngine, host: str = "127.0.0.1", port: int = 0):
        self._httpd = make_server(engine, host, port)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> "LakeApiServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=10)


def main(argv: list[str] | None = None) -> int:
    """`python -m datalake_on_prem_system_spark.api --warehouse W --port P`
    — the `uvicorn api_poc:app` analog."""
    import argparse

    from .session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", default=os.environ.get("LAKE_WAREHOUSE", "./warehouse"))
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    args = ap.parse_args(argv)
    eng = LakeEngine(get_spark(app_name="lake_api"), args.warehouse)
    srv = LakeApiServer(eng, host=args.host, port=args.port)
    print(f"serving on http://{args.host}:{srv.port}")
    srv.start()
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        srv.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
