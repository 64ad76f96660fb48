"""HTTP facade tests: drive the stdlib server over real sockets, end to
end through LakeEngine → LakeTable → parquet (the reference exercises its
FastAPI app the same way: live HTTP against live Iceberg)."""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request

import pytest

from datalake_on_prem_system_spark.api import LakeApiServer
from datalake_on_prem_system_spark.engine import LakeEngine


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    eng = LakeEngine(spark, str(tmp_path_factory.mktemp("wh")), namespace="api_ns")
    eng.write_table(
        "products",
        spark.createDataFrame(
            [(1, "alpha widget", 9.5), (2, "beta gadget", 3.25), (3, "gamma widget", 7.0)],
            "product_id int, name string, price double",
        ),
    )
    srv = LakeApiServer(eng).start()
    yield eng, f"http://127.0.0.1:{srv.port}"
    srv.stop()


def _get(base: str, path: str) -> dict:
    with urllib.request.urlopen(base + path) as r:
        return json.loads(r.read())


def _post(base: str, path: str, body: bytes = b"", json_body: dict | None = None) -> dict:
    if json_body is not None:
        body = json.dumps(json_body).encode()
    req = urllib.request.Request(base + path, data=body, method="POST")
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_portal_and_tables(served):
    eng, base = served
    with urllib.request.urlopen(base + "/") as r:
        html = r.read().decode()
    assert "products" in html and "text/html" in r.headers["Content-Type"]
    assert _get(base, "/tables")["tables"] == ["products"]


def test_data_page_limit_and_order(served):
    _, base = served
    out = _get(base, "/data/products?limit=2")
    assert out["columns"] == ["product_id", "name", "price"]
    # latest-first page: ORDER BY pk DESC LIMIT n (api_poc.py:287-298)
    assert [r["product_id"] for r in out["rows"]] == [3, 2]


def test_sql_workspace(served):
    _, base = served
    out = _get(base, "/sql-workspace?query=SELECT%20count(*)%20AS%20n%20FROM%20products")
    assert out["rows"] == [{"n": 3}]
    # bad SQL → 400 with detail, not a 500
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base, "/sql-workspace?query=SELEKT%20broken")
    assert e.value.code == 400


def test_view_search_and_snapshot(served):
    _, base = served
    hits = _get(base, "/view/products?search=widget")
    assert {r["product_id"] for r in hits["rows"]} == {1, 3}
    assert hits["snapshots"], "dashboard sidebar carries snapshot history"
    v0 = _get(base, "/view/products?snapshot=0")
    assert len(v0["rows"]) == 3


def test_edit_insert_update_delete_roundtrip(served):
    _, base = served
    assert _get(base, "/edit/products/2")["row"]["name"] == "beta gadget"
    _post(base, "/insert/products", json_body={"product_id": 9, "name": "delta", "price": 1.5})
    assert _get(base, "/edit/products/9")["row"]["price"] == 1.5
    _post(base, "/update/products/9", json_body={"price": 2.5})
    assert _get(base, "/edit/products/9")["row"]["price"] == 2.5
    _post(base, "/delete/products/9")
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base, "/edit/products/9")
    assert e.value.code == 404
    # table state back to the original three rows
    assert len(_get(base, "/data/products?limit=50")["rows"]) == 3


def test_upload_direct_csv(served):
    _, base = served
    csv = b"item_id,label\n1,first\n2,second\n"
    out = _post(base, "/upload/uploads_t1", body=csv)
    assert out == {"status": "ingested", "table": "uploads_t1", "mode": "direct", "rows": 2}
    # keyed re-upload upserts instead of duplicating (api_poc.py:300-320)
    csv2 = b"item_id,label\n2,second-v2\n3,third\n"
    out2 = _post(base, "/upload/uploads_t1?pk=item_id", body=csv2)
    assert out2["rows"] == 3
    rows = {r["item_id"]: r["label"] for r in _get(base, "/data/uploads_t1")["rows"]}
    assert rows == {1: "first", 2: "second-v2", 3: "third"}


def test_upload_cdc_stream(served):
    _, base = served
    events = [
        {"payload": {"before": None, "after": {"id": 1, "name": "a", "seq": 1}, "op": "c"}},
        {"payload": {"before": None, "after": {"id": 2, "name": "b", "seq": 1}, "op": "c"}},
        # delete's row image rides `before` (P2); seq=2 outranks the create
        {"payload": {"before": {"id": 1, "name": "a", "seq": 2}, "after": None, "op": "d"}},
    ]
    body = "\n".join(json.dumps(e) for e in events).encode()
    ddl = "id bigint, name string, seq bigint"
    out = _post(
        base,
        "/upload/uploads_cdc?mode=cdc&pk=id&order_cols=seq&row_ddl="
        + urllib.parse.quote(ddl),
        body=body,
    )
    assert out["rows"] == 1
    rows = _get(base, "/data/uploads_cdc")["rows"]
    assert [r["id"] for r in rows] == [2]


def test_unknown_routes_and_tables_404(served):
    _, base = served
    for path in ("/nope", "/data/missing_table", "/edit/products/12345"):
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(base, path)
        assert e.value.code == 404


def test_history_and_diff(served):
    _, base = served
    hist = _get(base, "/history/products")["snapshots"]
    assert len(hist) >= 2  # create + the CRUD churn above
    diff = _get(base, "/diff/products?v_old=0&v_new=1")["diff"]
    assert diff, "insert between v0 and v1 must show up"


def test_percent_encoded_pk_roundtrip(served):
    """Path segments are percent-decoded: a string pk containing a space
    must be addressable through /edit, /update, and /delete."""
    eng, base = served
    eng.write_table(
        "people",
        eng.spark.createDataFrame(
            [("John Doe", 30), ("Jane Roe", 40)], "person_id string, age int"
        ),
    )
    enc = urllib.parse.quote("John Doe")
    row = _get(base, f"/edit/people/{enc}")["row"]
    assert row["person_id"] == "John Doe"
    _post(base, f"/update/people/{enc}", json_body={"age": "31"})
    assert _get(base, f"/edit/people/{enc}")["row"]["age"] == 31
    _post(base, f"/delete/people/{enc}")
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(base, f"/edit/people/{enc}")
    assert exc.value.code == 404


def test_insert_rejects_nested_json_values(served):
    """Nested JSON values must be rejected with 400, never committed as a
    Python repr string."""
    _, base = served
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(
            base,
            "/insert/products",
            json_body={"product_id": "77", "name": ["a", "b"], "price": "1.0"},
        )
    assert exc.value.code == 400


def test_view_default_page_is_latest_first(served):
    """/view without search/snapshot must serve the same latest-first page
    as /data, not an arbitrary partition sample."""
    _, base = served
    view_ids = [r["product_id"] for r in _get(base, "/view/products?limit=2")["rows"]]
    data_ids = [r["product_id"] for r in _get(base, "/data/products?limit=2")["rows"]]
    assert view_ids == data_ids == sorted(view_ids, reverse=True)


def test_clone_endpoint(served):
    _, base = served
    out = _post(base, "/clone/products/products_fork")
    assert out == {"status": "cloned", "table": "products", "dest": "products_fork"}
    _post(base, "/update/products_fork/1", json_body={"price": 123.0})
    fork = {r["product_id"]: r["price"] for r in _get(base, "/data/products_fork")["rows"]}
    orig = {r["product_id"]: r["price"] for r in _get(base, "/data/products")["rows"]}
    assert fork[1] == 123.0 and orig[1] != 123.0
    # restore the fork to its bootstrap (the clone preserves the source's
    # version numbering, so resolve it from history rather than assuming 0)
    boot = min(
        s["version"] for s in _get(base, "/history/products_fork")["snapshots"]
    )
    out = _post(base, f"/restore/products_fork/{boot}")
    assert out == {"status": "restored", "table": "products_fork", "version": boot}
    fork = {r["product_id"]: r["price"] for r in _get(base, "/data/products_fork")["rows"]}
    assert fork[1] == orig[1]


def test_changes_endpoint(served):
    _, base = served
    hist = _get(base, "/history/products")["snapshots"]
    v_to = max(s["version"] for s in hist)
    out = _get(base, f"/changes/products?v_from=0&v_to={v_to}")
    assert out["table"] == "products"
    assert out["changes"], "CRUD churn above must surface as change records"
    assert {c["_change_type"] for c in out["changes"]} <= {"insert", "update", "delete"}
    assert all("_commit_version" in c for c in out["changes"])


def test_diff_and_changes_responses_are_bounded(served):
    """/diff and /changes default to a LIMIT-100 page (the reference scopes
    its diff to the rendered page, api_poc.py:436) — a large diff must not
    collect the whole table into one HTTP response, and ?limit= overrides."""
    eng, base = served
    spark = eng.spark
    eng.write_table(
        "bulk",
        spark.createDataFrame(
            [(i, f"a{i}") for i in range(300)], "bulk_id int, s string"
        ),
    )
    eng.write_table(
        "bulk",
        spark.createDataFrame(
            [(i, f"b{i}") for i in range(300)], "bulk_id int, s string"
        ),
    )
    diff = _get(base, "/diff/bulk?v_old=0&v_new=1")["diff"]
    assert len(diff) == 100  # 300 modified keys, default page of 100
    assert [r["bulk_id"] for r in diff] == sorted(r["bulk_id"] for r in diff)
    assert len(_get(base, "/diff/bulk?v_old=0&v_new=1&limit=7")["diff"]) == 7
    changes = _get(base, "/changes/bulk?v_from=0&v_to=1")["changes"]
    assert len(changes) == 100
    assert len(_get(base, "/changes/bulk?v_from=0&v_to=1&limit=5")["changes"]) == 5


def test_branch_routes_roundtrip(served):
    eng, base = served
    eng.write_table(
        "brtab",
        eng.spark.createDataFrame([(1, "one"), (2, "two")], "id int, name string"),
    )
    out = _post(base, "/branch/brtab/create/dev")
    assert out["status"] == "branched" and out["fork_version"] == 0
    assert _get(base, "/branches/brtab")["branches"] == {"dev": 0}
    eng.catalog.table("brtab").branch_table("dev").insert_rows(
        [{"id": 3, "name": "three"}]
    )
    rows = _get(base, "/branch/brtab/dev")["rows"]
    assert {r["id"] for r in rows} == {1, 2, 3}
    # main untouched until the merge lands
    assert {r["id"] for r in _get(base, "/data/brtab")["rows"]} == {1, 2}
    assert _post(base, "/branch/brtab/merge/dev")["status"] == "merged"
    assert {r["id"] for r in _get(base, "/data/brtab")["rows"]} == {1, 2, 3}
    assert _post(base, "/branch/brtab/delete/dev")["status"] == "deleted"
    assert _get(base, "/branches/brtab")["branches"] == {}
