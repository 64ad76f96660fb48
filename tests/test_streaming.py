from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from datalake_on_prem_system_spark.lakehouse import LakeTable
from datalake_on_prem_system_spark.streaming import (
    debezium_schemas,
    last_writer_wins,
    normalize_envelope,
    run_cdc_file_stream,
)

ROW_DDL = "id bigint, name string, seq bigint"


def _write_events(path: str, events: list[dict]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        for e in events:
            fh.write(json.dumps(e) + "\n")


def _wrapped(before, after, op):
    return {"payload": {"before": before, "after": after, "op": op}}


def _flat(before, after, op):
    return {"before": before, "after": after, "op": op}


def test_envelope_sniff_mixed_formats(spark):
    rows = [
        _wrapped(None, {"id": 1, "name": "w", "seq": 1}, "c"),
        _flat(None, {"id": 2, "name": "f", "seq": 1}, "c"),
        _wrapped({"id": 3, "name": "gone", "seq": 2}, None, "d"),  # key resurrection
    ]
    df = spark.createDataFrame([(json.dumps(r),) for r in rows], "value string")
    out = {r.id: (r.name, r.op) for r in normalize_envelope(df, ROW_DDL).collect()}
    assert out == {1: ("w", "c"), 2: ("f", "c"), 3: ("gone", "d")}


def test_debezium_schema_shapes(spark):
    # the spark fixture is load-bearing: DDL parsing needs an active
    # context, and without it this test only passed by suite ordering
    wrapped, flat = debezium_schemas(ROW_DDL)
    assert wrapped.fieldNames() == ["payload"]
    assert flat.fieldNames() == ["before", "after", "op"]


def test_update_setting_column_to_null_is_not_resurrected(spark):
    """An update whose after-image legitimately NULLs a column must keep
    the NULL — a per-field coalesce with the before-image would silently
    restore the old value."""
    rows = [
        _wrapped({"id": 1, "name": "old", "seq": 1}, {"id": 1, "name": None, "seq": 2}, "u"),
    ]
    df = spark.createDataFrame([(json.dumps(r),) for r in rows], "value string")
    out = normalize_envelope(df, ROW_DDL).collect()
    assert out[0].name is None
    assert out[0].id == 1


def test_last_writer_wins(spark):
    df = spark.createDataFrame(
        [(1, "old", 1, "u"), (1, "new", 2, "u"), (2, "only", 1, "u")],
        "id bigint, name string, seq bigint, op string",
    )
    out = {r.id: r.name for r in last_writer_wins(df, "id", ["seq"]).collect()}
    assert out == {1: "new", 2: "only"}


def _run(spark, tmp_path, tag, events_by_file):
    src = str(tmp_path / f"src_{tag}")
    for i, events in enumerate(events_by_file):
        _write_events(os.path.join(src, f"{i}.json"), events)
    table = LakeTable(spark, str(tmp_path / f"tbl_{tag}"))
    table.create_or_replace(
        spark.createDataFrame([(1, "base1", 0), (2, "base2", 0)], ROW_DDL)
    )
    ckpt = str(tmp_path / f"ckpt_{tag}")
    run_cdc_file_stream(
        spark, table, pk="id", row_ddl=ROW_DDL, src_dir=src, checkpoint_dir=ckpt,
        order_cols=["seq"], max_files_per_trigger=1,
    )
    return table, src, ckpt


def test_cdc_stream_end_to_end(spark, tmp_path):
    table, _, _ = _run(
        spark, tmp_path, "e2e",
        [[
            _wrapped(None, {"id": 1, "name": "upd1", "seq": 1}, "u"),
            _flat({"id": 2, "name": "base2", "seq": 0}, None, "d"),
            _wrapped(None, {"id": 3, "name": "new3", "seq": 1}, "c"),
            _wrapped(None, {"id": 3, "name": "new3b", "seq": 2}, "u"),  # same batch, later seq
        ]],
    )
    rows = {r.id: r.name for r in table.read().collect()}
    assert rows == {1: "upd1", 3: "new3b"}


def test_cdc_checkpoint_replay_is_noop(spark, tmp_path):
    """Re-running the stream with the same checkpoint must not reprocess
    committed batches (idempotent restart, T2)."""
    table, src, ckpt = _run(
        spark, tmp_path, "replay",
        [[_wrapped(None, {"id": 1, "name": "v1", "seq": 1}, "u")]],
    )
    versions_before = table.versions()
    run_cdc_file_stream(
        spark, table, pk="id", row_ddl=ROW_DDL, src_dir=src, checkpoint_dir=ckpt,
        order_cols=["seq"],
    )
    assert table.versions() == versions_before  # no new commit


def test_cdc_new_file_after_restart_processes_incrementally(spark, tmp_path):
    table, src, ckpt = _run(
        spark, tmp_path, "incr",
        [[_wrapped(None, {"id": 1, "name": "v1", "seq": 1}, "u")]],
    )
    _write_events(
        os.path.join(src, "late.json"),
        [_wrapped(None, {"id": 1, "name": "v2", "seq": 2}, "u")],
    )
    run_cdc_file_stream(
        spark, table, pk="id", row_ddl=ROW_DDL, src_dir=src, checkpoint_dir=ckpt,
        order_cols=["seq"],
    )
    rows = {r.id: r.name for r in table.read().collect()}
    assert rows[1] == "v2"


def test_empty_batch_guard(spark, tmp_path):
    """A stream over only-unparseable lines must not commit DATA (P12):
    no rewrite, no delta segment — the only commit the batch may leave is
    the metadata-only watermark record (set_properties), which carries
    the parent's file list verbatim and makes a crash replay of the empty
    batch detectable."""
    src = str(tmp_path / "src_empty")
    _write_events(os.path.join(src, "bad.json"), [{"noise": True}])
    table = LakeTable(spark, str(tmp_path / "tbl_empty"))
    table.create_or_replace(spark.createDataFrame([(1, "x", 0)], ROW_DDL))
    files_before = [dict(e) for e in table.commit_at().files]
    run_cdc_file_stream(
        spark, table, pk="id", row_ddl=ROW_DDL, src_dir=src,
        checkpoint_dir=str(tmp_path / "ckpt_empty"), order_cols=["seq"],
    )
    latest = table.commit_at()
    assert latest.files == files_before  # no data written, nothing merged
    assert latest.operation in ("create_or_replace", "set_properties")
    assert table.read().count() == 1


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-key state across micro-batches:
    two files forced into separate batches must accumulate, not reset."""
    import uuid

    from datalake_on_prem_system_spark.streaming.stateful import running_user_totals

    src = str(tmp_path / "ev")
    os.makedirs(src)
    with open(os.path.join(src, "a.json"), "w") as fh:
        fh.write('{"user_id": 1, "value": 10.0}\n{"user_id": 2, "value": 5.0}\n')
    with open(os.path.join(src, "b.json"), "w") as fh:
        fh.write('{"user_id": 1, "value": 2.5}\n')

    stream = spark.readStream.schema("user_id bigint, value double").option(
        "maxFilesPerTrigger", 1
    ).json(src)
    sink = f"st_{uuid.uuid4().hex[:8]}"
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(sink).collect()
    # last emission per user reflects accumulated state
    last = {}
    for r in rows:
        last[r.user_id] = (r.n_events, r.total_value)
    assert last[1] == (2, 12.5)  # 10.0 + 2.5 across two batches
    assert last[2] == (1, 5.0)


def test_stateful_funnel_advances_across_batches(spark, tmp_path):
    """The streaming funnel's per-user (stage, t) state must carry across
    micro-batches (view in batch 1, click+purchase in batch 2 → stage 3)
    and must enforce the strictly-after contract within a batch (a click
    at the same ts_us as the view does not count)."""
    import time as _time
    import uuid

    from datalake_on_prem_system_spark.streaming.stateful import funnel_stage_stream

    src = str(tmp_path / "ev")
    os.makedirs(src)
    # batch 1: user 1 views; user 2 views and same-ts clicks (no advance)
    with open(os.path.join(src, "a.json"), "w") as fh:
        fh.write(
            '{"user_id": 1, "ts_us": 100, "event_type": "view"}\n'
            '{"user_id": 2, "ts_us": 100, "event_type": "view"}\n'
            '{"user_id": 2, "ts_us": 100, "event_type": "click"}\n'
        )
    _time.sleep(0.05)
    # batch 2: user 1 completes; user 2's click now strictly later
    with open(os.path.join(src, "b.json"), "w") as fh:
        fh.write(
            '{"user_id": 1, "ts_us": 200, "event_type": "click"}\n'
            '{"user_id": 1, "ts_us": 300, "event_type": "purchase"}\n'
            '{"user_id": 2, "ts_us": 250, "event_type": "click"}\n'
        )

    stream = (
        spark.readStream.schema("user_id bigint, ts_us bigint, event_type string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    sink = f"sfn_{uuid.uuid4().hex[:8]}"
    q = (
        funnel_stage_stream(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) == 2
    rows = spark.table(sink).collect()
    last = {}
    for r in rows:  # memory sink appends per-batch updates; last wins
        last[r.user_id] = r.stage
    assert last == {1: 3, 2: 2}


def test_stateful_ema_recurses_across_batches(spark, tmp_path):
    """The streaming EMA's (n, ema) state must carry the recursion across
    micro-batches — batch 2's first value folds onto batch 1's smoothed
    result, with the identical per-step rounding as the batch w_ema fold."""
    import time as _time
    import uuid

    from datalake_on_prem_system_spark.streaming.stateful import ema_stream

    src = str(tmp_path / "ev")
    os.makedirs(src)
    with open(os.path.join(src, "a.json"), "w") as fh:
        fh.write(
            '{"user_id": 1, "ts_us": 100, "event_id": 1, "value": 10.0}\n'
            '{"user_id": 1, "ts_us": 200, "event_id": 2, "value": 20.0}\n'
            '{"user_id": 2, "ts_us": 100, "event_id": 4, "value": 5.0}\n'
            '{"user_id": 2, "ts_us": 200, "event_id": 5, "value": null}\n'
        )
    _time.sleep(0.05)
    with open(os.path.join(src, "b.json"), "w") as fh:
        fh.write(
            '{"user_id": 1, "ts_us": 300, "event_id": 3, "value": 30.0}\n'
            '{"user_id": 2, "ts_us": 300, "event_id": 6, "value": 7.0}\n'
        )

    stream = (
        spark.readStream.schema("user_id bigint, ts_us bigint, event_id bigint, value double")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    sink = f"sem_{uuid.uuid4().hex[:8]}"
    q = (
        ema_stream(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) == 2
    last = {}
    for r in spark.table(sink).collect():
        last[r.user_id] = (r.n_events, r.ema)
    # user 1: 10 → 0.2·20+0.8·10 = 12 → 0.2·30+0.8·12 = 15.6
    # user 2: a NULL value nulls the accumulator (batch w_ema parity —
    # 0.2·NULL+0.8·acc is NULL) and the next value restarts the EMA
    assert last == {1: (3, 15.6), 2: (3, 7.0)}


def test_windowed_agg_batch_equivalence(spark, sf_dir):
    """The streaming window agg gives the same answer as the batch plan on
    the same data (watermark is a no-op in batch)."""
    from datalake_on_prem_system_spark.operators.common import t
    from datalake_on_prem_system_spark.streaming.aggregate import windowed_event_agg

    ev = t(spark, sf_dir, "events")
    agg = windowed_event_agg(ev).select(F.col("w.start").alias("day"), "n_events")
    direct = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, direct.collect()))


def test_last_writer_wins_rejects_null_order_key(spark):
    """The max_by dedup's documented non-null order-key contract is
    enforced, not assumed: a NULL order key aborts the batch instead of
    silently shifting winner selection."""
    import pytest as _pytest

    from datalake_on_prem_system_spark.streaming.cdc import last_writer_wins

    ok = spark.createDataFrame(
        [(1, 10, "new"), (1, 5, "old")], "k int, seq int, v string"
    )
    assert {r.v for r in last_writer_wins(ok, "k", ["seq"]).collect()} == {"new"}

    bad = spark.createDataFrame(
        [(1, 10, "new"), (1, None, "poison")], "k int, seq int, v string"
    )
    with _pytest.raises(Exception, match="NULL order key"):
        last_writer_wins(bad, "k", ["seq"]).collect()


def test_normalize_envelope_rejects_reserved_op_column(spark):
    """A row schema with its own 'op' column would collide with the CDC op
    in the normalized output (ambiguous reference on every batch) — reject
    up front."""
    import pytest as _pytest

    from datalake_on_prem_system_spark.streaming.cdc import normalize_envelope

    df = spark.createDataFrame([("x",)], "value string")
    with _pytest.raises(ValueError, match="op"):
        normalize_envelope(df, "id INT, op STRING")


def test_single_batch_guard_fires_on_split_corpus(spark, tmp_path):
    """The watermarked append-mode queries' batch oracles assume the whole
    corpus drains in ONE micro-batch (cross-batch watermark advancement
    drops later-batch rows as late). The guard must turn a split into a
    loud error instead of a silently-diverging result."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from datalake_on_prem_system_spark.operators.streaming_ops import _run_to_memory

    for i in range(3):
        spark.createDataFrame(
            [(i, f"2024-01-0{i + 1} 00:00:00")], "id bigint, ts_s string"
        ).write.mode("overwrite").json(str(tmp_path / f"d{i}"))
    stream = (
        spark.readStream.schema("id bigint, ts_s string")
        .option("maxFilesPerTrigger", 1)  # force a multi-batch drain
        .option("recursiveFileLookup", "true")
        .json(str(tmp_path))
        .withColumn("ts", F.to_timestamp("ts_s"))
        .withWatermark("ts", "1 minute")
        .dropDuplicatesWithinWatermark(["id"])
    )
    with _pytest.raises(RuntimeError, match="ONE batch"):
        _run_to_memory(stream, "guard_test", "append", expect_single_batch=True)
    # and a one-batch drain passes the same guard
    single = (
        spark.readStream.schema("id bigint, ts_s string")
        .option("recursiveFileLookup", "true")
        .json(str(tmp_path))
        .withColumn("ts", F.to_timestamp("ts_s"))
        .withWatermark("ts", "1 minute")
        .dropDuplicatesWithinWatermark(["id"])
    )
    out = _run_to_memory(single, "guard_test_ok", "append", expect_single_batch=True)
    assert out.count() == 3


def test_kafka_source_contract(spark):
    """No broker exists here, but the Kafka wrapper's contract is still
    pinnable: (1) the exact option set the reference configures
    (cdc_merger_optimized.py:206-212) is data, asserted verbatim; (2) the
    reader really carries format 'kafka' (resolving it fails with the
    missing-connector error, not a silent fallback); (3) both the file and
    Kafka paths drive the same `_drive_cdc` funnel — shared
    normalize_envelope path by construction, not by convention."""
    import inspect

    import pytest as _pytest

    from datalake_on_prem_system_spark.streaming import cdc

    assert cdc.kafka_source_options("lake\\..*", "broker:9092", 5000) == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribePattern": "lake\\..*",
        "startingOffsets": "earliest",
        "maxOffsetsPerTrigger": "5000",
        "failOnDataLoss": "false",
    }
    with _pytest.raises(Exception, match="(?i)kafka"):
        cdc.kafka_cdc_stream(spark, "lake\\..*", "broker:9092")
    for fn in (cdc.run_cdc_file_stream, cdc.run_cdc_kafka_stream):
        assert "_drive_cdc(" in inspect.getsource(fn), fn.__name__


def test_cdc_batch_replay_guard_skips_applied_batch(spark, tmp_path):
    """Exactly-once across crash replays: a foreachBatch invocation re-run
    with an already-applied (stream_id, batch_id) must be a no-op — the
    watermark rides the merge commit itself, so the skip decision is
    atomic with the applied state. A NEW stream (different stream_id)
    legitimately restarts at batch 0 and must apply."""
    from datalake_on_prem_system_spark.streaming.cdc import cdc_apply_batch

    table = LakeTable(spark, str(tmp_path / "tbl_guard"))
    table.create_or_replace(
        spark.createDataFrame([(1, "base1", 0), (2, "base2", 0)], ROW_DDL)
    )
    batch = spark.createDataFrame(
        [(json.dumps(_wrapped(None, {"id": 1, "name": "v1", "seq": 1}, "u")),)],
        "value string",
    )
    kw = dict(pk="id", row_ddl=ROW_DDL, order_cols=["seq"], drop_cols=[])
    cdc_apply_batch(table, batch_df=batch, batch_id=0, stream_id="s1", **kw)
    v_applied = table.versions()
    assert table.properties()["cdc.applied"] == "s1:0"

    # crash replay: same stream, same batch id — no new commit, state intact
    replay = spark.createDataFrame(
        [(json.dumps(_wrapped(None, {"id": 1, "name": "GHOST", "seq": 9}, "u")),)],
        "value string",
    )
    cdc_apply_batch(table, batch_df=replay, batch_id=0, stream_id="s1", **kw)
    assert table.versions() == v_applied
    assert {r.id: r.name for r in table.read().collect()}[1] == "v1"

    # next batch of the same stream applies and advances the watermark
    nxt = spark.createDataFrame(
        [(json.dumps(_wrapped(None, {"id": 2, "name": "v2", "seq": 2}, "u")),)],
        "value string",
    )
    cdc_apply_batch(table, batch_df=nxt, batch_id=1, stream_id="s1", **kw)
    assert table.properties()["cdc.applied"] == "s1:1"

    # a NEW stream's batch 0 is not blocked by the old stream's counter
    other = spark.createDataFrame(
        [(json.dumps(_wrapped(None, {"id": 1, "name": "v3", "seq": 3}, "u")),)],
        "value string",
    )
    cdc_apply_batch(table, batch_df=other, batch_id=0, stream_id="s2", **kw)
    assert {r.id: r.name for r in table.read().collect()}[1] == "v3"
    assert table.properties()["cdc.applied"] == "s2:0"


def test_cdc_replay_memo_invalidated_by_table_recreate(spark, tmp_path):
    """Round-12 ADVICE: the in-process applied-batch memo must not outlive
    a create_or_replace at the same root — a new stream reusing the same
    checkpoint dir (hence the same stream_id) legitimately restarts at
    batch 0 against the FRESH table, and the stale memo would wrongly
    skip it (the durable property the memo mirrors is gone)."""
    from datalake_on_prem_system_spark.streaming.cdc import cdc_apply_batch

    table = LakeTable(spark, str(tmp_path / "tbl_memo"))
    table.create_or_replace(
        spark.createDataFrame([(1, "base1", 0)], ROW_DDL)
    )
    kw = dict(pk="id", row_ddl=ROW_DDL, order_cols=["seq"], drop_cols=[])
    b0 = spark.createDataFrame(
        [(json.dumps(_wrapped(None, {"id": 1, "name": "v1", "seq": 1}, "u")),)],
        "value string",
    )
    cdc_apply_batch(table, batch_df=b0, batch_id=0, stream_id="s1", **kw)
    assert {r.id: r.name for r in table.read().collect()}[1] == "v1"

    # table wholesale re-created at the same root: durable watermark gone
    table.create_or_replace(
        spark.createDataFrame([(1, "fresh", 0)], ROW_DDL)
    )
    assert "cdc.applied" not in (table.properties() or {})

    # same stream_id restarts at batch 0 — must APPLY, not memo-skip
    restart = spark.createDataFrame(
        [(json.dumps(_wrapped(None, {"id": 1, "name": "v2", "seq": 2}, "u")),)],
        "value string",
    )
    cdc_apply_batch(table, batch_df=restart, batch_id=0, stream_id="s1", **kw)
    assert {r.id: r.name for r in table.read().collect()}[1] == "v2"


def test_dlq_classify_reasons(spark):
    """dlq_classify pins: healthy wrapped/flat lines get NULL reason (the
    normalize path keeps them), a corrupt line is 'unparseable' (PERMISSIVE
    from_json yields an all-null struct, not a NULL struct), and valid
    JSON without an op in either envelope shape is 'missing_op'."""
    from datalake_on_prem_system_spark.streaming.cdc import dlq_classify

    ddl = "k bigint, v string"
    rows = [
        ('{"payload": {"after": {"k": 1, "v": "a"}, "op": "u"}}',),
        ('{"after": {"k": 2, "v": "b"}, "op": "u"}',),
        ('{poison{"after": {"k": 3}}',),
        ('{"after": {"k": 4, "v": "d"}}',),
        ('{"foo": 1}',),
    ]
    df = spark.createDataFrame(rows, "value string")
    got = {r.value: r.reason for r in dlq_classify(df, ddl).collect()}
    assert got[rows[0][0]] is None  # healthy wrapped
    assert got[rows[1][0]] is None  # healthy flat
    assert got[rows[2][0]] == "unparseable"
    assert got[rows[3][0]] == "missing_op"
    # valid JSON with NO envelope fields parses to an all-null struct just
    # like a corrupt line — the corrupt-record column is what tells them
    # apart: this is a schema mismatch (missing_op), not a parse failure
    assert got[rows[4][0]] == "missing_op"


def test_empty_merge_batch_records_watermark(spark, tmp_path):
    """A batch whose healthy rows dedup to EMPTY (all-poison) must still
    record its (stream, batch) watermark — via a metadata-only commit —
    so a crash replay of that batch is detected and the DLQ rejects are
    not re-appended (round-11 ADVICE)."""
    from datalake_on_prem_system_spark.streaming.cdc import cdc_apply_batch

    table = LakeTable(spark, str(tmp_path / "tbl_empty_wm"))
    table.create_or_replace(
        spark.createDataFrame([(1, "base1", 0)], ROW_DDL)
    )
    dlq = LakeTable(spark, str(tmp_path / "dlq_empty_wm"))
    poison = spark.createDataFrame(
        [('{poison',), ('{"foo": 1}',)], "value string"
    )
    kw = dict(pk="id", row_ddl=ROW_DDL, order_cols=["seq"], drop_cols=[])
    cdc_apply_batch(
        table, batch_df=poison, batch_id=0, stream_id="s1", dlq_table=dlq, **kw
    )
    # the merge wrote nothing, but the watermark committed (metadata-only)
    assert table.properties()["cdc.applied"] == "s1:0"
    assert table.read().count() == 1  # data untouched
    assert dlq.read().count() == 2
    # crash replay of the same batch: DLQ must NOT re-append
    cdc_apply_batch(
        table, batch_df=poison, batch_id=0, stream_id="s1", dlq_table=dlq, **kw
    )
    assert dlq.read().count() == 2


def test_set_properties_metadata_only_commit(spark, tmp_path):
    """set_properties publishes a new version carrying the parent's file
    list verbatim: data identical, properties merged, one more version."""
    table = LakeTable(spark, str(tmp_path / "tbl_props"))
    table.create_or_replace(
        spark.createDataFrame([(1, "a", 0), (2, "b", 0)], ROW_DDL)
    )
    v0 = table.latest_version()
    table.set_properties({"x.y": "1"})
    assert table.latest_version() == v0 + 1
    assert table.properties()["x.y"] == "1"
    assert sorted(r.id for r in table.read().collect()) == [1, 2]
    # merging keeps earlier properties
    table.set_properties({"x.z": "2"})
    assert table.properties() == {"x.y": "1", "x.z": "2"}
