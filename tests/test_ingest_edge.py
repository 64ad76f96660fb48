"""Ingest-path edge pins: corrupt JSONL lines must be QUARANTINED by the
PERMISSIVE reader (visible in the corrupt-record column), never silently
dropped or allowed to poison the committed table."""

from __future__ import annotations

import os
import tempfile


def test_jsonl_corrupt_lines_quarantined_not_dropped(spark):
    work = tempfile.mkdtemp(prefix="jl_corrupt_")
    src = os.path.join(work, "docs.jsonl")
    os.makedirs(src)
    with open(os.path.join(src, "part-0.json"), "w") as fh:
        fh.write('{"doc_id": 1, "text": "ok", "meta": {"lang": "en"}}\n')
        fh.write("{broken json line\n")
        fh.write('{"doc_id": 2, "text": "also ok", "meta": {"lang": "de"}}\n')
        fh.write('["wrong", "shape"]\n')

    schema = (
        "doc_id bigint, text string, meta struct<lang:string>, _corrupt string"
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(src)
    ).cache()  # PERMISSIVE corrupt-record column requires a materialized scan
    rows = raw.collect()
    assert len(rows) == 4  # nothing silently dropped
    good = [r for r in rows if r._corrupt is None]
    bad = [r for r in rows if r._corrupt is not None]
    assert {r.doc_id for r in good} == {1, 2}
    assert len(bad) == 2 and all(r.doc_id is None or r._corrupt for r in bad)
    # the quarantine filter used by in_jsonl_roundtrip keeps only clean rows
    clean = raw.filter(raw._corrupt.isNull())
    assert clean.count() == 2
    raw.unpersist()


def test_csv_badrecords_hand_counted(spark, tmp_path):
    """in_csv_badrecords triage on keys 1..10 (key 7 corrupt by rule):
    exactly one quarantined row, nine clean rows, clean key-sum 48 —
    corruption is counted, never silently dropped or coerced."""
    from datalake_on_prem_system_spark.operators.ingest_ops import (
        in_csv_badrecords,
    )

    spark.createDataFrame(
        [(k, f"name{k}", float(k)) for k in range(1, 11)],
        "c_custkey bigint, c_name string, c_acctbal double",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    row = in_csv_badrecords(spark, str(tmp_path)).head()
    assert (row.n_rows, row.n_quarantined, row.n_clean) == (10, 1, 9)
    assert row.clean_key_sum == sum(range(1, 11)) - 7
