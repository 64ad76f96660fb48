"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": dir}. Per-query time includes full execution
(collect to driver via count/collect of the final small result).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datalake_on_prem_system_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headliners: scan-agg, broadcast join, multi-join, pushdown, fact-fact
# shuffle, window dedup, search, term-freq, minhash-lsh, knn
HEADLINERS = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_nation_revenue",
    "q6_forecast_revenue",
    "q_order_lineitem_join_agg",
    "w1_latest_per_key",
    "a_date_window",
    "search_phrase_ranked",
    "tx_term_freq",
    "dd_minhash_lsh",
    "dd_ngram_jaccard",
    "sim_brute_topk",
    "sim_knn_join",
    "k5_cdc_merge_batch",
    "st_cdc_merge_stream",
    "lh_merge_upsert",
    "a_skew_salted",
    "w_sessionize",
    "pl_curation",
    "j_asof_join",
    "j_range_join",
    "lh_incremental_rollup",
]


def main() -> None:
    spark = get_spark(app_name="bench")
    qs = entry_mod.queries()

    # warm the session (JVM + parquet footer reads) and build the derived
    # search index (a K6 maintenance op, amortized across queries in
    # production) outside the timed region
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    from datalake_on_prem_system_spark.operators.search import sync_search_index

    sync_search_index(spark, SF_DIR)

    # warm the Structured Streaming machinery too (first streaming query in
    # a session pays ~3s of one-time planner/codegen init that would
    # otherwise land on whichever streaming headliner runs first)
    import tempfile as _tf

    _wdir = _tf.mkdtemp(prefix="bench_warm_")
    with open(os.path.join(_wdir, "w.txt"), "w") as _fh:
        _fh.write("warm\n")
    (
        spark.readStream.text(_wdir)
        .writeStream.format("noop")
        .option("checkpointLocation", os.path.join(_wdir, "ck"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINERS:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        # collect, not count: count() lets Catalyst prune the aggregate
        # expressions out of the plan, silently excluding the very work
        # being measured (verified on q1: all 8 aggregates optimized away)
        n = len(df.collect())
        dt = round(time.perf_counter() - t0, 3)
        times[name] = dt
        total += dt
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    # sustained CDC merge throughput (reference headline: ~50k rows/sec,
    # OZONE_ARCHITECTURE.md:75): envelope corpus pre-generated at 10x the
    # sf change-set (shifted key ranges), seed table pre-committed; timed
    # region = the streaming consume + MOR merge only. 10x amortizes the
    # one-shot availableNow query setup, so this measures the sustained
    # rate a long-running stream sees, not cold-start.
    from datalake_on_prem_system_spark.operators import streaming_ops as so
    from datalake_on_prem_system_spark.streaming.cdc import run_cdc_file_stream
    import tempfile

    _CDC_COPIES = 10
    src = so._envelope_dir(spark, SF_DIR, n_files=1, copies=_CDC_COPIES)
    n_changes = so._changes(spark, SF_DIR).count() * _CDC_COPIES
    work = tempfile.mkdtemp(prefix="bench_cdc_")
    table = so._seed_target(spark, SF_DIR, os.path.join(work, "tbl"))
    t0 = time.perf_counter()
    run_cdc_file_stream(
        spark, table, pk="user_id", row_ddl=so._ROW_DDL, src_dir=src,
        checkpoint_dir=os.path.join(work, "ckpt"),
        order_cols=["ts_us", "event_id"], drop_cols=["event_id", "ts_us"],
    )
    cdc_sec = time.perf_counter() - t0
    cdc_rps = round(n_changes / cdc_sec)
    print(f"# cdc_throughput: {n_changes} rows in {cdc_sec:.3f}s = {cdc_rps} rows/s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "cdc_rows_per_sec": cdc_rps,
                "sf": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    main()
