"""Operator inventory (SURVEY.md §2) + LLM-pipeline extensions.

Each module exposes:

- ``QUERIES``: dict[name -> Callable[(SparkSession, sf_dir) -> DataFrame]]
- ``ORACLE``:  dict[name -> ANSI SQL string] (DuckDB-runnable oracle; a name
  missing here is a rows-only operator — non-SQL-expressible or intentionally
  Spark-only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    analytics,
    curation,
    dedup,
    facade_ops,
    ingest_ops,
    lakehouse_ops,
    multimodal,
    pipeline_ops,
    relational,
    search,
    similarity,
    streaming_ops,
    textops,
    tpch,
    tpch2,
)

# Registration order drives the order external harnesses sweep queries in.
# The sweep is budget-capped (~50 queries/round), so we ROTATE which families
# lead each round: whichever family's driver row is oldest goes first, so no
# family's correctness row ages more than ~2 rounds. Round 6 refreshed
# relational/tpch/search; the 30 round-6 additions (tpch2 q12-q22, analytics
# windows/grouping-sets, lh_changes_feed/lh_clone_divergence, streaming
# interval-join/dedup/enrich, in_jsonl/in_orc/in_jdbc, dd_components,
# pl_dedup_canonical/pl_sequence_pack) have never had a driver row, so round 7
# fronts exactly those families, smallest-first so all 30 fit the budget.
_MODULES = (
    pipeline_ops,
    dedup,
    tpch2,
    analytics,
    streaming_ops,
    ingest_ops,
    lakehouse_ops,
    relational,
    tpch,
    search,
    facade_ops,
    similarity,
    multimodal,
    curation,
    textops,
)


# Fine-grained sweep priority (round 7): the ~50-query/round budget should
# go to queries with NO driver correctness row yet — the 30 round-6
# additions the driver never swept plus the round-7 additions; the module
# rotation above puts the right FAMILIES first, this list pulls the exact
# names to the very front. The list now EXCEEDS the ~50 budget (round-7
# session-2 queries were prepended), so its own tail falls outside the
# sweep — those names were judge-verified in r6. ROUND 8: rebuild from
# whatever lacks a CORRECTNESS_r07 row. Names here must exist in some
# module (asserted in all_queries).
_SWEEP_FIRST = [
    "dd_minhash_incremental", "lh_branch_merge", "pl_incremental_ingest",
    "search_bm25", "ev_transition_matrix", "w_ema", "sim_sq8_topk",
    "st_ema_stream", "lh_partition_evolution",
    "lh_bloom_skipping", "ev_funnel", "ev_retention", "st_session_window",
    "lh_restore", "tx_lm_score", "cur_source_mix", "st_funnel_stream",
    "a_unpivot", "a_heavy_hitters", "lh_constrained_dml",
    "sim_ann_ivf_incremental",
    "pl_curation", "pl_dedup_canonical", "pl_sequence_pack",
    "dd_exact", "dd_ngram_jaccard", "dd_components", "dd_minhash_lsh",
    "dd_simhash", "dd_embedding_cosine",
    "q12_priority_shipping", "q13_cust_order_histogram", "q15_top_supplier",
    "q16_part_supplier_variety", "q17_small_qty_revenue",
    "q18_large_volume_customers", "q20_promo_part_suppliers",
    "q21_waiting_suppliers", "q22_sales_opportunity",
    "w_running_total", "w_lag_delta", "w_moving_avg", "w_quartiles",
    "w_first_last", "w_gapfill_resample", "w_range_frame",
    "a_grouping_sets", "f_array_hof", "a_approx_quantiles",
    "st_cdc_merge_stream", "st_cdc_multibatch", "st_watermark_window",
    "st_stream_interval_join", "st_dedup_stream", "st_static_enrich",
    "in_csv_roundtrip", "in_csv_append_evolution", "in_csv_upsert_precombine",
    "in_csv_partitioned", "in_jsonl_roundtrip", "in_orc_roundtrip",
    "in_jdbc_roundtrip",
    "lh_changes_feed", "lh_clone_divergence", "lh_mor_read_amp",
    "lh_composite_key_dml", "lh_stats_skipping", "lh_zorder_skipping",
    "search_incremental_sync",
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    missing = [n for n in _SWEEP_FIRST if n not in out]
    if missing:
        raise ValueError(f"_SWEEP_FIRST names not registered: {missing}")
    ordered = {n: out[n] for n in _SWEEP_FIRST}
    ordered.update(out)
    return ordered


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
