"""Plan-quality gates: the properties that matter at 100 TB, asserted on the
actual physical plans."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from datalake_on_prem_system_spark.plans import audit_plan

_QS = entry_mod.queries()


def test_q6_filters_pushed_to_scan(spark, sf_dir):
    a = audit_plan(_QS["q6_forecast_revenue"](spark, sf_dir))
    assert a.pushed_filters, "selective filters must reach the parquet reader"
    assert all("l_" in s for s in a.read_schemas)
    # scan must be pruned to the 4 referenced columns, not the full lineitem row
    assert a.read_schemas[0].count(":") <= 4


def test_q3_broadcasts_dim_and_topk(spark, sf_dir):
    a = audit_plan(_QS["q3_top_revenue_orders"](spark, sf_dir))
    assert a.n_broadcasts >= 1, "customer dim must broadcast"
    assert a.has_take_ordered, "top-10 must plan as TakeOrderedAndProject"


def test_o1_topk_no_global_sort(spark, sf_dir):
    a = audit_plan(_QS["o1_order_desc_limit"](spark, sf_dir))
    assert a.has_take_ordered
    assert a.n_exchanges == 0, "top-k must not shuffle the table"


def test_search_reads_derived_index_only(spark, sf_dir):
    a = audit_plan(_QS["search_phrase_ranked"](spark, sf_dir))
    assert any(
        s.startswith("struct<doc_id") and "text" in s and "lang" not in s
        for s in a.read_schemas
    ), f"must scan the 2-column index table, got {a.read_schemas}"


def test_search_allwords_never_scans_text_table(spark, sf_dir):
    """E1's primary path is the inverted index: posting intersection over
    (token, doc_id) — the corpus-wide (pk, text) table must not appear in
    the plan AT ALL (its only former role was the per-row contains scan)."""
    from datalake_on_prem_system_spark.plans import capture_plan

    plan = capture_plan(_QS["search_allwords"](spark, sf_dir))
    assert "search_postings_" in plan, "postings must drive the query"
    assert "search_idx" not in plan, "the flat text table must not be scanned"


def test_search_phrase_text_scan_is_candidate_join_only(spark, sf_dir):
    """E2's phrase verify touches the text table only through the
    all-words-candidate join: no corpus-wide Contains FILTER over the text
    scan survives in the plan (the contains is a projection over joined
    candidates), and the postings feed the scoring."""
    import re as _re

    from datalake_on_prem_system_spark.plans import capture_plan

    plan = capture_plan(_QS["search_phrase_ranked"](spark, sf_dir))
    assert "search_postings_" in plan
    # every Filter line in the formatted plan must be free of Contains(text
    for line in plan.splitlines():
        if _re.search(r"\bFilter \[", line) or "PushedFilters" in line:
            assert "Contains(text" not in line and "StringContains(text" not in line, (
                f"corpus-wide substring filter survived: {line.strip()}"
            )


def test_bucketed_join_is_co_located(spark, sf_dir, tmp_path):
    """Fact-fact joins at 100 TB: pre-bucketing both tables on the join key
    lets the join run shuffle-free (each bucket pair joins locally). Verify
    the plan contains NO shuffle exchange when both sides are bucketed."""
    from datalake_on_prem_system_spark.operators.common import t
    from datalake_on_prem_system_spark.plans import capture_plan

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{tmp_path}'")
    t(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("bkt.orders_b")
    t(spark, sf_dir, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("bkt.lineitem_b")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bkt.orders_b").join(
            spark.table("bkt.lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = capture_plan(joined, "simple")
        assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan[:600]}"
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt.orders_b")
        spark.sql("DROP TABLE IF EXISTS bkt.lineitem_b")
        spark.sql("DROP DATABASE IF EXISTS bkt")


def test_q1_partial_aggregation(spark, sf_dir):
    a = audit_plan(_QS["q1_pricing_summary"](spark, sf_dir))
    assert a.n_exchanges <= 1, "one shuffle (final agg) max"
    assert a.has_partial_agg, "map-side combine must run below the exchange"
    assert a.has_batched_scan, "vectorized parquet reader expected"


def test_quality_bins_no_single_partition_funnel(spark, sf_dir):
    """Exact ntile via distributed global rank: the plan must contain no
    single-partition exchange (the unpartitioned-window anti-pattern)."""
    from datalake_on_prem_system_spark.plans import capture_plan

    df = _QS["tx_quality_bins"](spark, sf_dir)
    plan = capture_plan(df)
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" in plan  # parallel range shuffle does the sort


def test_embedding_cosine_no_cartesian(spark, sf_dir):
    """Exact pair mining must be the block-grid EQUI-join, never a
    cartesian/broadcast-nested-loop all-pairs join."""
    from datalake_on_prem_system_spark.plans import capture_plan

    plan = capture_plan(_QS["dd_embedding_cosine"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_facade_search_scans_materialized_index(spark, sf_dir, tmp_path):
    """LakeEngine.search must scan the 2-column (pk, text) index parquet —
    not recompute the search projection over the full base table — and
    must invalidate it on the next commit."""
    from datalake_on_prem_system_spark.engine import LakeEngine
    from datalake_on_prem_system_spark.plans import capture_plan

    eng = LakeEngine(spark, str(tmp_path / "wh"), namespace="ns")
    eng.write_table(
        "parts",
        spark.createDataFrame(
            [(1, "alpha widget", 9.5), (2, "beta widget", 3.25)],
            "part_id int, name string, price double",
        ),
    )
    out = eng.search("parts", "widget")
    plan = capture_plan(out)
    assert "_search_index" in plan, "search must read the materialized index"
    assert len(eng._search_index_cache) == 1
    # repeat search at the same version reuses the cache (no rebuild)
    cached = dict(eng._search_index_cache)
    eng.search("parts", "alpha")
    assert eng._search_index_cache == cached
    assert {r.part_id for r in out.collect()} == {1, 2}
    # a new commit invalidates: next search materializes the new version
    eng.insert("parts", {"part_id": "3", "name": "gamma widget", "price": "1.0"})
    hits = eng.search("parts", "widget")
    assert {r.part_id for r in hits.collect()} == {1, 2, 3}
    assert list(eng._search_index_cache) != list(cached)


def test_partitioned_ingest_prunes_scan(spark, sf_dir):
    """`ingest_csv(partition_by=...)` lays the table out hive-partitioned;
    a partition-key filter must prune at the scan (PartitionFilters), not
    post-filter all files."""
    from datalake_on_prem_system_spark.plans import capture_plan

    df = _QS["in_csv_partitioned"](spark, sf_dir)
    plan = capture_plan(df)
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "c_mktsegment" in seg, f"partition filter must prune, got: [{seg}]"


def test_decontaminate_broadcasts_eval_side(spark, sf_dir):
    """The eval reference set is small by construction: the inverted-index
    join must be a broadcast join so the train corpus never shuffles."""
    a = audit_plan(_QS["cur_decontaminate"](spark, sf_dir))
    assert a.n_broadcasts >= 1, "eval shingle set must broadcast"


def test_jaccard_shingle_frame_cached_once(spark, sf_dir):
    """Four plan branches consume the shingle frame; it must come from the
    persisted copy (InMemoryTableScan), not be re-derived per branch."""
    from datalake_on_prem_system_spark.plans import capture_plan

    plan = capture_plan(_QS["dd_ngram_jaccard"](spark, sf_dir))
    assert "InMemoryTableScan" in plan, "shingle frame must be persisted"


def test_cdc_dedup_is_partial_aggregate_not_window(spark):
    """last_writer_wins must plan as an aggregate with map-side combine
    (shuffle carries one candidate per key per partition), never as a
    row_number window (shuffles + sorts every change row)."""
    from datalake_on_prem_system_spark.plans import capture_plan
    from datalake_on_prem_system_spark.streaming.cdc import last_writer_wins

    df = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (2, "c", 5)], "k int, v string, seq int"
    )
    out = last_writer_wins(df, "k", ["seq"])
    a = audit_plan(out)
    plan = capture_plan(out)
    assert a.has_partial_agg, "dedup must map-side combine"
    assert "Window" not in plan and "row_number" not in plan
    got = {r.k: r.v for r in out.collect()}
    assert got == {1: "b", 2: "c"}


# --------------------------------------------------------------------------
# global plan invariants over EVERY registered query

import pytest  # noqa: E402

# literal-broadcast nested-loop joins that are the INTENDED plan: a handful
# of query-point rows (a lit() array or a tiny trained structure) joined to
# the corpus without an equi-key — the corpus side never moves. The TPC-H
# scalar-subquery shapes (Q11's value threshold, Q22's positive-balance
# average) cross-join a ONE-ROW aggregate in the same way — constant cost
# at any fact size.
# Enumerated EXPLICITLY (not a sim_* prefix rule) so a future similarity
# operator with an accidental non-literal nested-loop join fails the sweep
# instead of inheriting a waiver silently.
_BNLJ_ALLOWED = {
    "sim_ann_ivf",
    "sim_ann_ivf_incremental",
    "sim_ann_lsh",
    "sim_brute_topk",
    "sim_filtered_topk",
    "sim_ivfpq_incremental",
    "sim_ivfpq_topk",
    "sim_knn_join",
    "sim_label_centroids",
    "sim_matryoshka_topk",
    "sim_pq_topk",
    "sim_range_search",
    "sim_sq8_topk",
    "sim_topk_per_label",
    # recall@k audit: the EXACT side broadcasts the bounded query batch
    # over the corpus with a non-equi self-exclusion (the sim_knn_join
    # shape); the ANN side under audit stays equi-joined
    "sim_recall_eval",
    # rebalance planner: nlist² centroid-pair non-equi self-join plus the
    # ONE-ROW (total, nlist) anchor — both bounded by the quantizer size
    # (driver-side metadata), never by the corpus
    "sim_cell_rebalance",
} | {
    "q11_important_stock",
    "q22_sales_opportunity",
    # time-span midpoint: a ONE-ROW (t0, t1) aggregate cross-joined to tag
    # each event's stream half — the same constant-cost scalar shape
    "ev_drift_psi",
    # node count N: a ONE-ROW aggregate cross-joined into every PageRank
    # iteration — constant cost at any graph size
    "g_pagerank",
    # per-half-step normalizer max(auth)/max(hub): ONE-ROW aggregates
    # cross-joined into each HITS iteration — constant cost at any size
    "g_hits",
    # corpus max date + the 12 quintile boundaries: two ONE-ROW aggregates
    # cross-joined into the per-customer frame — constant cost
    "a_rfm_segments",
    # sufficient-statistics row × node-count row: ONE-ROW × ONE-ROW
    # cross-join — constant cost at any graph size
    "g_assortativity",
    # first-purchase-day anchor: a ONE-ROW min cross-joined to index weeks
    "ev_ltv_cohort",
    # series anchor (n, Σx): a ONE-ROW aggregate cross-joined into the
    # |days|-bounded daily series — constant cost at any fact size
    "ts_autocorrelation",
    # two-series anchor (n, Σx, Σy): same ONE-ROW shape
    "ts_cross_correlation",
    # point-estimate anchor: a ONE-ROW aggregate cross-joined onto the
    # ONE-ROW bootstrap summary — constant cost at any fact size
    "a_poisson_bootstrap",
    # same anchor shape, streaming tier: the harvested ONE-ROW totals
    # cross-joined onto the ONE-ROW SE/CI summary
    "st_bootstrap_stream",
    # Theil-Sen: the pairwise-slope grid is a broadcast non-equi self-join
    # of the CALENDAR-BOUNDED daily series (days^2 at any SF), plus the
    # one-row min-day/count and median anchors
    "ts_theil_sen",
    # revenue anchor: the ONE-ROW purchase-cents aggregate cross-joined
    # onto the vocabulary-bounded per-channel Shapley frame
    "ev_shapley_attribution",
    # exact-NDV anchor: the ONE-ROW countDistinct aggregate cross-joined
    # onto the one-row merged-stats frame (segments-bounded)
    "lh_analyze_incremental",
    # two ONE-ROW per-group sufficient-statistic frames cross-joined —
    # constant cost at any fact size
    "a_welch_ttest",
    # fence anchor: the ONE-ROW quartile aggregate cross-joined onto the
    # calendar-bounded detrended series
    "ts_trend_outliers",
    # modularity anchors: the ONE-ROW (m, E_intra) and (n_comm, Σd_c²)
    # aggregates cross-joined — constant cost at any graph size
    "g_modularity",
    # edge-count anchor: the ONE-ROW m aggregate cross-joined onto the
    # community-bounded conductance rollup
    "g_conductance",
    # converter-total anchor: the ONE-ROW count cross-joined onto the
    # day-bounded lag histogram
    "ev_conversion_lag",
    # MK pair grid (calendar-bounded broadcast non-equi self-join) plus
    # the ONE-ROW S and tie anchors
    "ts_mann_kendall",
    # 5-row literal threshold grid broadcast onto the verified pair frame
    # (vocabulary-bounded non-equi census join)
    "dd_threshold_curve",
    # observation-horizon anchor: a ONE-ROW max-day aggregate cross-joined
    # to the per-user lifetime frame — constant cost at any fact size
    "ev_survival_censored",
    # grand-total anchor + the R×C vocabulary grid cross join — both
    # bounded by the category vocabularies, never by the fact table
    "a_chi_square",
    # (n1, n2) anchor: a ONE-ROW aggregate cross-joined into the
    # distinct-value ECDF frame — constant cost at any fact size
    "a_ks_test",
    # tie/fold anchors: ONE-ROW aggregates cross-joined onto the ONE-ROW
    # folded group terms — constant cost at any fact size
    "a_kruskal_wallis",
    # cell-pair non-equi join over the 550-cell bounded-domain contingency
    # table (50 quantities × 11 discounts) + ONE-ROW margin anchors —
    # bounded by the value domains, never by the fact table
    "a_kendall_tau",
    # suffix-count non-equi joins BETWEEN the degree-value histograms —
    # bounded by distinct degree values, never by nodes or edges
    "g_rich_club",
    # purchase-revenue anchor: a ONE-ROW sum cross-joined into the
    # vocabulary-bounded per-channel frame — constant cost at any size
    "ev_markov_attribution",
    # seasonal-strength anchor: a ONE-ROW fold over the 7 weekday rows
    # cross-joined back — constant cost at any fact size
    "ts_decompose",
    # (N_early, N_late, |V|) anchor: a ONE-ROW aggregate cross-joined
    # into the vocabulary-bounded term frame — constant cost at any size
    "tx_vocab_drift",
    # global band distribution: a ONE-ROW aggregate cross-joined to every
    # quasi-identifier class — constant cost at any fact size
    "cur_t_closeness",
    # session total: a ONE-ROW sum cross-joined onto the top-25 rows only
    "ev_top_paths",
    # manifest total: a ONE-ROW sum cross-joined onto the segment relation
    # (one row per segment — manifest-sized, never data-sized)
    "lh_compaction_plan",
    # holdout cutoff: a ONE-ROW max-date anchor cross-joined to the daily
    # rollup — constant cost at any fact size
    "ts_forecast_backtest",
    # token total: a ONE-ROW sum cross-joined onto the manifest-sized
    # pack relation
    "pl_dataloader_shards",
    # checkpoint step: a ONE-ROW pack count cross-joined onto the same
    # manifest-sized pack relation
    "pl_resume_plan",
    # nprobe census: the 4-row literal grid broadcast non-equi onto the
    # query-bounded hit ranks, plus the ONE-ROW exact-total anchor
    "sim_nprobe_curve",
    # user total: a ONE-ROW count cross-joined onto the age-bounded curve
    "ev_churn_curve",
    # week anchor: a ONE-ROW min-day aggregate cross-joined to the
    # distinct (user, day) frame
    "ev_stickiness",
    # same ONE-ROW min-day week anchor, feeding the reach rollups
    "ev_reach_curve",
    # CUPED anchors: the ONE-ROW date-midpoint aggregate onto the fact
    # scan, and the ONE-ROW pooled statistics onto the 2-row arm frame
    "ev_cuped",
    # doc-count anchor: the ONE-ROW corpus count cross-joined onto the
    # 20-row top-df word frame
    "tx_burstiness",
    # corpus total: a ONE-ROW count cross-joined onto the boilerplate
    # candidates
    "dd_boilerplate_lines",
    # user/event totals: a ONE-ROW aggregate cross-joined onto the
    # per-user count table
    "ev_pareto_share",
}


@pytest.mark.parametrize("name", sorted(_QS))
def test_plan_global_invariants(spark, sf_dir, name):
    """The 100 TB smell test, applied to all registered queries: no
    cartesian product ever; no nested-loop broadcast join outside the
    intentional literal-broadcast similarity queries; no row-at-a-time
    Python UDF (BatchEvalPython) anywhere; every parquet scan vectorized."""
    from datalake_on_prem_system_spark.plans import capture_plan

    df = _QS[name](spark, sf_dir)
    plan = capture_plan(df)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in _BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: nested-loop join"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if "Scan parquet" in plan:
        assert "Batched: true" in plan, f"{name}: non-vectorized parquet scan"


def test_colocated_join_no_join_exchange(spark, sf_dir):
    """lh_colocated_join's whole point: both scans are bucketed on the
    join key (formatted plan shows `Bucketed: true` twice), the sort-merge
    join consumes them WITHOUT any exchange, and the only shuffle in the
    query is the final small-group aggregate."""
    from datalake_on_prem_system_spark.operators.lakehouse_ops import (
        lh_colocated_join,
    )
    from datalake_on_prem_system_spark.plans import capture_plan

    plan = capture_plan(lh_colocated_join(spark, sf_dir))
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Bucketed: true") == 2, plan
    # no shuffle on either join key — the bucketed layout provides the
    # distribution; the agg's hashpartitioning(o_orderpriority…) remains
    assert "hashpartitioning(o_orderkey" not in plan, plan
    assert "hashpartitioning(l_orderkey" not in plan, plan


def test_point_read_prunes_to_one_bucket(spark, tmp_path):
    """P10 read path: a pk-equality read through read_where must resolve
    ONLY the bucket dir holding the key — O(1 bucket), not O(table) —
    while returning exactly the matching row (MOR deltas included via the
    shared bucket filter)."""
    from pyspark.sql import functions as F

    from datalake_on_prem_system_spark.lakehouse import LakeTable

    t = LakeTable(spark, str(tmp_path / "pt"))
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(64)], "id bigint, s string"
    )
    t.create_or_replace(df, bucket_by=("id", 8))
    # MOR delta on the same key's bucket must still be visible
    t.merge(
        spark.createDataFrame([(7, "v7_new")], "id bigint, s string"), pk="id"
    )

    out = t.read_where(F.col("id") == 7)
    files = out.inputFiles()
    buckets = {f.split("__bucket=")[1].split("/")[0] for f in files if "__bucket=" in f}
    assert len(buckets) == 1, files  # one bucket dir, not eight
    assert [(r.id, r.s) for r in out.collect()] == [(7, "v7_new")]

    # a non-pk EQUALITY now prunes too — via manifest column stats, not
    # buckets (round 7): only entries whose s-range can hold 'v9' resolve
    stat = t.read_where(F.col("s") == "v9")
    sb = {f.split("__bucket=")[1].split("/")[0] for f in stat.inputFiles() if "__bucket=" in f}
    assert len(sb) < 8, "stats should exclude provably-non-matching buckets"
    assert [(r.id, r.s) for r in stat.collect()] == [(9, "v9")]

    # a predicate stats can't reason about falls back to the full snapshot
    full = t.read_where(F.col("s").contains("v9"))
    fb = {f.split("__bucket=")[1].split("/")[0] for f in full.inputFiles() if "__bucket=" in f}
    assert len(fb) == 8
    assert [(r.id, r.s) for r in full.collect()] == [(9, "v9")]


def test_pq_serve_path_scans_code_table(spark, sf_dir):
    """sim_pq_topk's whole point: the ADC ranking pass reads the persisted
    8-byte code table (a pq_idx_* parquet scan), raw vectors appear only in
    the candidate rerank (broadcast join of the 40 survivors back to the
    primary table), and the top-k plans as TakeOrderedAndProject — never a
    global sort."""
    from datalake_on_prem_system_spark.operators.similarity import sim_pq_topk
    from datalake_on_prem_system_spark.plans import capture_plan

    plan = capture_plan(sim_pq_topk(spark, sf_dir))
    assert "pq_idx_" in plan, "ADC pass must read the persisted code table"
    assert "TakeOrderedAndProject" in plan
    assert "Sort (" not in plan or "TakeOrderedAndProject" in plan


def test_semantic_dedup_reads_cell_partitioned_index(spark, sf_dir):
    """dd_semantic must serve from the persisted cell-partitioned IVF
    assignments (ivf_idx_* scan with `cell` as a partition column), never
    re-deriving cluster assignments at query time, and the within-cell
    pair join must be an equi-join (no cartesian/nested-loop — also
    enforced globally)."""
    from datalake_on_prem_system_spark.operators.dedup import dd_semantic
    from datalake_on_prem_system_spark.plans import capture_plan

    plan = capture_plan(dd_semantic(spark, sf_dir))
    assert "ivf_idx_" in plan, "must read the persisted index"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_peak_concurrency_single_sessionize_pass(spark, sf_dir):
    """The ±1 deltas come from ONE explode over the session frame — a
    unionAll formulation would recompute the sessionization (and rescan
    events) once per branch. Exactly one events scan in the plan."""
    from datalake_on_prem_system_spark.operators.analytics import (
        ev_peak_concurrency,
    )
    from datalake_on_prem_system_spark.plans import capture_plan

    plan = capture_plan(ev_peak_concurrency(spark, sf_dir))
    assert plan.count("events.parquet") == 1, plan.count("events.parquet")
