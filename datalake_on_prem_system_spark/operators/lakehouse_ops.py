"""Lakehouse operator queries: versioned writes, time travel, history,
MERGE, DML, snapshot diff — exercised end-to-end through ``LakeTable``.

Each query builds a real versioned table (parquet + commit log) in a fresh
temp dir from fixture data, performs actual commits, and returns a
DataFrame whose content the DuckDB oracle reproduces as pure SQL algebra
over the same fixtures — so the correctness gate checks the whole write →
commit → time-travel-read path, not just a read-only emulation.

Reference parity map:
- K1/K2 create/append           → table.create_or_replace / append
- K3/K5/J1/M4/M5 MERGE          → table.merge (op + precombine semantics)
- K4/M3 keyed delete            → table.delete_where
- M1/M2 insert/update           → table.insert_rows / update_where
- D5 $snapshots history         → table.history (api_poc.py:426-493)
- D6 time travel + fallback     → table.read(version=, fallback_to_latest=)
                                  (api_poc.py:374-376, 462-468)
- J2 snapshot diff              → lakehouse.diff.snapshot_diff
                                  (api_poc.py:443-487, 552-557)
- D1/D2 SHOW TABLES / DESCRIBE  → LakeCatalog (api_poc.py:131, 382-389)
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakehouse import LakeCatalog, LakeTable, snapshot_diff
from ..lakehouse.diff import changes_feed
from .common import index_tempdir, t
from .relational import _HLL_REL_BOUND


def _base_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 4 != 0)
        .select(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "c_mktsegment",
        )
    )


def _cdc_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    changes = cust.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal") + 100.0, 2).alias("c_acctbal"),
        "c_mktsegment",
        F.when(F.col("c_custkey") % 5 == 0, "d").otherwise("u").alias("op"),
    )
    inserts = cust.filter(F.col("c_custkey") % 7 == 1).select(
        (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
        F.concat(F.lit("new_"), F.col("c_name")).alias("c_name"),
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
        F.lit("c").alias("op"),
    )
    return changes.unionByName(inserts)


# five queries read the same two-commit table: build it once per sf_dir
# (same memoization precedent as streaming_ops._ENVELOPE_CACHE)
_MERGED_CACHE: dict[str, str] = {}


def _merged_table(spark: SparkSession, sf_dir: str) -> LakeTable:
    """v0 = base customers; v1 = CDC MERGE (update/delete/insert)."""
    if sf_dir not in _MERGED_CACHE:
        root = index_tempdir("lake_merge_")
        table = LakeTable(spark, root)
        table.create_or_replace(_base_customers(spark, sf_dir))
        table.merge(_cdc_source(spark, sf_dir), pk="c_custkey", op_col="op")
        _MERGED_CACHE[sf_dir] = root
    return LakeTable(spark, _MERGED_CACHE[sf_dir])


_MOR_AMP_CACHE: dict[str, str] = {}


def _n_pending_deltas(table: LakeTable) -> int:
    """Distinct un-compacted MOR delta commits in the latest snapshot —
    one place for the commit-file delta encoding (delta id == committing
    version), used by the fixture assertion and the depth profile."""
    return len({
        e["delta"] for e in table.commit_at().files if e.get("delta") is not None
    })


def _mor_amplified_table(spark: SparkSession, sf_dir: str) -> LakeTable:
    """Seed + 7 pending MOR delta commits (one under the compaction
    threshold of 8, table.py DEFAULT_DELTA_COMPACT_THRESHOLD): the
    worst-case read-amplification state a reader can see. Each delta
    updates the disjoint slice c_custkey % 7 == i, so every customer key
    is covered by exactly one delta — SQL-expressible final state."""
    if sf_dir not in _MOR_AMP_CACHE:
        root = index_tempdir("lake_moramp_")
        table = LakeTable(spark, root)
        # mor mode is a TABLE PROPERTY — without it every merge is a
        # copy-on-write rewrite and there are no deltas to read through
        # (round-7 review catch: the first version of this helper measured
        # exactly that nothing)
        table.create_or_replace(
            _full_customers(spark, sf_dir),
            bucket_by=("c_custkey", 8),
            properties={"write.merge.mode": "mor"},
        )
        for i in range(7):
            table.merge(_mor_amp_delta(spark, sf_dir, i), pk="c_custkey")
        assert _n_pending_deltas(table) == 7, "expected 7 pending deltas"
        _MOR_AMP_CACHE[sf_dir] = root
    return LakeTable(spark, _MOR_AMP_CACHE[sf_dir])


def _full_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL customer keys (unlike _base_customers' %4 filter) so every MOR
    delta is a pure per-key UPDATE — depth timings then measure read
    amplification alone, not corpus growth from upsert-inserts."""
    return t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
    )


def _mor_amp_delta(spark: SparkSession, sf_dir: str, i: int) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 7 == i)
        .select(
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal") + 10.0 * (i + 1), 2).alias("c_acctbal"),
            "c_mktsegment",
        )
    )


def lh_mor_read_amp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read amplification path under load: a full read through 7
    pending delta commits (per-bucket base+delta resolve at read time,
    table.py _merge_mor_delta) aggregated per segment. Bench carries a
    depth profile (``mor_read_profile``) so the amplification is measured
    data, not design intent."""
    df = _mor_amplified_table(spark, sf_dir).read()
    return df.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("sum_acctbal"),
    )


def mor_read_profile(spark: SparkSession, sf_dir: str) -> dict:
    """Measured read amplification for the bench: seconds to scan+merge a
    MOR-mode bucketed table at 0 / 4 / 8 pending delta commits and again
    right after threshold compaction folds them. Timed quantity is a
    count over a non-prunable filter — the full scan + delta-merge runs
    distributed but only a scalar returns, so the number measures MOR
    merge cost, not driver materialization (collect() was previously
    timed and dominated the figure). Every delta is a pure update over
    the full-customer seed, so the row count is CONSTANT across depths —
    the timing deltas are amplification alone. Builds and removes its own
    throwaway table; one timed read per depth.

    Threshold semantics (table.py merge): a merge COMPACTS only when
    n_delta_commits >= threshold (8), i.e. deltas accumulate to 8 and the
    NINTH merge folds — so the worst case readers see is 8 pending deltas,
    and 'after_compact' times the read following that ninth merge."""
    import shutil
    import time as _time

    root = index_tempdir("lake_morprof_")
    out: dict = {}
    try:
        table = LakeTable(spark, root)
        table.create_or_replace(
            _full_customers(spark, sf_dir),
            bucket_by=("c_custkey", 8),
            properties={"write.merge.mode": "mor"},
        )

        def timed_read(label: str, want_deltas: int) -> None:
            assert _n_pending_deltas(table) == want_deltas, (
                f"{label}: {_n_pending_deltas(table)} pending deltas, "
                f"wanted {want_deltas}"
            )
            spark.catalog.clearCache()
            t0 = _time.perf_counter()
            # count + a data-column aggregate: cannot be answered from
            # parquet footers, so the base+delta merge genuinely executes,
            # but only two scalars cross to the driver
            n = int(
                table.read()
                .agg(F.count(F.lit(1)), F.sum(F.length("c_name")))
                .first()[0]
            )
            out[label] = round(_time.perf_counter() - t0, 3)
            out.setdefault("n_rows", n)
            assert n == out["n_rows"], "row count must stay constant"

        timed_read("deltas_0", 0)
        for i in range(4):
            table.merge(_mor_amp_delta(spark, sf_dir, i), pk="c_custkey")
        timed_read("deltas_4", 4)
        for i in range(4, 8):
            table.merge(_mor_amp_delta(spark, sf_dir, i % 7), pk="c_custkey")
        timed_read("deltas_8", 8)
        # ninth merge sees n_delta_commits >= threshold: compaction folds
        table.merge(_mor_amp_delta(spark, sf_dir, 1), pk="c_custkey")
        timed_read("after_compact", 0)
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


_CPK_CACHE: dict[str, str] = {}


def lh_composite_key_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-primary-key DML (beyond the single-pk reference): lineitem's
    natural (l_orderkey, l_linenumber) key, bucket layout + pruning on the
    leading l_orderkey. Three real commits — create (composite-bucketed),
    merge-update of every linenumber=1 row, merge-delete of every
    linenumber=3 row — then the final state. Rows sharing a leading key are
    individually addressed (the whole point of the composite key). The
    built table memoizes per sf_dir (same precedent as _MERGED_CACHE):
    repeat sweeps re-read, not re-commit, and no tempdir-per-call leak."""
    pk = ["l_orderkey", "l_linenumber"]
    if sf_dir not in _CPK_CACHE:
        root = index_tempdir("lake_cpk_")
        table = LakeTable(spark, root)
        base = (
            t(spark, sf_dir, "lineitem")
            .filter(F.col("l_orderkey") < 2000)
            .select(
                "l_orderkey",
                "l_linenumber",
                "l_quantity",
                F.round("l_extendedprice", 2).alias("l_extendedprice"),
            )
        )
        table.create_or_replace(base, bucket_by=(tuple(pk), 8))
        upd = base.filter(F.col("l_linenumber") == 1).withColumn(
            "l_quantity", F.col("l_quantity") + 5
        )
        table.merge(upd, pk=pk)
        dels = base.filter(F.col("l_linenumber") == 3).withColumn("op", F.lit("d"))
        table.merge(dels, pk=pk, op_col="op")
        _CPK_CACHE[sf_dir] = root
    return LakeTable(spark, _CPK_CACHE[sf_dir]).read()


_SCD2_CACHE: dict[str, str] = {}


def lh_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 dimension maintenance (``lakehouse/scd.py``): customer
    dimension tracking (c_mktsegment, c_acctbal) through two update
    batches, full version history returned.

    - init at 2020-01-01: every customer current;
    - batch 2024-01-01: every c_custkey % 7 == 0 reports segment
      'MACHINERY' — a real change only where the segment differed (keys
      already in MACHINERY are no-ops, exercising change detection);
    - batch 2024-02-01: every c_custkey % 5 == 0 reports acctbal + 1000
      (always a change), segment unchanged — i.e. the post-batch-1
      segment, the full-attribute-tuple contract of a dimension feed.

    Each batch is one atomic composite-key MERGE (close + open in the same
    commit); the oracle reconstructs all three version strata as pure SQL.
    Memoized per sf_dir (the _CPK_CACHE precedent): repeat sweeps re-read,
    not re-commit."""
    return LakeTable(spark, _scd2_root(spark, sf_dir)).read()


def _scd2_root(spark: SparkSession, sf_dir: str) -> str:
    from ..lakehouse.scd import scd2_apply, scd2_init

    key, attrs = "c_custkey", ["c_mktsegment", "c_acctbal"]
    if sf_dir not in _SCD2_CACHE:
        root = index_tempdir("lake_scd2_")
        table = LakeTable(spark, root)
        cust = t(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment", "c_acctbal"
        )
        table.create_or_replace(
            scd2_init(cust, "2020-01-01"), bucket_by=((key,), 8)
        )
        b1 = cust.filter(F.col(key) % 7 == 0).withColumn(
            "c_mktsegment", F.lit("MACHINERY")
        )
        scd2_apply(table, b1, key, attrs, "2024-01-01")
        b2 = cust.filter(F.col(key) % 5 == 0).select(
            key,
            F.when(F.col(key) % 7 == 0, "MACHINERY")
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
            (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
        )
        scd2_apply(table, b2, key, attrs, "2024-02-01")
        _SCD2_CACHE[sf_dir] = root
    return _SCD2_CACHE[sf_dir]


_SCD2_BODY = """
    changed1 AS (
        SELECT c_custkey FROM customer
        WHERE c_custkey % 7 = 0 AND c_mktsegment <> 'MACHINERY'
    ), changed2 AS (
        SELECT c_custkey FROM customer WHERE c_custkey % 5 = 0
    ), v0 AS (
        SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal,
               '2020-01-01' AS effective_from,
               CASE WHEN c1.c_custkey IS NOT NULL THEN '2024-01-01'
                    WHEN c2.c_custkey IS NOT NULL THEN '2024-02-01'
               END AS effective_to,
               c1.c_custkey IS NULL AND c2.c_custkey IS NULL AS is_current
        FROM customer c
        LEFT JOIN changed1 c1 USING (c_custkey)
        LEFT JOIN changed2 c2 USING (c_custkey)
    ), v1 AS (
        SELECT c.c_custkey, 'MACHINERY' AS c_mktsegment, c.c_acctbal,
               '2024-01-01' AS effective_from,
               CASE WHEN c2.c_custkey IS NOT NULL THEN '2024-02-01'
               END AS effective_to,
               c2.c_custkey IS NULL AS is_current
        FROM customer c
        JOIN changed1 c1 USING (c_custkey)
        LEFT JOIN changed2 c2 USING (c_custkey)
    ), v2 AS (
        SELECT c.c_custkey,
               CASE WHEN c.c_custkey % 7 = 0 THEN 'MACHINERY'
                    ELSE c.c_mktsegment END AS c_mktsegment,
               c.c_acctbal + 1000.0 AS c_acctbal,
               '2024-02-01' AS effective_from,
               CAST(NULL AS VARCHAR) AS effective_to,
               TRUE AS is_current
        FROM customer c
        JOIN changed2 c2 USING (c_custkey)
    ), scd2_dim AS (
        SELECT * FROM v0
        UNION ALL SELECT * FROM v1
        UNION ALL SELECT * FROM v2
    )
"""

_SCD2_SQL = "WITH " + _SCD2_BODY + "\n    SELECT * FROM scd2_dim\n"


def lh_scd2_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consumer side of SCD2: a temporal (as-of) dimension join —
    enrich (customer, timestamp) probe rows with the attribute version
    effective AT that timestamp (from <= ts < to). Three probe dates per
    customer straddle both update batches, so every version stratum is
    exercised: 2020-06-01 always hits v0; 2024-01-15 hits v1 where batch 1
    changed the key; 2024-06-01 hits the current row.

    Scale shape: an equi-join on the natural key with the validity range
    as a residual predicate — each probe row meets only that key's few
    versions (dimension version counts are small constants), so cost is
    O(probes) after the key shuffle, never a time-range cross product. A
    fact table would use the same plan with its event timestamp as the
    probe."""
    table = LakeTable(spark, _scd2_root(spark, sf_dir))
    dim = table.read()
    probes = (
        t(spark, sf_dir, "customer")
        .select("c_custkey")
        .select(
            "c_custkey",
            F.explode(
                F.array(
                    F.lit("2020-06-01"), F.lit("2024-01-15"), F.lit("2024-06-01")
                )
            ).alias("as_of"),
        )
    )
    return probes.join(
        dim,
        (probes.c_custkey == dim.c_custkey)
        & (dim.effective_from <= probes.as_of)
        & (dim.effective_to.isNull() | (dim.effective_to > probes.as_of)),
    ).select(
        probes.c_custkey, "as_of", "c_mktsegment", "c_acctbal", "effective_from"
    )


_PARTITIONS_CACHE: dict[str, str] = {}


def lh_partitions_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$partitions metadata table over a hive-partitioned orders table
    (one append on top of the create, so two segments' leaves aggregate):
    per-partition row counts from footer metadata only — the oracle is a
    plain GROUP BY over the same fixture rows, proving the metadata path
    agrees with the data. The append lands as a PLAIN segment (appends are
    O(batch), layout-blind by contract), so the intermediate snapshot
    reports it under NULL partition values (pytest-pinned, with n_files);
    the compact() folds everything into hive leaves and this query reads
    the fully-partitioned snapshot."""
    if sf_dir not in _PARTITIONS_CACHE:
        root = index_tempdir("lake_parts_")
        table = LakeTable(spark, root)
        orders = t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        )
        table.create_or_replace(
            orders.filter(F.col("o_orderkey") % 2 == 0),
            partition_by=["o_orderpriority"],
        )
        table.append(orders.filter(F.col("o_orderkey") % 2 == 1))
        table.compact()
        _PARTITIONS_CACHE[sf_dir] = root
    return LakeTable(spark, _PARTITIONS_CACHE[sf_dir]).partitions().select(
        "o_orderpriority", "n_rows"
    )


_STATS_SKIP_CACHE: dict[str, str] = {}


def _orders_epoch_table(spark: SparkSession, sf_dir: str) -> LakeTable:
    """Time-series ingest shape: three commits each covering a disjoint
    o_ym (month-string) range — the entry-level min/max then lets a range
    filter skip whole historical segments (the classic append-by-time
    data-skipping case)."""
    if sf_dir not in _STATS_SKIP_CACHE:
        root = index_tempdir("lake_statskip_")
        table = LakeTable(spark, root)
        base = t(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.date_format("o_orderdate", "yyyy-MM").alias("o_ym"),
        )
        table.create_or_replace(base.filter(F.col("o_ym") < "1995-01"))
        table.append(base.filter((F.col("o_ym") >= "1995-01") & (F.col("o_ym") < "1997-01")))
        table.append(base.filter(F.col("o_ym") >= "1997-01"))
        _STATS_SKIP_CACHE[sf_dir] = root
    return LakeTable(spark, _STATS_SKIP_CACHE[sf_dir])


def lh_stats_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-stats file skipping on the serve path: a month-range
    filter over the epoch-appended orders table resolves only the entries
    whose recorded [min, max] overlap (2 of 3 segments skipped —
    inputFiles-asserted in pytest), then aggregates per month."""
    table = _orders_epoch_table(spark, sf_dir)
    df = table.read_where(F.col("o_ym") >= "1997-01")
    return df.groupBy("o_ym").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("revenue"),
    )


_BLOOM_CACHE: dict[str, tuple[str, int]] = {}


def _bloom_orders_table(spark: SparkSession, sf_dir: str) -> tuple[LakeTable, int]:
    """The 8-epoch bloom-indexed orders table shared by the point-lookup
    and join-pruning serve paths; built once per fixture (the lookup
    target — min custkey — is SETUP, not the measured operator)."""
    if sf_dir not in _BLOOM_CACHE:
        root = index_tempdir("lake_bloom_")
        table = LakeTable(spark, root)
        base = t(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        table.create_or_replace(
            base.filter(F.col("o_orderkey") % 8 == 0),
            properties={"bloom.columns": "o_custkey", "bloom.m": str(1 << 17)},
        )
        for epoch in range(1, 8):
            table.append(base.filter(F.col("o_orderkey") % 8 == epoch))
        target = int(table.read().agg(F.min("o_custkey")).collect()[0][0])
        _BLOOM_CACHE[sf_dir] = (root, target)
    root, target = _BLOOM_CACHE[sf_dir]
    return LakeTable(spark, root), target


def lh_bloom_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter file skipping on the serve path ("find this customer's
    orders" over an append-only table): orders land in 8 epoch segments
    whose o_custkey [min, max] ranges all span the whole domain — min/max
    stats can prune NOTHING for a custkey point predicate — but each
    segment's manifest entry carries a per-column bloom
    (``bloom.columns=o_custkey``), so ``read_where`` drops every epoch the
    customer never ordered in. The 100 TB shape: a point lookup on a
    high-cardinality non-layout column costs O(segments containing the
    key), not O(table). Soundness + parity pinned in tests/test_bloom.py."""
    table, target = _bloom_orders_table(spark, sf_dir)
    return table.read_where(F.col("o_custkey") == target)


_BLOOM_JOIN_KEYS: dict[str, list[int]] = {}


def lh_bloom_join_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-probe JOIN pruning — dynamic partition pruning for the
    UNPARTITIONED fact case (``LakeTable.read_for_join``): a two-row
    customer dimension (the two smallest custkeys that ever ordered —
    setup, cached like ``lh_bloom_skipping``'s lookup target) probes the
    8-epoch bloom-indexed orders fact's manifest, and only segments
    whose bloom admits SOME probe key are scanned before the broadcast
    join. The epochs' o_custkey [min, max] ranges all span the domain —
    range stats prune nothing here; bloom membership IS the skipping.

    Scale shape: the key collect is the broadcast materialization the
    join performs anyway (max_keys-guarded); the fact read costs
    O(segments containing the dim's keys); the join broadcasts the
    dimension. Result-invariance: the oracle joins the UNPRUNED tables —
    identical output proves pruning dropped only provably-empty
    segments. Segment skipping itself is ``inputFiles``-pinned in
    tests/test_bloom.py.

    Exactness: o_totalprice sums ride decimal(18,4) on both engines;
    ONE round + double cast at the end."""
    table, _ = _bloom_orders_table(spark, sf_dir)
    if sf_dir not in _BLOOM_JOIN_KEYS:
        _BLOOM_JOIN_KEYS[sf_dir] = [
            int(r.o_custkey)
            for r in table.read()
            .select("o_custkey")
            .distinct()
            .orderBy("o_custkey")
            .limit(2)
            .collect()
        ]
    keys = _BLOOM_JOIN_KEYS[sf_dir]
    dim = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey").isin(keys))
        .select("c_custkey", "c_name")
    )
    fact = table.read_for_join("o_custkey", dim, keys_col="c_custkey")
    return (
        fact.join(F.broadcast(dim), fact.o_custkey == dim.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("c_custkey")
    )


_DV_CACHE: dict[str, str] = {}


def lh_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional deletion vectors on the DML path
    (``LakeTable.delete_vectors`` — Iceberg v2 position deletes / Delta
    DV parity): two STACKED DV deletes land on the even-orderkey half of
    orders (every orderkey ≡4 mod 10, then every remaining '1-URGENT'
    row — the second sidecar subtracts already-tombstoned positions), an
    append follows AFTER the DVs (its urgent rows survive: tombstones are
    position-scoped to the files that existed when they were cut), and
    the serve read anti-joins the tiny sidecars against the untouched
    base bytes. No data file is rewritten across the four commits —
    byte-identity is inputFiles-pinned in tests/test_lakehouse.py.

    Scale shape: a DV commit costs O(matching rows) longs + one manifest
    entry; the read pays one broadcast anti-join on (file, pos) — the
    delete path a 100 TB table wants when COW write amplification and
    MOR key shuffles are both too expensive.

    Exactness: o_totalprice sums ride decimal(18,4) both engines; the
    oracle recomputes the final state as pure predicates over orders."""
    if sf_dir not in _DV_CACHE:
        root = index_tempdir("lake_dv_")
        table = LakeTable(spark, root)
        base = t(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        table.create_or_replace(base.filter(F.col("o_orderkey") % 2 == 0))
        table.delete_vectors(F.col("o_orderkey") % 10 == 4)
        table.delete_vectors(F.col("o_orderpriority") == "1-URGENT")
        table.append(base.filter(F.col("o_orderkey") % 2 == 1))
        _DV_CACHE[sf_dir] = root
    table = LakeTable(spark, _DV_CACHE[sf_dir])
    return (
        table.read()
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


_ZORDER_CACHE: dict[str, str] = {}


def lh_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER serve path: orders rewritten by
    ``compact_clustered(zorder_key([o_custkey, o_totalprice]))`` into 16
    range segments, then a narrow o_totalprice range read — manifest
    stats skip most segments on the SECOND clustered dimension (the one
    lexicographic clustering can never serve; pruning inputFiles-pinned
    in tests/test_table_format.py). Result = per-custkey-bucket aggregate
    of the band, oracle-recomputed from raw orders (clustering is layout,
    not semantics)."""
    from ..lakehouse.zorder import zorder_key

    if sf_dir not in _ZORDER_CACHE:
        root = index_tempdir("lake_zorder_")
        table = LakeTable(spark, root)
        table.create_or_replace(
            t(spark, sf_dir, "orders").select(
                "o_orderkey",
                "o_custkey",
                F.round("o_totalprice", 2).alias("o_totalprice"),
            )
        )
        table.compact_clustered(
            zorder_key(table.read(), ["o_custkey", "o_totalprice"]), n_ranges=16
        )
        _ZORDER_CACHE[sf_dir] = root
    table = LakeTable(spark, _ZORDER_CACHE[sf_dir])
    band = table.read_where(
        (F.col("o_totalprice") >= 100000.0) & (F.col("o_totalprice") < 120000.0)
    )
    return band.groupBy((F.col("o_custkey") % 10).alias("cust_bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("revenue"),
    )


def lh_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5/M4: real MERGE commit, read back the new version."""
    return _merged_table(spark, sf_dir).read()


def lh_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: read VERSION AS OF 0 after the merge commit — must return the
    pre-merge state."""
    return _merged_table(spark, sf_dir).read(version=0)


def lh_expired_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 fallback: an expired/unknown version degrades to latest
    (api_poc.py:462-468)."""
    return _merged_table(spark, sf_dir).read(version=99, fallback_to_latest=True)


def lh_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5: $snapshots-style history with deterministic columns (row counts
    prove the commit contents; committed_at excluded — wall-clock)."""
    return _merged_table(spark, sf_dir).history().select(
        "version", "parent", "operation", "n_rows"
    )


def lh_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 on real versions: classify rows between v0 and v1 of the merged
    table, surfacing the changed acctbal cell old→new."""
    table = _merged_table(spark, sf_dir)
    d = snapshot_diff(table, v_old=0, v_new=1, pk="c_custkey")
    return d.select(
        "c_custkey",
        "status",
        F.col("changed_cells")["c_acctbal"]["old"].cast("double").alias("old_acctbal"),
        F.col("changed_cells")["c_acctbal"]["new"].cast("double").alias("new_acctbal"),
    )


def lh_dml_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1+M2+M3: typed insert / update / keyed delete round trip — four real
    commits, final state read back."""
    table = LakeTable(spark, index_tempdir("lake_dml_"))
    base = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 100)
        .select("p_partkey", "p_name", "p_brand", "p_retailprice")
    )
    table.create_or_replace(base)
    table.update_where(F.col("p_partkey") % 10 == 3, {"p_retailprice": 9999.99})
    table.delete_where(F.col("p_partkey") % 10 == 7)
    table.insert_rows(
        [
            {"p_partkey": 1_000_001, "p_name": "inserted part a", "p_brand": "Brand#99", "p_retailprice": 1.5},
            {"p_partkey": 1_000_002, "p_name": "inserted part b", "p_brand": "Brand#98", "p_retailprice": 2.5},
        ]
    )
    return table.read()


def lh_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta RESTORE / Iceberg rollback parity: v0 base → a botched UPDATE
    and a botched DELETE → ``restore(0)`` publishes a NEW commit
    re-referencing v0's files (O(metadata), no rewrite), and the read
    returns exactly the pre-damage state — which is the oracle: plain SQL
    over the fixture, because the damage never happened. History keeps the
    botched interval time-travelable (asserted in pytest)."""
    table = LakeTable(spark, index_tempdir("lake_restore_"))
    base = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 150)
        .select("p_partkey", "p_name", "p_brand", F.round("p_retailprice", 2).alias("p_retailprice"))
    )
    table.create_or_replace(base)
    table.update_where(F.col("p_partkey") % 2 == 0, {"p_retailprice": -1.0})
    table.delete_where(F.col("p_partkey") % 3 == 0)
    table.restore(0)
    return table.read()


def lh_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-style PARTITION EVOLUTION: a table created hive-partitioned
    on o_orderpriority takes an append (plain segment against the hive
    base — already a mixed-layout read), then evolves its layout to
    o_orderstatus with an O(metadata) commit (``set_partitioning`` — no
    rewrite at evolution time), and the next ``compact()`` lands the data
    in the NEW layout. The read after each step is identical — which is
    the oracle: plain SQL over the fixture, because layout is invisible to
    query results. Pruning on the new layout is plan-asserted in
    tests/test_lakehouse.py."""
    table = LakeTable(spark, index_tempdir("lake_pevo_"))
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "o_orderpriority",
    )
    table.create_or_replace(
        orders.filter(F.col("o_orderkey") % 3 == 1),
        partition_by=["o_orderpriority"],
    )
    table.append(orders.filter(F.col("o_orderkey") % 3 == 2))
    table.set_partitioning(["o_orderstatus"])
    table.compact()
    return table.read()


def lh_branch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-style BRANCH workflow: main holds the even-keyed suppliers;
    an 'etl' branch forks (O(metadata) — a parallel commit chain sharing
    main's data/ dir), takes an append of the odd-keyed suppliers, an
    update and a delete — three branch commits main never sees (isolation
    pinned in tests/test_branches.py) — then a fast-forward merge publishes
    the branch head back to main as one commit re-referencing the shared
    segments. Returns main's post-merge read; the oracle recomputes the
    same final state as plain SQL, as if the work had run on main."""
    table = LakeTable(spark, index_tempdir("lake_branch_"))
    sup = t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", F.round("s_acctbal", 2).alias("s_acctbal")
    )
    table.create_or_replace(sup.filter(F.col("s_suppkey") % 2 == 0))
    br = table.create_branch("etl")
    br.append(sup.filter(F.col("s_suppkey") % 2 == 1))
    br.update_where(F.col("s_suppkey") % 5 == 0, {"s_acctbal": 1.5})
    br.delete_where(F.col("s_suppkey") % 7 == 0)
    table.merge_branch("etl")
    return table.read()


def lh_constrained_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECK constraints on the serve path: a table created with two
    ``constraint.*`` properties takes a full create → insert → update →
    delete chain of VALID writes (each gated by the pre-commit probe —
    tests/test_constraints.py pins the rejection side) and reads back the
    final state, which the oracle reproduces as plain SQL. Proves
    enforcement never perturbs committed data."""
    table = LakeTable(spark, index_tempdir("lake_constr_"))
    base = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 120)
        .select("p_partkey", "p_name", F.round("p_retailprice", 2).alias("p_retailprice"))
    )
    table.create_or_replace(
        base,
        properties={
            "constraint.price_nonneg": "p_retailprice >= 0",
            "constraint.has_key": "p_partkey IS NOT NULL",
        },
    )
    table.insert_rows(
        [{"p_partkey": 2_000_001, "p_name": "constrained part", "p_retailprice": 10.5}]
    )
    table.update_where(F.col("p_partkey") % 5 == 0, {"p_retailprice": 1.25})
    table.delete_where(F.col("p_partkey") % 7 == 0)
    return table.read()


def lh_append_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 + schema evolution: append a batch carrying a new column — old
    rows take NULL (ingest_csv_hudi.py:112-146 union-of-columns
    semantics via unionByName(allowMissingColumns))."""
    table = LakeTable(spark, index_tempdir("lake_append_"))
    nations = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    table.create_or_replace(nations.filter(F.col("n_nationkey") < 10))
    table.append(
        nations.filter(F.col("n_nationkey") >= 10).withColumn(
            "ingest_batch", F.lit("batch2")
        )
    )
    return table.read()


def lh_merge_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE + schema evolution (Delta's ``mergeSchema`` on MERGE INTO): a
    CDC change batch arrives carrying a NEW column — updated/inserted rows
    take its values, untouched rows read NULL, and the table schema widens
    without rewriting untouched data. The first schema change every
    long-lived CDC pipeline hits (upstream added a field)."""
    table = LakeTable(spark, index_tempdir("lake_mevo_"))
    nations = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    table.create_or_replace(nations)
    # the change batch: update regionkey-0 nations with a new `trade_zone`
    # column and insert one brand-new nation carrying it
    changes = (
        nations.filter(F.col("n_regionkey") == 0)
        .withColumn("n_name", F.concat(F.col("n_name"), F.lit("_v2")))
        .withColumn("trade_zone", F.lit("zone_a"))
        .unionByName(
            spark.createDataFrame(
                [(990, "NEWLAND", 0, "zone_b")],
                "n_nationkey int, n_name string, n_regionkey int, trade_zone string",
            ).withColumn("n_nationkey", F.col("n_nationkey").cast("long"))
        )
    )
    # fixture nation keys are int or long depending on generation; align
    changes = changes.withColumn(
        "n_nationkey", F.col("n_nationkey").cast(dict(nations.dtypes)["n_nationkey"])
    )
    table.merge(changes, pk="n_nationkey")
    return table.read()


def lh_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1+D2: SHOW TABLES + DESCRIBE through the catalog facade."""
    cat = LakeCatalog(spark, index_tempdir("lake_cat_"), namespace="trino_db")
    cat.create_namespace()
    cat.table("regions").create_or_replace(t(spark, sf_dir, "region"))
    cat.table("nations").create_or_replace(t(spark, sf_dir, "nation"))
    tables = spark.createDataFrame([(n,) for n in cat.list_tables()], "table_name string")
    desc = cat.describe("regions").select(
        F.lit("regions").alias("table_name"),
        F.concat_ws(":", "col_name", "data_type").alias("detail"),
    )
    return tables.withColumn("detail", F.lit("__table__")).unionByName(desc)


_MERGED_SQL = """
    base AS (
        SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 4 != 0
    ), src AS (
        SELECT c_custkey, c_name, round(c_acctbal + 100.0, 2) AS c_acctbal,
               c_mktsegment,
               CASE WHEN c_custkey % 5 = 0 THEN 'd' ELSE 'u' END AS op
        FROM customer WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey + 1000000, 'new_' || c_name, round(c_acctbal, 2),
               c_mktsegment, 'c'
        FROM customer WHERE c_custkey % 7 = 1
    ), merged AS (
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM src WHERE op != 'd'
        UNION ALL
        SELECT b.* FROM base b
        WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.c_custkey = b.c_custkey)
    )
"""

def lh_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: a daily rollup table
    maintained INCREMENTALLY — each event batch contributes partial
    (count, sum) aggregates that combine with the stored state via a
    full-outer merge on the day key, never rescanning prior batches.
    At 100 TB this is the difference between O(batch) and O(history) per
    refresh; sum/count compose exactly, so the result equals the full
    recompute (the oracle). Three real commits: empty→batch1→batch2."""
    ev = t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")

    def partial(batch: DataFrame) -> DataFrame:
        return batch.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
            F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value")
        )

    table = LakeTable(spark, index_tempdir("lake_rollup_"))
    table.create_or_replace(partial(ev.filter(F.col("ts") < cutoff)))
    for lo, hi in [("2024-01-15", "2024-01-22"), ("2024-01-22", None)]:
        batch = ev.filter(F.col("ts") >= F.lit(lo).cast("timestamp"))
        if hi is not None:  # the last batch is unbounded above — a fixed
            # upper bound would silently drop late events vs the oracle
            batch = batch.filter(F.col("ts") < F.lit(hi).cast("timestamp"))
        state = table.read()
        inc = partial(batch).select(
            "day",
            F.col("n_events").alias("inc_n"),
            F.col("sum_value").alias("inc_sum"),
        )
        combined = (
            state.join(inc, "day", "full_outer")
            .select(
                "day",
                (F.coalesce("n_events", F.lit(0)) + F.coalesce("inc_n", F.lit(0))).alias("n_events"),
                (F.coalesce("sum_value", F.lit(0.0)) + F.coalesce("inc_sum", F.lit(0.0))).alias("sum_value"),
            )
        )
        table.create_or_replace(combined)
    return table.read().select(
        "day", "n_events", F.round("sum_value", 2).alias("sum_value")
    )


def lh_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint validation audit — the missing half of the CHECK-
    constraint lifecycle (write-time enforcement is live via
    ``constraint.*`` properties; this is Delta's "ADD CONSTRAINT must
    validate existing rows" step): stage a customer table, attach three
    CANDIDATE constraints via a metadata-only ``set_properties`` commit
    (deliberately NOT enforced retroactively), and report per constraint
    the definite-FALSE violations, the NULL/unknown rows (which PASS
    under SQL CHECK three-valued logic — exercised by a NULLIF
    expression), and whether enforcement could be enabled losslessly.

    Scale shape: ONE scan, all constraints as map-side-combined
    conditional sums (``LakeTable.validate_constraints``); the unpack is
    a constraints-bounded explode.

    Oracle: the staged state is exactly the customer table, so DuckDB
    recomputes each census directly."""
    table = LakeTable(spark, index_tempdir("lake_ck_"))
    table.create_or_replace(
        t(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment", F.round("c_acctbal", 2).alias("bal")
        )
    )
    table.set_properties(
        {
            "constraint.bal_nonneg": "bal >= 0",
            "constraint.key_positive": "c_custkey > 0",
            # NULL for BUILDING rows (unknown → passes), FALSE for
            # MACHINERY — pins the three-valued CHECK semantics
            "constraint.seg_rule": (
                "nullif(c_mktsegment, 'BUILDING') != 'MACHINERY'"
            ),
        }
    )
    return table.validate_constraints()


def lh_analyze_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANALYZE TABLE (Iceberg `compute table stats` / Delta
    `ANALYZE` parity, maintained O(batch)): every write appends a stats
    row for ITS batch only — rowcount, min/max, and a MERGEABLE
    HyperLogLog NDV sketch (Apache DataSketches via ``hll_sketch_agg``,
    stored as a binary column in a stats side-table). Reading table-level
    statistics is then a segments-bounded rollup: counts SUM, min/max
    fold exactly, and the NDV sketches combine with ``hll_union_agg`` —
    register-wise max, so the merged estimate is IDENTICAL to a
    single-pass whole-table sketch (pinned in tests). This is how column
    stats stay fresh at 100 TB without ever rescanning history — the
    stats twin of ``lh_incremental_rollup``.

    Oracle: exact n_rows/NDV/min/max recompute; the engine-specific HLL
    estimate is checked through its error-bound CONTRACT column (the
    ``a_hll_distinct`` recipe — DuckDB emits literal TRUE)."""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    tbl = LakeTable(spark, index_tempdir("lake_anl_"))
    stats_tbl = LakeTable(spark, index_tempdir("lake_anl_stats_"))

    def stats_of(batch: DataFrame) -> DataFrame:
        return batch.agg(
            F.lit("o_custkey").alias("col"),
            F.hll_sketch_agg("o_custkey").alias("sk"),
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
        )

    for i in range(3):
        batch = orders.filter(F.col("o_orderkey") % 3 == i)
        if i == 0:
            tbl.create_or_replace(batch)
            stats_tbl.create_or_replace(stats_of(batch))
        else:
            tbl.append(batch)
            stats_tbl.append(stats_of(batch))
    merged = stats_tbl.read().groupBy("col").agg(
        F.hll_sketch_estimate(F.expr("hll_union_agg(sk)")).alias("approx_ndv"),
        F.sum("n").alias("n_rows"),
        F.min("mn").alias("min_price"),
        F.max("mx").alias("max_price"),
    )
    exact = F.broadcast(
        tbl.read().agg(F.countDistinct("o_custkey").alias("exact_ndv"))
    )
    return merged.crossJoin(exact).select(
        "col",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("exact_ndv").cast("long").alias("exact_ndv"),
        (
            F.abs(F.col("approx_ndv") - F.col("exact_ndv"))
            <= F.greatest(
                F.lit(1.0), F.lit(_HLL_REL_BOUND) * F.col("exact_ndv")
            )
        ).alias("within_bound"),
        F.round("min_price", 2).alias("min_price"),
        F.round("max_price", 2).alias("max_price"),
    )


def merge_view_state(view: LakeTable, delta: DataFrame, drop_empty: bool = False) -> None:
    """THE view-merge rule of the revenue-by-priority join view, shared
    by all four tiers (batch append-only, batch CDC-retraction,
    stream-static, two-sided streaming): full-outer-merge a
    ``(o_orderpriority, inc_n, inc_cents)`` partial frame into the
    stored view state — group-key-bounded, decimal(38,0) cents. A
    never-created view bootstraps from the partials; ``drop_empty``
    removes groups whose weighted count reaches 0 (the retraction
    tier)."""
    # coalesce(1) on every view write: the state is GROUP-KEY-BOUNDED (a
    # handful of priority rows at any fact size), but the aggregate that
    # produces it leaves it spread over the full shuffle-partition count —
    # every merge was paying shuffle-partition-count write tasks (and tiny
    # files) to store five rows, once per micro-batch in the streaming
    # tiers. One task, one file, same rows.
    if not view.exists():
        first = delta.select(
            "o_orderpriority",
            F.col("inc_n").alias("n_items"),
            F.col("inc_cents").alias("cents"),
        )
        if drop_empty:
            first = first.filter(F.col("n_items") != 0)
        view.create_or_replace(first.coalesce(1))
        return
    state = view.read()
    zero = F.lit(0).cast("decimal(38,0)")
    merged = state.join(delta, "o_orderpriority", "full_outer").select(
        "o_orderpriority",
        (
            F.coalesce("n_items", F.lit(0)) + F.coalesce("inc_n", F.lit(0))
        ).alias("n_items"),
        (
            F.coalesce(F.col("cents"), zero)
            + F.coalesce(F.col("inc_cents"), zero)
        ).alias("cents"),
    )
    if drop_empty:
        merged = merged.filter(F.col("n_items") != 0)
    view.create_or_replace(merged.coalesce(1))


def view_revenue(view: LakeTable) -> DataFrame:
    """The shared serve read of the join view's state: priority, item
    count, revenue (ONE double division from integer cents)."""
    return (
        view.read()
        .select(
            "o_orderpriority",
            F.col("n_items").cast("long").alias("n_items"),
            F.round(F.col("cents").cast("double") / 100.0, 2).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


def lh_incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a TWO-TABLE JOIN view (the classic
    materialized-view delta-join rule; Delta Live Tables / Materialize
    semantics): a revenue-by-priority rollup over orders ⋈ lineitem,
    maintained O(batch) from BOTH sides' append feeds via

        Δ(O ⋈ L) = ΔO ⋈ L₀  ∪  O₀ ⋈ ΔL  ∪  ΔO ⋈ ΔL

    (the three terms are disjoint, so their aggregate partials ADD). The
    change inputs come from ``LakeTable.appended_between`` — the added
    segments of each side's append commit, never a re-diff or rescan of
    prior batches (``inputFiles``-pinned in tests/test_lakehouse.py).
    The refresh joins each batch against the OTHER side's pre-batch
    snapshot plus the batch-batch term, aggregates partials, and
    full-outer-merges them into the stored view state on the group key
    — the two-table generalization of ``lh_incremental_rollup``.

    Exactness: per-row revenue quantizes to integer cents with the
    identical double expression on both engines; sums ride
    decimal(38,0) ↔ HUGEINT; ONE double division at the end.

    Scale shape: the batch-side joins are O(|Δ| + matching keys) with
    the delta side broadcastable; the snapshot sides are ordinary pruned
    scans (at scale: pk-bucketed co-located joins). The view merge is a
    full-outer on the GROUP key — bounded by the priority vocabulary,
    not the fact tables.

    Oracle: final states are the WHOLE orders/lineitem tables (the two
    batches partition each side), so DuckDB recomputes the view from
    scratch."""
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("cents"),
        "l_linenumber",
    )
    o_tbl = LakeTable(spark, index_tempdir("lake_ivm_o_"))
    l_tbl = LakeTable(spark, index_tempdir("lake_ivm_l_"))
    o_tbl.create_or_replace(orders.filter(F.col("o_orderkey") % 3 < 2))
    l_tbl.create_or_replace(
        li.filter(F.col("l_linenumber") <= 3).drop("l_linenumber")
    )
    o_tbl.append(orders.filter(F.col("o_orderkey") % 3 == 2))
    l_tbl.append(li.filter(F.col("l_linenumber") > 3).drop("l_linenumber"))

    def partial(joined: DataFrame) -> DataFrame:
        return joined.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("inc_n"),
            F.sum(F.col("cents").cast("decimal(38,0)")).alias("inc_cents"),
        )

    view = LakeTable(spark, index_tempdir("lake_ivm_v_"))
    o0, l0 = o_tbl.read(version=0), l_tbl.read(version=0)
    merge_view_state(
        view, partial(o0.join(l0, o0.o_orderkey == l0.l_orderkey))
    )
    # ---- the incremental refresh: O(batch) from both change feeds
    d_o = o_tbl.appended_between(0, 1)
    d_l = l_tbl.appended_between(0, 1)
    delta = (
        partial(d_o.join(l0, d_o.o_orderkey == l0.l_orderkey))
        .unionByName(partial(o0.join(d_l, o0.o_orderkey == d_l.l_orderkey)))
        .unionByName(partial(d_o.join(d_l, d_o.o_orderkey == d_l.l_orderkey)))
        .groupBy("o_orderpriority")
        .agg(
            F.sum("inc_n").alias("inc_n"),
            F.sum("inc_cents").alias("inc_cents"),
        )
    )
    merge_view_state(view, delta)
    return view_revenue(view)


def lh_incremental_join_view_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the orders ⋈ lineitem revenue-by-
    priority view through a CDC batch containing DELETES and UPDATES —
    the retraction half ``lh_incremental_join_view`` leaves out (real
    CDC feeds are not append-only). The change inputs are SIGNED row
    deltas (``LakeTable.signed_changes_between`` — ±1 Z-set
    multiplicities from the file-level commit diff, the DBSP /
    differential-dataflow contract), and the same delta-join rule
    applies with weight products:

        Δ(O ⋈ L) = ΔO ⋈ L₀  ∪  O₀ ⋈ ΔL  ∪  ΔO ⋈ ΔL,   w = w_o · w_l

    so a deleted order RETRACTS its items from the view (negative
    partials subtract in the same full-outer merge) and an updated
    priority retracts under the old group and re-inserts under the new
    one — no rescan of either base table.

    The batch: orders takes a keyed MERGE deleting every o_orderkey
    divisible by 9, re-prioritizing keys ≡4 (mod 9) to '0-RUSH', and
    inserting the keys ≡2 (mod 3) held out of v0; lineitem takes a
    delete of line numbers ≥ 5. Unchanged rows of rewritten buckets
    enter Δ as cancelling -1/+1 pairs — bilinearity cancels them exactly
    (pinned in tests), and the read stays O(touched segments).

    Exactness: identical integer-cents quantization as the append-only
    view; weighted counts/sums ride BIGINT/decimal(38,0) ↔ HUGEINT; ONE
    double division at the end. Groups whose weighted count reaches 0
    drop out of the view (none do here — every priority class keeps
    members).

    Scale shape: Δ sides are O(touched buckets) and broadcastable; the
    snapshot sides are ordinary pruned scans; the view merge is bounded
    by the priority vocabulary.

    Oracle: the two batches leave final states that are pure predicates
    over the source tables, so DuckDB recomputes the view from
    scratch."""
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("cents"),
    )
    o_tbl = LakeTable(spark, index_tempdir("lake_ivmc_o_"))
    l_tbl = LakeTable(spark, index_tempdir("lake_ivmc_l_"))
    o_tbl.create_or_replace(
        orders.filter(F.col("o_orderkey") % 3 < 2),
        bucket_by=("o_orderkey", 8),
    )
    l_tbl.create_or_replace(li, bucket_by=("l_orderkey", 8))
    # ---- the CDC batch: deletes + updates + inserts via MERGE / DELETE
    cdc = (
        orders.filter(F.col("o_orderkey") % 9 == 0)
        .withColumn("op", F.lit("d"))
        .unionByName(
            orders.filter(F.col("o_orderkey") % 9 == 4)
            .withColumn("o_orderpriority", F.lit("0-RUSH"))
            .withColumn("op", F.lit("u"))
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 3 == 2).withColumn(
                "op", F.lit("c")
            )
        )
    )
    o_tbl.merge(cdc, pk="o_orderkey", op_col="op")
    l_tbl.delete_where(F.col("l_linenumber") >= 5)

    def wpartial(joined: DataFrame, weight) -> DataFrame:
        return joined.groupBy("o_orderpriority").agg(
            F.sum(weight).cast("long").alias("inc_n"),
            F.sum(
                (weight * F.col("cents")).cast("decimal(38,0)")
            ).alias("inc_cents"),
        )

    view = LakeTable(spark, index_tempdir("lake_ivmc_v_"))
    o0, l0 = o_tbl.read(version=0), l_tbl.read(version=0)
    merge_view_state(
        view, wpartial(o0.join(l0, o0.o_orderkey == l0.l_orderkey), F.lit(1))
    )
    # ---- the signed refresh: O(touched segments) from both change feeds
    d_o = o_tbl.signed_changes_between(0, 1).withColumnsRenamed(
        {"_weight": "w_o"}
    )
    d_l = l_tbl.signed_changes_between(0, 1).withColumnsRenamed(
        {"_weight": "w_l"}
    )
    delta = (
        wpartial(d_o.join(l0, d_o.o_orderkey == l0.l_orderkey), F.col("w_o"))
        .unionByName(
            wpartial(
                o0.join(d_l, o0.o_orderkey == d_l.l_orderkey), F.col("w_l")
            )
        )
        .unionByName(
            wpartial(
                d_o.join(d_l, d_o.o_orderkey == d_l.l_orderkey),
                F.col("w_o") * F.col("w_l"),
            )
        )
        .groupBy("o_orderpriority")
        .agg(
            F.sum("inc_n").alias("inc_n"),
            F.sum("inc_cents").alias("inc_cents"),
        )
    )
    merge_view_state(view, delta, drop_empty=True)
    return view_revenue(view)


# three-commit table for the change-data-feed query (separate from
# _MERGED_CACHE — the feed's extra commit must not shift the five queries
# reading that table's latest state)
_FEED_CACHE: dict[str, str] = {}


def _feed_table(spark: SparkSession, sf_dir: str) -> LakeTable:
    """v0 = base customers; v1 = CDC MERGE; v2 = segment update."""
    if sf_dir not in _FEED_CACHE:
        root = index_tempdir("lake_feed_")
        table = LakeTable(spark, root)
        table.create_or_replace(_base_customers(spark, sf_dir))
        table.merge(_cdc_source(spark, sf_dir), pk="c_custkey", op_col="op")
        table.update_where(F.col("c_custkey") % 11 == 2, {"c_mktsegment": "VIP"})
        _FEED_CACHE[sf_dir] = root
    return LakeTable(spark, _FEED_CACHE[sf_dir])


def lh_changes_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed (Delta CDF parity) over three real commits: one
    row-level change record per commit step — inserts/updates/deletes from
    the v1 MERGE, then the v2 segment update — with before/after cell
    values surfaced for updates. The oracle replays the same change
    algebra per step in SQL."""
    feed = changes_feed(_feed_table(spark, sf_dir), 0, 2, pk="c_custkey")
    return feed.select(
        "c_custkey",
        "_change_type",
        "_commit_version",
        F.col("changed_cells")["c_acctbal"]["old"].cast("double").alias("old_acctbal"),
        F.col("changed_cells")["c_acctbal"]["new"].cast("double").alias("new_acctbal"),
        F.col("changed_cells")["c_mktsegment"]["new"].alias("new_segment"),
    )


def lh_clone_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-copy shallow clone + divergent writes: clone a bucketed nation
    table (O(metadata), no data copied), update one row in the CLONE and a
    different row in the SOURCE, and return both sides tagged — proving
    snapshot isolation between the two tables over shared segments."""
    src = LakeTable(spark, index_tempdir("lake_clone_src_"))
    src.create_or_replace(
        t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey"),
        bucket_by=("n_nationkey", 4),
    )
    clone = src.clone_to(index_tempdir("lake_clone_dst_") + "/t")
    clone.update_where(F.col("n_nationkey") == 3, {"n_name": F.lit("CLONE_EDIT")})
    src.update_where(F.col("n_nationkey") == 5, {"n_name": F.lit("SRC_EDIT")})
    return src.read().withColumn("side", F.lit("src")).unionByName(
        clone.read().withColumn("side", F.lit("clone"))
    )


# --------------------------------------------------- co-located bucket join

_COLO_BUCKETS = 8
_COLO_DIR: str | None = None


def _colo_root() -> str:
    global _COLO_DIR
    if _COLO_DIR is None:
        _COLO_DIR = index_tempdir("lake_colo_")
    return _COLO_DIR


def _colocated_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write orders and lineitem ONCE per session as Spark bucketed tables
    (same bucket count, bucketed + sorted on the join key) so the join
    below is co-located: both scans come out hash-distributed on the key
    and the join needs NO exchange. Catalog-memoized: repeat sweeps and
    the bench re-read, not re-write."""
    import hashlib
    import os

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    names = (f"colo_orders_{tag}", f"colo_lineitem_{tag}")
    for name, (tbl, key) in zip(
        names, (("orders", "o_orderkey"), ("lineitem", "l_orderkey"))
    ):
        if not spark.catalog.tableExists(name):
            (
                t(spark, sf_dir, tbl)
                .write.format("parquet")
                .bucketBy(_COLO_BUCKETS, key)
                .sortBy(key)
                .option("path", os.path.join(_colo_root(), name))
                .mode("overwrite")
                .saveAsTable(name)
            )
    return names


def lh_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free fact-to-fact join via bucketing — THE layout lever for
    repeated big joins at 100 TB: orders and lineitem are stored bucketed
    (+ sorted) on the order key with equal bucket counts, so the
    sort-merge join reads both sides already co-partitioned — zero
    exchange on either join input (plan-asserted in
    ``tests/test_plans.py::test_colocated_join_no_join_exchange``); the
    only shuffle in the whole query is the final 5-group aggregate.
    Neither side is broadcastable at scale (both are fact tables), which
    is exactly when bucketing pays: the shuffle cost is paid once at
    write time and amortized over every subsequent join.

    The merge hint pins SMJ so the demo measures the bucketed path even
    at toy SF where AQE would otherwise broadcast the small side."""
    to, tl = _colocated_tables(spark, sf_dir)
    o, li = spark.table(to), spark.table(tl)
    return (
        o.hint("merge")
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
        )
    )


_COMPACT_PLAN_CACHE: dict[str, str] = {}
# sf_dir → (overlapping-layout root, sorted-layout root)
_CLUSTER_DEPTH_CACHE: dict[str, tuple[str, str]] = {}
_CD_SEGMENTS = 7


def lh_cluster_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-depth AUDIT over ``$files`` metadata — the metric
    Delta's OPTIMIZE ZORDER reports to decide whether a rewrite is worth
    it: for each data file, how many files' [min, max] key ranges cover
    its lower bound (overlap depth); a perfectly clustered table has
    depth 1 everywhere, an append-only table converges to depth ≈
    n_files. The audit side of ``lh_zorder_skipping`` — that op proves
    pruning works on a sorted layout, this one MEASURES how far a layout
    is from prunable, reading only recorded column stats (no data files
    opened).

    Two real tables are built and audited side-by-side: 7 hash-sliced
    appends (``o_orderkey % 7`` — every segment spans the whole key
    domain, depth 7) and 7 range-sliced appends (rank-partitioned —
    disjoint ranges, depth 1), so the metric demonstrably discriminates
    layout quality, and the oracle recomputing the ranges from the
    SAME slicing rules cross-checks the manifest's recorded stats
    end-to-end.

    Depth via the interval SWEEP, not an O(files²) overlap self-join:
    each manifest entry contributes (+1 at min, −1 after max); the
    running event sum at each file's start event IS its overlap depth.
    The cumulative window runs over 2·n_files manifest-bounded rows
    (ends sort after starts at equal positions, so touching ranges
    count as overlapping — both engines apply the same (pos, is_end)
    order). Integer arithmetic throughout (ppm share via integer
    division)."""
    from pyspark.sql import Window

    if sf_dir not in _CLUSTER_DEPTH_CACHE:
        keys = t(spark, sf_dir, "orders").select("o_orderkey")
        n = keys.count()
        w_rank = Window.orderBy("o_orderkey")
        sliced = keys.select(
            "o_orderkey",
            (F.col("o_orderkey") % _CD_SEGMENTS).alias("b_mod"),
            F.expr(
                f"(row_number() OVER (ORDER BY o_orderkey) - 1) "
                f"* {_CD_SEGMENTS} div {n}"
            ).alias("b_rng"),
        ).localCheckpoint()
        roots = []
        for col in ("b_mod", "b_rng"):
            root = index_tempdir("lake_clusterdepth_")
            table = LakeTable(spark, root)
            for b in range(_CD_SEGMENTS):
                part = sliced.filter(F.col(col) == b).select("o_orderkey")
                if b == 0:
                    table.create_or_replace(part)
                else:
                    table.append(part)
            roots.append(root)
        _CLUSTER_DEPTH_CACHE[sf_dir] = (roots[0], roots[1])
    out = []
    for layout, root in zip(
        ("append-overlapping", "range-sorted"), _CLUSTER_DEPTH_CACHE[sf_dir]
    ):
        segs = (
            LakeTable(spark, root)
            .files()
            .filter(~F.col("is_delta"))
            .select(
                F.get_json_object("stats_json", "$.o_orderkey[0]")
                .cast("long")
                .alias("mn"),
                F.get_json_object("stats_json", "$.o_orderkey[1]")
                .cast("long")
                .alias("mx"),
            )
        )
        events = segs.select(
            F.col("mn").alias("pos"),
            F.lit(1).alias("delta"),
            F.lit(0).alias("is_end"),
        ).unionByName(
            segs.select(
                F.col("mx").alias("pos"),
                F.lit(-1).alias("delta"),
                F.lit(1).alias("is_end"),
            )
        )
        w_sweep = Window.orderBy("pos", "is_end").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        depths = events.withColumn("d", F.sum("delta").over(w_sweep)).filter(
            F.col("is_end") == 0
        )
        out.append(
            depths.agg(
                F.lit(layout).alias("layout"),
                F.count(F.lit(1)).alias("n_files"),
                F.max("d").cast("long").alias("max_depth"),
                F.expr("sum(d) * 1000000 div count(1)").alias("avg_depth_ppm"),
            )
        )
    return out[0].unionByName(out[1]).orderBy("layout")


def lh_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction PLANNER over ``$files`` metadata — the OPTIMIZE
    bin-packing step surfaced as a queryable plan (what Delta's OPTIMIZE
    and Iceberg's rewrite_data_files decide before touching data): after
    seven per-year appends the table holds seven base segments; the
    planner sorts segments size-descending (ties on the segment's min
    year, read from the recorded column stats — the planner NEVER opens
    data files) and fills compaction groups to a row target by prefix
    sum, emitting per-group file counts, row totals, member lists, and
    the worth-compacting flag.

    The row target here is fixture-relative (ceil(total/3) → ~3 groups at
    any SF); a production call passes an absolute bytes/rows target — the
    plan shape is identical. Determinism: pure integer sort/prefix-sum
    arithmetic over manifest entries. Scale shape: everything runs on the
    MANIFEST relation (one row per segment — thousands, not billions);
    the single-partition window is bounded by manifest size, and the
    one-row total is the scalar-anchor cross-join."""
    from pyspark.sql import Window

    if sf_dir not in _COMPACT_PLAN_CACHE:
        root = index_tempdir("lake_compactplan_")
        table = LakeTable(spark, root)
        base = t(spark, sf_dir, "orders").select(
            "o_orderkey", F.year("o_orderdate").cast("int").alias("o_year")
        )
        years = [
            r.o_year
            for r in base.select("o_year").distinct().orderBy("o_year").collect()
        ]
        table.create_or_replace(base.filter(F.col("o_year") == years[0]))
        for y in years[1:]:
            table.append(base.filter(F.col("o_year") == y))
        _COMPACT_PLAN_CACHE[sf_dir] = root
    table = LakeTable(spark, _COMPACT_PLAN_CACHE[sf_dir])
    segs = (
        table.files()
        .filter(~F.col("is_delta"))
        .select(
            F.get_json_object("stats_json", "$.o_year[0]").cast("int").alias(
                "min_year"
            ),
            "n_rows",
        )
    )
    total = segs.agg(F.sum("n_rows").alias("total"))
    w_before = (
        Window.orderBy(F.desc("n_rows"), F.asc("min_year"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = (
        segs.crossJoin(F.broadcast(total))
        .withColumn(
            "cum_before", F.coalesce(F.sum("n_rows").over(w_before), F.lit(0))
        )
        .withColumn("grp", F.expr("cum_before div ((total + 2) div 3)"))
    )
    member = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct((-F.col("n_rows")).alias("neg"), "min_year"))
            ),
            lambda s: s["min_year"].cast("string"),
        ),
        ",",
    )
    return (
        planned.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_rows").alias("total_rows"),
            member.alias("members"),
        )
        .select(
            F.col("grp").cast("long").alias("group_id"),
            "n_files",
            "total_rows",
            "members",
            (F.col("n_files") > 1).alias("compact_worthwhile"),
        )
        .orderBy("group_id")
    )


_VACUUM_PLAN_CACHE: dict[str, str] = {}
_VACUUM_KEEP = 2  # live snapshots retained by the audit's retention policy


def lh_vacuum_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM planner — the snapshot-expiry GC decision as a queryable
    report (Delta VACUUM / Iceberg expire_snapshots, dry-run): after a
    full load, a replacing reload, and an append, a keep-last-2 retention
    leaves the original full segment referenced ONLY by the expired first
    snapshot — reclaimable — while both live segments stay pinned. The
    planner walks the manifest chain (versions × entries — metadata only,
    no data files opened), unions every segment ever referenced, and
    flags each with liveness under the retention policy plus its size and
    stats identity.

    Determinism: segment identities come from recorded n_rows + min-key
    stats, both exact functions of the fixture filters the commits were
    built from — so the oracle derives the identical report straight from
    the orders table. Scale shape: O(versions × manifest entries)
    driver-side metadata, like every $-table here."""
    if sf_dir not in _VACUUM_PLAN_CACHE:
        root = index_tempdir("lake_vacplan_")
        table = LakeTable(spark, root)
        base = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        table.create_or_replace(base)  # v1: full load (expired by policy)
        table.create_or_replace(base.filter(F.col("o_orderkey") % 2 == 0))
        table.append(base.filter(F.col("o_orderkey") % 4 == 1))
        _VACUUM_PLAN_CACHE[sf_dir] = root
    table = LakeTable(spark, _VACUUM_PLAN_CACHE[sf_dir])
    versions = sorted(table.versions())
    live = set(versions[-_VACUUM_KEEP:])
    # distributed manifest relation: union the per-version $files frames
    # (each O(manifest entries)) tagged with liveness, then derive per-
    # segment liveness as bool_or over its referencing snapshots — one
    # groupBy, no driver-side versions × entries fold. At warehouse scale
    # the manifest union is millions of rows across thousands of
    # snapshots; the aggregate shape is what an Iceberg expire_snapshots
    # dry-run runs as a distributed metadata query.
    from functools import reduce as _reduce

    manifest = _reduce(
        DataFrame.unionByName,
        [
            table.files(v).withColumn("ref_live", F.lit(v in live))
            for v in versions
        ],
    )
    return (
        manifest.groupBy("path")
        .agg(
            F.first("n_rows").alias("n_rows"),
            F.get_json_object(F.first("stats_json"), "$.o_orderkey[0]")
            .cast("long")
            .alias("min_orderkey"),
            F.bool_or("ref_live").alias("is_live"),
        )
        .select(
            "n_rows",
            "min_orderkey",
            "is_live",
            (~F.col("is_live")).alias("reclaimable"),
        )
        .orderBy(F.desc("n_rows"))
    )


_ORPHAN_CACHE: dict[str, str] = {}


def lh_orphan_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-file detection (Iceberg ``remove_orphan_files`` dry-run): a
    segment directory that exists under ``data/`` but is referenced by NO
    retained snapshot is storage leaked by a failed/abandoned write —
    MERGE-crashed-before-publish, the exact failure mode
    ``_publish_commit``'s lost-race cleanup handles when it CAN run. The
    fixture stages that scenario: two committed segments plus one segment
    written straight into ``data/`` whose commit never published.

    Plan: the referenced-path set is the distributed union of every
    retained snapshot's $files frame (same manifest relation as
    lh_vacuum_plan — O(versions x entries) stays on executors, never a
    driver fold); the disk side is ONE recursive FILE LISTING of the
    whole ``data/`` dir (binaryFile source, content column pruned — at
    warehouse scale: an object-store LIST) fed to an Arrow-batched
    footer reader: per file, only the parquet FOOTER is opened
    (num_rows + o_orderkey min/max statistics), never row data. Each
    file's footer is parsed independently, so orphan segments whose
    schema drifted from the live table cannot break the scan (a unified
    ``spark.read.parquet`` over mixed-schema segments would). The
    segment key is anchored on the known ``data/`` root (not the first
    '/data/' substring — a warehouse path containing 'data' elsewhere
    would mis-group every file). Liveness is a broadcast left join
    against the manifest-path relation — plan size is independent of
    segment count.

    Oracle: segment contents derive exactly from the staging filters, so
    DuckDB rebuilds the report from the orders table (footer min/max of
    an int64 column is exact, so the stats-derived min equals the data
    min)."""
    import os
    import re as _re
    from functools import reduce as _reduce

    if sf_dir not in _ORPHAN_CACHE:
        root = index_tempdir("lake_orphan_")
        table = LakeTable(spark, root)
        base = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        table.create_or_replace(base.filter(F.col("o_orderkey") % 2 == 0))
        table.append(base.filter(F.col("o_orderkey") % 4 == 1))
        # a failed writer's leftovers: segment on disk, commit never published
        base.filter(F.col("o_orderkey") % 7 == 3).write.parquet(
            os.path.join(root, "data", "99-deadbeef.parquet")
        )
        _ORPHAN_CACHE[sf_dir] = root
    return orphan_report(spark, _ORPHAN_CACHE[sf_dir])


def orphan_report(spark: SparkSession, root: str) -> DataFrame:
    """The report core of :func:`lh_orphan_files`, reusable against any
    table root (tests stage a schema-evolved orphan through this)."""
    import os
    import re as _re
    from functools import reduce as _reduce

    table = LakeTable(spark, root)
    referenced = (
        _reduce(
            DataFrame.unionByName,
            [table.files(v).select("path") for v in table.versions()],
        )
        .distinct()
        .select(F.col("path").alias("seg"), F.lit(True).alias("referenced"))
    )
    data_dir = os.path.join(root, "data")
    listing = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .load(data_dir)
        .select(F.regexp_replace("path", "^file:(//)?", "").alias("fpath"))
        .withColumn(
            "seg",
            F.regexp_extract(
                "fpath", "^(" + _re.escape(data_dir) + "/[^/]+)", 1
            ),
        )
    )

    def _footer_stats(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            segs, counts, mins = [], [], []
            for fpath, seg in zip(pdf["fpath"], pdf["seg"]):
                md = pq.ParquetFile(fpath).metadata
                mn = None
                for rg in range(md.num_row_groups):
                    row_group = md.row_group(rg)
                    for ci in range(row_group.num_columns):
                        col = row_group.column(ci)
                        if col.path_in_schema != "o_orderkey":
                            continue
                        st = col.statistics
                        if st is not None and st.has_min_max:
                            mn = st.min if mn is None else min(mn, st.min)
                segs.append(seg)
                counts.append(md.num_rows)
                mins.append(mn)
            yield pd.DataFrame(
                {"seg": segs, "n_rows": counts, "min_orderkey": mins}
            )

    on_disk = (
        listing.mapInPandas(
            _footer_stats, "seg string, n_rows long, min_orderkey long"
        )
        .groupBy("seg")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.min("min_orderkey").alias("min_orderkey"),
        )
    )
    return (
        on_disk.join(F.broadcast(referenced), "seg", "left")
        .select(
            "n_rows",
            "min_orderkey",
            F.coalesce("referenced", F.lit(False)).alias("referenced"),
            (~F.coalesce("referenced", F.lit(False))).alias("reclaimable"),
        )
        .orderBy(F.desc("n_rows"))
    )



def lh_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-Audit-Publish (the Iceberg/Netflix WAP pattern — stage on an
    isolated branch, audit the staged state, publish only if the audit
    passes): a raw customer feed lands on an ``audit`` branch, the audit
    suite runs AGAINST THE BRANCH (null keys, domain violations —
    negative keys, blank segments), the violating rows are quarantined
    with a branch-side delete, the audit re-runs clean, and ONLY THEN does
    a fast-forward merge publish the branch head to main. Main never
    serves un-audited rows at any point (branch isolation is pinned in
    tests/test_branches.py).

    Scale shape: branch fork and publish are O(metadata) (parallel commit
    chains over the shared data/ dir); the audit queries are ordinary
    pruned scans of the branch; the quarantine delete is bucket-granular.

    Oracle: the staged feed and both audit predicates derive exactly from
    fixture filters, so DuckDB computes the same published state."""
    table = LakeTable(spark, index_tempdir("lake_wap_"))
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", F.round("c_acctbal", 2).alias("bal")
    )
    table.create_or_replace(cust.filter(F.col("c_custkey") % 3 == 0))
    br = table.create_branch("audit")
    # the raw feed: new rows, some violating the domain rules (key sign
    # flipped for %11==1, segment blanked for %13==2) — deterministic
    feed = cust.filter(F.col("c_custkey") % 3 == 1).select(
        F.when(F.col("c_custkey") % 11 == 1, -F.col("c_custkey"))
        .otherwise(F.col("c_custkey"))
        .alias("c_custkey"),
        "c_name",
        F.when(F.col("c_custkey") % 13 == 2, F.lit(""))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        "bal",
    )
    br.append(feed)
    # strictly negative: key 0 is a legitimate pre-published base row
    bad = F.col("c_custkey") < 0
    blank = F.col("c_mktsegment") == ""
    n_bad = br.read().filter(bad | blank).count()
    if n_bad:  # audit failed: quarantine violators ON THE BRANCH
        br.delete_where(bad | blank)
    assert br.read().filter(bad | blank).count() == 0  # audit green
    table.merge_branch("audit")  # publish
    return table.read()



QUERIES = {
    "lh_compaction_plan": lh_compaction_plan,
    "lh_cluster_depth": lh_cluster_depth,
    "lh_vacuum_plan": lh_vacuum_plan,
    "lh_orphan_files": lh_orphan_files,
    "lh_write_audit_publish": lh_write_audit_publish,
    "lh_colocated_join": lh_colocated_join,
    "lh_changes_feed": lh_changes_feed,
    "lh_clone_divergence": lh_clone_divergence,
    "lh_mor_read_amp": lh_mor_read_amp,
    "lh_composite_key_dml": lh_composite_key_dml,
    "lh_scd2_history": lh_scd2_history,
    "lh_scd2_asof_join": lh_scd2_asof_join,
    "lh_partitions_meta": lh_partitions_meta,
    "lh_stats_skipping": lh_stats_skipping,
    "lh_bloom_skipping": lh_bloom_skipping,
    "lh_bloom_join_pruning": lh_bloom_join_pruning,
    "lh_deletion_vectors": lh_deletion_vectors,
    "lh_restore": lh_restore,
    "lh_branch_merge": lh_branch_merge,
    "lh_partition_evolution": lh_partition_evolution,
    "lh_constrained_dml": lh_constrained_dml,
    "lh_zorder_skipping": lh_zorder_skipping,
    "lh_merge_upsert": lh_merge_upsert,
    "lh_incremental_rollup": lh_incremental_rollup,
    "lh_incremental_join_view": lh_incremental_join_view,
    "lh_incremental_join_view_cdc": lh_incremental_join_view_cdc,
    "lh_analyze_incremental": lh_analyze_incremental,
    "lh_constraint_report": lh_constraint_report,
    "lh_time_travel": lh_time_travel,
    "lh_expired_fallback": lh_expired_fallback,
    "lh_history": lh_history,
    "lh_snapshot_diff": lh_snapshot_diff,
    "lh_dml_chain": lh_dml_chain,
    "lh_append_evolution": lh_append_evolution,
    "lh_merge_evolution": lh_merge_evolution,
    "lh_catalog": lh_catalog,
}

ORACLE = {
    # recomputes each layout's segment [min, max] ranges from the SAME
    # slicing rules the fixture build used (o_orderkey % 7 /
    # rank-partitioned), then the identical (pos, is_end)-ordered sweep —
    # a mismatch means the manifest recorded wrong column stats
    "lh_cluster_depth": f"""
        WITH k AS (SELECT o_orderkey AS key FROM orders),
        st AS (SELECT count(*) AS n FROM k),
        rk AS (SELECT key, row_number() OVER (ORDER BY key) AS r FROM k),
        seg_mod AS (
            SELECT key % {_CD_SEGMENTS} AS b, min(key) AS mn, max(key) AS mx
            FROM k GROUP BY 1
        ),
        seg_rng AS (
            SELECT (r - 1) * {_CD_SEGMENTS} // n AS b,
                   min(key) AS mn, max(key) AS mx
            FROM rk, st GROUP BY 1
        ),
        ev AS (
            SELECT 'append-overlapping' AS layout, mn AS pos,
                   1 AS delta, 0 AS is_end FROM seg_mod
            UNION ALL SELECT 'append-overlapping', mx, -1, 1 FROM seg_mod
            UNION ALL SELECT 'range-sorted', mn, 1, 0 FROM seg_rng
            UNION ALL SELECT 'range-sorted', mx, -1, 1 FROM seg_rng
        ),
        run AS (
            SELECT layout, is_end,
                   sum(delta) OVER (PARTITION BY layout
                       ORDER BY pos, is_end
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS d
            FROM ev
        )
        SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
               CAST(max(d) AS BIGINT) AS max_depth,
               CAST(sum(d) * 1000000 // count(*) AS BIGINT) AS avg_depth_ppm
        FROM run WHERE is_end = 0 GROUP BY layout
        ORDER BY layout
    """,
    "lh_write_audit_publish": """
        WITH base AS (
            SELECT c_custkey, c_name, c_mktsegment, round(c_acctbal, 2) AS bal
            FROM customer WHERE c_custkey % 3 = 0
        ), feed AS (
            SELECT CASE WHEN c_custkey % 11 = 1 THEN -c_custkey
                        ELSE c_custkey END AS c_custkey,
                   c_name,
                   CASE WHEN c_custkey % 13 = 2 THEN ''
                        ELSE c_mktsegment END AS c_mktsegment,
                   round(c_acctbal, 2) AS bal
            FROM customer WHERE c_custkey % 3 = 1
        )
        SELECT * FROM base
        UNION ALL
        SELECT * FROM feed
        WHERE c_custkey > 0 AND c_mktsegment <> ''
    """,
    # the planner's inputs are manifest entries whose n_rows/min-year
    # stats derive EXACTLY from the per-year fixture partitioning, so the
    # oracle rebuilds the segment relation from orders and replays the
    # identical sort → prefix-sum → group arithmetic
    "lh_compaction_plan": """
        WITH seg AS (
            SELECT CAST(year(o_orderdate) AS INTEGER) AS min_year,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM orders GROUP BY 1
        ), tot AS (
            SELECT CAST(sum(n_rows) AS BIGINT) AS total FROM seg
        ), planned AS (
            SELECT min_year, n_rows, total,
                   CAST(coalesce(sum(n_rows) OVER (
                        ORDER BY n_rows DESC, min_year ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS cum_before
            FROM seg CROSS JOIN tot
        )
        SELECT CAST(cum_before // ((total + 2) // 3) AS BIGINT) AS group_id,
               CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(n_rows) AS BIGINT) AS total_rows,
               array_to_string(list(CAST(min_year AS VARCHAR)
                                    ORDER BY n_rows DESC, min_year ASC),
                               ',') AS members,
               count(*) > 1 AS compact_worthwhile
        FROM planned GROUP BY 1
        ORDER BY group_id
    """,
    # segments are exact functions of the fixture filters the commits were
    # built from; the report derives from orders directly
    "lh_orphan_files": """
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(o_orderkey) AS BIGINT) AS min_orderkey,
               true AS referenced, false AS reclaimable
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT CAST(count(*) AS BIGINT), CAST(min(o_orderkey) AS BIGINT),
               true, false
        FROM orders WHERE o_orderkey % 4 = 1
        UNION ALL
        SELECT CAST(count(*) AS BIGINT), CAST(min(o_orderkey) AS BIGINT),
               false, true
        FROM orders WHERE o_orderkey % 7 = 3
        ORDER BY n_rows DESC
    """,
    "lh_vacuum_plan": """
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(o_orderkey) AS BIGINT) AS min_orderkey,
               false AS is_live, true AS reclaimable
        FROM orders
        UNION ALL
        SELECT CAST(count(*) AS BIGINT), CAST(min(o_orderkey) AS BIGINT),
               true, false
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT CAST(count(*) AS BIGINT), CAST(min(o_orderkey) AS BIGINT),
               true, false
        FROM orders WHERE o_orderkey % 4 = 1
        ORDER BY n_rows DESC
    """,
    "lh_colocated_join": """
        SELECT o_orderpriority,
               count(*) AS n_items,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority
    """,
    "lh_changes_feed": f"""
        WITH {_MERGED_SQL}
        SELECT m.c_custkey, 'insert' AS _change_type,
               CAST(1 AS INTEGER) AS _commit_version,
               CAST(NULL AS DOUBLE) AS old_acctbal,
               CAST(NULL AS DOUBLE) AS new_acctbal,
               CAST(NULL AS VARCHAR) AS new_segment
        FROM merged m WHERE NOT EXISTS
            (SELECT 1 FROM base b WHERE b.c_custkey = m.c_custkey)
        UNION ALL
        SELECT b.c_custkey, 'delete', 1, NULL, NULL, NULL
        FROM base b WHERE NOT EXISTS
            (SELECT 1 FROM merged m WHERE m.c_custkey = b.c_custkey)
        UNION ALL
        SELECT b.c_custkey, 'update', 1, b.c_acctbal, m.c_acctbal, NULL
        FROM base b JOIN merged m ON b.c_custkey = m.c_custkey
        WHERE CAST(b.c_acctbal AS VARCHAR) != CAST(m.c_acctbal AS VARCHAR)
           OR b.c_name != m.c_name OR b.c_mktsegment != m.c_mktsegment
        UNION ALL
        SELECT c_custkey, 'update', 2, NULL, NULL, 'VIP'
        FROM merged WHERE c_custkey % 11 = 2 AND c_mktsegment != 'VIP'
    """,
    "lh_clone_divergence": """
        SELECT n_nationkey,
               CASE WHEN n_nationkey = 5 THEN 'SRC_EDIT' ELSE n_name END
                   AS n_name,
               n_regionkey, 'src' AS side
        FROM nation
        UNION ALL
        SELECT n_nationkey,
               CASE WHEN n_nationkey = 3 THEN 'CLONE_EDIT' ELSE n_name END
                   AS n_name,
               n_regionkey, 'clone' AS side
        FROM nation
    """,
    "lh_scd2_history": _SCD2_SQL,
    "lh_partitions_meta": """
        SELECT o_orderpriority, count(*) AS n_rows
        FROM orders GROUP BY 1
    """,
    "lh_scd2_asof_join": f"""
        WITH {_SCD2_BODY},
        probes AS (
            SELECT c_custkey, as_of
            FROM customer, unnest(['2020-06-01', '2024-01-15', '2024-06-01'])
                 AS u(as_of)
        )
        SELECT p.c_custkey, p.as_of, d.c_mktsegment, d.c_acctbal,
               d.effective_from
        FROM probes p JOIN scd2_dim d
            ON p.c_custkey = d.c_custkey
            AND d.effective_from <= p.as_of
            AND (d.effective_to IS NULL OR d.effective_to > p.as_of)
    """,
    "lh_composite_key_dml": """
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_linenumber = 1 THEN l_quantity + 5
                    ELSE l_quantity END AS l_quantity,
               round(l_extendedprice, 2) AS l_extendedprice
        FROM lineitem
        WHERE l_orderkey < 2000 AND l_linenumber != 3
    """,
    "lh_stats_skipping": """
        SELECT strftime(o_orderdate, '%Y-%m') AS o_ym,
               count(*) AS n_orders,
               CAST(round(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS revenue
        FROM orders
        WHERE strftime(o_orderdate, '%Y-%m') >= '1997-01'
        GROUP BY 1
    """,
    "lh_bloom_skipping": """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_custkey = (SELECT min(o_custkey) FROM orders)
    """,
    # deletion vectors: the stacked DV deletes hit only the pre-append
    # even half; the odd half appended after the tombstones keeps its
    # urgent rows — final state is a pure predicate over orders
    "lh_deletion_vectors": """
        WITH st AS (
            SELECT o_orderpriority, round(o_totalprice, 2) AS p
            FROM orders
            WHERE (o_orderkey % 2 = 0 AND o_orderkey % 10 <> 4
                   AND o_orderpriority <> '1-URGENT')
               OR o_orderkey % 2 = 1
        )
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
               CAST(round(sum(CAST(p AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS revenue
        FROM st GROUP BY 1 ORDER BY 1
    """,
    # join pruning result-invariance: the oracle joins the UNPRUNED
    # tables — equality proves the bloom probe dropped only segments
    # provably empty of the dim's keys
    "lh_bloom_join_pruning": """
        WITH ks AS (
            SELECT DISTINCT o_custkey FROM orders ORDER BY o_custkey LIMIT 2
        )
        SELECT c_custkey, c_name, CAST(count(*) AS BIGINT) AS n_orders,
               CAST(round(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,4))),
                          2) AS DOUBLE) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_custkey IN (SELECT o_custkey FROM ks)
        GROUP BY c_custkey, c_name
        ORDER BY c_custkey
    """,
    "lh_restore": """
        SELECT p_partkey, p_name, p_brand, round(p_retailprice, 2) AS p_retailprice
        FROM part WHERE p_partkey < 150
    """,
    "lh_partition_evolution": """
        SELECT o_orderkey, o_custkey, o_orderstatus,
               round(o_totalprice, 2) AS o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 3 != 0
    """,
    "lh_branch_merge": """
        SELECT s_suppkey, s_name, s_nationkey,
               CASE WHEN s_suppkey % 5 = 0 THEN 1.5
                    ELSE round(s_acctbal, 2) END AS s_acctbal
        FROM supplier WHERE s_suppkey % 7 != 0
    """,
    "lh_constrained_dml": """
        WITH base AS (
            SELECT p_partkey, p_name, round(p_retailprice, 2) AS p_retailprice
            FROM part WHERE p_partkey < 120
            UNION ALL
            SELECT 2000001, 'constrained part', 10.5
        )
        SELECT p_partkey, p_name,
               CASE WHEN p_partkey % 5 = 0 THEN 1.25 ELSE p_retailprice END
                   AS p_retailprice
        FROM base WHERE p_partkey % 7 != 0
    """,
    "lh_zorder_skipping": """
        SELECT o_custkey % 10 AS cust_bucket, count(*) AS n_orders,
               CAST(round(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS revenue
        FROM orders
        WHERE round(o_totalprice, 2) >= 100000.0
          AND round(o_totalprice, 2) < 120000.0
        GROUP BY 1
    """,
    "lh_mor_read_amp": """
        SELECT c_mktsegment, count(*) AS n_rows,
               CAST(round(sum(CAST(round(c_acctbal + 10.0 * (c_custkey % 7 + 1), 2)
                                   AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_acctbal
        FROM customer GROUP BY c_mktsegment
    """,
    "lh_merge_upsert": f"WITH {_MERGED_SQL} SELECT * FROM merged",
    "lh_incremental_rollup": """
        SELECT date_trunc('day', ts) AS day, count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1
    """,
    "lh_constraint_report": """
        WITH c AS (
            SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS bal
            FROM customer
        ), n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM c)
        SELECT 'bal_nonneg' AS "constraint",
               n_rows,
               (SELECT CAST(sum(CASE WHEN NOT (bal >= 0) THEN 1 ELSE 0 END)
                       AS BIGINT) FROM c) AS n_violations,
               CAST(0 AS BIGINT) AS n_unknown,
               (SELECT sum(CASE WHEN NOT (bal >= 0) THEN 1 ELSE 0 END) = 0
                FROM c) AS would_pass
        FROM n
        UNION ALL
        SELECT 'key_positive', n_rows,
               (SELECT CAST(sum(CASE WHEN NOT (c_custkey > 0) THEN 1 ELSE 0
                            END) AS BIGINT) FROM c),
               CAST(0 AS BIGINT),
               (SELECT sum(CASE WHEN NOT (c_custkey > 0) THEN 1 ELSE 0
                           END) = 0 FROM c)
        FROM n
        UNION ALL
        SELECT 'seg_rule', n_rows,
               (SELECT CAST(sum(CASE WHEN (nullif(c_mktsegment, 'BUILDING')
                                           != 'MACHINERY') = false
                                     THEN 1 ELSE 0 END) AS BIGINT) FROM c),
               (SELECT CAST(sum(CASE WHEN (nullif(c_mktsegment, 'BUILDING')
                                           != 'MACHINERY') IS NULL
                                     THEN 1 ELSE 0 END) AS BIGINT) FROM c),
               (SELECT sum(CASE WHEN (nullif(c_mktsegment, 'BUILDING')
                                      != 'MACHINERY') = false
                           THEN 1 ELSE 0 END) = 0 FROM c)
        FROM n
        ORDER BY "constraint"
    """,
    "lh_analyze_incremental": """
        SELECT 'o_custkey' AS col,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_ndv,
               true AS within_bound,
               round(min(o_totalprice), 2) AS min_price,
               round(max(o_totalprice), 2) AS max_price
        FROM orders
    """,
    "lh_incremental_join_view": """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_items,
               round(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                          * 100) AS BIGINT)) AS DOUBLE)
                     / 100.0, 2) AS revenue
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    # retraction IVM: the CDC batch leaves final states that are pure
    # predicates over the sources — orders minus the %9==0 deletes plus
    # the %3==2 inserts with the %9==4 re-prioritization, lineitem minus
    # line numbers >= 5 — so the view recomputes from scratch
    "lh_incremental_join_view_cdc": """
        WITH o AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 9 = 4 THEN '0-RUSH'
                        ELSE o_orderpriority END AS o_orderpriority
            FROM orders
            WHERE (o_orderkey % 3 < 2 AND o_orderkey % 9 <> 0)
               OR o_orderkey % 3 = 2
        ), l AS (
            SELECT l_orderkey,
                   CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT) AS cents
            FROM lineitem WHERE l_linenumber <= 4
        )
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_items,
               round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS revenue
        FROM o JOIN l ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "lh_time_travel": f"WITH {_MERGED_SQL} SELECT * FROM base",
    "lh_expired_fallback": f"WITH {_MERGED_SQL} SELECT * FROM merged",
    "lh_history": f"""
        WITH {_MERGED_SQL}
        SELECT CAST(1 AS INTEGER) AS version, CAST(0 AS INTEGER) AS parent,
               'merge' AS operation, (SELECT count(*) FROM merged) AS n_rows
        UNION ALL
        SELECT 0, NULL, 'create_or_replace', (SELECT count(*) FROM base)
    """,
    "lh_snapshot_diff": f"""
        WITH {_MERGED_SQL}
        SELECT m.c_custkey, 'NEW' AS status,
               CAST(NULL AS DOUBLE) AS old_acctbal,
               CAST(NULL AS DOUBLE) AS new_acctbal
        FROM merged m WHERE NOT EXISTS
            (SELECT 1 FROM base b WHERE b.c_custkey = m.c_custkey)
        UNION ALL
        SELECT b.c_custkey, 'DELETED', NULL, NULL
        FROM base b WHERE NOT EXISTS
            (SELECT 1 FROM merged m WHERE m.c_custkey = b.c_custkey)
        UNION ALL
        SELECT b.c_custkey, 'MODIFIED', b.c_acctbal, m.c_acctbal
        FROM base b JOIN merged m ON b.c_custkey = m.c_custkey
        WHERE CAST(b.c_acctbal AS VARCHAR) != CAST(m.c_acctbal AS VARCHAR)
           OR b.c_name != m.c_name OR b.c_mktsegment != m.c_mktsegment
    """,
    "lh_dml_chain": """
        WITH base AS (
            SELECT p_partkey, p_name, p_brand, p_retailprice
            FROM part WHERE p_partkey < 100
        ), updated AS (
            SELECT p_partkey, p_name, p_brand,
                   CASE WHEN p_partkey % 10 = 3 THEN 9999.99
                        ELSE p_retailprice END AS p_retailprice
            FROM base
        ), afterdel AS (
            SELECT * FROM updated WHERE NOT (p_partkey % 10 = 7)
        )
        SELECT * FROM afterdel
        UNION ALL
        SELECT * FROM (VALUES
            (CAST(1000001 AS BIGINT), 'inserted part a', 'Brand#99', CAST(1.5 AS DOUBLE)),
            (CAST(1000002 AS BIGINT), 'inserted part b', 'Brand#98', CAST(2.5 AS DOUBLE))
        ) v(p_partkey, p_name, p_brand, p_retailprice)
    """,
    "lh_append_evolution": """
        SELECT n_nationkey, n_name, n_regionkey, CAST(NULL AS VARCHAR) AS ingest_batch
        FROM nation WHERE n_nationkey < 10
        UNION ALL
        SELECT n_nationkey, n_name, n_regionkey, 'batch2'
        FROM nation WHERE n_nationkey >= 10
    """,
    "lh_merge_evolution": """
        SELECT n_nationkey, n_name, n_regionkey, CAST(NULL AS VARCHAR) AS trade_zone
        FROM nation WHERE n_regionkey != 0
        UNION ALL
        SELECT n_nationkey, n_name || '_v2', n_regionkey, 'zone_a'
        FROM nation WHERE n_regionkey = 0
        UNION ALL
        SELECT 990, 'NEWLAND', 0, 'zone_b'
    """,
    "lh_catalog": """
        SELECT 'nations' AS table_name, '__table__' AS detail
        UNION ALL SELECT 'regions', '__table__'
        UNION ALL SELECT 'regions', 'r_regionkey:int'
        UNION ALL SELECT 'regions', 'r_name:string'
    """,
}
