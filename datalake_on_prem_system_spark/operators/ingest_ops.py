"""CSV-ingest operator queries (S1/S7/K1-K3/F8 + schema evolution).

Each query writes a real CSV (messy headers and all) from fixture data,
ingests it through ``sources.csv_ingest`` into a versioned LakeTable, and
returns the read-back state; the oracle reproduces the same result as SQL
over the original fixture tables — covering read → sanitize → infer →
commit → read end-to-end.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakehouse import LakeTable
from ..sources.csv_ingest import ingest_csv
from ._cache import persist_bounded
from .common import index_tempdir, t


def _write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)


def in_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+F8+K1: CSV with Avro-hostile headers (spaces, dots, parens) →
    sanitize → inferSchema → create-or-replace → read back. Output cast to
    stable widths (inference picks the narrowest int that fits)."""
    work = index_tempdir("ingest_rt_")
    src = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 10 == 0)
        .select(
            F.col("c_custkey").alias("Customer Key"),
            F.col("c_name").alias("Name.Full"),
            F.round("c_acctbal", 2).alias("acct (bal)"),
        )
    )
    csv_path = os.path.join(work, "in.csv")
    _write_csv(src, csv_path)
    out = ingest_csv(LakeTable(spark, os.path.join(work, "tbl")), csv_path, mode="create")
    return out.select(
        F.col("Customer_Key").cast("bigint").alias("customer_key"),
        F.col("NameFull").alias("name_full"),
        F.col("acct_bal").cast("double").alias("acct_bal"),
    )


def in_csv_append_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 + schema evolution: second CSV batch adds a column and drops one —
    union-of-columns alignment (ingest_csv_hudi.py:112-146)."""
    work = index_tempdir("ingest_ev_")
    supp = t(spark, sf_dir, "supplier")
    batch1 = supp.filter(F.col("s_suppkey") % 2 == 0).select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    batch2 = supp.filter(F.col("s_suppkey") % 2 == 1).select(
        "s_suppkey", "s_name", F.lit("fresh").alias("batch_tag")  # no s_nationkey
    )
    p1, p2 = os.path.join(work, "b1.csv"), os.path.join(work, "b2.csv")
    _write_csv(batch1, p1)
    _write_csv(batch2, p2)
    table = LakeTable(spark, os.path.join(work, "tbl"))
    ingest_csv(table, p1, mode="create")
    out = ingest_csv(table, p2, mode="append")
    return out.select(
        F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
        "s_name",
        F.col("s_nationkey").cast("int").alias("s_nationkey"),
        "batch_tag",
    )


def in_csv_upsert_precombine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3: Hudi-style keyed upsert with precombine — the change CSV carries
    two versions of the same keys; the higher precombine wins (W1
    last-writer-wins), then MERGE applies."""
    work = index_tempdir("ingest_up_")
    nation = t(spark, sf_dir, "nation")
    base = nation.select("n_nationkey", "n_name", "n_regionkey")
    changes = (
        nation.filter(F.col("n_nationkey") % 2 == 0)
        .select(
            "n_nationkey",
            F.concat(F.lit("v1_"), F.col("n_name")).alias("n_name"),
            "n_regionkey",
            F.lit(1).alias("seq"),
        )
        .unionByName(
            nation.filter(F.col("n_nationkey") % 4 == 0).select(
                "n_nationkey",
                F.concat(F.lit("v2_"), F.col("n_name")).alias("n_name"),
                "n_regionkey",
                F.lit(2).alias("seq"),
            )
        )
    )
    pb, pc = os.path.join(work, "base.csv"), os.path.join(work, "chg.csv")
    _write_csv(base, pb)
    _write_csv(changes, pc)
    table = LakeTable(spark, os.path.join(work, "tbl"))
    ingest_csv(table, pb, mode="create")
    out = ingest_csv(table, pc, mode="upsert", pk="n_nationkey", precombine="seq")
    return out.select(
        F.col("n_nationkey").cast("int").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("int").alias("n_regionkey"),
    )


def in_csv_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hudi partition-path parity (ingest_csv_hudi.py:101-103): ingest with
    ``partition_by`` → hive-partitioned layout → a partition-key filter
    prunes to one directory at the scan (asserted in tests/test_plans.py)."""
    work = index_tempdir("ingest_pt_")
    src = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", F.round("c_acctbal", 2).alias("acct_bal")
    )
    csv_path = os.path.join(work, "in.csv")
    _write_csv(src, csv_path)
    out = ingest_csv(
        LakeTable(spark, os.path.join(work, "tbl")),
        csv_path,
        mode="create",
        partition_by=["c_mktsegment"],
    )
    return out.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").cast("bigint").alias("c_custkey"),
        "c_name",
        "c_mktsegment",
        F.col("acct_bal").cast("double").alias("acct_bal"),
    )


def in_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL ingest — the de-facto LLM training-corpus interchange format:
    write documents as JSON Lines with a NESTED ``meta`` struct, read back
    with an explicit schema (no inference pass over 100 TB) plus
    PERMISSIVE corrupt-record capture, flatten, commit to a LakeTable,
    read back. The flatten is a plain nested-field projection — pushed into
    the scan, no UDF."""
    work = index_tempdir("ingest_jl_")
    src = os.path.join(work, "docs.jsonl")
    t(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.struct("lang", "source", "n_chars").alias("meta"),
    ).write.mode("overwrite").json(src)

    schema = (
        "doc_id bigint, text string, "
        "meta struct<lang:string,source:string,n_chars:bigint>, "
        "_corrupt string"
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(src)
    )
    flat = raw.filter(F.col("_corrupt").isNull()).select(
        "doc_id",
        F.col("meta.lang").alias("lang"),
        F.col("meta.source").alias("source"),
        F.col("meta.n_chars").alias("n_chars"),
    )
    table = LakeTable(spark, os.path.join(work, "tbl"))
    table.create_or_replace(flat)
    return table.read()


_FW_WIDTHS = (12, 12, 1, 16, 10)  # orderkey, custkey, status, cents, date


def in_fixedwidth_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIXED-WIDTH text ingest (S4 breadth — the mainframe/COBOL export
    format ETL stacks still receive): render orders as zero-padded
    fixed-offset records, read back as raw text, and parse by pure
    ``substring`` + ``cast`` column slicing — JVM-side expressions the
    optimizer folds into the scan projection, no UDF, no per-row Python.
    Totalprice travels as integer CENTS (fixed-point is the native
    fixed-width convention, and it keeps the round trip exact).

    Scale shape: both directions are narrow per-row maps; the text file
    splits by line across the cluster like any other text source. The
    oracle re-derives every field from the orders table directly, so a
    wrong offset, width, or padding rule breaks the compare."""
    work = index_tempdir("ingest_fw_")
    src = os.path.join(work, "orders.fw")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
    )
    w1, w2, w3, w4, _ = _FW_WIDTHS
    line = F.concat(
        F.lpad(F.col("o_orderkey").cast("string"), w1, "0"),
        F.lpad(F.col("o_custkey").cast("string"), w2, "0"),
        F.col("o_orderstatus"),
        F.lpad(F.col("cents").cast("string"), w4, "0"),
        F.col("d"),
    )
    o.select(line.alias("value")).write.mode("overwrite").text(src)

    raw = spark.read.text(src)
    p1, p2, p3, p4 = (
        1,
        1 + w1,
        1 + w1 + w2,
        1 + w1 + w2 + w3,
    )
    p5 = p4 + w4
    parsed = raw.select(
        F.substring("value", p1, w1).cast("bigint").alias("o_orderkey"),
        F.substring("value", p2, w2).cast("bigint").alias("o_custkey"),
        F.substring("value", p3, w3).alias("o_orderstatus"),
        (F.substring("value", p4, w4).cast("long") / 100.0).alias(
            "total_dollars"
        ),
        F.substring("value", p5, 10).cast("date").alias("o_orderdate"),
    )
    table = LakeTable(spark, os.path.join(work, "tbl"))
    table.create_or_replace(parsed)
    return table.read().orderBy("o_orderkey")


def in_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC format-path scan (S4 breadth beyond parquet/CSV/JSON): write
    orders as ORC, read back through the columnar reader with a pushed
    filter + pruned projection — same declarative path as the parquet
    scans, different on-disk format."""
    work = index_tempdir("ingest_orc_")
    src = os.path.join(work, "orders.orc")
    t(spark, sf_dir, "orders").write.mode("overwrite").orc(src)
    return (
        spark.read.orc(src)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price"))
    )


# embedded-Derby JDBC databases keyed by sf_dir — reused across sweep
# invocations (write is mode=overwrite, so re-runs are exact); Derby ships
# with Spark (metastore dependency), making the S6/S7 JDBC paths LIVE in
# this sandbox, not argument plumbing
_DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
_JDBC_DB_CACHE: dict[str, str] = {}


def in_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 + S6 live: load a fixture table into an embedded Derby database
    through ``write_jdbc`` (the distributed ``to_sql`` replacement,
    csv_to_sql.py:32-37), then federate it back through ``read_jdbc`` as a
    4-way PARTITIONED range read (each Spark task opens its own connection
    and scans one pk range — the shape that keeps a 100 TB federation from
    serializing on one socket). Derby stands in for the reference's
    MySQL/Postgres catalogs (trino/etc/catalog/mysql.properties:1-4);
    swapping the URL/driver is configuration, not code."""
    from ..sources.jdbc import read_jdbc, write_jdbc

    if sf_dir not in _JDBC_DB_CACHE:
        _JDBC_DB_CACHE[sf_dir] = os.path.join(
            index_tempdir("derby_"), "db"
        )
    url = f"jdbc:derby:{_JDBC_DB_CACHE[sf_dir]};create=true"
    src = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    # partition bounds come from the DATA, not a constant: a hardcoded
    # upper bound below the real max collapses everything above it into
    # the last range partition — one socket doing most of the scan
    lo, hi = src.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    write_jdbc(
        src, url, "orders_jdbc", mode="overwrite", driver=_DERBY_DRIVER,
        # Derby's dialect maps StringType → CLOB, which rejects pushed-down
        # equality filters; VARCHAR keeps the federation predicate pushdown
        # working (same concern as sizing text columns on MySQL/Postgres)
        createTableColumnTypes=(
            "o_orderstatus VARCHAR(4), o_orderpriority VARCHAR(20)"
        ),
    )
    back = read_jdbc(
        spark, url, "orders_jdbc",
        partition_column="o_orderkey", num_partitions=4,
        lower_bound=int(lo), upper_bound=int(hi) + 1, driver=_DERBY_DRIVER,
    )
    return back.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.round("o_totalprice", 2).alias("price"),
    )


_BADREC_FEED_CACHE: dict[str, str] = {}


def in_csv_badrecords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record handling — the ingest-robustness contract every
    production CSV loader needs: a feed where every ``c_custkey % 10 == 7``
    row ships a NON-NUMERIC key is read under an explicit (non-inferred)
    schema in PERMISSIVE mode with a corrupt-record column, and the
    operator reports the triage summary: clean rows land typed, broken
    rows are quarantined (counted + key-sum of the clean side proves no
    row was silently dropped OR silently coerced).

    Spark quirk handled: a query that references ONLY the corrupt-record
    column is disallowed against the raw stream (the parser prunes the
    data columns it needs to decide corruption), so the parsed frame is
    cached before the counts — the documented workaround, and the right
    plan anyway (one parse, two aggregates).

    Oracle: the corruption rule is deterministic (key mod 10), so DuckDB
    derives both counts and the clean key-sum from the fixture."""
    # the corrupted feed is a pure function of sf_dir: materialize once
    # per process (repeated sweep/bench calls reuse the same CSV and the
    # same logical plan), and track the mandatory parse cache in
    # persist_bounded so executor storage is bounded too (round-10 ADVICE)
    if sf_dir not in _BADREC_FEED_CACHE:
        work = index_tempdir("ingest_bad_")
        cust = t(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", F.round("c_acctbal", 2).alias("bal")
        )
        feed = cust.select(
            F.when(F.col("c_custkey") % 10 == 7, F.lit("KEY-CORRUPT"))
            .otherwise(F.col("c_custkey").cast("string"))
            .alias("c_custkey"),
            "c_name",
            F.col("bal").cast("string").alias("bal"),
        )
        path = os.path.join(work, "feed.csv")
        _write_csv(feed, path)
        _BADREC_FEED_CACHE[sf_dir] = path
    path = _BADREC_FEED_CACHE[sf_dir]
    parsed = persist_bounded(
        spark.read.schema(
            "c_custkey bigint, c_name string, bal double, _corrupt string"
        )
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path),
        f"ingest_badrecords:{path}",
    )
    return parsed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("_corrupt").isNotNull().cast("long")).alias("n_quarantined"),
        F.sum(F.col("_corrupt").isNull().cast("long")).alias("n_clean"),
        F.sum(F.when(F.col("_corrupt").isNull(), F.col("c_custkey"))).alias(
            "clean_key_sum"
        ),
    )


QUERIES = {
    "in_csv_roundtrip": in_csv_roundtrip,
    "in_csv_badrecords": in_csv_badrecords,
    "in_csv_append_evolution": in_csv_append_evolution,
    "in_csv_upsert_precombine": in_csv_upsert_precombine,
    "in_csv_partitioned": in_csv_partitioned,
    "in_jsonl_roundtrip": in_jsonl_roundtrip,
    "in_orc_roundtrip": in_orc_roundtrip,
    "in_jdbc_roundtrip": in_jdbc_roundtrip,
    "in_fixedwidth_roundtrip": in_fixedwidth_roundtrip,
}

ORACLE = {
    # re-derives every parsed field from orders directly: a wrong offset,
    # width, or padding rule in the fixed-width round trip fails this
    "in_fixedwidth_roundtrip": """
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(floor(o_totalprice * 100) AS BIGINT) / 100.0
                   AS total_dollars,
               o_orderdate
        FROM orders ORDER BY o_orderkey
    """,
    "in_csv_badrecords": """
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN c_custkey % 10 = 7 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_quarantined,
               CAST(sum(CASE WHEN c_custkey % 10 = 7 THEN 0 ELSE 1 END)
                    AS BIGINT) AS n_clean,
               CAST(sum(CASE WHEN c_custkey % 10 = 7 THEN NULL
                             ELSE c_custkey END) AS BIGINT) AS clean_key_sum
        FROM customer
    """,
    "in_jsonl_roundtrip": """
        SELECT doc_id, lang, source, n_chars FROM documents
    """,
    "in_orc_roundtrip": """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    "in_jdbc_roundtrip": """
        SELECT o_orderkey, o_custkey, o_orderdate,
               round(o_totalprice, 2) AS price
        FROM orders WHERE o_orderkey % 7 = 0 AND o_orderstatus = 'F'
    """,
    "in_csv_roundtrip": """
        SELECT c_custkey AS customer_key, c_name AS name_full,
               round(c_acctbal, 2) AS acct_bal
        FROM customer WHERE c_custkey % 10 = 0
    """,
    "in_csv_append_evolution": """
        SELECT s_suppkey, s_name, s_nationkey, CAST(NULL AS VARCHAR) AS batch_tag
        FROM supplier WHERE s_suppkey % 2 = 0
        UNION ALL
        SELECT s_suppkey, s_name, NULL, 'fresh'
        FROM supplier WHERE s_suppkey % 2 = 1
    """,
    "in_csv_upsert_precombine": """
        SELECT n_nationkey,
               CASE WHEN n_nationkey % 4 = 0 THEN 'v2_' || n_name
                    WHEN n_nationkey % 2 = 0 THEN 'v1_' || n_name
                    ELSE n_name END AS n_name,
               n_regionkey
        FROM nation
    """,
    "in_csv_partitioned": """
        SELECT c_custkey, c_name, c_mktsegment, round(c_acctbal, 2) AS acct_bal
        FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
}
