"""Graph analytics over relational edges (Pregel-shaped, DataFrame-native).

Beyond-reference capability, sibling of ``dd_components`` (label
propagation): iterative fixed-iteration PageRank over the customer↔supplier
interaction graph that ``orders ⋈ lineitem`` induces — the standard
"which entities anchor the network" signal (supplier criticality, customer
centrality) every procurement-analytics stack computes.

Determinism across engines is the hard part of an oracle-checked PageRank:
double summation is addition-order-dependent, so a float PageRank can NEVER
hash-match a second engine reliably. This implementation runs the entire
recurrence in 64-bit FIXED-POINT integer arithmetic (picounits of rank,
``_PR_SCALE = 1e12``): every per-edge contribution is an integer division,
every combine is an exact integer sum (order-independent), and the damping
step is ``(17 * s) div 20``. DuckDB replays the identical integer
recurrence, so the comparison is exact — no tolerance, no rounding games.
Quantization error is ≤ deg(v) picounits per node per iteration — ~1e-9
relative, far below anything a ranking consumer can observe.

Scale shape (100 TB): the classic Pregel-on-DataFrames loop —

- edge list built once: distinct (custkey, suppkey) pairs, shuffled on the
  join key by the build, then persisted through the bounded registry and
  re-read by every iteration (one build, k reads);
- per iteration: join contributions to edges on ``src`` (one shuffle),
  aggregate on ``dst`` with partial (map-side) combine (second shuffle,
  bounded by distinct dst per partition);
- node count N enters as a ONE-ROW aggregate cross-joined in (the same
  constant-cost scalar shape as TPC-H Q11/Q22 — allow-listed in the plan
  sweep);
- iteration count is FIXED (3), so the lineage stays shallow; a
  convergence-driven variant would checkpoint every ~5 rounds to cut
  lineage, exactly as ``dd_components`` documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._cache import persist_bounded
from .common import t

_PR_SCALE = 1_000_000_000_000  # picounits: rank 1.0 == 1e12
_PR_ITERS = 3
_PR_TOP_K = 50
# damping 0.85 as the exact rational 17/20 — both engines apply it as
# integer multiply-then-div, so no float enters the recurrence
_PR_D_NUM, _PR_D_DEN = 17, 20


def g_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 PageRank over the undirected customer↔supplier graph
    (distinct trade pairs from orders ⋈ lineitem), 3 fixed-point
    iterations. Node ids pack type+key into one long (customer = 2k,
    supplier = 2k+1) so the shuffle key is 8 bytes; output unpacks them."""
    orders = t(spark, sf_dir, "orders")
    lineitem = t(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .distinct()
    )
    edges = persist_bounded(
        pairs.select(F.col("c_node").alias("src"), F.col("s_node").alias("dst"))
        .unionAll(
            pairs.select(F.col("s_node").alias("src"), F.col("c_node").alias("dst"))
        )
        .repartition("src"),
        f"g_pagerank_edges:{sf_dir}",
    )
    deg = persist_bounded(
        edges.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        ),
        f"g_pagerank_deg:{sf_dir}",
    )
    n = F.broadcast(deg.agg(F.count(F.lit(1)).alias("n_nodes")))

    # teleport_q = (3 * SCALE) div (20 * N): exact in both engines
    ranks = deg.crossJoin(n).select(
        "node",
        "deg",
        "n_nodes",
        F.expr(f"({_PR_SCALE}L div n_nodes)").alias("rq"),
    )
    for _ in range(_PR_ITERS):
        contrib = ranks.select(
            F.col("node").alias("src"), F.expr("rq div deg").alias("contrib")
        )
        incoming = (
            edges.join(contrib, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("contrib").alias("s"))
        )
        ranks = (
            deg.join(incoming, "node")
            .crossJoin(n)
            .select(
                "node",
                "deg",
                "n_nodes",
                (
                    F.expr(f"({3 * _PR_SCALE}L div ({_PR_D_DEN} * n_nodes))")
                    + F.expr(f"({_PR_D_NUM} * s) div {_PR_D_DEN}")
                ).alias("rq"),
            )
        )
    return (
        ranks.select(
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            F.expr("node div 2").alias("entity_key"),
            F.col("deg").alias("degree"),
            F.col("rq").alias("rank_pico"),
            F.round(F.col("rq") / _PR_SCALE, 9).alias("rank"),
        )
        .orderBy(F.desc("rank_pico"), F.asc("node_type"), F.asc("entity_key"))
        .limit(_PR_TOP_K)
    )


def _pagerank_oracle_sql() -> str:
    s, dn, dd = _PR_SCALE, _PR_D_NUM, _PR_D_DEN
    it = """
        r{i} AS (
            SELECT d.node, d.deg,
                   (3 * {s}) // ({dd} * n.n)
                   + ({dn} * sum(r.rq // r.deg)) // {dd} AS rq
            FROM deg d
            JOIN edges e ON e.dst = d.node
            JOIN r{p} r ON r.node = e.src
            CROSS JOIN n
            GROUP BY d.node, d.deg, n.n
        )"""
    iters = ",".join(
        it.format(i=i, p=i - 1, s=s, dn=dn, dd=dd) for i in range(1, _PR_ITERS + 1)
    )
    return f"""
        WITH pairs AS (
            SELECT DISTINCT o_custkey * 2 AS c_node, l_suppkey * 2 + 1 AS s_node
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ), edges AS (
            SELECT c_node AS src, s_node AS dst FROM pairs
            UNION ALL
            SELECT s_node AS src, c_node AS dst FROM pairs
        ), deg AS (
            SELECT src AS node, count(*) AS deg FROM edges GROUP BY src
        ), n AS (
            SELECT count(*) AS n FROM deg
        ), r0 AS (
            SELECT node, deg, {s} // n.n AS rq FROM deg CROSS JOIN n
        ),{iters}
        SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
                   AS node_type,
               node // 2 AS entity_key,
               CAST(deg AS BIGINT) AS degree,
               CAST(rq AS BIGINT) AS rank_pico,
               round(rq / {s}.0, 9) AS rank
        FROM r{_PR_ITERS}
        ORDER BY rank_pico DESC, node_type ASC, entity_key ASC
        LIMIT {_PR_TOP_K}
    """


QUERIES = {"g_pagerank": g_pagerank}

ORACLE = {"g_pagerank": _pagerank_oracle_sql()}
