"""Semantic pins for the graph operators (g_pagerank).

The oracle compare proves Spark==DuckDB on the exact integer recurrence;
these pins prove the recurrence itself behaves like PageRank (an oracle
compare alone cannot catch a bug shared by both sides).
"""

import pytest

from datalake_on_prem_system_spark.operators.graph_ops import (
    _PR_SCALE,
    _PR_TOP_K,
    g_pagerank,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pr_rows(spark):
    return g_pagerank(spark, SF).collect()


def test_pagerank_shape_and_order(pr_rows):
    assert len(pr_rows) == _PR_TOP_K
    picos = [r.rank_pico for r in pr_rows]
    assert picos == sorted(picos, reverse=True)
    assert all(r.rank_pico > 0 for r in pr_rows)


def test_pagerank_hubs_rank_first(pr_rows):
    """TPC-H's graph is bipartite with ~15× more customers than suppliers,
    so suppliers are the high-degree hubs — the top of the ranking must be
    supplier-dominated, and rank must correlate with degree at the top."""
    top10 = pr_rows[:10]
    assert sum(1 for r in top10 if r.node_type == "supplier") >= 8
    # every top-10 node beats the uniform rank 1/N by a wide margin: N is
    # ~hundreds at sf0.001, uniform ~ SCALE/N; hubs concentrate mass
    assert all(r.rank_pico > _PR_SCALE // 1000 for r in top10)


def test_pagerank_mass_conservation(pr_rows):
    """Integer truncation only ever LOSES picounits, so no node can exceed
    total mass and the top node holds a plausible share (< 20%)."""
    assert pr_rows[0].rank_pico < _PR_SCALE // 5
