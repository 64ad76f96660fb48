"""Elasticsearch index sink (K6) — optional external-search parity.

The reference syncs whole tables into ES with the Spark ES connector
(``sync_to_es.py:44-52``: mode=overwrite, auto-create index). The engine's
default search path is the materialized index table
(``operators.search.sync_search_index``) which needs no external process;
this wrapper preserves the real-ES option behind the same call shape when
the connector jar + cluster exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def sync_to_es(
    df: DataFrame,
    index: str,
    es_nodes: str = "localhost",
    es_port: int = 9200,
    mode: str = "overwrite",
    **options: str,
) -> None:
    """Full-table index sync (one doc per row, all columns searchable).
    Requires ``org.elasticsearch.spark.sql`` on the classpath — absent in
    this environment, so the call fails fast with Spark's missing-source
    error rather than a stub."""
    writer = (
        df.write.format("org.elasticsearch.spark.sql")
        .option("es.nodes", es_nodes)
        .option("es.port", str(es_port))
        .option("es.index.auto.create", "true")
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(index)
