"""datalake_on_prem_system_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference system ``Madhuri-Jadhav107/datalake-on-prem-system``
(an on-prem lakehouse: Iceberg/Hudi tables on Ozone/MinIO, Trino SQL, Debezium
CDC through Kafka + Spark Structured Streaming, Elasticsearch search, FastAPI
facade — see SURVEY.md).

Everything here is built on the public Apache Spark DataFrame / SQL /
Structured Streaming APIs. Layout:

- ``session``   — SparkSession factory tuned for local[N] and cluster use.
- ``sources``   — batch/stream sources: parquet star schema, CSV ingest with
                  header sanitization + schema inference, Debezium-style CDC
                  event streams (Kafka in prod, JSON file source in tests).
- ``lakehouse`` — a lightweight versioned table format (parquet + JSON commit
                  log) providing ACID-ish snapshots, time travel, history,
                  MERGE upsert/delete, and snapshot diff. Stands in for
                  Iceberg/Delta in environments without their jars.
- ``operators`` — the relational operator inventory (SURVEY.md §2) plus the
                  LLM-data-pipeline extensions (dedup, similarity search,
                  text analysis, multimodal columns).
- ``functions`` — scalar helpers: key detection, value casting, schema
                  evolution/sanitization.
- ``streaming`` — CDC merge pipeline (foreachBatch + last-writer-wins dedup
                  + MERGE), watermarked event aggregation.
- ``plans``     — plan inspection helpers (explain capture, shuffle audit).
"""

__version__ = "0.1.0"
