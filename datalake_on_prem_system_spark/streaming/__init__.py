"""Structured Streaming pipelines: Debezium-style CDC merge + watermarked
event aggregation (reference ``cdc_merger_optimized.py`` re-expressed)."""

from .cdc import (
    cdc_apply_batch,
    debezium_schemas,
    last_writer_wins,
    normalize_envelope,
    run_cdc_file_stream,
)

__all__ = [
    "cdc_apply_batch",
    "debezium_schemas",
    "last_writer_wins",
    "normalize_envelope",
    "run_cdc_file_stream",
]
