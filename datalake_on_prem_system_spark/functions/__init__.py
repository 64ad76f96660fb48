"""Scalar/library helpers: key detection, typed value casting, schema
sanitization and evolution (reference ``api_poc.py`` + ``ingest_csv_hudi.py``
driver-side logic re-expressed as engine library code)."""

from .casting import get_cast_val
from .keys import find_id_col
from .schema import evolve_to_union, sanitize_column_name, sanitize_columns

__all__ = [
    "find_id_col",
    "get_cast_val",
    "evolve_to_union",
    "sanitize_column_name",
    "sanitize_columns",
]
