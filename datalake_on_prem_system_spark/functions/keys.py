"""Primary-key column detection.

Port of the reference's two heuristics:
- server ``find_id_col`` (api_poc.py:44-51): exact match against a known
  list, else first column;
- CLI autodetect (lake_cli.py:36-48): known list, then ``*_id`` suffix,
  then first column.

Combined here into one function with the CLI's extra suffix rule (a strict
superset of the server behavior for the names the server recognizes).
"""

from __future__ import annotations

import re

_KNOWN = ("id", "index", "internal id", "internal_id", "uid", "customer_id", "product_id")

# '..._key', or the TPC-H prefixed style 'x_yyykey' (o_orderkey, c_custkey) —
# a bare endswith("key") would claim ordinary words like 'whiskey' as pks
_KEY_SUFFIX = re.compile(r"(_key|^[a-z]+_[a-z]*key)$")


def find_id_col(columns: list[str]) -> str | None:
    if not columns:
        return None
    lowered = {c.lower(): c for c in columns}
    for k in _KNOWN:
        if k in lowered:
            return lowered[k]
    for c in columns:
        if c.lower().endswith("_id") or _KEY_SUFFIX.search(c.lower()):
            return c
    return columns[0]
