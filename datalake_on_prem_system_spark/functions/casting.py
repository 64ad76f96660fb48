"""Typed form-value casting — port of ``get_cast_val`` (api_poc.py:704-726).

Maps a user-supplied string to the Python value matching a column's type so
DML against a typed table keeps its schema: int, double/real → float,
decimal → Decimal, boolean (truthy strings), timestamp/date → ISO parse
with string fallback, else string.
"""

from __future__ import annotations

import decimal
from datetime import datetime
from typing import Any

_TRUTHY = {"true", "1", "t", "yes", "y"}


def get_cast_val(raw: str | None, col_type: str) -> Any:
    if raw is None:
        return None
    ct = col_type.lower()
    try:
        if ct in ("int", "integer", "bigint", "smallint", "tinyint", "long"):
            return int(raw)
        if ct.startswith("decimal"):
            # Spark's type verifier rejects Python float for DecimalType,
            # so insert into a decimal column needs a real Decimal.
            return decimal.Decimal(raw)
        if ct in ("double", "float", "real"):
            return float(raw)
        if ct in ("boolean", "bool"):
            return raw.strip().lower() in _TRUTHY
        if ct in ("timestamp", "date", "timestamp_ntz"):
            dt = datetime.fromisoformat(raw)
            return dt.date() if ct == "date" else dt
    except (ValueError, TypeError, decimal.InvalidOperation):
        return raw  # string fallback, as the reference does
    return raw
