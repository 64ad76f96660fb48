"""Z-order (Morton) clustering key for multi-column data skipping.

``compact(cluster_by=[...])`` sorts lexicographically: files carry tight
stats on the FIRST column but every file spans the full range of the
trailing ones, so only first-column predicates skip. Interleaving the
bits of all clustered columns gives every column a share of the
significant bits — after ``LakeTable.compact_clustered(zorder_key(...))``
each range segment covers a small hyper-rectangle, and a range predicate
on ANY of the columns excludes most segments via their manifest
[min, max] stats (Delta OPTIMIZE ZORDER / Iceberg sort-order analog).

The key is pure JVM column arithmetic (normalize → fixed-point →
bit-interleave): no UDF, no shuffle of its own — the one expensive step
is the clustering rewrite itself, which is the point of an OPTIMIZE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(df: DataFrame, cols: list[str], bits: int = 12) -> Column:
    """Morton key over numeric ``cols``: each column is min/max-normalized
    (bounds measured from ``df`` with one tiny aggregate, collected
    driver-side) into a ``bits``-bit fixed-point value, then the values'
    bits are interleaved LSB-first. NULLs map to cell 0.

    The returned Column references the input columns BY NAME, so it can
    be applied to any frame with the same columns (``compact_clustered``
    re-reads the table internally). Honest caveat: linear min/max
    normalization keys skewed columns into few distinct cells — for heavy
    skew, pre-transform (log) or rank-normalize the column first."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits * len(cols) > 53:
        # not 63: compact_clustered computes range bounds on the key CAST
        # TO DOUBLE (approxQuantile), whose 53-bit mantissa would silently
        # collapse distinct keys — and with it the promised skipping —
        # above this width
        raise ValueError(
            f"bits * n_cols must fit a double mantissa (53 bits); "
            f"got {bits}×{len(cols)}"
        )
    row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    scale = (1 << bits) - 1
    qcols: list[Column] = []
    for i, c in enumerate(cols):
        mn, mx = row[f"mn_{i}"], row[f"mx_{i}"]
        if mn is None or mx is None:  # all-NULL column: constant cell
            qcols.append(F.lit(0).cast("bigint"))
            continue
        span = (mx - mn) or 1.0
        q = F.floor(
            (F.col(c).cast("double") - F.lit(float(mn))) / F.lit(span) * scale
        ).cast("bigint")
        # clamp (floating-point edges / rows outside the measured bounds
        # on reuse) and send NULLs to cell 0
        qcols.append(
            F.coalesce(F.least(F.lit(scale), F.greatest(F.lit(0), q)), F.lit(0))
        )
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, q in enumerate(qcols):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(q, b).bitwiseAND(F.lit(1)), b * len(cols) + i)
            )
    return z
