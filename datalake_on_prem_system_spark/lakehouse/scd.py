"""Slowly-Changing-Dimension Type 2 maintenance over a LakeTable.

Beyond-reference capability (the reference's merge path,
cdc_merger_optimized.py:171-183, is last-writer-wins Type 1 — history is
overwritten): SCD2 keeps every attribute version as its own row, bracketed
by [effective_from, effective_to) with an ``is_current`` flag — the
standard warehouse dimension contract for "what did this customer look
like when the order shipped".

Scale design (100 TB dimension, daily batches):

- change detection is ONE equi-join of the update batch against only the
  CURRENT rows (is_current filter cuts the scan to the live slice; the
  batch side is small → AQE broadcasts it, the dimension never shuffles
  for detection);
- the close+open rows land in ONE ``merge`` commit keyed on the composite
  (natural_key..., effective_from) — closing rows match existing composite
  keys (update), opening rows are new composite keys (insert), so the
  whole transition is a single atomic MERGE with bucket pruning on the
  leading natural-key column;
- a no-op update (attribute tuple identical to current) is filtered out
  BEFORE the merge — idempotent re-deliveries of the same batch produce
  zero new versions.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .table import Commit, LakeTable

SCD2_COLS = ("effective_from", "effective_to", "is_current")


def scd2_init(df: DataFrame, effective_from: str) -> DataFrame:
    """Bracket an initial dimension load: every row becomes the current
    version effective from ``effective_from`` (ISO date string)."""
    return (
        df.withColumn("effective_from", F.lit(effective_from))
        .withColumn("effective_to", F.lit(None).cast("string"))
        .withColumn("is_current", F.lit(True))
    )


def scd2_apply(
    table: LakeTable,
    updates: DataFrame,
    key: str | list[str],
    attrs: list[str],
    effective_ts: str,
) -> Commit | None:
    """Apply one update batch (natural key + full new attribute tuple) at
    ``effective_ts``: keys whose attribute tuple actually changed get their
    current row CLOSED (effective_to = ts, is_current = false) and a new
    current row OPENED; unknown keys are inserted as brand-new current
    rows; unchanged tuples are no-ops. One atomic ``merge`` commit on the
    composite (key..., effective_from); returns None when the whole batch
    is a no-op (nothing to commit — idempotent redelivery)."""
    pks = [key] if isinstance(key, str) else list(key)
    # a batch carrying two tuples for one key would open two CURRENT rows
    # for that key (both land under the same (key, effective_from) merge
    # identity) — corrupting the dimension invariant silently. Upstream
    # must pre-combine (last_writer_wins / precombine); reject loudly here.
    dup = (
        updates.groupBy(*pks)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .limit(5)
        .collect()
    )
    if dup:
        keys = [tuple(r[p] for p in pks) for r in dup]
        raise ValueError(
            f"scd2_apply batch has multiple rows for key(s) {keys}: "
            f"pre-combine the batch to one tuple per key first"
        )
    cur = table.read().filter(F.col("is_current"))
    out_cols = cur.columns
    u = updates.select(
        *pks, *[F.col(a).alias(f"__u_{a}") for a in attrs]
    )
    j = cur.join(u, pks)
    same = reduce(
        lambda a, b: a & b,
        [F.col(a).eqNullSafe(F.col(f"__u_{a}")) for a in attrs],
    )
    changed = j.filter(~same)
    closed = (
        changed.select(*out_cols)
        .withColumn("effective_to", F.lit(effective_ts))
        .withColumn("is_current", F.lit(False))
        .select(*out_cols)
    )
    opened = changed.select(
        *pks, *[F.col(f"__u_{a}").alias(a) for a in attrs]
    )
    brand_new = updates.select(*pks, *attrs).join(
        cur.select(*pks), pks, "left_anti"
    )
    fresh = (
        opened.unionByName(brand_new)
        .withColumn("effective_from", F.lit(effective_ts))
        .withColumn("effective_to", F.lit(None).cast("string"))
        .withColumn("is_current", F.lit(True))
        .select(*out_cols)
    )
    # persist: the no-op probe (take) and the merge below would otherwise
    # each re-execute the full change-detection join; the batch is
    # changed-rows-sized, so the cached footprint is small
    batch = closed.unionByName(fresh).persist()
    try:
        if not batch.take(1):
            return None
        return table.merge(batch, pk=pks + ["effective_from"])
    finally:
        batch.unpersist()


def scd2_as_of(table: LakeTable, key: str | list[str], ts: str) -> DataFrame:
    """Point-in-time dimension lookup: the row version effective at ``ts``
    (from <= ts < to; open-ended current rows match any later ts)."""
    return table.read().filter(
        (F.col("effective_from") <= F.lit(ts))
        & (
            F.col("effective_to").isNull()
            | (F.col("effective_to") > F.lit(ts))
        )
    )
