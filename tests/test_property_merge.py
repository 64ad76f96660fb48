"""Property-based check of the CDC MERGE semantics: any sequence of
upsert/delete batches applied through LakeTable.merge must equal a plain
dict reference model (last-writer-wins per batch, MERGE branch semantics).

Examples are kept small (Spark round-trips per example are expensive), but
hypothesis explores op interleavings a hand-written test never would:
deletes of absent keys, re-inserts after delete, same-key collisions within
a batch resolved by precombine, multi-batch compositions.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datalake_on_prem_system_spark.lakehouse import LakeTable

KEYS = st.integers(min_value=0, max_value=5)

# one event: (key, value, op, seq) — op 'd' deletes, else upserts
EVENT = st.tuples(
    KEYS, st.integers(min_value=0, max_value=100), st.sampled_from(["u", "d"]),
    st.integers(min_value=0, max_value=9),
)
BATCH = st.lists(EVENT, min_size=1, max_size=6)
SCENARIO = st.lists(BATCH, min_size=1, max_size=3)


def _reference_apply(state: dict, batch: list[tuple]) -> None:
    """The reference model: last-writer-wins per key within the batch by
    (seq desc, arrival-index desc), then MERGE branches."""
    winners: dict[int, tuple] = {}
    for idx, (k, v, op, seq) in enumerate(batch):
        cur = winners.get(k)
        if cur is None or (seq, idx) > (cur[3], cur[4]):
            winners[k] = (k, v, op, seq, idx)
    for k, v, op, _seq, _idx in winners.values():
        if op == "d":
            state.pop(k, None)
        else:
            state[k] = v


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(scenario=SCENARIO)
def test_merge_matches_reference_model(spark, tmp_path_factory, scenario):
    table = LakeTable(spark, str(tmp_path_factory.mktemp("prop")))
    table.create_or_replace(
        spark.createDataFrame([(99, -1)], "k int, v int")  # pre-existing row
    )
    state = {99: -1}
    for batch in scenario:
        rows = [(k, v, op, seq, idx) for idx, (k, v, op, seq) in enumerate(batch)]
        src = spark.createDataFrame(
            rows, "k int, v int, op string, seq int, idx int"
        ).selectExpr("k", "v", "op", "bigint(seq) * 1000 + idx AS seq")
        table.merge(src.select("k", "v", "op", "seq"), pk="k", op_col="op", precombine="seq")
        _reference_apply(state, batch)
        got = {r.k: r.v for r in table.read().select("k", "v").collect()}
        assert got == state, f"after batch {batch}: {got} != {state}"
