"""Property-based checks of the lakehouse write semantics.

1. hypothesis MERGE property: any sequence of upsert/delete batches applied
   through LakeTable.merge must equal a plain dict reference model
   (last-writer-wins per batch, MERGE branch semantics).
2. random-program property over MOR interleavings: random programs of
   merge/delete/update/append/insert_rows/compact × {MOR, COW} × random
   compaction thresholds; the invariant is SPEC-level — a multiset replay
   model must equal ``read()`` at EVERY surviving version, so merge-on-read
   deltas, compaction folds, and copy-on-write rewrites are
   indistinguishable to a reader. (The round-4 MOR sequencing bugs —
   post-delta appends resurrecting deleted rows, duplicate-key append
   collapse — were found by review, not by the old test; these programs
   cover exactly those interleavings.)

Examples are kept small (Spark round-trips per example are expensive), but
the generators explore interleavings a hand-written test never would:
deletes of absent keys, re-inserts after delete, same-key collisions within
a batch resolved by precombine, appends of duplicate keys between deltas,
compaction at every threshold. ``SPARK_GRAFT_PROP_N`` scales the program
count (default 40 per CI run; a full 200-program pass is run per round).
"""

from __future__ import annotations

import os
import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

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


# --------------------------------------------------------------------------
# random programs over MOR/COW interleavings

N_PROGRAMS = int(os.environ.get("SPARK_GRAFT_PROP_N", "40"))


def _rand_batch(rng: random.Random, allow_delete: bool = True) -> list[tuple]:
    """Unique-key merge batch (callers pre-deduplicate per the merge
    contract): [(k, v, op)]."""
    keys = rng.sample(range(8), rng.randint(1, 4))
    return [
        (k, rng.randrange(1000), "d" if allow_delete and rng.random() < 0.3 else "u")
        for k in keys
    ]


@pytest.mark.parametrize("seed", range(N_PROGRAMS))
def test_random_program_matches_multiset_model(spark, tmp_path_factory, seed):
    rng = random.Random(7000 + seed)
    mode = rng.choice(["cow", "mor"])
    threshold = rng.choice([1, 2, 3])
    table = LakeTable(spark, str(tmp_path_factory.mktemp(f"prog{seed}")))

    model: list[tuple[int, int]] = [(k, rng.randrange(1000)) for k in range(rng.randint(1, 4))]
    table.create_or_replace(
        spark.createDataFrame(model, "k int, v int"),
        properties={
            "write.merge.mode": mode,
            "write.merge.delta.compact-threshold": str(threshold),
        },
    )
    snapshots: dict[int, list[tuple[int, int]]] = {table.latest_version(): sorted(model)}

    for _ in range(rng.randint(4, 7)):
        op = rng.choice(
            [
                "merge", "merge", "delete", "update", "append", "insert",
                "compact", "pdelete", "pupdate", "restore", "branch",
            ]
        )
        if op == "merge":
            batch = _rand_batch(rng)
            table.merge(
                spark.createDataFrame(batch, "k int, v int, op string"),
                pk="k", op_col="op",
            )
            touched = {k for k, _, _ in batch}
            model = [r for r in model if r[0] not in touched] + [
                (k, v) for k, v, o in batch if o != "d"
            ]
        elif op == "delete":
            m, r = rng.choice([(2, 0), (3, 1), (4, 2)])
            table.delete_where(F.col("k") % m == r)
            model = [row for row in model if row[0] % m != r]
        elif op == "update":
            m, r = rng.choice([(2, 1), (3, 0)])
            nv = rng.randrange(1000)
            table.update_where(F.col("k") % m == r, {"v": nv})
            model = [(k, nv if k % m == r else v) for k, v in model]
        elif op == "append":
            rows = [(rng.randrange(8), rng.randrange(1000)) for _ in range(rng.randint(1, 3))]
            table.append(spark.createDataFrame(rows, "k int, v int"))
            model = model + rows
        elif op == "insert":
            rows = [{"k": rng.randrange(8, 12), "v": rng.randrange(1000)}]
            table.insert_rows(rows)
            model = model + [(r["k"], r["v"]) for r in rows]
        elif op == "pdelete":
            # point DML: pk-equality / pk-IN literals exercise the
            # touched-bucket-from-literals fast path across MOR/COW states
            ks = rng.sample(range(12), rng.randint(1, 2))
            cond = (
                F.col("k") == F.lit(ks[0])
                if len(ks) == 1
                else F.col("k").isin(*ks)
            )
            table.delete_where(cond)
            model = [row for row in model if row[0] not in set(ks)]
        elif op == "pupdate":
            k, nv = rng.randrange(12), rng.randrange(1000)
            table.update_where(F.col("k") == F.lit(k), {"v": nv})
            model = [(kk, nv if kk == k else v) for kk, v in model]
        elif op == "restore":
            # rollback to any earlier snapshot, including MOR states with
            # pending deltas and pre-bucketization layouts — the model
            # simply becomes that snapshot's rows
            v = rng.choice(sorted(snapshots))
            table.restore(v)
            model = list(snapshots[v])
        elif op == "branch":
            # fork → 1-2 random writes on the branch (isolated: main's
            # model is untouched until the merge) → fast-forward publish,
            # or abandon the branch (model unchanged). Exercises branch
            # writes over every MOR/COW/bucketized state the main program
            # wandered into, plus the merge-version gap in main's chain.
            name = f"b{len(snapshots)}_{rng.randrange(1 << 16)}"
            bt = table.create_branch(name)
            fork_model = list(model)
            for _ in range(rng.randint(1, 2)):
                bop = rng.choice(["merge", "append"])
                if bop == "merge":
                    batch = _rand_batch(rng)
                    bt.merge(
                        spark.createDataFrame(batch, "k int, v int, op string"),
                        pk="k", op_col="op",
                    )
                    touched = {k for k, _, _ in batch}
                    fork_model = [r for r in fork_model if r[0] not in touched] + [
                        (k, v) for k, v, o in batch if o != "d"
                    ]
                else:
                    rows = [(rng.randrange(8), rng.randrange(1000))]
                    bt.append(spark.createDataFrame(rows, "k int, v int"))
                    fork_model = fork_model + rows
            # branch reads see the fork's own state while main still reads
            # the pre-fork model
            got_b = sorted((r.k, r.v) for r in bt.read().select("k", "v").collect())
            assert got_b == sorted(fork_model), f"seed={seed} branch state"
            if rng.random() < 0.75:
                table.merge_branch(name)
                model = fork_model
            else:
                table.delete_branch(name)
        elif op == "compact":
            table.compact()
        snapshots[table.latest_version()] = sorted(model)

    live = set(table.versions())
    for ver, want in snapshots.items():
        if ver not in live:
            continue
        got = sorted((r.k, r.v) for r in table.read(version=ver).select("k", "v").collect())
        assert got == want, (
            f"seed={seed} mode={mode} thr={threshold} v{ver}: {got} != {want}"
        )


# --------------------------------------------------------------------------
# concurrent-writer races over the optimistic-concurrency commit protocol

N_RACES = int(os.environ.get("SPARK_GRAFT_RACE_N", "50"))


def test_concurrent_writers_serialize_and_losers_clean_up(spark, tmp_path):
    """The os.link refuse-to-clobber + ConcurrentCommitError retry contract
    (table.py::_publish_commit) under REAL races: per race, two threads
    prepare commits against the same parent and hit the publish point
    simultaneously (a barrier inside a patched _publish_commit guarantees
    the collision). Invariants, per race and at the end:

    - exactly one writer loses and raises ConcurrentCommitError; its retry
      commits against the new parent, so the table advances exactly 2
      versions per race;
    - the final state equals SOME serial order of the two batches (for the
      merge-vs-merge shared-key races: the shared key holds either tag);
    - every segment directory on disk is referenced by some commit — the
      losers' orphaned segments were removed.
    """
    import threading

    from datalake_on_prem_system_spark.lakehouse.table import ConcurrentCommitError

    root = str(tmp_path / "race")
    t = LakeTable(spark, root)
    t.merge(
        spark.createDataFrame([(k, 0) for k in range(16)], "k int, v int"),
        pk="k",
        n_buckets=4,
    )

    real_publish = LakeTable._publish_commit
    barrier_box = {}
    tls = threading.local()
    lost = []  # ConcurrentCommitError observations (appends are atomic)

    def patched(self, commit, new_paths):
        if getattr(tls, "first", False):
            tls.first = False
            try:
                barrier_box["b"].wait()
            except threading.BrokenBarrierError:
                pass
        return real_publish(self, commit, new_paths)

    LakeTable._publish_commit = patched
    try:
        for i in range(N_RACES):
            barrier_box["b"] = threading.Barrier(2, timeout=120)
            tag_a, tag_b = i * 10 + 1, i * 10 + 2
            shared = i % 16
            errs: list[str] = []

            def writer(batch_rows, merge_mode):
                tls.first = True
                for _ in range(6):
                    try:
                        if merge_mode:
                            t.merge(
                                spark.createDataFrame(batch_rows, "k int, v int"),
                                pk="k",
                                n_buckets=4,
                            )
                        else:
                            t.append(
                                spark.createDataFrame(batch_rows, "k int, v int")
                            )
                        return
                    except ConcurrentCommitError:
                        lost.append(1)
                        continue
                errs.append("retries exhausted")

            v_before = t.latest_version()
            if i % 2 == 0:  # merge vs merge on a shared key
                ta = threading.Thread(target=writer, args=([(shared, tag_a)], True))
                tb = threading.Thread(target=writer, args=([(shared, tag_b)], True))
            else:  # merge vs append, disjoint keys
                ta = threading.Thread(target=writer, args=([(shared, tag_a)], True))
                tb = threading.Thread(target=writer, args=([(1000 + i, tag_b)], False))
            ta.start(), tb.start()
            ta.join(180), tb.join(180)
            assert not errs, errs
            assert t.latest_version() == v_before + 2  # both committed, serially

        state = {r.k: r.v for r in t.read().select("k", "v").collect()}
        # shared keys are reused every 16 races — only the LAST race per key
        # is visible in the final state
        last_race = {i % 16: i for i in range(N_RACES)}
        for k, i in last_race.items():
            if i % 2 == 0:
                # merge-vs-merge: last committer wins the shared key; either
                # order is a valid serialization, anything else is a lost
                # update
                assert state[k] in (i * 10 + 1, i * 10 + 2), (i, k, state[k])
            else:
                # merge-vs-append: only the merge touched the shared key
                assert state[k] == i * 10 + 1, (i, k, state[k])
        for i in range(1, N_RACES, 2):
            assert state[1000 + i] == i * 10 + 2
        # the barrier guarantees both writers contend for the same version,
        # so every race produced at least one ConcurrentCommitError (a
        # retry may additionally lose to the other writer's retry)
        assert len(lost) >= N_RACES, f"only {len(lost)} losses in {N_RACES} races"
        # orphan sweep: all on-disk segments belong to some commit
        data_dir = os.path.join(root, "data")
        referenced = {
            os.path.relpath(e["path"], data_dir).split(os.sep)[0]
            for v in t.versions()
            for e in t._read_commit(v).files
        }
        orphans = set(os.listdir(data_dir)) - referenced
        assert not orphans, f"loser segments not cleaned up: {orphans}"
    finally:
        LakeTable._publish_commit = real_publish


# --------------------------------------------------------------------------
# composite-key random programs (round 7): the same multiset-replay
# invariant, keyed on (k1, k2) — full-key row identity, leading-key layout

N_CPK_PROGRAMS = int(os.environ.get("SPARK_GRAFT_PROP_CPK_N", "10"))

_K2 = ["a", "b", "c"]


def _rand_cpk_batch(rng: random.Random) -> list[tuple]:
    keys = rng.sample([(k1, k2) for k1 in range(4) for k2 in _K2], rng.randint(1, 5))
    return [
        (k1, k2, rng.randrange(1000), "d" if rng.random() < 0.3 else "u")
        for k1, k2 in keys
    ]


@pytest.mark.parametrize("seed", range(N_CPK_PROGRAMS))
def test_random_composite_key_program_matches_multiset_model(
    spark, tmp_path_factory, seed
):
    rng = random.Random(9000 + seed)
    mode = rng.choice(["cow", "mor"])
    threshold = rng.choice([1, 2, 3])
    table = LakeTable(spark, str(tmp_path_factory.mktemp(f"cpk{seed}")))

    model: list[tuple[int, str, int]] = [
        (k1, rng.choice(_K2), rng.randrange(1000)) for k1 in range(rng.randint(1, 3))
    ]
    table.create_or_replace(
        spark.createDataFrame(model, "k1 int, k2 string, v int"),
        bucket_by=(("k1", "k2"), 4),
        properties={
            "write.merge.mode": mode,
            "write.merge.delta.compact-threshold": str(threshold),
        },
    )
    snapshots = {table.latest_version(): sorted(model)}

    for _ in range(rng.randint(4, 7)):
        op = rng.choice(["merge", "merge", "lead_delete", "update", "append", "compact"])
        if op == "merge":
            batch = _rand_cpk_batch(rng)
            table.merge(
                spark.createDataFrame(batch, "k1 int, k2 string, v int, op string"),
                pk=["k1", "k2"], op_col="op",
            )
            touched = {(k1, k2) for k1, k2, _, _ in batch}
            model = [r for r in model if (r[0], r[1]) not in touched] + [
                (k1, k2, v) for k1, k2, v, o in batch if o != "d"
            ]
        elif op == "lead_delete":
            # leading-key point literal: the bucket-pruned DML fast path
            k1 = rng.randrange(5)
            table.delete_where(F.col("k1") == F.lit(k1))
            model = [r for r in model if r[0] != k1]
        elif op == "update":
            k2, nv = rng.choice(_K2), rng.randrange(1000)
            table.update_where(F.col("k2") == k2, {"v": nv})
            model = [(a, b, nv if b == k2 else v) for a, b, v in model]
        elif op == "append":
            rows = [
                (rng.randrange(4), rng.choice(_K2), rng.randrange(1000))
                for _ in range(rng.randint(1, 2))
            ]
            table.append(spark.createDataFrame(rows, "k1 int, k2 string, v int"))
            model = model + rows  # duplicate composite keys are legal
        elif op == "compact":
            table.compact()
        snapshots[table.latest_version()] = sorted(model)

    live = set(table.versions())
    for ver, want in snapshots.items():
        if ver not in live:
            continue
        got = sorted(
            (r.k1, r.k2, r.v)
            for r in table.read(version=ver).select("k1", "k2", "v").collect()
        )
        assert got == want, (
            f"seed={seed} mode={mode} thr={threshold} v{ver}: {got} != {want}"
        )
