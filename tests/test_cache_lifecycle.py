"""Operator-internal persisted frames must not accumulate over a long
session (round-6 ADVICE): the bounded registry caps live caches without
any harness clearCache cooperation, and release_all() returns storage to
baseline on demand."""

from __future__ import annotations

from datalake_on_prem_system_spark.operators import _cache, dedup


def _n_cached_rdds(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())  # noqa: SLF001


def test_dedup_caches_stay_bounded_across_sweeps(spark, sf_dir):
    spark.catalog.clearCache()
    _cache.release_all()
    assert _n_cached_rdds(spark) == 0

    # 4 sweeps × 2 persisting queries = 8 persists — over the cap; without
    # the registry each sweep would leave 2 more cached shingle frames
    for _ in range(4):
        dedup.QUERIES["dd_ngram_jaccard"](spark, sf_dir).collect()
        dedup.QUERIES["dd_minhash_lsh"](spark, sf_dir).collect()
    assert _n_cached_rdds(spark) <= _cache._MAX_LIVE

    released = _cache.release_all()
    assert released >= 1
    assert _n_cached_rdds(spark) == 0, "storage must return to baseline"
    # and the operators still work after a full release
    assert dedup.QUERIES["dd_ngram_jaccard"](spark, sf_dir).collect() is not None


def test_ivf_refit_removes_superseded_index_dir(spark, sf_dir, tmp_path):
    """A re-fit (corpus drift ⇒ new mtime in the cache key) must remove the
    superseded index tempdir instead of orphaning it until process exit."""
    import os
    import shutil

    from datalake_on_prem_system_spark.operators import similarity as sim

    # private corpus copy so touching the mtime can't perturb other tests
    work = tmp_path / "sf_copy"
    work.mkdir()
    for name in ("embeddings.parquet", "documents.parquet"):
        src = os.path.join(sf_dir, name)
        if os.path.isdir(src):
            shutil.copytree(src, work / name)
        elif os.path.exists(src):  # fixture parquet are single files
            shutil.copy2(src, work / name)

    path1, _ = sim.build_ivf_index(spark, str(work))
    dir1 = os.path.dirname(path1)
    assert os.path.isdir(dir1)

    # simulate corpus drift: bump the embeddings mtime → new cache key
    emb = work / "embeddings.parquet"
    os.utime(emb, (os.path.getmtime(emb) + 10, os.path.getmtime(emb) + 10))
    path2, _ = sim.build_ivf_index(spark, str(work))
    assert path2 != path1
    assert not os.path.exists(dir1), "superseded index dir must be GC'd"
    assert os.path.isdir(os.path.dirname(path2))
