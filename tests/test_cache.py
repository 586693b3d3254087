"""Shared-cache registry (imdbmapreduce_spark/cache.py): one
materialization per key, explicit release, no storage accumulation."""

from __future__ import annotations

from pyspark.sql import functions as F

from imdbmapreduce_spark.cache import release_shared_caches, shared_cache


def _storage_rdd_count(spark) -> int:
    jsc = spark.sparkContext._jsc.sc()
    return jsc.getRDDStorageInfo().__len__()


def _storage_drops_below(spark, bound: int, timeout_s: float = 10.0) -> bool:
    """Unpersist is asynchronous on the block-manager side — poll
    briefly instead of asserting the instantaneous count."""
    import time

    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if _storage_rdd_count(spark) < bound:
            return True
        time.sleep(0.2)
    return False


def test_shared_cache_memoizes_and_releases(spark):
    builds = []

    def build():
        builds.append(1)
        return spark.range(100).withColumn("x", F.col("id") * 2)

    a = shared_cache(spark, ("t", "k1"), build)
    b = shared_cache(spark, ("t", "k1"), build)
    assert a is b, "same key must return the same DataFrame object"
    assert len(builds) == 1, "build() must run once per key"
    assert a.count() == 100

    before = _storage_rdd_count(spark)
    assert before >= 1  # our cached artifact is registered
    release_shared_caches()
    assert _storage_drops_below(spark, before), "release must unpersist"

    c = shared_cache(spark, ("t", "k1"), build)
    assert len(builds) == 2, "released key rebuilds on next use"
    assert c.count() == 100
    release_shared_caches()


def test_release_during_build_does_not_leak(spark):
    """A release that fires while a builder is mid-build() must not leave
    the builder's entry cached-but-unreleasable: the builder re-checks the
    generation before inserting, unpersists, and hands back the frame
    uncached (deterministic simulation: build() itself runs the release)."""
    from imdbmapreduce_spark import cache as cache_mod

    def build():
        df = spark.range(7)
        release_shared_caches()  # a concurrent sweep owner evicts mid-build
        return df

    key = ("race", "release-mid-build")
    df = shared_cache(spark, key, build)
    assert df.count() == 7, "result stays correct, just uncached"
    full_key = (spark.sparkContext.applicationId, *key)
    assert full_key not in cache_mod._CACHE, "stale entry must not register"
    assert not df.storageLevel.useMemory, "stale entry must be unpersisted"

    rebuilt = shared_cache(spark, key, lambda: spark.range(7))
    assert full_key in cache_mod._CACHE, "next caller caches cleanly"
    assert rebuilt.count() == 7
    release_shared_caches()


def test_sweep_does_not_accumulate_storage(spark, sf_dir):
    """Running the near-dup family twice must not double cached storage:
    the round-3 audit flagged per-query .cache() calls with no release;
    the shared registry bounds storage by distinct artifacts, not query
    count."""
    from imdbmapreduce_spark.operators.dedup import (
        minhash_lsh_pairs,
        neardup_ngram_jaccard,
    )

    release_shared_caches()
    neardup_ngram_jaccard(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    minhash_lsh_pairs(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    first = _storage_rdd_count(spark)
    neardup_ngram_jaccard(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    minhash_lsh_pairs(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    assert _storage_rdd_count(spark) == first, "re-runs must reuse artifacts"
    release_shared_caches()
    assert _storage_drops_below(spark, first)


def test_package_facade_runs_queries_and_persists_indexes(spark, sf_dir, tmp_path, monkeypatch):
    """The public API surface: queries()/run() reach the registry, and
    persist_indexes writes both index groups with valid manifests."""
    import imdbmapreduce_spark as eng
    from imdbmapreduce_spark import indexstore
    from imdbmapreduce_spark.cache import release_shared_caches

    assert "q1_pricing_summary" in eng.queries()
    assert eng.run("limit_scan", spark, sf_dir).count() > 0

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    release_shared_caches()
    try:
        dirs = eng.persist_indexes(spark, sf_dir)
        assert set(dirs) == {"vector", "text"}
        assert indexstore.manifest(sf_dir) is not None
        assert indexstore.group_manifest(sf_dir, "text") is not None
    finally:
        indexstore.drop_group(sf_dir, "vector")
        indexstore.drop_group(sf_dir, "text")
        release_shared_caches()


def test_torn_persist_leaves_no_manifest(spark, sf_dir, tmp_path, monkeypatch):
    """Crash-mid-persist contract: the manifest lands LAST, so a persist
    that dies during an artifact write leaves the group unloadable (and
    the loaders fall back to building) rather than half-written."""
    import pytest

    from imdbmapreduce_spark import indexstore
    from imdbmapreduce_spark.cache import release_shared_caches
    from imdbmapreduce_spark.operators.dedup import _text_params, build_text_index

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    release_shared_caches()
    try:
        artifacts = build_text_index(spark, sf_dir)

        # poison ONE artifact: fails lazily, at WRITE time (an eager
        # failure would never reach persist_group)
        def boom(_batches):
            raise RuntimeError("torn-write")
            yield  # pragma: no cover — marks this as a generator

        bad = artifacts["shingle_hx"].mapInPandas(boom, "doc_id long, hx long")
        artifacts = dict(artifacts, shingle_hx=bad)
        with pytest.raises(Exception, match="torn-write"):
            indexstore.persist_group(
                spark, sf_dir, "text", artifacts, params=_text_params()
            )
        assert indexstore.group_manifest(sf_dir, "text") is None
        assert (
            indexstore.load_group_artifact(
                spark, sf_dir, "text", "jaccard_pairs", _text_params()
            )
            is None
        )
        # and a subsequent CLEAN persist fully recovers
        release_shared_caches()
        indexstore.persist_group(
            spark, sf_dir, "text", build_text_index(spark, sf_dir), params=_text_params()
        )
        assert indexstore.group_manifest(sf_dir, "text", _text_params()) is not None
    finally:
        indexstore.drop_group(sf_dir, "text")
        release_shared_caches()


def test_persist_group_build_t0_covers_prebuild_work(spark, sf_dir, tmp_path, monkeypatch):
    """``build_sec`` must cover work done BEFORE persist_group is entered
    when the caller passes ``build_t0`` (r13 verdict task 5: the ER
    artifacts materialize during build_er_index, so a persist-window-only
    timer understated the true build cost by ~30x)."""
    import time

    from imdbmapreduce_spark import indexstore
    from imdbmapreduce_spark.cache import release_shared_caches
    from imdbmapreduce_spark.operators.dedup import _text_params, build_text_index

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    release_shared_caches()
    try:
        artifacts = build_text_index(spark, sf_dir)
        # a build that "started" 5 s before persist_group was entered:
        # the manifest must record the full window, not the write window
        t0 = time.monotonic() - 5.0
        indexstore.persist_group(
            spark, sf_dir, "text", artifacts, params=_text_params(), build_t0=t0
        )
        m = indexstore.group_manifest(sf_dir, "text", _text_params())
        assert m is not None
        assert m["build_sec"] >= 5.0
    finally:
        indexstore.drop_group(sf_dir, "text")
        release_shared_caches()


def test_stable_checkpoint_durable_mode_is_bit_identical(spark, tmp_path):
    """With a checkpoint dir configured, stable_checkpoint switches every
    iterative operator to DURABLE checkpoints — results must stay
    bit-identical to the localCheckpoint default, and the reliable
    checkpoint files must actually land in the directory."""
    import os

    from pyspark.sql import Row

    from imdbmapreduce_spark.operators.graph import pagerank

    nodes = spark.createDataFrame([Row(node=i) for i in range(6)])
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3)]]
    )
    local = {(r.node, r.rank_fp) for r in pagerank(nodes, edges, iters=4).collect()}

    ckdir = str(tmp_path / "ck")
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    sc.setCheckpointDir(ckdir)
    try:
        durable = {
            (r.node, r.rank_fp) for r in pagerank(nodes, edges, iters=4).collect()
        }
    finally:
        # restore the session default (localCheckpoint) for later tests:
        # SparkContext.checkpointDir is a plain Scala Option var
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.apply(None))
    assert sc.getCheckpointDir() is None
    assert durable == local
    # reliable checkpoint data was written under the configured dir
    found = [
        os.path.join(dp, f) for dp, _, fs in os.walk(ckdir) for f in fs
    ]
    assert found, "durable checkpoint wrote no files"
