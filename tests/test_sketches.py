"""Misra-Gries guarantees, locked on an adversarially skewed corpus the
sketch cannot luck its way through: a planted heavy key, a mid-weight
band, and a long tail of near-distinct items (domain >> k)."""

from __future__ import annotations

from pyspark.sql import functions as F

from imdbmapreduce_spark import registry
from imdbmapreduce_spark.operators.sketches import misra_gries

_K = 16


def _skewed(spark):
    # 20_000 rows: item 0 -> 8_000 rows (heavy), items 1..9 -> 400 each
    # (mid), tail: 8_000 distinct singletons. Domain size 8_010 >> k=16.
    n = 20_000
    return spark.range(n).select(
        F.when(F.col("id") < 8_000, F.lit(0))
        .when(F.col("id") < 12_000, (F.col("id") % 10) + 1)
        .otherwise(F.col("id") + 100)
        .alias("item")
    )


def test_mg_guarantees_on_skew(spark):
    df = _skewed(spark).repartition(8)  # force multi-partition merge
    out = misra_gries(df, "item", k=_K).collect()
    assert out, "summary must not be empty"
    bound = out[0]["bound"]
    assert all(r["bound"] == bound for r in out)  # global decrement
    assert 0 < bound <= 20_000 // (_K + 1) * 8 + 20_000 // (_K + 1)
    exact = {r["item"]: r["cnt"] for r in df.groupBy("item").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    got = {r["item"]: r["est"] for r in out}
    # undercount-only, within bound
    for item, est in got.items():
        assert est <= exact[item] <= est + bound, (item, est, exact[item], bound)
    # any item heavier than the bound MUST be present
    for item, cnt in exact.items():
        if cnt > bound:
            assert item in got, (item, cnt, bound)
    # the planted heavy key is found with a tight estimate
    assert got[0] >= 8_000 - bound
    assert len(out) <= _K


def test_mg_partition_invariance(spark):
    """Same answer-set guarantees under 1, 4, and 32 partitions — the
    summary is mergeable, not partition-lucky. (Estimates may differ —
    the guarantee is what's invariant.)"""
    base = _skewed(spark)
    exact = {r["item"]: r["cnt"] for r in base.groupBy("item").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    for parts in (1, 4, 32):
        out = misra_gries(base.repartition(parts), "item", k=_K).collect()
        bound = out[0]["bound"]
        got = {r["item"]: r["est"] for r in out}
        for item, cnt in exact.items():
            if cnt > bound:
                assert item in got, (parts, item, cnt, bound)
        for item, est in got.items():
            assert est <= exact[item] <= est + bound


def test_registered_audit_is_all_within_bound(spark, sf_dir):
    rows = registry.get("events_heavy_hitters_sketch").fn(spark, sf_dir).collect()
    assert rows
    assert all(r["within_bound"] for r in rows)
    assert all(r["err"] >= 0 for r in rows)  # undercount-only


def test_cms_never_undercounts_and_is_exact_without_collisions(spark):
    """CMS's deterministic guarantee: est >= true for every queried item
    (present or absent); with a sparse sketch (2 items, 512 buckets, min
    over 4 rows) the estimates are exact."""
    from imdbmapreduce_spark.operators.sketches import cms_estimate, count_min

    df = spark.createDataFrame([(1,), (1,), (2,)], "user_id long")
    cms = count_min(df, "user_id")
    cand = spark.createDataFrame([(1,), (2,), (99,)], "item long")
    est = {r.item: r.est for r in cms_estimate(cms, cand).collect()}
    true = {1: 2, 2: 1, 99: 0}
    n = 3
    for item, t in true.items():
        assert t <= est[item] <= t + n, (item, est[item])
    assert est[1] == 2 and est[2] == 1 and est[99] == 0


def test_cms_partition_invariance(spark):
    """The counter table is exact integer counts per (row, bucket) —
    bit-identical under any partitioning (the mergeable-summary
    linearity: CMS(A ∪ B) = CMS(A) + CMS(B), elementwise)."""
    from imdbmapreduce_spark.operators.sketches import count_min

    rows = [(i % 17,) for i in range(500)]
    df = spark.createDataFrame(rows, "user_id long")
    a = sorted(map(tuple, count_min(df, "user_id").collect()))
    b = sorted(map(tuple, count_min(df.repartition(7), "user_id").collect()))
    assert a == b


def test_registered_cms_audit_guarantee_and_error_scale(spark, sf_dir):
    """The registered audit: never_undercounts is all-true (the
    deterministic CMS guarantee), and the min-over-rows overcount stays
    within a loose multiple of the expected per-row N/w on this corpus."""
    rows = registry.get("events_cms_audit").fn(spark, sf_dir).collect()
    assert rows and all(r.never_undercounts for r in rows)
    assert all(r.overcount_within_bound for r in rows)

    # the RAW estimates (no longer emitted columns — xxhash64 isn't
    # SQL-portable): recompute and lock the overcount band directly
    from pyspark.sql import functions as F

    from imdbmapreduce_spark.catalog import table
    from imdbmapreduce_spark.operators.sketches import cms_estimate, count_min
    from imdbmapreduce_spark.plans.events import _CMS_D, _CMS_W, _top_users

    ev = table(spark, sf_dir, "events")
    cms = count_min(ev, "user_id", d=_CMS_D, w=_CMS_W)
    top = _top_users(spark, sf_dir)
    est = cms_estimate(
        cms, top.select(F.col("user_id").alias("item")), d=_CMS_D, w=_CMS_W
    )
    raw = top.join(est, top.user_id == est.item).collect()
    assert raw and all(r.est >= r.exact_cnt for r in raw)
    n = ev.count()
    loose = 5 * n / _CMS_W + 5
    assert all(r.est - r.exact_cnt <= loose for r in raw), max(
        r.est - r.exact_cnt for r in raw
    )
