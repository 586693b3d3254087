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
