"""ORC source/sink: lossless roundtrip, schema enforcement, and the scan
capabilities (predicate pushdown + column pruning) that justify calling
it a columnar interchange format rather than a dump."""

from __future__ import annotations

from pyspark.sql import functions as F

from imdbmapreduce_spark.catalog import table
from imdbmapreduce_spark.sources.columnar import read_orc, write_orc


def test_orc_roundtrip_lossless(spark, sf_dir, tmp_path):
    src = table(spark, sf_dir, "events")
    path = f"{tmp_path}/events_orc"
    write_orc(src, path)
    back = read_orc(spark, path, src.schema)
    assert back.schema == src.schema
    assert back.count() == src.count()
    # order-insensitive content equality
    assert src.exceptAll(back).limit(1).count() == 0
    assert back.exceptAll(src).limit(1).count() == 0


def test_orc_scan_pushes_filters_and_prunes_columns(spark, sf_dir, tmp_path):
    src = table(spark, sf_dir, "orders")
    path = f"{tmp_path}/orders_orc"
    write_orc(src, path, sort_by=["o_custkey"])
    back = read_orc(spark, path, src.schema)
    q = back.filter(F.col("o_custkey") == 7).select("o_orderkey", "o_totalprice")
    q.collect()
    plan = q._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    scan = plan[plan.index("FileScan orc") :]
    assert "o_custkey" in scan.split("PushedFilters")[1][:200]
    read_schema = scan.split("ReadSchema:")[1][:300]
    assert "o_orderpriority" not in read_schema  # untouched column pruned
    # same answer as the parquet original
    expect = sorted(
        (r.o_orderkey, r.o_totalprice)
        for r in src.filter(F.col("o_custkey") == 7)
        .select("o_orderkey", "o_totalprice")
        .collect()
    )
    assert sorted((r.o_orderkey, r.o_totalprice) for r in q.collect()) == expect


def test_orc_read_under_wrong_schema_fails_loudly(spark, sf_dir, tmp_path):
    """Enforcing the caller's schema must surface a shard/type mismatch at
    the scan, not let nulls leak downstream."""
    src = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    path = f"{tmp_path}/nation_orc"
    write_orc(src, path)
    wrong = src.select(
        F.col("n_nationkey").cast("string").alias("n_nationkey"), "n_name"
    ).schema
    import pytest

    with pytest.raises(ValueError, match="ORC schema mismatch"):
        read_orc(spark, path, wrong)
