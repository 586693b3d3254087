"""Z-order layout (operators/layout.py): the clustering must measurably
shrink per-file bounding boxes — the statistic file skipping runs on."""

from __future__ import annotations

import pyspark.sql.functions as F

from imdbmapreduce_spark.catalog import table
from imdbmapreduce_spark.operators.layout import (
    morton_interleave,
    zorder_key,
    zorder_layout,
)


def test_zorder_key_empty_input(spark):
    """Empty input has no min/max — the key must degenerate to 0, not
    raise (round-3 advisory: int(None) TypeError)."""
    df = spark.createDataFrame([], "a double, b double")
    assert zorder_key(df, "a", "b").collect() == []


def test_zorder_key_fractional_columns_keep_resolution(spark):
    """Sub-integer ranges (prices in dollars, ratios) must spread across
    the grid — the round-3 advisory flagged an early cast('long') that
    collapsed any dimension with span < 1 to a single Morton coordinate."""
    rows = [(i / 100.0, (99 - i) / 100.0) for i in range(100)]  # both in [0,1)
    df = spark.createDataFrame(rows, "a double, b double")
    keys = [r._z for r in zorder_key(df, "a", "b").collect()]
    assert len(set(keys)) == len(rows), "fractional dims collapsed"


def test_morton_interleave_known_values(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 3), (65535, 0)], ["a", "b"])
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", morton_interleave(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 2  # a's bit 0 lands at position 1
    assert got[(0, 1)] == 1  # b's bit 0 lands at position 0
    assert got[(3, 3)] == 15  # 0b1111: both low bit-pairs interleaved
    assert got[(65535, 0)] == sum(1 << (2 * i + 1) for i in range(16))


def _file_boxes(spark, path, c1, c2):
    """Per-file (min, max) spans of both columns."""
    df = spark.read.parquet(path).withColumn("_f", F.input_file_name())
    return (
        df.groupBy("_f")
        .agg(
            F.min(c1).alias("lo1"),
            F.max(c1).alias("hi1"),
            F.min(c2).alias("lo2"),
            F.max(c2).alias("hi2"),
        )
        .collect()
    )


def test_zorder_shrinks_file_bounding_boxes(spark, sf_dir, tmp_path):
    """The point of the curve: every output file covers a small rectangle
    of (partkey, suppkey) space, so min/max skipping bites on either
    column. Quantified as mean normalized bounding-box area vs a plain
    round-robin write of the same data into the same file count."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    span1 = li.agg(F.max("l_partkey") - F.min("l_partkey")).first()[0] or 1
    span2 = li.agg(F.max("l_suppkey") - F.min("l_suppkey")).first()[0] or 1

    plain, zpath = str(tmp_path / "plain"), str(tmp_path / "zorder")
    li.repartition(8).write.mode("overwrite").parquet(plain)
    zorder_layout(li, "l_partkey", "l_suppkey", zpath, n_files=8)

    def mean_area(path):
        boxes = _file_boxes(spark, path, "l_partkey", "l_suppkey")
        areas = [
            ((r.hi1 - r.lo1) / span1) * ((r.hi2 - r.lo2) / span2) for r in boxes
        ]
        return sum(areas) / len(areas)

    a_plain, a_z = mean_area(plain), mean_area(zpath)
    # round-robin files each cover ~the whole space (area ~1); z-ordered
    # files must be dramatically tighter on the two columns JOINTLY
    assert a_plain > 0.5, a_plain
    assert a_z < a_plain / 3, (a_z, a_plain)
    # and the rewrite loses no rows
    assert spark.read.parquet(zpath).count() == li.count()


def test_compact_parquet_rightsizes_and_preserves_rows(spark, tmp_path):
    """Compaction: 40 tiny files -> the computed file count, identical
    row multiset, and roughly even output sizes (repartition, not
    coalesce)."""
    import glob

    from imdbmapreduce_spark.operators.layout import compact_parquet

    src, dst = f"{tmp_path}/small", f"{tmp_path}/compacted"
    df = spark.range(20000).selectExpr("id", "id * 2 AS v")
    df.repartition(40).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 40

    total = sum(
        __import__("os").path.getsize(p) for p in glob.glob(f"{src}/part-*.parquet")
    )
    target = max(1, total // 3)  # force ~3-4 output files
    n = compact_parquet(spark, src, dst, target_bytes=target)
    out_files = glob.glob(f"{dst}/part-*.parquet")
    assert len(out_files) == n <= 5
    a = sorted(map(tuple, spark.read.parquet(src).collect()))
    b = sorted(map(tuple, spark.read.parquet(dst).collect()))
    assert a == b
    sizes = sorted(__import__("os").path.getsize(p) for p in out_files)
    assert sizes[0] * 3 > sizes[-1]  # no pathological skew across outputs


def test_compact_parquet_in_place_is_safe(spark, tmp_path):
    """dst == src must stage-then-swap, not self-overwrite (review r5):
    the data survives, row multiset unchanged, file count reduced."""
    import glob

    from imdbmapreduce_spark.operators.layout import compact_parquet

    d = f"{tmp_path}/table"
    spark.range(5000).selectExpr("id", "id % 7 AS g").repartition(20).write.parquet(d)
    before = sorted(map(tuple, spark.read.parquet(d).collect()))
    n = compact_parquet(spark, d, d, target_bytes=1 << 30)
    assert n == 1
    files = glob.glob(f"{d}/part-*.parquet")
    assert len(files) == 1
    assert sorted(map(tuple, spark.read.parquet(d).collect())) == before
    assert not glob.glob(f"{d}.compact-stage")


def test_partitioned_write_layout_and_pruning(spark, tmp_path):
    """Hive-style layout (day=... dirs) and directory-level pruning: an
    equality filter on the partition column must appear as a
    PartitionFilter and the scan must touch ONLY that partition's
    files."""
    from imdbmapreduce_spark.operators.layout import write_partitioned

    df = spark.createDataFrame(
        [("2024-01-01", i) for i in range(10)]
        + [("2024-01-02", i) for i in range(10)]
        + [("2024-01-03", i) for i in range(10)],
        "day string, v long",
    )
    path = str(tmp_path / "events_by_day")
    write_partitioned(df, path, ["day"])
    import os

    assert sorted(d for d in os.listdir(path) if d.startswith("day=")) == [
        "day=2024-01-01",
        "day=2024-01-02",
        "day=2024-01-03",
    ]
    back = spark.read.parquet(path).filter(F.col("day") == "2024-01-02")
    assert back.count() == 10
    # inputFiles() lists the relation pre-pruning; input_file_name() at
    # execution time shows what the pruned scan actually read
    files = [r[0] for r in back.select(F.input_file_name()).distinct().collect()]
    assert files and all("day=2024-01-02" in f for f in files)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "2024-01-02" in plan


def test_dynamic_partition_overwrite_replaces_only_incoming_days(spark, tmp_path):
    """The idempotent-backfill contract: overwriting with a frame that
    only contains day 2 must leave days 1 and 3 byte-identical and
    replace day 2's content."""
    import os

    from imdbmapreduce_spark.operators.layout import (
        overwrite_partitions,
        write_partitioned,
    )

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("d1", 1), ("d2", 2), ("d3", 3)], "day string, v long"
    )
    write_partitioned(base, path, ["day"])

    def snapshot(day):
        d = os.path.join(path, f"day={day}")
        out = {}
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                with open(os.path.join(d, f), "rb") as fh:
                    out[f] = fh.read()
        return out

    before_d1, before_d3 = snapshot("d1"), snapshot("d3")
    patch = spark.createDataFrame([("d2", 99), ("d2", 100)], "day string, v long")
    overwrite_partitions(patch, path, ["day"])
    assert snapshot("d1") == before_d1  # byte-identical, not rewritten
    assert snapshot("d3") == before_d3
    got = {
        (r.day, r.v) for r in spark.read.parquet(path).collect()
    }
    assert got == {("d1", 1), ("d2", 99), ("d2", 100), ("d3", 3)}


def test_write_with_metrics_observes_in_one_pass(spark, tmp_path):
    """Observed metrics must match the written data exactly — rows, a
    conditional null count, and an exact cents sum — and the whole call
    must run as ONE Spark job (a count-then-write regression would show
    up as a second job in the job group)."""
    import pytest

    from imdbmapreduce_spark.operators.layout import write_with_metrics

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 2.5)], "id long, v double"
    )
    path = str(tmp_path / "observed")
    sc = spark.sparkContext
    sc.setJobGroup("obs-one-pass", "write_with_metrics test")
    try:
        got = write_with_metrics(
            df,
            path,
            {
                "null_v": F.sum(F.isnull("v").cast("long")),
                "sum_v_cents": F.sum(F.round(F.col("v") * 100).cast("long")),
            },
        )
    finally:
        jobs = sc.statusTracker().getJobIdsForGroup("obs-one-pass")
        sc.setJobGroup(None, None)
    assert got["rows_written"] == 3
    assert got["null_v"] == 1
    assert got["sum_v_cents"] == 1250
    assert len(jobs) == 1, f"expected ONE job (write+observe), saw {jobs}"
    back = spark.read.parquet(path)
    assert back.count() == 3
    # the built-in count is reserved — a caller metric must not shadow it
    with pytest.raises(ValueError, match="rows_written"):
        write_with_metrics(df, path, {"rows_written": F.sum("v")})


def test_zorder_pruning_audit_invariants(spark, sf_dir):
    """Structural claims of the pruning audit: the single-column sort
    cannot prune the other column (scans every file for c2-only probes),
    Z-order prunes BOTH columns (strictly fewer than all files on every
    probe), and rows_selected is layout-invariant."""
    from imdbmapreduce_spark import registry

    rows = registry.get("zorder_pruning_audit").fn(spark, sf_dir).collect()
    by = {(r.layout, r.probe): r for r in rows}
    assert len(by) == 8
    probes = {p for _, p in by}
    for p in probes:
        z, s = by[("zorder", p)], by[("sorted_c1", p)]
        assert z.rows_selected == s.rows_selected  # selection is layout-free
        assert z.n_files == s.n_files
        # a scan never reads fewer files than 1 or more than all
        for r in (z, s):
            assert 1 <= r.files_scanned <= r.n_files
    for p in ("c2_mid16", "c2_top16"):
        # sorted-by-c1 has no c2 clustering: every file intersects
        assert by[("sorted_c1", p)].files_scanned == by[("sorted_c1", p)].n_files
        # z-order prunes the same probe
        assert by[("zorder", p)].files_scanned < by[("zorder", p)].n_files
    # on its own column the sort is at least as tight as z-order
    assert (
        by[("sorted_c1", "c1_mid16")].files_scanned
        <= by[("zorder", "c1_mid16")].files_scanned
    )


def test_file_compaction_plan_invariants(spark, sf_dir):
    """Planner invariants: files partition the corpus; 'keep' files are
    at least half-target; every 'compact' group except possibly the last
    (in fill order) reaches the target once its next member would
    overflow — equivalently, group fill never exceeds target + the
    smallest member's slack, and group ids are dense from 0."""
    from imdbmapreduce_spark import registry
    from imdbmapreduce_spark.operators.layout import _CMP_SMALL, _CMP_TARGET

    rows = registry.get("file_compaction_plan").fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == docs
    small = [r for r in rows if r.action == "compact"]
    for r in rows:
        if r.action == "keep":
            assert r.bytes >= _CMP_SMALL and r.target_file is None
        else:
            assert r.bytes < _CMP_SMALL and r.target_file is not None
    if small:
        gids = sorted({r.target_file for r in small})
        assert gids == list(range(len(gids)))
        # replay the sequential fill: same order, same group edges
        fill: dict[int, int] = {}
        for r in sorted(small, key=lambda r: (-r.bytes, r.file_id)):
            off = sum(fill.values())
            assert r.target_file == off // _CMP_TARGET
            fill[r.file_id] = r.bytes


def test_bucketed_join_runs_with_zero_exchanges(spark, sf_dir):
    """The co-located join contract: both sides bucketed+sorted on the
    join key ⇒ the sort-merge join AND the downstream per-key
    aggregation run with ZERO Exchange nodes, while the identical
    plain-parquet join (same merge hint) shuffles both sides. Value
    equality against the plain join proves the bucketed layout
    lost/duplicated nothing."""
    from pyspark.sql import functions as F

    from imdbmapreduce_spark import registry
    from imdbmapreduce_spark.catalog import table

    df = registry.get("bucketed_colocated_join").fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "SortMergeJoin" in plan

    o = table(spark, sf_dir, "orders").select(
        "o_custkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    plain = (
        c.join(o.hint("merge"), c.c_custkey == o.o_custkey)
        .groupBy(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("cents").alias("sum_cents"))
    )
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert plain_plan.count("Exchange") >= 2  # both join sides shuffle

    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_fact_fact_join_zero_exchanges(spark, sf_dir):
    """The fact-fact pair (lineitem ⨝ orders): zero Exchange nodes with
    the bucketed layout — the case where neither side broadcasts and
    the plain plan must shuffle the two largest tables."""
    from imdbmapreduce_spark import registry

    df = registry.get("bucketed_fact_fact_join").fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "SortMergeJoin" in plan


def test_q18_routes_through_bucketed_layout(spark, sf_dir):
    """r11 verdict task 2: the STANDING q18 consumer routes through the
    full-column orderkey-bucketed twins via the
    ``catalog.table(..., prefer_bucketed_on=...)`` seam — the whole
    plan (fact aggregation AND orders join) runs with ZERO Exchange
    nodes — and value-equals the plain-parquet form of the same query,
    so the layout lost/duplicated nothing."""
    from pyspark.sql import functions as F

    from imdbmapreduce_spark import registry
    from imdbmapreduce_spark.catalog import table
    from imdbmapreduce_spark.functions import cents
    from imdbmapreduce_spark.plans.relational import _Q18_MIN_QTY_CENTS

    df = registry.get("q18_large_orders").fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "SortMergeJoin" in plan

    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(cents("l_quantity")).alias("sum_qc"))
        .filter(F.col("sum_qc") > _Q18_MIN_QTY_CENTS)
    )
    orders = table(spark, sf_dir, "orders")
    plain = orders.join(big, orders.o_orderkey == big.l_orderkey).select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        (cents("o_totalprice").cast("double") / 100.0).alias("total_price"),
        (F.col("sum_qc").cast("double") / 100.0).alias("sum_qty"),
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, plain.collect()))


def test_q12_routes_opportunistically_when_layout_exists(spark, sf_dir):
    """The opportunistic half of the seam: q12 passes prefer_bucketed_on
    WITHOUT building the twins; once any orderkey consumer has built
    them (q18 here), the routed read serves the join from the bucketed
    layout. At test scale AQE broadcasts the year-filtered fact either
    way (hiding the exchange question), so the exchange pin compares
    the SORT-MERGE forms — the strategy a 100 TB run would take, where
    neither side broadcasts: the bucketed SMJ join is exchange-free on
    the join keys while the plain SMJ shuffles both sides. The
    registered query's values are pinned identical to the plain text."""
    from pyspark.sql import functions as F

    from imdbmapreduce_spark import registry
    from imdbmapreduce_spark.catalog import table
    from imdbmapreduce_spark.operators.layout import ensure_bucketed_layout

    ensure_bucketed_layout(spark, sf_dir, "lineitem", "l_orderkey")
    ensure_bucketed_layout(spark, sf_dir, "orders", "o_orderkey")

    year = (
        F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))

    def q12_join(prefer: bool):
        kw = dict(prefer_bucketed_on="l_orderkey") if prefer else {}
        li = table(spark, sf_dir, "lineitem", **kw).filter(year)
        okw = dict(prefer_bucketed_on="o_orderkey") if prefer else {}
        orders = table(spark, sf_dir, "orders", **okw)
        return li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)

    routed_plan = q12_join(True)._jdf.queryExecution().executedPlan().toString()
    plain_plan = q12_join(False)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in routed_plan and "SortMergeJoin" in plain_plan
    assert routed_plan.count("Exchange") == 0
    assert plain_plan.count("Exchange") >= 2

    # the registered query (AQE free to broadcast) equals the plain text
    routed = registry.get("q12_late_shipment_priority").fn(spark, sf_dir)
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    plain = (
        q12_join(False)
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )
    assert sorted(map(tuple, routed.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_append_preserves_colocation(spark, sf_dir):
    """Incremental layout maintenance: a production warehouse does not
    rebuild a bucketed fact table per delivery — it APPENDS, and Spark's
    bucketed append hashes the new rows into the same bucket files, so
    the layout contract (exchange-free co-located joins) survives
    arrivals. Pinned: base write + shard append == full rebuild by
    value, and the appended table's merge join against an equal-count
    bucketed side still runs with ZERO Exchange nodes."""
    from pyspark.sql import functions as F

    from imdbmapreduce_spark.catalog import table
    from imdbmapreduce_spark.operators.layout import (
        _ensure_bucketed,
        write_bucketed_table,
    )

    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    is_new = (F.col("o_orderkey") % 10) == 7
    name = "t_orders_append_pin"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    write_bucketed_table(orders.filter(~is_new), name, "o_orderkey")
    # the delivery lands as an append — no rebuild, same bucket spec
    orders.filter(is_new).write.mode("append").bucketBy(
        16, "o_orderkey"
    ).sortBy("o_orderkey").format("parquet").saveAsTable(name)

    appended = spark.table(name)
    assert sorted(map(tuple, appended.collect())) == sorted(
        map(tuple, orders.collect())
    )

    l16 = _ensure_bucketed(
        spark,
        sf_dir,
        "li_nb16",
        "l_orderkey",
        lambda: table(spark, sf_dir, "lineitem").select("l_orderkey"),
        n_buckets=16,
    )
    j = appended.join(
        spark.table(l16).hint("merge"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    assert "Exchange" not in j._jdf.queryExecution().executedPlan().toString()
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucket_count_mismatch_reintroduces_exchange(spark, sf_dir):
    """write_bucketed_table's sharp edge, pinned negative (r11 verdict
    task 7): the exchange-free sort-merge join requires EQUAL bucket
    counts — Spark's bucket hashing at N buckets is not a refinement of
    2N, so an 8-vs-16 pair silently reintroduces the shuffle the write
    paid to remove, while the equal-count control stays exchange-free."""
    from pyspark.sql import functions as F

    from imdbmapreduce_spark.catalog import table
    from imdbmapreduce_spark.operators.layout import _ensure_bucketed

    def orders_df():
        return table(spark, sf_dir, "orders").select("o_orderkey")

    def li_df():
        return table(spark, sf_dir, "lineitem").select("l_orderkey")

    o8 = _ensure_bucketed(spark, sf_dir, "orders_nb8", "o_orderkey", orders_df, n_buckets=8)
    o16 = _ensure_bucketed(spark, sf_dir, "orders_nb16", "o_orderkey", orders_df, n_buckets=16)
    l16 = _ensure_bucketed(spark, sf_dir, "li_nb16", "l_orderkey", li_df, n_buckets=16)

    mismatched = spark.table(o8).join(
        spark.table(l16).hint("merge"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    assert "Exchange" in mismatched._jdf.queryExecution().executedPlan().toString()

    matched = spark.table(o16).join(
        spark.table(l16).hint("merge"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    assert "Exchange" not in matched._jdf.queryExecution().executedPlan().toString()
