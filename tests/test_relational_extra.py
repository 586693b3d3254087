"""Relational-family tests beyond the oracle gate: the approx-percentile
sketch's rank-error bound and the hash sampler's statistical properties
(the parts a value-hash compare can't express)."""

from __future__ import annotations

from imdbmapreduce_spark import registry


def test_approx_percentile_within_error_bound(spark, sf_dir):
    """The audit's verdict column must be TRUE (the GK sketch honors
    its deterministic rank guarantee), the exact median must sit inside
    its own bracket, and the bracket must be TIGHT — a bound so loose
    it can't fail would make the hash check vacuous."""
    rows = registry.get("approx_quantile_error").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.sketch_within_bound, r.l_returnflag
        assert r.n_lines > 0 and r.exact_p50_q6 > 0, r.l_returnflag

    # the RAW estimate's relative error (no longer an emitted column —
    # it is partition-order-dependent): recompute and lock it directly
    from pyspark.sql import functions as F

    from imdbmapreduce_spark.catalog import table
    from imdbmapreduce_spark.functions import cents

    li = table(spark, sf_dir, "lineitem")
    pc = cents("l_extendedprice")
    raw = li.groupBy("l_returnflag").agg(
        F.percentile(pc, F.lit(0.5)).alias("exact_p50"),
        F.approx_percentile(pc, F.lit(0.5), F.lit(10000))
        .cast("double")
        .alias("approx_p50"),
    )
    for r in raw.collect():
        rel_err = abs(r.approx_p50 - r.exact_p50) / max(abs(r.exact_p50), 1)
        assert rel_err < 0.01, (r.l_returnflag, r.approx_p50, r.exact_p50)


def test_stratified_sample_rate_and_determinism(spark, sf_dir):
    from imdbmapreduce_spark.catalog import table

    sample = registry.get("stratified_sample").fn(spark, sf_dir)
    n_total = table(spark, sf_dir, "orders").count()
    kept = sample.collect()
    # ~10% +- generous tolerance at small sf (binomial noise)
    assert 0.05 * n_total < len(kept) < 0.15 * n_total, (len(kept), n_total)
    # deterministic: a second run keeps the exact same row set
    again = {r.o_orderkey for r in sample.collect()}
    assert {r.o_orderkey for r in kept} == again


def test_referential_integrity_audit_counts_planted_violations(spark, tmp_path):
    """The sf corpus is violation-free, so the audit's positive path
    needs planted breakage: orphan FKs on every edge, a duplicate
    customer key, and non-positive measures — each counted exactly."""
    from imdbmapreduce_spark import registry

    spark.createDataFrame(
        [(1, "a"), (1, "dup"), (2, "b")], "c_custkey long, c_name string"
    ).write.parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        [(10, 1, 5.0), (11, 2, -3.0), (12, 99, 7.0)],  # 99 = orphan custkey
        "o_orderkey long, o_custkey long, o_totalprice double",
    ).write.parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [
            (10, 100, 1000, 2.0),   # ok
            (10, 100, 1000, 0.0),   # non-positive quantity
            (77, 100, 1000, 1.0),   # orphan orderkey
            (10, 999, 1000, 1.0),   # orphan suppkey
            (10, 100, 9999, 1.0),   # orphan partkey
        ],
        "l_orderkey long, l_suppkey long, l_partkey long, l_quantity double",
    ).write.parquet(f"{tmp_path}/lineitem.parquet")
    spark.createDataFrame([(100, "s")], "s_suppkey long, s_name string").write.parquet(
        f"{tmp_path}/supplier.parquet"
    )
    spark.createDataFrame([(1000, "p")], "p_partkey long, p_name string").write.parquet(
        f"{tmp_path}/part.parquet"
    )

    got = {
        r.check_name: r.n_violations
        for r in registry.get("referential_integrity_audit").fn(spark, str(tmp_path)).collect()
    }
    assert got == {
        "orders_orphan_custkey": 1,
        "lineitem_orphan_orderkey": 1,
        "lineitem_orphan_suppkey": 1,
        "lineitem_orphan_partkey": 1,
        "customer_dup_custkey": 1,
        "lineitem_nonpositive_quantity": 1,
        "orders_nonpositive_totalprice": 1,
    }


def test_rollup_incremental_single_day_edge(spark, tmp_path):
    """Cutoff = start of the max-ts day: when EVERY event is on that
    day, the state side is empty and the delta carries everything — the
    merge must still equal the direct rollup."""
    import datetime

    from imdbmapreduce_spark import registry

    base = datetime.datetime(2026, 3, 3, 10, 0, tzinfo=datetime.timezone.utc)
    rows = [
        (i, base + datetime.timedelta(minutes=40 * i), "click", 1.25 * i)
        for i in range(6)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    ).write.parquet(f"{tmp_path}/events.parquet")
    got = {
        (r.bucket_start, r.event_type): (r.n_events, r.sum_value)
        for r in registry.get("events_rollup_incremental").fn(spark, str(tmp_path)).collect()
    }
    # direct expectation: hours 10..13 with 40-minute spacing
    want = {}
    for i, r in enumerate(rows):
        key = (r[1].strftime("%Y-%m-%d %H:00:00"), "click")
        n, s = want.get(key, (0, 0.0))
        want[key] = (n + 1, round(s + 1.25 * i, 2))
    assert {k: (n, round(s, 2)) for k, (n, s) in got.items()} == want


def test_skyline_matches_naive_python(spark, sf_dir):
    """The sort-scan skyline must equal the quadratic dominance
    definition replayed in pure Python, and every returned point must
    be pairwise non-dominating."""
    from imdbmapreduce_spark import registry
    from imdbmapreduce_spark.catalog import table

    pts = [
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in table(spark, sf_dir, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]

    def dominated(p):
        return any(
            (q[1] < p[1] and q[2] >= p[2]) or (q[1] <= p[1] and q[2] > p[2])
            for q in pts
        )

    want = {p[0] for p in pts if not dominated(p)}
    got = registry.get("part_price_size_skyline").fn(spark, sf_dir).collect()
    assert {r.p_partkey for r in got} == want
    sky = [(r.price, r.size_v) for r in got]
    for a in sky:
        for b in sky:
            assert not ((b[0] < a[0] and b[1] >= a[1]) or (b[0] <= a[0] and b[1] > a[1]))


def test_seasonal_decomposition_properties(spark, sf_dir):
    """Multiplicative seasonal indices must straddle 1 (their mean is ~1e6
    ppm by construction — ratios are value/centered-mean), cover all 12
    calendar months, and use exactly the interior complete windows."""
    from pyspark.sql import functions as F

    from imdbmapreduce_spark import registry

    rows = registry.get("orders_seasonal_decomposition").fn(spark, sf_dir).collect()
    assert sorted(r.month_of_year for r in rows) == list(range(1, 13))
    n_months = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.date_trunc("month", "o_orderdate"))
        .distinct()
        .count()
    )
    assert sum(r.n_windows for r in rows) == n_months - 12
    weighted = sum(r.seasonal_index_ppm * r.n_windows for r in rows) / (n_months - 12)
    assert abs(weighted - 1_000_000) < 20_000  # ratios center on 1


def test_order_basket_lift_invariants(spark, sf_dir):
    """Association-rule sanity: pair support bounded by both marginals,
    confidence = supp_ab/supp_a in exact ppm, lift consistent with its
    definition, one row per unordered type pair."""
    from imdbmapreduce_spark import registry

    rows = registry.get("order_basket_lift").fn(spark, sf_dir).collect()
    assert rows
    n = rows[0].n_orders
    seen = set()
    for r in rows:
        assert r.type_a < r.type_b
        assert (r.type_a, r.type_b) not in seen
        seen.add((r.type_a, r.type_b))
        assert r.n_orders == n
        assert 1 <= r.supp_ab <= min(r.supp_a, r.supp_b)
        assert r.confidence_ppm == r.supp_ab * 1_000_000 // r.supp_a
        assert r.lift_ppm == r.supp_ab * n * 1_000_000 // (r.supp_a * r.supp_b)
