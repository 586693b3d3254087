"""Events-family tests beyond the oracle gate: the HLL sketch's error
bound vs the exact distinct count, the anomaly z-score's internal
consistency, and the NTZ-normalization's no-global-mutation contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from imdbmapreduce_spark import registry
from imdbmapreduce_spark.catalog import normalize_events_ts


def test_approx_distinct_within_error_bound(spark, sf_dir):
    rows = registry.get("events_approx_distinct").fn(spark, sf_dir).collect()
    assert rows
    exact = {
        r.event_type: (r.exact_users, r.n_events)
        for r in registry.get("events_distinct_exact").fn(spark, sf_dir).collect()
    }
    for r in rows:
        assert r.hll_within_5pct, r.event_type
        # the exact columns equal the oracle-checked twin's
        assert exact[r.event_type] == (r.exact_users, r.n_events), r.event_type

    # the RAW estimate's band (no longer an emitted column — it is
    # engine-specific): recompute and lock it per type directly
    from pyspark.sql import functions as F

    from imdbmapreduce_spark.catalog import table

    raw = (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
    )
    for r in raw.collect():
        rel_err = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert rel_err < 0.05, (r.event_type, r.approx_users, r.exact_users)


def test_anomaly_z_consistent_with_gate(spark, sf_dir):
    """Every row the |z|>3 gate keeps must REPORT |z| > 3 — the round-3
    advisory bug was a stray n factor inside the sqrt that understated
    the reported z by sqrt(n) while the gate stayed correct."""
    rows = registry.get("events_value_anomalies").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.z) > 3.0, (r.event_id, r.z)


def test_ntz_normalize_does_not_mutate_session_timezone(spark):
    """normalize_events_ts on an NTZ column must (a) interpret the naive
    wall-clock as UTC and (b) leave spark.sql.session.timeZone untouched
    — the round-3 advisory flagged the old path for permanently flipping
    an externally-built non-UTC session to UTC as a read side effect."""
    prior = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = spark.createDataFrame(
            [("2024-06-01 12:00:00",)], "s string"
        ).select(F.col("s").cast("timestamp_ntz").alias("ts"))
        out = normalize_events_ts(df)
        epoch = out.select(F.unix_micros("ts").alias("e")).first().e
        assert epoch == 1717243200 * 1_000_000  # 2024-06-01T12:00:00Z
        assert (
            spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)


def test_hll_sketch_merge_matches_direct_sketch(spark, sf_dir):
    """Merge associativity of the mergeable-HLL rollup: unioning the
    per-day sketches must estimate exactly what one direct whole-scan
    sketch estimates (same registers → same estimate), and land within
    the 5% audit band of the exact count for every event type."""
    from imdbmapreduce_spark.catalog import table

    ev = table(spark, sf_dir, "events")
    merged = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14))).alias("est_direct"),
        F.countDistinct("user_id").alias("exact"),
    )
    rows = merged.join(direct, "event_type").collect()
    assert rows
    for r in rows:
        assert r.est == r.est_direct, (r.event_type, r.est, r.est_direct)
        assert abs(r.est - r.exact) <= 0.05 * r.exact, (r.event_type, r.est, r.exact)


def test_key_skew_profile_identities(spark, sf_dir):
    """The profiler's ratios are integer functions of exact counts; check
    them against an independent groupBy, and that the report orders the
    strategy decision correctly (event_type is the skewed-few-keys case,
    user_id the balanced-many-keys case in this corpus)."""
    from imdbmapreduce_spark.catalog import table

    rows = {r.key_col: r for r in registry.get("events_key_skew_profile").fn(spark, sf_dir).collect()}
    ev = table(spark, sf_dir, "events")
    for col in ("user_id", "event_type"):
        cnts = [r.c for r in ev.groupBy(col).agg(F.count(F.lit(1)).alias("c")).collect()]
        r = rows[col]
        assert (r.n_rows, r.n_distinct, r.max_key_cnt) == (sum(cnts), len(cnts), max(cnts))
        assert r.top1_permille == r.max_key_cnt * 1000 // r.n_rows
        assert r.skew_factor == r.max_key_cnt * r.n_distinct // r.n_rows
    assert rows["event_type"].n_distinct < rows["user_id"].n_distinct


def test_disorder_profile_counts_synthetic_inversions(spark, tmp_path):
    """The sf corpus arrives fully in-order (n_late = 0), so drive the
    late path directly: planted inversions must be counted with exact
    lateness against hand-computed values."""
    import datetime

    from imdbmapreduce_spark import registry

    base = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)

    def ts(us):
        return base + datetime.timedelta(microseconds=us)

    rows = [
        # user 1, arrival order by event_id: lateness 0, 50, 0, 30
        (1, 1, ts(100)), (2, 1, ts(50)), (3, 1, ts(150)), (4, 1, ts(120)),
        # user 2: fully in order
        (5, 2, ts(10)), (6, 2, ts(20)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    r = registry.get("events_disorder_profile").fn(spark, str(tmp_path)).first()
    assert (r.n_events, r.n_late, r.max_late_us, r.sum_late_us) == (6, 2, 50, 80)
    assert r.late_permille == 2 * 1000 // 6


# --- banded range join (operators/rangejoin.py) ---------------------------


def _naive_point_in_interval(points, intervals):
    """Reference semantics: per-key theta join, Python-side."""
    out = []
    for pk, pts, extra in points:
        for ik, s, e, tag in intervals:
            if pk == ik and s <= pts < e:
                out.append((pk, pts, extra, s, e, tag))
    return sorted(out)


def test_point_in_interval_join_matches_naive(spark):
    """Banded equi-join == naive theta join on a randomized small case,
    including intervals longer than / shorter than the bucket, bucket
    boundary landings, and empty (start==end) intervals."""
    import random

    from imdbmapreduce_spark.operators.rangejoin import point_in_interval_join

    rng = random.Random(7)
    # negative epochs included: bucket math must FLOOR, not truncate
    points = [
        (rng.randrange(3), rng.randrange(-500, 500), i) for i in range(120)
    ]
    intervals = []
    for j in range(40):
        s = rng.randrange(-500, 500)
        # 0 = empty, -60 = reversed/corrupt (must match nothing)
        ln = rng.choice([0, -60, 1, 7, 93, 250, 400])  # bucket=100
        intervals.append((rng.randrange(3), s, s + ln, j))
    p = spark.createDataFrame(points, "k long, ts long, pid long")
    i = spark.createDataFrame(intervals, "k long, s long, e long, iid long")
    got = point_in_interval_join(
        p, i, keys=["k"], point_ts="ts", start="s", end="e", bucket=100
    )
    got_rows = sorted(
        (r.k, r.ts, r.pid, r.s, r.e, r.iid) for r in got.collect()
    )
    assert got_rows == _naive_point_in_interval(points, intervals)
    # pair multiplicity is exactly 1 by construction — no dedup hiding dupes
    assert len(got_rows) == len(set(got_rows))


def test_point_in_interval_join_left_keeps_unmatched_points(spark):
    from imdbmapreduce_spark.operators.rangejoin import point_in_interval_join

    p = spark.createDataFrame(
        [(1, 50, 10), (1, 500, 11), (2, 50, 12)], "k long, ts long, pid long"
    )
    i = spark.createDataFrame([(1, 0, 100, 7)], "k long, s long, e long, iid long")
    got = point_in_interval_join(
        p, i, keys=["k"], point_ts="ts", start="s", end="e", bucket=100, how="left"
    )
    rows = {(r.k, r.ts): (r.iid, r.s) for r in got.collect()}
    assert rows[(1, 50)] == (7, 0)
    assert rows[(1, 500)] == (None, None)
    assert rows[(2, 50)] == (None, None)
    assert got.count() == 3
    # a matched point carrying a NULL column must appear exactly once
    # (the old anti-join formulation emitted a null-padded duplicate)
    pn = spark.createDataFrame([(1, 50, None)], "k long, ts long, pid long")
    i2 = spark.createDataFrame([(1, 0, 100, 7)], "k long, s long, e long, iid long")
    got2 = point_in_interval_join(
        pn, i2, keys=["k"], point_ts="ts", start="s", end="e", bucket=100, how="left"
    ).collect()
    assert len(got2) == 1 and got2[0].iid == 7


def test_range_join_rejects_colliding_column_names(spark):
    import pytest

    from imdbmapreduce_spark.operators.rangejoin import point_in_interval_join

    p = spark.createDataFrame([(1, 5, 1)], "k long, ts long, tag long")
    i = spark.createDataFrame([(1, 0, 10, 2)], "k long, s long, e long, tag long")
    with pytest.raises(ValueError, match="collision"):
        point_in_interval_join(
            p, i, keys=["k"], point_ts="ts", start="s", end="e", bucket=10
        )


def test_reversed_interval_replicates_nowhere(spark):
    """Spark sequence() counts DOWN when stop < start; the guard must
    turn end<=start rows into an empty bucket set, not a reversed-span
    replication blowup."""
    from imdbmapreduce_spark.operators.rangejoin import _interval_buckets

    df = spark.createDataFrame(
        [(100, 100), (1000, 0), (0, 100)], "s long, e long"
    )
    got = [list(r[0]) for r in df.select(_interval_buckets("s", "e", 100)).collect()]
    assert got == [[], [], [0]]


def test_attribution_window_plan_is_banded_not_theta(spark, sf_dir):
    """The scale claim: the range join must execute as an equi hash/merge
    join on (user, bucket) — never BroadcastNestedLoopJoin or cartesian,
    which is what a naive range predicate plans as."""
    df = registry.get("events_attribution_window").fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Join") >= 2  # banded pair join + zero-count join-back


def test_interval_overlap_join_matches_naive(spark):
    """Banded overlap join == naive O(n*m) overlap test on randomized
    intervals, with exact multiplicity 1 per overlapping pair (the
    overlap-start-bucket guard, not a dedup)."""
    import random

    from imdbmapreduce_spark.operators.rangejoin import interval_overlap_join

    rng = random.Random(11)

    def mk(n, tag):
        out = []
        for j in range(n):
            s = rng.randrange(-500, 500)  # negative epochs: floor, not trunc
            out.append(
                (rng.randrange(3), s, s + rng.choice([0, -40, 1, 5, 80, 170, 320]), j)
            )
        return out

    L, R = mk(60, "l"), mk(60, "r")
    ldf = spark.createDataFrame(L, "k long, ls long, le long, lid long")
    rdf = spark.createDataFrame(R, "k long, rs long, re long, rid long")
    got = sorted(
        (r.k, r.lid, r.rid)
        for r in interval_overlap_join(
            ldf, rdf, keys=["k"], lstart="ls", lend="le",
            rstart="rs", rend="re", bucket=100,
        ).collect()
    )
    want = sorted(
        (lk, lid, rid)
        for lk, ls, le, lid in L
        for rk, rs, re, rid in R
        # the ls<re AND rs<le form presumes NONEMPTY intervals; empty or
        # reversed rows (end <= start) have nothing to overlap
        if lk == rk and le > ls and re > rs and ls < re and rs < le
    )
    assert got == want
    assert len(got) == len(set(got))


def test_salted_join_spreads_hot_keys(spark, sf_dir):
    """The skew loop closed: the profile-driven salted join must (a) flag
    event_type's keys as hot (5 keys can never balance a 32-way
    shuffle), (b) partition the hot branch on (key, salt) — visible in
    the executed plan — and (c) actually spread each hot key's rows so
    the hottest (key, salt) group carries ~1/buckets of that key's rows,
    not all of them."""
    from imdbmapreduce_spark.plans.events import _SKEW_JOIN_SALT, salted_join

    # The hot rule compares key counts to the session's per-task fair
    # share, so pin the driver-harness width (32) while BUILDING the
    # plan — in a 4-wide test session 5 keys genuinely need no salting
    # and the query correctly emits the plain join.
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        ev = registry.get("events_skewed_join_salted").fn(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    plan = ev._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "_salt" in plan  # the hot branch joins on (event_type, _salt)

    from imdbmapreduce_spark.catalog import table
    from pyspark.sql import functions as F

    fact = table(spark, sf_dir, "events").select("event_id", "event_type")
    key_counts = {
        r.event_type: r.c
        for r in fact.groupBy("event_type").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    salted = fact.withColumn(
        "_salt", F.pmod(F.hash("event_id"), F.lit(_SKEW_JOIN_SALT))
    )
    worst = (
        salted.groupBy("event_type", "_salt")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("event_type")
        .agg(F.max("c").alias("mx"))
        .collect()
    )
    for r in worst:
        # hash salting is near-uniform: hottest bucket well under half
        # the key's rows (ideal is 1/16; allow generous slack)
        assert r.mx < key_counts[r.event_type] / 4, (r.event_type, r.mx)


def test_salted_join_helper_exact_on_synthetic_skew(spark):
    """salted_join == plain join on an adversarially skewed fixture
    (one key owns 90% of rows), including hot/cold routing with an
    arbitrary hot-key subset."""
    from imdbmapreduce_spark.plans.events import salted_join

    rows = [(("hot" if i % 10 else f"cold{i}"), i) for i in range(500)]
    fact = spark.createDataFrame(rows, "k string, v long")
    dim = fact.groupBy("k").count().withColumnRenamed("count", "dim_n")
    got = sorted(
        (r.k, r.v, r.dim_n)
        for r in salted_join(fact, dim, "k", ["hot"], 8, "v").collect()
    )
    want = sorted((r.k, r.v, r.dim_n) for r in fact.join(dim, "k").collect())
    assert got == want


def test_markov_chain_matches_python_replay(spark, sf_dir):
    """Transition matrix and exact fixed-point stationary distribution
    replayed in pure Python (int64 semantics: truncating division)."""
    from imdbmapreduce_spark.catalog import table
    from imdbmapreduce_spark.plans.events import _MC_ITERS, _MC_SCALE

    ev = sorted(
        table(spark, sf_dir, "events")
        .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) ts_us")
        .collect(),
        key=lambda r: (r.user_id, r.ts_us, r.event_id),
    )
    pairs: dict[tuple[str, str], int] = {}
    prev_by_user: dict[int, str] = {}
    for r in ev:
        p = prev_by_user.get(r.user_id)
        if p is not None:
            pairs[(p, r.event_type)] = pairs.get((p, r.event_type), 0) + 1
        prev_by_user[r.user_id] = r.event_type
    row_tot: dict[str, int] = {}
    for (a, _), n in pairs.items():
        row_tot[a] = row_tot.get(a, 0) + n

    got = registry.get("events_type_transitions").fn(spark, sf_dir).collect()
    assert {(r.prev_type, r.next_type): (r.n, r.row_total) for r in got} == {
        k: (n, row_tot[k[0]]) for k, n in pairs.items()
    }
    for r in got:
        assert r.p == r.n / r.row_total

    # stationary: exact integer power iteration (// truncates toward
    # zero for the non-negative values here, matching Spark div)
    states = sorted(row_tot)
    pi = {s: _MC_SCALE // len(states) for s in states}
    for _ in range(_MC_ITERS):
        nxt: dict[str, int] = {}
        for (a, b), n in pairs.items():
            nxt[b] = nxt.get(b, 0) + (pi[a] * n) // row_tot[a]
        pi = nxt
    out = {
        r.event_type: r.pi_fp
        for r in registry.get("events_type_stationary").fn(spark, sf_dir).collect()
    }
    assert out == pi
    # mass conservation up to truncation loss (one unit per matrix cell
    # per round at worst)
    assert 0 <= _MC_SCALE - sum(out.values()) <= _MC_ITERS * len(pairs)


def test_cusum_fires_on_planted_drift_and_resets(spark, tmp_path):
    """A user whose spend jumps sustains S above H -> alarm fires, state
    resets, and quiet users never alarm."""
    import datetime as dt

    from pyspark.sql import Row

    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: quiet (values near 50 << K=75) — never alarms
    for i in range(20):
        rows.append(Row(event_id=i, ts=base + dt.timedelta(minutes=i),
                        user_id=1, event_type="click", value=50.0, props="{}"))
    # user 2: drift — 300/event accumulates (300-75)*100=22500 >= H first hit
    for i in range(6):
        rows.append(Row(event_id=100 + i, ts=base + dt.timedelta(minutes=i),
                        user_id=2, event_type="click", value=300.0, props="{}"))
    sf = str(tmp_path)
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")

    out = registry.get("events_cusum_alarms").fn(spark, sf).collect()
    u1 = [r for r in out if r.user_id == 1]
    u2 = sorted((r for r in out if r.user_id == 2), key=lambda r: r.r)
    assert len(u1) == 20 and not any(r.alarm for r in u1)
    # every drift event individually crosses: alarm + reset each step
    assert [r.alarm for r in u2] == [True] * 6
    assert [r.cusum for r in u2] == [22500] * 6


def test_multitouch_credit_conserved_and_u_shaped(spark, sf_dir):
    """Every conversion's credit sums to exactly 10000 bp; edges get
    4000 each when n>=3; the integer remainder lands on position 2 —
    plus a full replay against a naive Python computation."""
    import duckdb
    from collections import defaultdict

    from imdbmapreduce_spark.plans.events import _MTA_WINDOW_US
    from imdbmapreduce_spark.registry import get

    rows = get("events_multitouch_attribution").fn(spark, sf_dir).collect()
    by_conv = defaultdict(list)
    for r in rows:
        by_conv[r.conversion_id].append(r)
    assert by_conv, "no conversions attributed"
    for conv, touches in by_conv.items():
        touches.sort(key=lambda r: r.position)
        n = touches[0].n_touches
        assert [t.position for t in touches] == list(range(1, n + 1))
        assert sum(t.credit_bp for t in touches) == 10_000
        if n >= 3:
            assert touches[0].credit_bp == 4000 and touches[-1].credit_bp == 4000
            mids = touches[1:-1]
            base = 2000 // (n - 2)
            assert mids[0].credit_bp == base + 2000 % (n - 2)
            assert all(m.credit_bp == base for m in mids[1:])

    # replay the touch sets for a sample of conversions
    con = duckdb.connect()
    ev = con.execute(
        f"""SELECT event_id, user_id, event_type, epoch_us(ts)
            FROM read_parquet('{sf_dir}/events.parquet')"""
    ).fetchall()
    by_user = defaultdict(list)
    convs = {}
    for eid, uid, et, us in ev:
        if et == "purchase":
            convs[eid] = (uid, us)
        elif et in ("view", "click"):
            by_user[uid].append((us, eid))
    for conv_id in list(convs)[:50]:
        uid, cus = convs[conv_id]
        want = sorted(
            (us, eid) for us, eid in by_user.get(uid, [])
            if cus - _MTA_WINDOW_US <= us < cus
        )
        got = [t.touch_event_id for t in by_conv.get(conv_id, [])]
        assert got == [eid for _, eid in want]


def test_k_anonymity_ladder_monotone(spark, sf_dir):
    """Generalization can only help: coarser quasi-identifiers mean
    fewer classes, a larger-or-equal minimum class size, and a
    smaller-or-equal at-risk fraction; per-level rows account for the
    whole table."""
    from imdbmapreduce_spark import registry

    rows = {
        r.level: r
        for r in registry.get("events_k_anonymity_audit").fn(spark, sf_dir).collect()
    }
    assert set(rows) == {0, 1, 2}
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    for r in rows.values():
        assert 0 <= r.rows_below_k <= n_events
        assert r.ppm_below_k == r.rows_below_k * 1_000_000 // n_events
    assert rows[0].n_classes >= rows[1].n_classes >= rows[2].n_classes
    assert rows[0].min_class_size <= rows[1].min_class_size <= rows[2].min_class_size
    assert rows[0].rows_below_k >= rows[1].rows_below_k >= rows[2].rows_below_k


def test_agg_salting_decision_flips_with_key_statistics(spark, sf_dir):
    """The stats-driven aggregation plan (r9 verdict task 5): on the
    skewed 5-type events key the planner must pick the salted two-stage
    shape (every type's count ~20% of rows >> 2x fair share at 32
    partitions); on a unique key (event_id)
    it must pick the plain one-exchange GROUP BY. Pinned three ways: the
    choose_agg_salting decision itself, the salt column in/out of the
    standing query's executed plan, and value equality of both physical
    shapes on the same frame."""
    from imdbmapreduce_spark.plans.events import (
        _PLAN_PARTITIONS,
        _stats_driven_key_stats,
    )
    from imdbmapreduce_spark.stats import choose_agg_salting, key_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    decision_type, hot = choose_agg_salting(
        key_stats(ev, "event_type"), _PLAN_PARTITIONS
    )
    assert decision_type == "salted"
    assert len(hot) == 5  # every type exceeds 2x fair share
    # the uniform side: a unique key (event_id) never concentrates more
    # than one row per key, so the planner must skip the salt. (user_id
    # is NOT uniform enough at the smallest fixture: ~tens of users over
    # thousands of events puts each over 2x the 1/32 fair share.)
    decision_user, hot_user = choose_agg_salting(
        key_stats(ev, "event_id"), _PLAN_PARTITIONS
    )
    assert (decision_user, hot_user) == ("plain", [])

    vc = F.round(F.col("value") * 100).cast("long")
    plan_type = _stats_driven_key_stats(ev, "event_type", vc)
    plan_user = _stats_driven_key_stats(ev, "event_id", vc)
    assert "salt" in plan_type._jdf.queryExecution().executedPlan().toString()
    assert "salt" not in plan_user._jdf.queryExecution().executedPlan().toString()

    # both shapes exact: the salted plan's merged output equals a plain
    # group-by on the same frame, bit for bit
    plain_type = {
        tuple(r)
        for r in ev.select("event_type", vc.alias("vc"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("vc").alias("sum_cents"),
            F.max("vc").alias("max_cents"),
        )
        .collect()
    }
    assert {tuple(r) for r in plan_type.collect()} == plain_type


def test_join_strategy_decision_flips_with_key_statistics(spark):
    """The stats-driven JOIN plan (r10 verdict task 8 — the CBO loop now
    drives a standing join beside the standing aggregation): the same
    planner path must pick all three shapes from statistics alone —
    salted on a skewed key (dim over budget), plain shuffle on a
    uniform key (dim over budget), broadcast when the dim fits —
    pinned by decision, executed-plan shape, and value equality of
    every shape against the plain join."""
    from imdbmapreduce_spark.plans.events import _stats_driven_fact_dim_join
    from imdbmapreduce_spark.stats import choose_join_strategy, key_stats

    def plan_str(df):
        return df._jdf.queryExecution().executedPlan().toString()

    # skewed: one key owns 90% of rows; dim "too big to broadcast"
    skew = spark.createDataFrame(
        [(("hot" if i % 10 else f"cold{i:03d}"), i) for i in range(500)],
        "k string, v long",
    )
    sdim = skew.groupBy("k").count().withColumnRenamed("count", "dim_n")
    dec_skew, hot = choose_join_strategy(
        key_stats(skew, "k"), key_stats(sdim, "k"), 32, broadcast_threshold_rows=0
    )
    assert (dec_skew, hot) == ("salted", ["hot"])

    # uniform: 200 keys x 5 rows never exceed 2x fair share at width 32
    uni = spark.createDataFrame(
        [(f"k{i % 200:03d}", i) for i in range(1000)], "k string, v long"
    )
    udim = uni.groupBy("k").count().withColumnRenamed("count", "dim_n")
    dec_uni, hot_uni = choose_join_strategy(
        key_stats(uni, "k"), key_stats(udim, "k"), 32, broadcast_threshold_rows=0
    )
    assert (dec_uni, hot_uni) == ("shuffle", [])

    # broadcast: same skewed frames, dim within the row budget
    dec_bc, _ = choose_join_strategy(
        key_stats(skew, "k"), key_stats(sdim, "k"), 32,
        broadcast_threshold_rows=1_000_000,
    )
    assert dec_bc == "broadcast"

    # the dispatcher's executed plans carry the decision's signature...
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        j_salted = _stats_driven_fact_dim_join(spark, skew, sdim, "k", "v", 0)
        j_shuffle = _stats_driven_fact_dim_join(spark, uni, udim, "k", "v", 0)
        j_bc = _stats_driven_fact_dim_join(spark, skew, sdim, "k", "v", 1_000_000)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    assert "_salt" in plan_str(j_salted)
    assert "_salt" not in plan_str(j_shuffle)
    assert "BroadcastHashJoin" in plan_str(j_bc)
    assert "_salt" not in plan_str(j_bc)

    # ...and every shape is a lossless rewrite of the plain join
    want = sorted((r.k, r.v, r.dim_n) for r in skew.join(sdim, "k").collect())
    assert sorted((r.k, r.v, r.dim_n) for r in j_salted.collect()) == want
    assert sorted((r.k, r.v, r.dim_n) for r in j_bc.collect()) == want
    want_u = sorted((r.k, r.v, r.dim_n) for r in uni.join(udim, "k").collect())
    assert sorted((r.k, r.v, r.dim_n) for r in j_shuffle.collect()) == want_u


def test_hot_key_predicate_matches_native_typed_keys(spark):
    """ADVICE r11: key_stats' MCV keys are strings; the salted join's
    hot/cold split must match them against NATIVE-typed join columns
    through the same cast the stats used — for every key type a
    warehouse realistically salts on. A coercion mismatch here is
    silent (results stay correct via the cold branch) so the pin is on
    the split itself: the predicate selects exactly the hot rows, and
    the salted join over a non-string key still routes them through
    the salted arm (hot dim rows replicated per salt bucket)."""
    import datetime

    from imdbmapreduce_spark.plans.events import _hot_key_predicate, salted_join
    from imdbmapreduce_spark.stats import key_stats

    cases = [
        ("bigint", [(7, "a")] * 9 + [(i, "b") for i in range(10, 19)], 9),
        ("double", [(7.5, "a")] * 9 + [(float(i), "b") for i in range(9)], 9),
        (
            "timestamp",
            [(datetime.datetime(2024, 1, 1, 12, 0, 0), "a")] * 9
            + [(datetime.datetime(2024, 2, 1 + i), "b") for i in range(9)],
            9,
        ),
    ]
    for typ, rows, n_hot in cases:
        df = spark.createDataFrame(rows, f"k {typ}, v string")
        stats = key_stats(df, "k")
        hot = [stats.mcv[0][0]]  # the string-typed MCV head, as shipped
        got = df.filter(_hot_key_predicate("k", hot)).count()
        assert got == n_hot, f"{typ}: hot predicate matched {got} of {n_hot}"

        # end to end: the salted arm actually engages — each hot dim row
        # is replicated across the salt buckets, never lost to coercion
        dim = df.select("k").distinct()
        out = salted_join(df, dim, "k", hot, 4, "v")
        assert out.count() == len(rows)  # lossless rewrite
        hot_arm = df.filter(_hot_key_predicate("k", hot)).join(
            dim.filter(_hot_key_predicate("k", hot)), "k"
        )
        assert hot_arm.count() == n_hot
