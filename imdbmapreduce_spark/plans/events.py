"""Event-stream analytics (batch plans over the ``events`` table).

The reference has no time-series surface at all (SURVEY.md §2.5 — no
windows, no streaming); this module is the batch half of the additive
events vertical: tumbling-window aggregation, gap-based sessionization,
semi-structured JSON access, and an as-of join. The Structured Streaming
half lives in ``imdbmapreduce_spark.streaming``.

Determinism: timestamps never cross the engine boundary as native values —
they are surfaced as microsecond epochs (exact BIGINT in both Spark and
DuckDB) or as formatted strings with explicit microsecond precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from imdbmapreduce_spark.catalog import table
from imdbmapreduce_spark.functions import cents_sum
from imdbmapreduce_spark.registry import query

# Formatted-timestamp spelling in each engine, microsecond-exact.
_SPARK_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_DUCK_TS_FMT = "%Y-%m-%d %H:%M:%S.%f"

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min in microseconds


@query(
    "events_hourly_stats",
    oracle=f"""
    SELECT
      strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_start,
      event_type,
      COUNT(*) AS n_events,
      COUNT(DISTINCT user_id) AS n_users,
      CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation per event type.

    The batch twin of the streaming windowed-count plan
    (imdbmapreduce_spark.streaming): same bucket semantics, so a backfill
    job and the live stream produce unionable results.

    Scale: date_trunc is a narrow projection; the only exchange carries
    (hour × type) partial aggregates — map-side combine bounds shuffle
    volume by group count (~24×5 per day), independent of event volume.
    COUNT(DISTINCT user) expands to a two-phase agg; at 100 TB swap in
    approx_count_distinct if exactness is negotiable.
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "bucket_start"
            ),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            cents_sum("value", "sum_value"),
        )
    )


@query(
    "events_sessionization",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             LAG(epoch_us(ts)) OVER w AS prev_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    marked AS (
      SELECT *,
             CASE WHEN prev_us IS NULL
                       OR ts_us - prev_us > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM ordered
    ),
    sessions AS (
      SELECT user_id, event_id, ts_us,
             CAST(SUM(is_new) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id) AS BIGINT) AS session_id
      FROM marked
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) AS session_end_us,
           MAX(ts_us) - MIN(ts_us) AS duration_us
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a >30-min silence starts a new session.

    The classic lag → flag → running-sum → group pattern. Timestamps are
    compared as microsecond epochs (exact BIGINT in both engines).

    Scale: both windows and the final agg share one hash-partitioning on
    user_id — Catalyst plans a single exchange and sorts once. Per-user
    event counts are human-bounded, so no partition outgrows memory; a
    pathological robot user is the skew case AQE's skew-join/sort handling
    absorbs. This is also the batch shape whose streaming twin is
    ``session_window`` in Structured Streaming.
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > F.lit(_SESSION_GAP_US)),
            1,
        ).otherwise(0),
    )
    sessions = marked.withColumn("session_id", F.sum("is_new").over(w))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )


@query(
    "events_props_json",
    oracle="""
    SELECT
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
        / COUNT(*) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: extract a JSON property, aggregate it.

    Scale: get_json_object evaluates JVM-side inside codegen (no Python).
    On a real lakehouse the win is schema-on-read without a reload; if the
    props column stabilizes, promote it to a struct at ingest (parquet
    then prunes/pushes down into it — JSON strings can't).
    """
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            (F.sum("k").cast("double") / F.count(F.lit(1))).alias("avg_k"),
        )
    )


@query(
    "events_asof_join",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    )
    SELECT
      p.event_id,
      p.user_id,
      epoch_us(p.ts) AS purchase_ts_us,
      CAST(round(p.value*100) AS BIGINT) AS purchase_cents,
      epoch_us(c.ts) AS click_ts_us,
      epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase ↔ the latest click at-or-before it, per user.

    Spark has no ASOF JOIN operator (DuckDB does — the oracle uses it), so
    the plan composes one from a tagged union + running ``last(ignorenulls)``
    window: click rows carry their own timestamp, purchase rows carry null,
    and the running last over (user, time) is exactly "most recent click so
    far". Equal timestamps order click (kind 0) before purchase (kind 1),
    matching ASOF's >= bound.

    Scale: ONE shuffle on user_id + one sort — linear in events, versus the
    naive range-join (purchases × clicks per user, then max) which is
    quadratic in per-user activity. This is the pattern to reach for on any
    100 TB "latest state at time t" backfill.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts_us"),
        F.lit(0).alias("kind"),
        F.col("ts_us").alias("click_ts_us"),
        F.lit(None).cast("long").alias("event_id_p"),
        F.lit(None).cast("double").alias("value_p"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts_us"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("click_ts_us"),
        F.col("event_id").alias("event_id_p"),
        F.col("value").alias("value_p"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("last_click_us", F.last("click_ts_us", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select(
            F.col("event_id_p").alias("event_id"),
            "user_id",
            F.col("ts_us").alias("purchase_ts_us"),
            F.round(F.col("value_p") * 100).cast("long").alias("purchase_cents"),
            F.col("last_click_us").alias("click_ts_us"),
            (F.col("ts_us") - F.col("last_click_us")).alias("gap_us"),
        )
    )


_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000


@query(
    "events_attribution_window",
    oracle=f"""
    WITH purchases AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'purchase'
    ), views AS (
      SELECT user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id, p.ts_us AS purchase_ts_us,
           CAST(COUNT(v.ts_us) AS BIGINT) AS n_views_24h
    FROM purchases p
    LEFT JOIN views v
      ON v.user_id = p.user_id
     AND v.ts_us >= p.ts_us - {_DAY_US} AND v.ts_us < p.ts_us
    GROUP BY 1, 2, 3
    """,
)
def events_attribution_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution range join: for every purchase, how many views the same
    user made in the preceding 24 hours (half-open window — the purchase
    instant itself excluded). Purchases with zero prior views stay in the
    result with n_views_24h = 0.

    The as-of join above finds the single NEAREST predecessor; this is its
    ALL-rows-in-window sibling — the other half of the range-join family
    Spark lacks natively. The oracle states the semantics as DuckDB's
    native theta left-join; the Spark plan must NOT do that (per-user
    cartesian): it goes through operators/rangejoin.point_in_interval_join,
    which bands time into 24-hour buckets and equi-joins on (user, bucket)
    with the exact range as a residual filter — each 24-hour window overlaps
    at most 2 buckets, so the interval side carries a fixed ~2× replication
    and the join stays a hash join at any scale.

    Scale: two shuffles on (user_id, bucket) — linear in events — then one
    partial-agg'd count per purchase and a broadcast-or-shuffle join back
    for the zero-view purchases. At 100 TB nothing here is quadratic; the
    residual within-bucket skew (one user's views concentrated in one day)
    is AQE skew-join territory, same as any hot hash key.
    """
    from imdbmapreduce_spark.operators.rangejoin import point_in_interval_join

    def ev() -> DataFrame:
        # independent scans per side: sharing one lineage makes the
        # operator's p[k] == i[k] key a same-attribute comparison that
        # Spark resolves via self-join dedup but warns about
        # ("trivially true equals predicate"); two reads of the same
        # parquet keep the join keys unambiguous and cost nothing (the
        # scan would run once per side either way)
        return table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", F.unix_micros(F.col("ts")).alias("ts_us")
        )

    views = ev().filter(F.col("event_type") == "view").select("user_id", "ts_us")
    purchases = ev().filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts_us").alias("purchase_ts_us"),
        (F.col("ts_us") - F.lit(_DAY_US)).alias("w_start"),
        F.col("ts_us").alias("w_end"),
    )
    pairs = point_in_interval_join(
        views,
        purchases,
        keys=["user_id"],
        point_ts="ts_us",
        start="w_start",
        end="w_end",
        bucket=_DAY_US,
    )
    counts = pairs.groupBy("event_id").agg(F.count(F.lit(1)).alias("n_views_24h"))
    return purchases.join(counts, "event_id", "left").select(
        "event_id",
        "user_id",
        "purchase_ts_us",
        F.coalesce(F.col("n_views_24h"), F.lit(0)).cast("long").alias("n_views_24h"),
    )


@query(
    "sessions_during_error_spikes",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             LAG(epoch_us(ts)) OVER w AS prev_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    marked AS (
      SELECT *,
             CASE WHEN prev_us IS NULL
                       OR ts_us - prev_us > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM ordered
    ),
    sessions AS (
      SELECT user_id, event_id, ts_us,
             CAST(SUM(is_new) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id) AS BIGINT) AS session_id
      FROM marked
    ),
    sess AS (
      SELECT user_id, session_id,
             MIN(ts_us) AS s_start, MAX(ts_us) + 1 AS s_end
      FROM sessions GROUP BY 1, 2
    ),
    hourly AS (
      SELECT epoch_us(date_trunc('hour', ts)) AS h, COUNT(*) AS n_err
      FROM events WHERE event_type = 'error' GROUP BY 1
    ),
    thr AS (SELECT 1.5 * AVG(n_err) AS t FROM hourly),
    inc AS (SELECT h, n_err FROM hourly, thr WHERE n_err > t)
    SELECT i.h AS incident_start_us,
           CAST(i.n_err AS BIGINT) AS n_errors,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(DISTINCT s.user_id) AS BIGINT) AS n_users
    FROM inc i JOIN sess s
      ON s.s_start < i.h + {_HOUR_US} AND i.h < s.s_end
    GROUP BY 1, 2
    """,
)
def sessions_during_error_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blast-radius analysis via the banded INTERVAL-OVERLAP join: which
    user sessions were in flight during error-spike hours (hourly error
    count > 1.5× the hourly average), and how many users each incident
    touched.

    Session intervals are [start, end+1) (half-open; single-event
    sessions stay nonempty); incident intervals are the aligned error
    hours, derived with the q11 scalar-threshold pattern (one-row
    broadcast). The oracle states the overlap as DuckDB's native theta
    join; the Spark plan goes through
    operators/rangejoin.interval_overlap_join — both sides replicate
    into 1-hour bands and pairs are emitted exactly once in the
    overlap-start bucket, so the theta join is a hash join plus a
    residual filter at ANY scale.

    Scale: sessionization's one user_id exchange dominates; the overlap
    join shuffles session intervals (one row per session) and a handful
    of incident rows on the band key — keyless here, which is safe
    precisely because one side is tiny (incident hours); with both sides
    fact-sized you'd add a tenant/region key to the band. The session
    CTE text is duplicated from events_sessionization's oracle — keep
    them in lockstep if the gap rule changes.
    """
    from imdbmapreduce_spark.operators.rangejoin import interval_overlap_join

    sess = events_sessionization(spark, sf_dir).select(
        "user_id",
        "session_id",
        F.col("session_start_us").alias("s_start"),
        (F.col("session_end_us") + 1).alias("s_end"),
    )
    hourly = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .groupBy(F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("h"))
        .agg(F.count(F.lit(1)).alias("n_err"))
    )
    thr = hourly.agg((F.avg("n_err") * 1.5).alias("t"))
    inc = (
        hourly.join(F.broadcast(thr))
        .filter(F.col("n_err") > F.col("t"))
        .select(
            F.col("h").alias("h_start"),
            (F.col("h") + F.lit(_HOUR_US)).alias("h_end"),
            F.col("n_err").cast("long").alias("n_errors"),
        )
    )
    pairs = interval_overlap_join(
        sess,
        inc,
        keys=[],
        lstart="s_start",
        lend="s_end",
        rstart="h_start",
        rend="h_end",
        bucket=_HOUR_US,
    )
    return pairs.groupBy("h_start", "n_errors").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
    ).select(
        F.col("h_start").alias("incident_start_us"),
        "n_errors",
        "n_sessions",
        "n_users",
    )


_FUNNEL_STEPS = ("view", "click", "purchase")


@query(
    "events_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), s2 AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1 GROUP BY 1
    ), s3 AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2 GROUP BY 1
    )
    SELECT * FROM (
      SELECT 1 AS step_idx, 'view' AS step, COUNT(*) AS n_users FROM s1
      UNION ALL
      SELECT 2, 'click', COUNT(*) FROM s2
      UNION ALL
      SELECT 3, 'purchase', COUNT(*) FROM s3
    )
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who did view, THEN click, THEN
    purchase — each step strictly after their first completion of the
    previous one. Counts per step (classic product-analytics op; no
    reference analog, SURVEY §2.5).

    Plan: per step, an equi-join to the previous step's first-completion
    times + a min-aggregate on user_id. Every shuffle keys on user_id, so
    the three stages reuse one co-partitioning (AQE keeps them aligned);
    each step's input shrinks to the survivors of the previous step.
    The step timestamps are exact integer micros — min() is
    order-independent, so the result is partition-invariant.

    Each step's survivor table feeds BOTH its count row and the next
    step's join; Spark doesn't common-subexpression a twice-referenced
    DataFrame (the q21 finding), so unmaterialized the step chain
    re-derives every prefix — measured 6 fact scans for 3 steps.
    localCheckpoint pins each survivor set (per-user rows, shrinking per
    step) so the fact is scanned once per step.

    Scale: |steps| joins on a uniform key with monotonically shrinking
    build sides — the later steps broadcast for free once conversion
    decimates the audience.
    """
    from imdbmapreduce_spark.cache import stable_checkpoint

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    prev: DataFrame | None = None
    counts = []
    for idx, step in enumerate(_FUNNEL_STEPS, start=1):
        cur = ev.filter(F.col("event_type") == step)
        if prev is not None:
            cur = cur.join(prev, "user_id").filter(F.col("ts_us") > F.col("t_prev"))
        reached = cur.groupBy("user_id").agg(F.min("ts_us").alias("t_prev")).transform(stable_checkpoint)
        counts.append(
            reached.agg(
                F.lit(idx).alias("step_idx"),
                F.lit(step).alias("step"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
        prev = reached
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


@query(
    "events_distinct_exact",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           COUNT(*) AS n_events
    FROM events GROUP BY 1
    """,
)
def events_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type — the oracle-checked twin the
    HLL audit (:func:`events_approx_distinct`) measures itself against,
    the same exact/sketch pairing as ``events_heavy_hitters_exact`` /
    ``_sketch``.

    Scale: exact distinct is the expand + two-shuffle plan (partial
    distinct on (type, user), then the count per type) — correct at any
    scale but the exchange carries |type × user| rows; the sketch twin's
    exchange carries |types| fixed-size buffers. At 100 TB you pick per
    query; this row is the ground truth that says what the sketch's 2%
    rsd actually costs.
    """
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "events_approx_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           TRUE AS hll_within_5pct
    FROM events
    GROUP BY event_type
    """,
)
def events_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type via HyperLogLog++
    (`approx_count_distinct`, rsd 2%) audited against the exact count —
    the sketch every 100 TB pipeline uses where exact distinct is a full
    extra shuffle.

    HASH-CHECKED since round 7 (same treatment as
    ``approx_quantile_error``): the raw HLL estimate is engine-specific
    so it cannot be a hashed column, but whether it lands within the
    audited 5% band is a deterministic fact of this corpus — HLL adds
    and merges are commutative and the hash is fixed, so the estimate
    (and hence the verdict) is partition-order-independent. The oracle
    recomputes the exact side and pins TRUE; an estimate drifting out of
    band hashes as FALSE and fails the driver gate. The raw estimate's
    band is additionally locked per type in tests/test_events_extra.py.

    Scale: the sketch is a fixed few-KB buffer per group merged
    map-side — the exchange carries |groups| sketches instead of
    |groups|×|users| rows. Exact distinct (the column beside it) is the
    expand+two-shuffle plan; at 100 TB you pick per query.
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
            F.countDistinct("user_id").cast("long").alias("exact_users"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .select(
            "event_type",
            "exact_users",
            "n_events",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("hll_within_5pct"),
        )
    )


@query(
    "user_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY 1
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(day_offset AS BIGINT) AS day_offset,
           COUNT(*) AS n_users
    FROM activity
    WHERE day_offset <= 14
    GROUP BY 1, 2
    """,
)
def user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted
    on each later day they return (offsets 0..14) — the canonical
    product-analytics rollup.

    Plan: first-seen aggregate on user_id, joined back to activity (both
    exchanges share the user_id partitioning), distinct per (user,
    offset), then a small (cohort × offset) count.

    Scale: the join-back build side is one row per user; the distinct
    keys on (user, cohort, offset) — uniform; the final agg output is
    |days| × 15 rows regardless of input size.
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .filter(F.col("day_offset") <= 14)
        .distinct()
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.col("day_offset").cast("long").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


_ROLL_7D_US = 7 * 24 * 3600 * 1_000_000


@query(
    "events_rolling_7d",
    oracle=f"""
    WITH t AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
             CAST(round(value*100) AS BIGINT) AS vc
      FROM events
    )
    SELECT event_id, user_id, ts_us,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
           CAST(SUM(vc) OVER w AS BIGINT) AS sum_cents_7d
    FROM t
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN {_ROLL_7D_US} PRECEDING AND CURRENT ROW)
    QUALIFY event_type = 'purchase'
    """,
)
def events_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day per-user activity at every purchase — a RANGE-frame
    window (frame bounded by event-time distance, not row count), the
    rolling-feature shape behind fraud scores and engagement features.

    The frame is defined over exact microsecond epochs, so peer-row
    handling (equal timestamps share a frame) is identical cross-engine;
    sums are long cents. The purchase filter applies AFTER the window
    (QUALIFY / post-window filter) so the trailing stats still see every
    event type.

    Scale: one shuffle on user_id, then a per-user time-ordered scan with
    a sliding two-pointer frame — state is the in-frame aggregate, not
    the partition. user_id is high-cardinality and unskewed; at 100 TB
    this is the canonical windowed-feature backfill plan.
    """
    ev = table(spark, sf_dir, "events")
    t = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-_ROLL_7D_US, Window.currentRow)
    )
    return (
        t.withColumn("n_7d", F.count(F.lit(1)).over(w))
        .withColumn("sum_cents_7d", F.sum("vc").over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts_us", "n_7d", "sum_cents_7d")
    )


@query(
    "events_value_anomalies",
    oracle="""
    WITH t AS (
      SELECT event_id, event_type, CAST(round(value*100) AS BIGINT) AS vc
      FROM events
    ), stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(vc) AS BIGINT) AS s,
             CAST(SUM(vc*vc) AS BIGINT) AS ss
      FROM t GROUP BY 1
    )
    SELECT t.event_id, t.event_type, t.vc,
           CAST(t.n * t.vc - t.s AS DOUBLE)
             / sqrt(CAST(t.n * t.ss - t.s * t.s AS DOUBLE)) AS z
    FROM (SELECT t.*, st.n, st.s, st.ss FROM t JOIN stats st USING (event_type)) t
    WHERE CAST(t.n * t.vc - t.s AS DOUBLE) * CAST(t.n * t.vc - t.s AS DOUBLE)
          > 9 * CAST(t.n * t.ss - t.s * t.s AS DOUBLE)
    """,
)
def events_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers (|z| > 3) — the standardization /
    outlier-gate stage of a feature pipeline, with a gate that is
    deterministic cross-engine.

    The gate is ((v − mean)/σ)² > 9 cleared of divisions:
    (n·v − s)² > 9·(n·ss − s²), and the reported z is the matching
    dev/√var = (n·v − s)/√(n·ss − s²) = (v − mean)/σ exactly (the n in
    the numerator cancels the n² inside the variance term), so every
    flagged row shows |z| > 3. Both bracketed terms are EXACT int64
    (order-independent integer sums; n·v ≤ ~2e9, n·ss − s² ≤ ~1e18 at
    sf0.1); the square and the ×9 then run in double — identical IEEE
    operations on identical integers in both engines, so the kept row SET
    is bit-deterministic even where a float-summed variance would drift.
    (An earlier all-integer form multiplied both sides by another n and
    overflowed int64 — the comparison needs double headroom, not more
    integer factors.)

    Scale: one partial/final agg to |event_type| stat rows, broadcast
    back across the fact — the two-pass normalize-join shape; nothing
    driver-side, nothing sorted. Integer headroom: ss ≤ n·1e10 caps the
    exact path near n ≈ 1e8 rows per group; past that promote s/ss to
    DECIMAL(38) or center values per group first — same plan shape.
    """
    ev = table(spark, sf_dir, "events")
    t = ev.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    stats = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vc").alias("s"),
        F.sum(F.col("vc") * F.col("vc")).alias("ss"),
    )
    j = t.join(stats, "event_type")
    dev_d = (F.col("n") * F.col("vc") - F.col("s")).cast("double")
    var_d = (F.col("n") * F.col("ss") - F.col("s") * F.col("s")).cast("double")
    return (
        j.filter(dev_d * dev_d > F.lit(9.0) * var_d)
        .select(
            "event_id",
            "event_type",
            "vc",
            (dev_d / F.sqrt(var_d)).alias("z"),
        )
    )


_SALT_BUCKETS = 16


@query(
    "events_salted_type_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(MAX(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS max_cents
    FROM events
    GROUP BY 1
    """,
)
def events_salted_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation over a pathologically low-cardinality key (5 event
    types) whose physical shape is now STATS-DRIVEN (r9 verdict task 5
    — the CBO loop driving a standing query, not only the audit row):
    ``key_stats`` runs the ANALYZE pass on the grouping key and
    ``choose_agg_salting`` picks the plan — the explicit two-stage
    salted aggregate when some key's row count exceeds 2x a reducer's
    fair share (on the events table every type carries ~20% of rows,
    so the decision is ``salted``), the plain one-exchange GROUP BY
    otherwise (a unique key like event_id flips it to ``plain`` —
    pinned by tests/test_events_extra.py, which also pins the salt
    column in/out of the executed plan on each side).

    Catalyst's partial/final agg already defuses this particular skew
    (map-side combine leaves ≤|types| rows per task); the salted form is
    the pattern for aggregates where partials DON'T stay tiny —
    collect_set / count-distinct / percentile sketches on a hot key —
    and this query locks its exactness: every stat here is decomposable
    (count/sum/max merge associatively), so the result hash-matches the
    plain GROUP BY oracle bit-for-bit WHICHEVER plan the stats pick.

    Scale: the decision is O(K) driver arithmetic over K+1 collected
    stat rows (the ANALYZE artifact a warehouse maintains per table,
    amortized across every query on the key); when salted, stage 1's
    exchange spreads each hot key over 16 reducers and stage 2
    shuffles 16·|types| partial rows. Salt count scales with
    executor count, not data volume.
    """
    ev = table(spark, sf_dir, "events")
    vc = F.round(F.col("value") * 100).cast("long")
    return _stats_driven_key_stats(ev, "event_type", vc)


def _stats_driven_key_stats(ev: DataFrame, key: str, vc) -> DataFrame:
    """The stats-driven decomposable-stats aggregation behind
    :func:`events_salted_type_stats`, factored over (frame, key) so the
    flip test can run the identical planner path on a uniform-key frame
    and watch the decision change."""
    from imdbmapreduce_spark.stats import choose_agg_salting, key_stats

    decision, _hot = choose_agg_salting(key_stats(ev, key), _PLAN_PARTITIONS)
    if decision == "salted":
        salted = ev.select(
            F.col(key),
            vc.alias("vc"),
            F.pmod(F.hash("event_id"), F.lit(_SALT_BUCKETS)).alias("salt"),
        )
        partial = salted.groupBy(key, "salt").agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum("vc").alias("ps"),
            F.max("vc").alias("pm"),
        )
        return partial.groupBy(key).agg(
            F.sum("pn").alias("n_events"),
            F.sum("ps").alias("sum_cents"),
            F.max("pm").alias("max_cents"),
        )
    return ev.select(F.col(key), vc.alias("vc")).groupBy(key).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("vc").alias("sum_cents"),
        F.max("vc").alias("max_cents"),
    )


@query(
    "events_first_touch",
    oracle="""
    WITH t AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events
    ), m AS (
      SELECT user_id,
             min(struct_pack(ts_us := ts_us, event_id := event_id,
                             event_type := event_type)) AS f
      FROM t GROUP BY 1
    )
    SELECT user_id, f.ts_us AS first_ts_us, f.event_id AS first_event_id,
           f.event_type AS first_type
    FROM m
    """,
)
def events_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each user's earliest event, resolved as a
    single MIN over a (ts, event_id, type) struct — the arg-min shape.

    Struct comparison is lexicographic in both engines, and event_id is a
    unique tiebreaker, so the selected row is total-order deterministic
    even with equal timestamps — without the window-sort the row_number
    formulation pays.

    Scale: one partial/final agg holding a single struct per user —
    map-side combine reduces each partition to one candidate per user
    before the exchange, where a row_number window must shuffle and sort
    EVERY row per user. This is THE pattern for latest/earliest-record
    queries (dedup to newest version, session origin, first touch).
    """
    ev = table(spark, sf_dir, "events")
    t = ev.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "event_type",
    )
    first = t.groupBy("user_id").agg(
        F.min(F.struct("ts_us", "event_id", "event_type")).alias("f")
    )
    return first.select(
        "user_id",
        F.col("f.ts_us").alias("first_ts_us"),
        F.col("f.event_id").alias("first_event_id"),
        F.col("f.event_type").alias("first_type"),
    )


def _user_exact_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-user event counts — the shared subplan of the heavy-
    hitters pair (one partial/final agg, |users| rows), cached so the
    sketch audit and the exact twin never scan events twice in a sweep."""
    from imdbmapreduce_spark.cache import shared_cache

    return shared_cache(
        spark,
        ("events_user_counts", sf_dir),
        lambda: table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").cast("long").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("exact_cnt")),
    )


_HH_TOP = 64


def _top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact top-_HH_TOP users by count — ONE definition shared by
    the oracle-checked exact twin and the CMS audit, so the audited
    candidate set can never drift from the hash-verified one."""
    return (
        _user_exact_counts(spark, sf_dir)
        .orderBy(F.desc("exact_cnt"), F.asc("user_id"))
        .limit(_HH_TOP)
    )


@query(
    "events_heavy_hitters_exact",
    oracle=f"""
    WITH cnt AS (
      SELECT CAST(user_id AS BIGINT) AS user_id, COUNT(*) AS exact_cnt
      FROM events GROUP BY 1
    ), ranked AS (
      SELECT user_id, exact_cnt,
             CAST(ROW_NUMBER() OVER (ORDER BY exact_cnt DESC, user_id)
                  AS BIGINT) AS rnk
      FROM cnt
    )
    SELECT user_id, exact_cnt, rnk FROM ranked WHERE rnk <= {_HH_TOP}
    """,
)
def events_heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-64 (_HH_TOP) users by event count — the oracle-checked twin the
    Misra-Gries audit (events_heavy_hitters_sketch) references: its
    "exact_cnt" column is THIS aggregation (shared subplan), so the
    sketch's self-audit compares against an externally hash-verified
    exact side (r4 verdict item 6).

    Plan: one partial/final count agg, then a distributed top-k
    (orderBy + limit lowers to TakeOrderedAndProject — per-partition
    heaps, no global sort); the rank window runs over the surviving
    {top} rows only.

    Scale: this is the regime where the exact answer is affordable
    (|users| grouped rows); when the key domain itself doesn't fit, the
    sketch twin takes over — that division of labor is the point of
    registering them as a pair.
    """
    w = Window.orderBy(F.desc("exact_cnt"), F.asc("user_id"))
    return _top_users(spark, sf_dir).withColumn(
        "rnk", F.row_number().over(w).cast("long")
    )


@query("events_heavy_hitters_sketch")  # no SQL oracle: sketch internals;
# self-audited against the oracle-checked exact twin (shared subplan)
def events_heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries frequent users next to their exact counts, with the
    deterministic error bound surfaced and checked as a column — the
    frequent-items member of the sketch family (HLL distinct counts and
    KLL quantiles being the other two), audited the same way
    approx_quantile_error audits KLL.

    Columns: (user_id, est, exact_cnt, err, bound, within_bound). The
    sketch guarantees est <= exact <= est + bound, so within_bound is
    all-true by construction — surfacing it makes the driver's rows-only
    check a real audit, and tests/test_sketches.py locks the guarantee
    on an adversarially skewed corpus.

    Scale: the exact side is a groupBy on user_id (fine HERE — the user
    domain is small; the sketch exists for domains where it isn't). The
    sketch side moves only summary rows (partitions x k), never the
    fact. See operators/sketches.py for the merge math.
    """
    from imdbmapreduce_spark.operators.sketches import misra_gries

    ev = table(spark, sf_dir, "events")
    sk = misra_gries(ev, "user_id", k=64)
    # the exact side IS the oracle-checked twin's aggregation (shared
    # cache), so this audit's reference column is externally verified
    exact = _user_exact_counts(spark, sf_dir).select(
        F.col("user_id").alias("item"), "exact_cnt"
    )
    return (
        sk.join(exact, "item")
        .select(
            F.col("item").alias("user_id"),
            "est",
            "exact_cnt",
            (F.col("exact_cnt") - F.col("est")).alias("err"),
            "bound",
            (
                (F.col("est") <= F.col("exact_cnt"))
                & (F.col("exact_cnt") <= F.col("est") + F.col("bound"))
            ).alias("within_bound"),
        )
        .orderBy(F.desc("est"), "user_id")
    )


_CMS_D, _CMS_W = 4, 512


@query(
    "events_cms_audit",
    bench=True,
    oracle=f"""
    WITH cnt AS (
      SELECT CAST(user_id AS BIGINT) AS user_id, COUNT(*) AS exact_cnt
      FROM events GROUP BY 1
    ), ranked AS (
      SELECT user_id, exact_cnt,
             ROW_NUMBER() OVER (ORDER BY exact_cnt DESC, user_id) AS rnk
      FROM cnt
    )
    SELECT user_id, CAST(exact_cnt AS BIGINT) AS exact_cnt,
           TRUE AS never_undercounts,
           TRUE AS overcount_within_bound
    FROM ranked WHERE rnk <= {_HH_TOP}
    """,
)
def events_cms_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch audit — the overcounting dual completing the
    sketch family (HLL distinct / KLL quantiles / MG undercounting
    frequent items / CMS overcounting point queries). The CMS counter
    table is built from events.user_id in pure codegen (no Arrow lane,
    operators/sketches.py) and point-estimates the top-64 (_HH_TOP) exact heavy
    hitters.

    HASH-CHECKED since round 7 (the approx_quantile_error /
    events_approx_distinct treatment): CMS counters are sums under
    fixed hashes — deterministic and partition-order-independent — so
    while the raw estimates are not SQL-portable (xxhash64 family),
    the audit VERDICTS are deterministic facts the oracle pins TRUE:
    ``never_undercounts`` (est >= exact ALWAYS — collisions only add;
    a violation is an implementation bug) and ``overcount_within_bound``
    (min-over-rows overcount <= 5·N/w + 5, the same loose band
    tests/test_sketches.py locks, compared in exact integer arithmetic:
    w·overcount <= 5·N + 5·w). The exact column is the same shared
    aggregation the oracle-checked exact twin
    (events_heavy_hitters_exact) hash-verifies; raw est/overcount
    magnitudes stay pinned in tests/test_sketches.py.

    Scale: the fact never shuffles raw rows — the build exchanges at
    most d*w combined counters per map task and the counter table is
    d*w slim rows; estimation broadcasts it over the candidate list.
    """
    from imdbmapreduce_spark.operators.sketches import cms_estimate, count_min

    ev = table(spark, sf_dir, "events")
    # N enters the plan as a broadcast 1-row aggregate, not a driver
    # .count() — the builder stays lazy like every registered query
    # (an eager count would re-scan events once per bench pass).
    n_events = ev.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    cms = count_min(ev, "user_id", d=_CMS_D, w=_CMS_W)
    top = _top_users(spark, sf_dir)
    est = cms_estimate(
        cms, top.select(F.col("user_id").alias("item")), d=_CMS_D, w=_CMS_W
    )
    over = F.col("est") - F.col("exact_cnt")
    return (
        top.join(est, top.user_id == est.item)
        .crossJoin(F.broadcast(n_events))
        .select(
            "user_id",
            "exact_cnt",
            (F.col("est") >= F.col("exact_cnt")).alias("never_undercounts"),
            (
                F.lit(_CMS_W) * over <= F.lit(5) * F.col("_n") + F.lit(5 * _CMS_W)
            ).alias("overcount_within_bound"),
        )
        .orderBy(F.desc("exact_cnt"), F.asc("user_id"))
    )


@query(
    "user_state_history_scd2",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             epoch_us(ts) AS ts_us,
             event_id,
             LAG(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    changes AS (
      SELECT user_id, event_type, ts_us, event_id
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id,
           event_type AS state,
           ts_us AS valid_from_us,
           LEAD(ts_us) OVER w2 AS valid_to_us,
           CAST(LEAD(ts_us) OVER w2 IS NULL AS BOOLEAN) AS is_current,
           CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS version
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ORDER BY user_id, version
    """,
)
def user_state_history_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build: each user's event_type stream becomes
    versioned validity intervals — (state, valid_from, valid_to,
    is_current, version), half-open, gap-free, exactly one open row per
    user. The dimension-history shape every warehouse needs next to the
    SCD-1 upsert (customer_upsert_merge); the reference only ever keeps
    last-write-wins state (csv_to_ets.erl:27-53) — this is the general
    form that remembers.

    Plan: one window pass ordered by (ts, event_id) per user detects
    state changes (lag), a second numbers the surviving change rows and
    closes each interval with lead. Run-length compression first means
    the second window sorts only change rows, not the full stream.

    Scale: both windows partition by user_id — the same single shuffle
    key; Spark evaluates them in one Exchange + sort since the
    partitioning matches. Skewed users are bounded by their own event
    counts (no cross-user data movement); the deterministic (ts,
    event_id) tiebreak makes versions stable under any partitioning.
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select("user_id", "event_type", "ts_us", "event_id")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        changes.withColumn("valid_to_us", F.lead("ts_us").over(w2))
        .withColumn("is_current", F.col("valid_to_us").isNull())
        .withColumn("version", F.row_number().over(w2).cast("long"))
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts_us").alias("valid_from_us"),
            "valid_to_us",
            "is_current",
            "version",
        )
        .orderBy("user_id", "version")
    )


# OLS x-origin: fixed epoch (2024-01-01 UTC) — slope is invariant to x
# translation, the intercept is reported AT this origin, and a constant
# origin keeps the plan single-pass (a data-derived min would cost a scan).
_OLS_ORIGIN_US = 1_704_067_200_000_000


@query(
    "events_value_trend_ols",
    oracle=f"""
    WITH stats AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM((epoch_us(ts) - {_OLS_ORIGIN_US}) // 1000000) AS sx,
             SUM(CAST(round(value*100) AS BIGINT)) AS sy,
             SUM(((epoch_us(ts) - {_OLS_ORIGIN_US}) // 1000000)
                 * ((epoch_us(ts) - {_OLS_ORIGIN_US}) // 1000000)) AS sxx,
             SUM(((epoch_us(ts) - {_OLS_ORIGIN_US}) // 1000000)
                 * CAST(round(value*100) AS BIGINT)) AS sxy
      FROM events
      GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_events,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             AS slope_cents_per_sec,
           (CAST(sy AS DOUBLE)
            - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
              * CAST(sx AS DOUBLE))
           / CAST(n AS DOUBLE) AS intercept_cents
    FROM stats
    ORDER BY event_type
    """,
)
def events_value_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares trend of event value over time, computed
    from SUFFICIENT STATISTICS — the pattern for fitting millions of
    per-group models without per-group iteration: one partial/final agg
    accumulates (n, Σx, Σy, Σxx, Σxy) as exact int64 sums
    (order-independent under any partitioning), then slope/intercept are
    closed-form double expressions over those integers, bit-identical in
    DuckDB because both engines combine the SAME integers with the SAME
    IEEE operations.

    x = whole seconds since a fixed origin (slope is
    translation-invariant; the intercept is reported at the origin);
    y = exact value cents. Int64 bounds: |x| < 2^31 for a ±68-year span,
    y ≤ 2^31 cents, so Σxy < 2^62 up to ~1 rows-per-group — headroom
    documented rather than discovered.

    Scale: the exchange carries 5 longs per (task, group) — map-side
    combine makes the model fit as cheap as a COUNT(*). This is how
    regression/covariance/variance families distribute; iterative
    optimizers only appear when the model stops being closed-form
    (and then they look like pagerank_cosuppliers' loop).
    """
    ev = table(spark, sf_dir, "events")
    # floor (not truncate-toward-zero) matches DuckDB's // for pre-origin
    # timestamps too — negative x is valid, only the division must agree
    x = F.floor((F.unix_micros("ts") - F.lit(_OLS_ORIGIN_US)) / 1_000_000).cast("long")
    y = F.round(F.col("value") * 100).cast("long")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxxd, sxyd = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    slope = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
    return stats.select(
        "event_type",
        F.col("n").alias("n_events"),
        slope.alias("slope_cents_per_sec"),
        ((syd - slope * sxd) / nd).alias("intercept_cents"),
    ).orderBy("event_type")


@query(
    "events_distinct_sketch_rollup",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS hll_within_5pct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_distinct_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: build one Datasketches HLL sketch of
    distinct users PER (event_type, day), then merge the daily sketches
    with ``hll_union_agg`` into per-type totals — the incremental
    pattern where daily jobs persist a few-KB binary sketch and the
    monthly rollup unions sketches instead of rescanning the raw 100 TB.
    (``events_approx_distinct`` is the one-shot in-query sketch; this is
    the two-level materialize-then-merge form.)

    Driver check: sketch registers are engine-specific, so the surfaced
    columns are the exact distinct count plus a determinism-safe audit
    flag — whether the merged estimate lands within HLL's 5-sigma band
    (lgConfigK=14 → rse ≈ 0.81%, 5 % is >6 sigma; the estimate is a
    deterministic function of the input set, so the flag is stable).
    The raw estimate and merge-associativity (union of partials equals
    the direct whole-scan sketch) are pinned in tests/test_events_extra.py.

    Scale: level 1 exchanges |type × day| fixed-size sketches (map-side
    partial merge), level 2 exchanges |type| of them; distinct users per
    day never ship as rows. The exact column beside it is the
    expand+two-shuffle plan, present for the audit only — a production
    rollup would drop it and keep the sketch column as the stored
    artifact.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            "n_days",
            "exact_users",
            (
                F.abs(F.col("est_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("hll_within_5pct"),
        )
        .orderBy("event_type")
    )


@query(
    "events_props_variant",
    oracle="""
    SELECT event_type,
           COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
           COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_distinct_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured via Spark 4 VARIANT: ``parse_json`` decodes each
    props payload ONCE into the binary variant encoding; every downstream
    access is a typed ``try_variant_get`` path lookup on the decoded
    form. Contrast ``events_props_json`` (get_json_object), which
    re-parses the JSON string at every extraction site — with one
    accessed field they tie, but the variant form is the one that scales
    to wide semi-structured payloads accessed many times.

    At 100 TB the parse moves to ingest: materialize the variant column
    in the table, and readers pay only the path lookups (with shredded
    variant storage, parquet stats/pruning reach into it — the
    schema-on-read endgame get_json_object can never give).

    Scale: parse + extraction are JVM-side codegen; the agg is an
    ordinary partial/final on |event_type| groups; distinct-k rewrites
    to a two-phase agg exactly like any countDistinct.
    """
    ev = table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.countDistinct("k").alias("n_distinct_k"),
            F.sum("k").alias("sum_k"),
        )
        .orderBy("event_type")
    )


@query(
    "events_hourly_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT event_type,
             date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
      FROM events GROUP BY event_type
    ),
    grid AS (
      SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
      FROM bounds
    ),
    counts AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT g.event_type,
           epoch_us(g.hour) AS hour_us,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
    FROM grid g LEFT JOIN counts c USING (event_type, hour)
    ORDER BY g.event_type, hour_us
    """,
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a DENSE hourly series per event type —
    silent hours appear as explicit zero rows, the resample-and-fill
    step every downstream forecaster/alerter needs (a missing row and a
    zero row mean different things to a model).

    The dense timeline is GENERATED, not scanned: per-type (min, max)
    hour bounds from one agg, then ``sequence()`` + explode manufactures
    the grid — no calendar dimension table, no cross join (the grid
    derives keyed per type, so the plan lint's no-cartesian rule holds).
    The observed counts left-join onto the grid.

    Scale: bounds = |types| rows; the grid is |types| × |hours| — time-
    bounded, not data-bounded (a year is 8,760 rows/type whatever the
    corpus size); the count agg is the usual partial/final on
    (type, hour). The left join keys on the same pair — one slim
    exchange. Sequence explosion is per-row generation (codegen), safe
    unless a single type spans decades of hours, in which case chunk
    the span — the explode's fan-out is the one knob.
    """
    ev = table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    bounds = ev.groupBy("event_type").agg(
        F.min(hour).alias("lo"), F.max(hour).alias("hi")
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    counts = ev.groupBy("event_type", hour.alias("hour")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        grid.join(counts, ["event_type", "hour"], "left")
        .select(
            "event_type",
            F.unix_micros("hour").alias("hour_us"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        )
        .orderBy("event_type", "hour_us")
    )


_SKEW_KEYS = ("user_id", "event_type")


@query(
    "events_key_skew_profile",
    oracle="""
    WITH u AS (
      SELECT CAST(user_id AS VARCHAR) AS key, COUNT(*) AS c
      FROM events GROUP BY 1
    ), t AS (
      SELECT event_type AS key, COUNT(*) AS c FROM events GROUP BY 1
    ), pu AS (
      SELECT 'user_id' AS key_col, CAST(SUM(c) AS BIGINT) AS n_rows,
             COUNT(*) AS n_distinct, CAST(MAX(c) AS BIGINT) AS max_key_cnt
      FROM u
    ), pt AS (
      SELECT 'event_type' AS key_col, CAST(SUM(c) AS BIGINT) AS n_rows,
             COUNT(*) AS n_distinct, CAST(MAX(c) AS BIGINT) AS max_key_cnt
      FROM t
    ), unioned AS (
      SELECT * FROM pu UNION ALL SELECT * FROM pt
    )
    SELECT key_col, n_rows, n_distinct, max_key_cnt,
           max_key_cnt * 1000 // n_rows AS top1_permille,
           (n_rows + n_distinct - 1) // n_distinct AS avg_key_cnt_ceil,
           max_key_cnt * n_distinct // n_rows AS skew_factor
    FROM unioned ORDER BY key_col
    """,
)
def events_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution profiler — the diagnostic that DECIDES the skew
    strategy the engine's other plans apply (salting in
    events_salted_type_stats, AQE skew-split reliance elsewhere): per
    candidate shuffle key, cardinality, the hottest key's absolute and
    per-mille share, and skew_factor = hottest/average. A factor near 1
    means hash partitioning balances; tens-to-hundreds means one task
    owns the key and salting/AQE is mandatory. All ratios are integer
    divisions of exact counts (engine-portable, no float).

    Plan: one partial/final count agg per profiled key, then a 1-row
    reduction each — the per-key tables never leave the executors except
    as single combined rows. Profiling k keys is k scans here for
    clarity; a production profiler fuses them into one pass with
    grouping sets when the scan dominates.

    Scale: this is the cheap pre-flight a 100 TB pipeline runs before
    choosing join/agg strategies; its own shuffle is |distinct keys|
    combined rows, and the hot-key share it reports is exactly the
    number that predicts whether AQE's skew split (pinned in
    test_scale_claims) will fire.
    """
    ev = table(spark, sf_dir, "events")

    def profile(colname: str) -> DataFrame:
        cnt = ev.groupBy(F.col(colname).cast("string").alias("key")).agg(
            F.count(F.lit(1)).alias("c")
        )
        return cnt.agg(
            F.lit(colname).alias("key_col"),
            F.sum("c").alias("n_rows"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("max_key_cnt"),
        )

    prof = profile(_SKEW_KEYS[0])
    for k in _SKEW_KEYS[1:]:
        prof = prof.unionByName(profile(k))
    return prof.select(
        "key_col",
        "n_rows",
        "n_distinct",
        "max_key_cnt",
        F.expr("max_key_cnt * 1000 div n_rows").alias("top1_permille"),
        F.expr("(n_rows + n_distinct - 1) div n_distinct").alias("avg_key_cnt_ceil"),
        F.expr("max_key_cnt * n_distinct div n_rows").alias("skew_factor"),
    ).orderBy("key_col")


_SKEW_JOIN_SALT = 16


def _hot_key_predicate(key: str, hot_keys: list):
    """The hot/cold split predicate of :func:`salted_join`, aligned with
    how ``stats.key_stats`` nominated the keys: the MCV list is
    collected through ``cast("string")``, so membership is tested
    through the SAME cast on the column side. Pinned across native key
    types in tests/test_events_extra.py — the failure mode this closes
    (ADVICE r11) is a coerced native-vs-string IN matching nothing and
    silently degrading a 'salted' decision to the plain shuffle."""
    return F.col(key).cast("string").isin([str(k) for k in hot_keys])


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: list,
    buckets: int,
    fact_salt_col: str,
) -> DataFrame:
    """Skew-aware equi-join: salt the hot keys, union the remainder.

    ``hot_keys`` (a driver-read list, typically from
    :func:`events_key_skew_profile`'s counts) become an IN-list literal
    on both sides — the broadcast-the-hot-key-list pattern. Hot fact
    rows get a deterministic salt from ``fact_salt_col``; hot dim rows
    are replicated ``buckets`` times (one per salt), so the join key
    becomes (key, salt) and each hot key's rows spread over ``buckets``
    reducers instead of landing on one. Cold keys join plain. Both
    branches carry a shuffle_hash hint: the scenario this helper exists
    for is a dim too big to broadcast (at 100 TB a 100M-row dim is not
    broadcastable), so the plan modeled is the shuffle join.

    Exactness: replicating a dim row across every salt value its fact
    partner might carry is a pure rewrite of the equi-join — each
    (fact row, dim row) match pairs exactly once, under exactly one
    salt. The hash-match against the plain-join oracle
    (events_skewed_join_salted) pins it.

    Scale: dim-side cost is |hot dim rows| × buckets extra replicas —
    bounded because hot keys are by definition few. Salt count scales
    with executor count, not data volume; residual imbalance within a
    salted key is AQE territory.

    Type note (ADVICE r11): hot keys arrive as STRINGS — ``key_stats``
    collects its MCV list through a ``cast("string")`` — so the hot
    filter compares the join column through the SAME cast. A native
    ``isin`` would make Spark coerce the mixed comparison, and for
    non-string keys (bigint, decimal, timestamp) a failed coercion
    silently matches nothing: results stay correct (the cold branch
    joins everything) but the salted decision degenerates to the plain
    shuffle it was chosen to avoid. The string compare keeps the hot
    IN-list aligned with the statistics that nominated it; it lives
    only on the few-valued hot/cold split, never on the join key
    itself.
    """
    hot = _hot_key_predicate(key, hot_keys)
    fact_hot = fact.filter(hot).withColumn(
        "_salt", F.pmod(F.hash(fact_salt_col), F.lit(buckets))
    )
    dim_hot = dim.filter(hot).withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    joined_hot = fact_hot.join(dim_hot.hint("shuffle_hash"), [key, "_salt"]).drop(
        "_salt"
    )
    joined_cold = fact.filter(~hot).join(dim.filter(~hot).hint("shuffle_hash"), key)
    return joined_hot.unionByName(joined_cold)


@query(
    "events_skewed_join_salted",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(SUM(CAST(round(value*100) AS BIGINT)) // COUNT(*) AS BIGINT)
               AS type_avg_cents
      FROM events GROUP BY 1
    )
    SELECT e.event_id, e.event_type,
           CAST(round(e.value*100) AS BIGINT) AS cents,
           d.type_avg_cents,
           CAST(round(e.value*100) AS BIGINT) - d.type_avg_cents AS delta_cents
    FROM events e JOIN d USING (event_type)
    """,
)
def events_skewed_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-driven skew join — the JOIN consumer of the CBO loop
    (round 11, r10 verdict task 8; ``events_salted_type_stats`` is the
    aggregation twin): enriches every event with its type's average
    value (the fact ⨝ per-key-dim shape), but the join key is
    event_type — 5 distinct values, so a plain shuffle join lands 100%
    of a 100 TB fact table on ≤5 reducer tasks no matter how many
    executors exist.

    The physical shape is picked by :func:`imdbmapreduce_spark.stats.
    choose_join_strategy` from both sides' ANALYZE statistics (rows,
    NDV, MCV) — broadcast when the dim fits the budget, salted
    (:func:`salted_join`, {salt} buckets) when some key's ESTIMATED
    join output exceeds 2× a reducer's fair share, plain shuffle
    otherwise. This query models the dim-too-big-to-broadcast scenario
    (broadcast budget 0 — at 100 TB a 100M-row dim is not
    broadcastable), under which the events type key decides ``salted``
    with all hot types listed; a uniform high-cardinality key decides
    ``shuffle`` and a within-budget dim decides ``broadcast`` — all
    three pinned by tests/test_events_extra.py, the salt column in/out
    of the executed plan on each side of the flip. The ORACLE is the
    plain unsalted join — hash equality proves every routed shape is a
    lossless rewrite.
    """
    ev = table(spark, sf_dir, "events")
    vc = F.round(F.col("value") * 100).cast("long")
    fact = ev.select("event_id", "event_type", vc.alias("cents"))
    dim = fact.groupBy("event_type").agg(
        F.expr("sum(cents) div count(1)").cast("long").alias("type_avg_cents")
    )
    joined = _stats_driven_fact_dim_join(
        spark, fact, dim, "event_type", "event_id", broadcast_threshold_rows=0
    )
    return joined.select(
        "event_id",
        "event_type",
        "cents",
        "type_avg_cents",
        (F.col("cents") - F.col("type_avg_cents")).alias("delta_cents"),
    )


def _stats_driven_fact_dim_join(
    spark: SparkSession,
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_col: str,
    broadcast_threshold_rows: int,
) -> DataFrame:
    """The stats-driven join dispatch behind
    :func:`events_skewed_join_salted`, factored over (frames, key) so
    the flip test can run the identical planner path on uniform /
    skewed / broadcastable fixtures and watch all three decisions.
    ``key_stats`` runs the ANALYZE pass on both sides (K+1 driver rows
    each — the artifact a warehouse maintains per table); the decision
    is O(K) driver arithmetic, made BEFORE any join materializes."""
    from imdbmapreduce_spark.stats import choose_join_strategy, key_stats

    width = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    decision, hot = choose_join_strategy(
        key_stats(fact, key),
        key_stats(dim, key),
        width,
        broadcast_threshold_rows=broadcast_threshold_rows,
    )
    if decision == "broadcast":
        return fact.join(F.broadcast(dim), key)
    if decision == "salted":
        return salted_join(fact, dim, key, hot, _SKEW_JOIN_SALT, salt_col)
    return fact.join(dim.hint("shuffle_hash"), key)


events_skewed_join_salted.__doc__ = events_skewed_join_salted.__doc__.replace(
    "{salt}", str(_SKEW_JOIN_SALT)
)


@query(
    "events_rollup_incremental",
    oracle=f"""
    SELECT
      strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_start,
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the hourly rollup is
    REBUILT AS state + delta — events before a cutoff become the
    "yesterday's rollup" state (partial aggregates: count + exact cent
    sum per group), the tail re-aggregates as the delta, and the two
    merge by group-wise addition. The ORACLE is the plain full rollup:
    hash equality proves the incremental path is lossless — the
    associativity/commutativity property that makes a rollup
    incrementally maintainable at all (and the reason only
    sum/count/min/max-style states qualify; medians don't).

    The cutoff is derived from the data (start of the max-ts day) so the
    delta is a realistic "today's partition"; in production the state
    side is yesterday's PERSISTED rollup table and only the delta
    touches raw events — turning a 100 TB daily rescan into a
    |rollup| + |1 day| job. The streaming twin is the windowed
    aggregation's checkpointed state; this is the batch/backfill form.

    Scale: two partial/final aggs (each exchanging only group rows) and
    a group-keyed merge agg over 2×|groups| slim rows. No raw-fact
    shuffle anywhere.
    """
    ev = table(spark, sf_dir, "events")
    cutoff = ev.agg(F.date_trunc("day", F.max("ts")).alias("w")).first()["w"]
    bucket = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss")

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(bucket.alias("bucket_start"), "event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )

    state = rollup(ev.filter(F.col("ts") < F.lit(cutoff)))   # yesterday's table
    delta = rollup(ev.filter(F.col("ts") >= F.lit(cutoff)))  # today's partition
    return (
        state.unionByName(delta)
        .groupBy("bucket_start", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            (F.sum("cents").cast("double") / F.lit(100.0)).alias("sum_value"),
        )
    )


_FUNNEL = ("view", "click", "purchase")
_FUNNEL_WINDOW_US = 24 * 3600 * 1_000_000  # per-stage conversion window


@query(
    "events_funnel_conversion",
    oracle=f"""
    WITH v AS (
      SELECT user_id, MIN(epoch_us(ts)) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY 1
    ), c AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_view
        AND epoch_us(e.ts) <= v.t_view + {_FUNNEL_WINDOW_US}
      GROUP BY 1
    ), p AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click
        AND epoch_us(e.ts) <= c.t_click + {_FUNNEL_WINDOW_US}
      GROUP BY 1
    ), counts AS (
      SELECT (SELECT COUNT(*) FROM v) AS n_view,
             (SELECT COUNT(*) FROM c) AS n_click,
             (SELECT COUNT(*) FROM p) AS n_purchase
    )
    SELECT stage, n_users, conv_permille FROM (
      SELECT 1 AS ord, 'view' AS stage, CAST(n_view AS BIGINT) AS n_users,
             CAST(n_view * 1000 // n_view AS BIGINT) AS conv_permille FROM counts
      UNION ALL
      SELECT 2, 'click', CAST(n_click AS BIGINT),
             CAST(n_click * 1000 // n_view AS BIGINT) FROM counts
      UNION ALL
      SELECT 3, 'purchase', CAST(n_purchase AS BIGINT),
             CAST(n_purchase * 1000 // n_view AS BIGINT) FROM counts
    ) ORDER BY ord
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINDOWED ordered funnel: view → click → purchase, each stage
    strictly AFTER the previous stage's first occurrence AND within a
    24 h window of it, with per-mille conversion rates as exact integer
    divisions. The unwindowed twin is :func:`events_funnel` (any-time
    ordering, counts only); the conversion-window bound is the
    product-analytics default (Amplitude/Mixpanel) because unbounded
    funnels credit conversions that took months.

    Plan: each stage is a per-user MIN-timestamp aggregation of one
    event type, semi-joined against the previous stage with the
    ordering/window predicate — three aggs and two joins, ALL keyed on
    user_id, so Catalyst plans one partitioning reused across every
    stage (no re-shuffle between stages). The final stage counts are
    three scalar aggregates unioned into the funnel table.

    Scale: per-stage state is one row per surviving user (monotonically
    shrinking down the funnel); no window function touches the raw
    event stream, and the user_id keying is the same single shuffle the
    sessionization family already uses. Adding a stage is one more
    agg + join on the same key.
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )

    def stage(etype: str, prev: DataFrame | None) -> DataFrame:
        e = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            e = e.join(prev, "user_id").filter(
                (F.col("ts_us") > F.col("t_prev"))
                & (F.col("ts_us") <= F.col("t_prev") + _FUNNEL_WINDOW_US)
            )
        return e.groupBy("user_id").agg(F.min("ts_us").alias("t_prev"))

    v = stage("view", None)
    c = stage("click", v)
    p = stage("purchase", c)
    n_view = v.count()
    n_click = c.count()
    n_purchase = p.count()

    def permille(n: int) -> int | None:
        # NULL on an empty funnel head — matching DuckDB's x // 0 = NULL
        # in the oracle, instead of a driver ZeroDivisionError (review r5)
        return n * 1000 // n_view if n_view else None

    return spark.createDataFrame(
        [
            ("view", n_view, 1000 if n_view else None),
            ("click", n_click, permille(n_click)),
            ("purchase", n_purchase, permille(n_purchase)),
        ],
        "stage string, n_users long, conv_permille long",
    )


@query(
    "events_disorder_profile",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             MAX(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS high_water_us
      FROM events
    ), lateness AS (
      SELECT user_id, high_water_us - ts_us AS late_us FROM seq
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late,
           CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) * 1000 // COUNT(*)
                AS BIGINT) AS late_permille,
           CAST(MAX(late_us) AS BIGINT) AS max_late_us,
           CAST(SUM(late_us) AS BIGINT) AS sum_late_us
    FROM lateness
    """,
)
def events_disorder_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness profile: treating event_id as arrival order, how
    late do events arrive relative to each user's running event-time
    high-water mark? This single row — late-event share, worst and total
    lateness — is the number that SIZES a streaming watermark: the
    `withWatermark` delay in the streaming twins must exceed the
    observed lateness tail or the windowed aggregates silently drop
    those events, and the SCD-2 sink's in-order contract (streaming/
    upsert.py) is exactly `n_late == 0` on its feed.

    Plan: one running-max window per user (same single user_id exchange
    + sort as sessionization — Catalyst shares the partitioning), then
    one global aggregation of four exact integer measures.

    Scale: per-user state in the window is one long; the global agg is
    a partial/final reduction to one row. Lateness quantiles (p99 for a
    tight watermark) are one approx_percentile away on the same
    `late_us` column — kept exact-integer here so the oracle is
    bit-for-bit.
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late = ev.select((F.max("ts_us").over(w) - F.col("ts_us")).alias("late_us"))
    return late.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("late_us") > 0).cast("long")).alias("n_late"),
        F.expr("sum(cast(late_us > 0 as long)) * 1000 div count(1)").alias(
            "late_permille"
        ),
        F.max("late_us").alias("max_late_us"),
        F.sum("late_us").alias("sum_late_us"),
    )


# --- user-journey Markov chain: transition matrix + steady state ----------

_MC_SCALE = 1_000_000_000_000  # stationary mass in 1e-12 units (pagerank's)
_MC_ITERS = 12

# Shared CTE text: per-user lag pairs → transition counts. Both Markov
# oracles build on this one definition so the ordering key and pair
# filter can never silently diverge between them.
_TRANSITION_CTES = """seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS prev_type
      FROM events
    ), pairs AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    )"""


def _transition_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(prev_type, next_type, n): the transition-count matrix both
    Markov queries derive from — ONE user_id-partitioned lag window over
    the facts, then a |types|²-keyed aggregation."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "events_type_transitions",
    oracle=f"""
    WITH {_TRANSITION_CTES}
    SELECT prev_type, next_type, n,
           CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS row_total,
           CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type) AS p
    FROM pairs
    """,
)
def events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the user journey: for
    each ordered pair of event types, how often type B directly follows
    type A within a user's stream, and the row-normalized transition
    probability — the structure behind next-action prediction, journey
    visualization, and the steady-state analysis in
    :func:`events_type_stationary`.

    Determinism: event order within a user is (epoch_us, event_id) —
    total and engine-independent; probabilities are one double division
    of exact integers.

    Scale: one window partitioned by user_id (the same single exchange
    every per-user plan here shares; per-user streams are
    human-bounded), then an aggregation whose key space is
    |event_types|² — tiny, map-side combined. The probability window
    runs over that tiny matrix, not the facts.
    """
    pairs = _transition_pairs(spark, sf_dir)
    wm = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.sum("n").over(wm).alias("row_total"),
        (F.col("n").cast("double") / F.sum("n").over(wm)).alias("p"),
    )


def _stationary_oracle_sql(iters: int = _MC_ITERS) -> str:
    """Unrolled exact fixed-point power iteration over the event-type
    transition matrix — the PageRank oracle pattern (graph.py:202) on a
    row-stochastic chain: per round, pi_{t+1}(j) = Σ_i (pi_t(i)·n_ij) //
    n_i, every term an exact int64 multiply + truncating division."""
    rounds = []
    for t in range(1, iters + 1):
        rounds.append(
            f"""r{t} AS (
      SELECT m.next_type AS event_type,
             CAST(SUM((r.pi_fp * m.n) // m.row_total) AS BIGINT) AS pi_fp
      FROM m JOIN r{t - 1} r ON m.prev_type = r.event_type
      GROUP BY m.next_type
    )"""
        )
    chain = ",\n    ".join(rounds)
    return f"""
    WITH {_TRANSITION_CTES}, m AS (
      SELECT prev_type, next_type, n,
             CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS row_total
      FROM pairs
    ), states AS (
      SELECT DISTINCT prev_type AS event_type FROM m
    ), r0 AS (
      SELECT event_type,
             CAST({_MC_SCALE} // (SELECT COUNT(*) FROM states) AS BIGINT)
               AS pi_fp
      FROM states
    ),
    {chain}
    SELECT event_type, pi_fp FROM r{iters}
    """


@query("events_type_stationary", oracle=_stationary_oracle_sql())
def events_type_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state distribution of the user-journey Markov chain: where
    a user's session settles in the long run — the "gravity" of each
    event type, read directly off the transition matrix by exact
    fixed-point power iteration (the third iterative-algorithm instance
    after PageRank and k-means, reusing PageRank's determinism
    contract: mass in 1e-12 int64 units, truncating division per edge,
    order-independent integer sums, bit-identical on any partitioning
    and in DuckDB's unrolled CTE recurrence).

    Plan: the transition matrix (|types|² rows) is computed ONCE from
    one user_id-partitioned window pass — that distributed pass is the
    only data-sized work. The matrix is then PROVABLY tiny (event-type
    vocabularies are bounded by product design, not corpus size), so it
    collects to the driver and the {iters} rounds iterate in memory —
    the same fits-on-driver venue judgment as the BPE merge loop and
    k-means centroids; paying 12 cluster-wide job round-trips to
    multiply a 5×5 matrix would be scheduling theater. Python's ``//``
    on the non-negative operands here matches Spark's ``div`` and
    DuckDB's ``//``, so the unrolled-CTE oracle reproduces every unit.
    The chain on event types is irreducible in practice; if a row were
    absorbing, its mass simply accumulates — still exact.

    Scale: the fact window is the whole cost (shared shape with
    sessionization); the iteration is O(|types|²) per round — constant
    for any corpus size. For state spaces that DO grow with the data
    (e.g. per-page chains), the distributed form is
    :func:`imdbmapreduce_spark.operators.graph.pagerank`'s loop shape.
    """
    m = (
        _transition_pairs(spark, sf_dir)
        .withColumn(
            "row_total", F.sum("n").over(Window.partitionBy("prev_type"))
        )
        .collect()
    )
    states = sorted({r.prev_type for r in m})
    pi = {s: _MC_SCALE // len(states) for s in states}
    for _ in range(_MC_ITERS):
        nxt: dict[str, int] = {}
        for r in m:
            if r.prev_type in pi:
                nxt[r.next_type] = (
                    nxt.get(r.next_type, 0) + (pi[r.prev_type] * r.n) // r.row_total
                )
        pi = nxt
    return spark.createDataFrame(
        sorted(pi.items()), "event_type string, pi_fp long"
    )


# --- CUSUM drift detection (sequential per-user state) --------------------

_CUSUM_K = 7_500  # reference value (cents): drift accumulates above this
_CUSUM_H = 20_000  # alarm threshold (cents); detector resets after firing


_CUSUM_ORACLE = f"""
    WITH RECURSIVE seq AS (
      SELECT user_id, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) AS BIGINT) AS r
      FROM events
    ), cus AS (
      SELECT user_id, event_id, r,
             GREATEST(0, cents - {_CUSUM_K}) AS cusum,
             GREATEST(0, cents - {_CUSUM_K}) >= {_CUSUM_H} AS alarm,
             CASE WHEN GREATEST(0, cents - {_CUSUM_K}) >= {_CUSUM_H}
                  THEN 0 ELSE GREATEST(0, cents - {_CUSUM_K}) END AS carry
      FROM seq WHERE r = 1
      UNION ALL
      SELECT n.user_id, n.event_id, n.r,
             GREATEST(0, c.carry + n.cents - {_CUSUM_K}) AS cusum,
             GREATEST(0, c.carry + n.cents - {_CUSUM_K}) >= {_CUSUM_H} AS alarm,
             CASE WHEN GREATEST(0, c.carry + n.cents - {_CUSUM_K}) >= {_CUSUM_H}
                  THEN 0
                  ELSE GREATEST(0, c.carry + n.cents - {_CUSUM_K}) END AS carry
      FROM cus c JOIN seq n ON n.user_id = c.user_id AND n.r = c.r + 1
    )
    SELECT user_id, event_id, r, cusum, alarm FROM cus
    """


@query("events_cusum_alarms", oracle=_CUSUM_ORACLE)
def events_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection per user: the classic sequential
    statistic S_t = max(0, S_(t-1) + x_t − K) with an alarm at S ≥ H
    and restart after firing — the change-point detector a spend/abuse
    monitor runs per account. This is the genuinely ORDER-DEPENDENT
    per-key recurrence (unlike sums/windows) that motivates the
    ``applyInPandas`` escape hatch: no built-in window expresses it.

    Determinism: x is the engine-wide cents quantization (exact int64);
    event order per user is the total (epoch_us, event_id) order; the
    whole recurrence is integer max/add — bit-identical in the Arrow
    lane, in pure Python, and in DuckDB's RECURSIVE CTE (the oracle —
    recursion depth = the per-user stream length, each step one
    integer-keyed join).

    Plan (r12 optimization, guide §4.1/§4.2): cents computed JVM-side
    (codegen); ONE shuffle on user_id + a partition sort on (user_id,
    ts_us, event_id), then a ``mapInPandas`` lane walks whole
    PARTITIONS — group boundaries found vectorized on the sorted
    user_id column, users spanning Arrow-batch edges carried over to
    the next batch. The previous ``applyInPandas`` form paid one pandas
    DataFrame construction + per-group sort per USER (~10k tiny groups
    at sf0.1): measured 2.7 s → 0.43 s median warm at sf0.1/local[32]
    with identical output
    (plans/r12/events_cusum_alarms_{before,after}.txt — the
    FlatMapGroupsInPandas node becomes Sort + MapInPandas). The Python
    loop is O(events) integer ops over already-batched columns. A robot
    user (the skew case) is one oversized group either way — cap or
    bisect-by-session upstream; AQE cannot split a single key.

    Scale: state is one int per live key — the streaming twin would be
    ``applyInPandasWithState`` with identical per-batch code (the batch
    form here IS the backfill/replay path a production detector needs
    for reprocessing); output is one row per event, written alongside
    the fact table as a derived column family. Per-group Python
    overhead now amortizes over the ~10k-row Arrow batch instead of
    the ~10-row user group — the §4 fix that matters more, not less,
    when groups stay human-sized as the corpus grows.
    """
    import numpy as np
    import pandas as pd

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )

    def _run(body: "pd.DataFrame") -> "pd.DataFrame":
        """CUSUM over a block of complete users (sorted by user_id,
        ts_us, event_id)."""
        uid = body["user_id"].to_numpy()
        n = len(uid)
        out_r = np.empty(n, dtype=np.int64)
        out_s = np.empty(n, dtype=np.int64)
        out_a = np.empty(n, dtype=bool)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], n]
        cl = body["cents"].tolist()
        for g0, g1 in zip(starts.tolist(), ends.tolist()):
            s = 0
            for i in range(g0, g1):
                s = max(0, s + cl[i] - _CUSUM_K)
                alarm = s >= _CUSUM_H
                out_r[i] = i - g0 + 1
                out_s[i] = s
                out_a[i] = alarm
                if alarm:
                    s = 0
        return pd.DataFrame(
            {
                "user_id": uid,
                "event_id": body["event_id"].to_numpy(),
                "r": out_r,
                "cusum": out_s,
                "alarm": out_a,
            }
        )

    def cusum_parts(batches):
        # the last user of each batch may continue in the next one:
        # hold its rows back (pend) and prepend them to the next batch
        pend = None
        for pdf in batches:
            if pend is not None and len(pend):
                pdf = pd.concat([pend, pdf], ignore_index=True)
            uid = pdf["user_id"]
            cut = int(uid.searchsorted(uid.iat[-1], side="left"))
            pend = pdf.iloc[cut:]
            if cut:
                yield _run(pdf.iloc[:cut])
        if pend is not None and len(pend):
            yield _run(pend)

    return (
        ev.repartition("user_id")
        .sortWithinPartitions("user_id", "ts_us", "event_id")
        .mapInPandas(
            cusum_parts,
            "user_id long, event_id long, r long, cusum long, alarm boolean",
        )
    )


# --- position-based multi-touch attribution ---------------------------------

_MTA_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7-day lookback
_MTA_TOTAL_BP = 10_000  # credit per conversion, basis points
_MTA_EDGE_BP = 4_000  # first- and last-touch shares (U-shaped 40/20/40)


@query(
    "events_multitouch_attribution",
    oracle=f"""
    WITH conv AS (
      SELECT event_id AS conversion_id, user_id, epoch_us(ts) AS c_us
      FROM events WHERE event_type = 'purchase'
    ), touch AS (
      SELECT user_id, event_id AS touch_event_id, event_type AS touch_type,
             epoch_us(ts) AS t_us
      FROM events WHERE event_type IN ('view', 'click')
    ), joined AS (
      SELECT c.conversion_id, c.user_id, t.touch_event_id, t.touch_type,
             t.t_us
      FROM conv c JOIN touch t
        ON c.user_id = t.user_id
       AND t.t_us < c.c_us AND t.t_us >= c.c_us - {_MTA_WINDOW_US}
    ), ranked AS (
      SELECT *,
             CAST(ROW_NUMBER() OVER (PARTITION BY conversion_id
                                     ORDER BY t_us, touch_event_id)
                  AS BIGINT) AS position,
             CAST(COUNT(*) OVER (PARTITION BY conversion_id) AS BIGINT) AS n_touches
      FROM joined
    )
    SELECT conversion_id, user_id, touch_event_id, touch_type, position,
           n_touches,
           CAST(CASE
             WHEN n_touches = 1 THEN {_MTA_TOTAL_BP}
             WHEN n_touches = 2 THEN {_MTA_TOTAL_BP} // 2
             WHEN position = 1 OR position = n_touches THEN {_MTA_EDGE_BP}
             ELSE ({_MTA_TOTAL_BP} - 2 * {_MTA_EDGE_BP}) // (n_touches - 2)
                  + CASE WHEN position = 2
                         THEN ({_MTA_TOTAL_BP} - 2 * {_MTA_EDGE_BP})
                              % (n_touches - 2)
                         ELSE 0 END
           END AS BIGINT) AS credit_bp
    FROM ranked
    """,
)
def events_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: every purchase
    distributes exactly {_MTA_TOTAL_BP} basis points of credit over the
    user's view/click touchpoints in the preceding 7 days — 40% to the
    first touch, 40% to the last, the middle 20% split evenly (integer
    division; the remainder goes to the EARLIEST middle touch, a stated
    deterministic rule rather than a float split). Single-touch
    conversions take all 10000 bp; two-touch split 5000/5000. Extends
    first-touch (:func:`events_first_touch`) and last-click
    (`events_attribution_window`) with the credit model marketing
    pipelines actually reconcile revenue against.

    Determinism: credit is pure integer arithmetic summing EXACTLY to
    {_MTA_TOTAL_BP} per conversion (pinned in tests); touch order is
    (ts, event_id) — total. No floats anywhere.

    Scale: the conversion-touch join keys on user_id (per-user activity
    is human-bounded — the same argument as sessionization; a bot-user
    hot key is AQE skew-split territory), then ONE window pair
    (row_number + count) partitioned by conversion_id, cardinality =
    conversions. For window-heavy variants at extreme fan-out, the
    banded range join (operators/rangejoin.py) swaps in as the
    candidate generator.
    """
    ev = table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conversion_id"),
        "user_id",
        F.unix_micros("ts").alias("c_us"),
    )
    touch = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_id").alias("touch_event_id"),
        F.col("event_type").alias("touch_type"),
        F.unix_micros("ts").alias("t_us"),
    )
    joined = conv.join(touch, "user_id").filter(
        (F.col("t_us") < F.col("c_us"))
        & (F.col("t_us") >= F.col("c_us") - _MTA_WINDOW_US)
    )
    wpos = Window.partitionBy("conversion_id").orderBy("t_us", "touch_event_id")
    wall = Window.partitionBy("conversion_id")
    ranked = joined.withColumn(
        "position", F.row_number().over(wpos).cast("long")
    ).withColumn("n_touches", F.count(F.lit(1)).over(wall).cast("long"))
    mid_total = _MTA_TOTAL_BP - 2 * _MTA_EDGE_BP
    credit = (
        F.when(F.col("n_touches") == 1, F.lit(_MTA_TOTAL_BP))
        .when(F.col("n_touches") == 2, F.lit(_MTA_TOTAL_BP // 2))
        .when(
            (F.col("position") == 1) | (F.col("position") == F.col("n_touches")),
            F.lit(_MTA_EDGE_BP),
        )
        .otherwise(
            F.expr(f"{mid_total} div (n_touches - 2)")
            + F.when(
                F.col("position") == 2,
                F.expr(f"{mid_total} % (n_touches - 2)"),
            ).otherwise(F.lit(0))
        )
    )
    return ranked.select(
        "conversion_id",
        "user_id",
        "touch_event_id",
        "touch_type",
        "position",
        "n_touches",
        credit.cast("long").alias("credit_bp"),
    )


# --- estimate-driven join planning (the CBO loop, closed) -------------------

# Modeled cluster for the planning decision — FIXED constants, not the
# session conf, so the decision is a pure function of the data and the
# oracle reproduces it (the session's actual partition count varies by
# harness: 8 in driver_sim, 32 in tests).
_PLAN_PARTITIONS = 32
_PLAN_BCAST_ROWS = 1000


def _ejed_oracle() -> str:
    from imdbmapreduce_spark.stats import EST_SCALE, MCV_K

    S, K = EST_SCALE, MCV_K
    return f"""
    WITH tc AS (
      SELECT event_type AS k, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ), uc AS (
      SELECT CAST(user_id AS VARCHAR) AS k, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ), tstat AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS d FROM tc
    ), ustat AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS d FROM uc
    ), tmcv AS (
      SELECT k, c FROM (
        SELECT k, c, row_number() OVER (ORDER BY c DESC, k ASC) AS rn FROM tc
      ) WHERE rn <= {K}
    ), umcv AS (
      SELECT k, c FROM (
        SELECT k, c, row_number() OVER (ORDER BY c DESC, k ASC) AS rn FROM uc
      ) WHERE rn <= {K}
    ),
    -- self-join estimate per keyed side: MCV exact + uniform tail
    -- (qdiv spelled divisor-first: q*S + (r*S)//den, the audit's rule)
    uagg AS (
      SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM umcv) AS mcv_rows,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM umcv) AS mcv_k,
             (SELECT CAST(SUM(c*c) AS BIGINT) FROM umcv) AS mcv_s2,
             n, d
      FROM ustat
    ), tagg AS (
      SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM tmcv) AS mcv_rows,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM tmcv) AS mcv_k,
             (SELECT CAST(SUM(c*c) AS BIGINT) FROM tmcv) AS mcv_s2,
             n, d
      FROM tstat
    ), uest AS (
      SELECT mcv_s2 * {S}
             + CASE WHEN d - mcv_k > 0 THEN
                 ((n - mcv_rows) * (n - mcv_rows) // (d - mcv_k)) * {S}
                 + (((n - mcv_rows) * (n - mcv_rows) % (d - mcv_k)) * {S})
                   // (d - mcv_k)
               ELSE 0 END AS est_q,
             n, d
      FROM uagg
    ), test_ AS (
      SELECT mcv_s2 * {S}
             + CASE WHEN d - mcv_k > 0 THEN
                 ((n - mcv_rows) * (n - mcv_rows) // (d - mcv_k)) * {S}
                 + (((n - mcv_rows) * (n - mcv_rows) % (d - mcv_k)) * {S})
                   // (d - mcv_k)
               ELSE 0 END AS est_q,
             n, d
      FROM tagg
    ),
    -- type_dim: every fact MCV key hits the 1-row dim MCV exactly
    dest AS (SELECT n * {S} AS est_q, n, d FROM tstat),
    truth AS (
      SELECT 'type_dim' AS join_name,
             (SELECT CAST(SUM(c) AS BIGINT) FROM tc) AS true_rows
      UNION ALL
      SELECT 'type_self', (SELECT CAST(SUM(c*c) AS BIGINT) FROM tc)
      UNION ALL
      SELECT 'user_self', (SELECT CAST(SUM(c*c) AS BIGINT) FROM uc)
    ),
    plans AS (
      SELECT 'type_dim' AS join_name,
             t.n AS fact_n, t.d AS fact_d, t.d AS dim_n, t.d AS dim_d,
             e.est_q,
             GREATEST((e.est_q // {S}) // {_PLAN_PARTITIONS}, 1) AS fair,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM tmcv
              WHERE c * 1 * {S} >
                    2 * GREATEST((e.est_q // {S}) // {_PLAN_PARTITIONS}, 1)
                      * {S}) AS n_hot
      FROM tstat t, dest e
      UNION ALL
      SELECT 'type_self', t.n, t.d, t.n, t.d, e.est_q,
             GREATEST((e.est_q // {S}) // {_PLAN_PARTITIONS}, 1),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM tmcv
              WHERE c * c * {S} >
                    2 * GREATEST((e.est_q // {S}) // {_PLAN_PARTITIONS}, 1)
                      * {S})
      FROM tstat t, test_ e
      UNION ALL
      SELECT 'user_self', u.n, u.d, u.n, u.d, e.est_q,
             GREATEST((e.est_q // {S}) // {_PLAN_PARTITIONS}, 1),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM umcv
              WHERE c * c * {S} >
                    2 * GREATEST((e.est_q // {S}) // {_PLAN_PARTITIONS}, 1)
                      * {S})
      FROM ustat u, uest e
    )
    SELECT p.join_name, p.fact_n, p.fact_d, p.dim_n, p.dim_d, p.est_q,
           t.true_rows,
           GREATEST(CAST(p.est_q AS DOUBLE) / {S} / t.true_rows,
                    CAST(t.true_rows AS DOUBLE) * {S} / p.est_q) AS q_error,
           p.n_hot,
           CASE WHEN p.dim_n <= {_PLAN_BCAST_ROWS} THEN 'broadcast'
                WHEN p.n_hot > 0 THEN 'salted'
                ELSE 'shuffle' END AS decision
    FROM plans p JOIN truth t USING (join_name)
    ORDER BY join_name
    """


@query("events_join_estimate_driven", oracle=_ejed_oracle())
def events_join_estimate_driven(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CBO loop, CLOSED (r8 verdict task 6): the end-biased MCV
    estimator that ``join_cardinality_estimate_audit`` validated now
    DRIVES the join-strategy decision, via
    :mod:`imdbmapreduce_spark.stats` — ``key_stats`` (the ANALYZE pass),
    ``estimate_join_size`` (four-term MCV decomposition), and
    ``choose_join_strategy`` (broadcast / salted / shuffle). One row per
    candidate join shape over the events table:

    - ``type_dim``  (events ⋈ 5-row type dim): tiny dim → broadcast —
      the case Spark's static byte threshold also gets right;
    - ``type_self`` (events ⋈ events ON event_type): the dim side is
      NOT broadcastable and the key has 5 distinct values — a plain
      shuffle join lands ~20% of the output on ONE reducer no matter
      how many executors exist, yet Spark's static rule picks exactly
      that plan. The estimator sees every type's c² output share exceed
      2× the fair share → ``salted``, with the hot-key list feeding
      :func:`salted_join` (tests/test_events_extra.py pins that the
      estimate-driven plan's worst (key, salt) group beats the static
      plan's worst group by ~the salt factor);
    - ``user_self`` (events ⋈ events ON user_id): high-cardinality
      uniform key → no estimated straggler → plain ``shuffle`` (at the
      smallest sf the events table itself fits the broadcast budget and
      the decision flips to broadcast — the oracle reproduces whichever
      the stats imply).

    Columns: stats (fact_n/fact_d/dim_n/dim_d), the 1e-6-quantized
    estimate, the EXACT true join size (one count-agg, no join
    executed), q_error, the estimated hot-key count, and the decision.
    Decision inputs are fixed model constants (_PLAN_PARTITIONS=32,
    _PLAN_BCAST_ROWS=1000), not session conf, so the whole row set is a
    pure integer function of the data — hash-checked against a DuckDB
    oracle that replays the estimator arithmetic verbatim.

    Scale: the stats are K+2 driver rows per side (ANALYZE artifacts a
    warehouse maintains anyway); truth is one group-by per key. The
    decision itself is O(K) driver arithmetic — the point: at 100 TB
    you pick the join strategy from statistics, not by materializing
    the bad shuffle first.
    """
    from imdbmapreduce_spark.stats import (
        EST_SCALE,
        KeyStats,
        choose_join_strategy,
        estimate_hot_keys,
        estimate_join_size,
        key_stats,
    )

    ev = table(spark, sf_dir, "events")
    fact_type = key_stats(ev, "event_type")
    fact_user = key_stats(ev, "user_id")
    dim_type = KeyStats(
        n_rows=fact_type.n_distinct,
        n_distinct=fact_type.n_distinct,
        mcv=tuple(sorted((k, 1) for k, _ in fact_type.mcv)),
    )
    true_type_self = sum(c * c for _, c in fact_type.mcv)  # d <= K: exact
    tr = (
        ev.groupBy(F.col("user_id").cast("string").alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).alias("s2"))
        .first()
    )
    true_user_self = int(tr["s2"])

    rows = []
    for name, a, b, true_rows in [
        ("type_dim", fact_type, dim_type, fact_type.n_rows),
        ("type_self", fact_type, fact_type, true_type_self),
        ("user_self", fact_user, fact_user, true_user_self),
    ]:
        est_q = estimate_join_size(a, b)
        # n_hot is REPORTED for every join shape (broadcast included) —
        # the audit wants the skew estimate even where no salting runs
        fair = max((est_q // EST_SCALE) // _PLAN_PARTITIONS, 1)
        n_hot = len(estimate_hot_keys(a, b, fair))
        # the registered decision IS the planner API's — no inline copy
        decision, _ = choose_join_strategy(a, b, _PLAN_PARTITIONS, _PLAN_BCAST_ROWS)
        rows.append(
            (name, a.n_rows, a.n_distinct, b.n_rows, b.n_distinct,
             est_q, true_rows, n_hot, decision)
        )
    out = spark.createDataFrame(
        rows,
        "join_name string, fact_n long, fact_d long, dim_n long, dim_d long,"
        " est_q long, true_rows long, n_hot long, decision string",
    )
    return out.select(
        "join_name", "fact_n", "fact_d", "dim_n", "dim_d", "est_q",
        "true_rows",
        F.greatest(
            F.col("est_q").cast("double") / EST_SCALE / F.col("true_rows"),
            F.col("true_rows").cast("double") * EST_SCALE / F.col("est_q"),
        ).alias("q_error"),
        "n_hot",
        "decision",
    ).orderBy("join_name")


# --- k-anonymity audit (data-governance vertical) ---------------------------

_KA_K = 5  # the anonymity bar the audit scores against
_KA_PPM = 1_000_000


@query(
    "events_k_anonymity_audit",
    oracle=f"""
    WITH q AS (
      SELECT event_type,
             CAST(hour(ts) AS BIGINT) AS hr,
             user_id % 100 AS cohort
      FROM events
    ), levels AS (
      SELECT 0 AS level, event_type, hr, cohort FROM q
      UNION ALL
      SELECT 1 AS level, event_type, hr, NULL FROM q
      UNION ALL
      SELECT 2 AS level, event_type, NULL, NULL FROM q
    ), classes AS (
      SELECT level, CAST(COUNT(*) AS BIGINT) AS sz
      FROM levels GROUP BY level, event_type, hr, cohort
    )
    SELECT level,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MIN(sz) AS BIGINT) AS min_class_size,
           CAST(SUM(CASE WHEN sz < {_KA_K} THEN sz ELSE 0 END) AS BIGINT)
             AS rows_below_k,
           CAST(SUM(CASE WHEN sz < {_KA_K} THEN sz ELSE 0 END) * {_KA_PPM}
                // SUM(sz) AS BIGINT) AS ppm_below_k
    FROM classes
    GROUP BY level
    """,
)
def events_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit under a generalization ladder — the
    data-governance measurement a training pipeline runs before
    releasing event-derived features (the structural complement to
    doc_pii_scrub's content-level scrubbing): every row's
    quasi-identifier tuple (event_type, hour-of-day, user cohort) forms
    equivalence classes; a row in a class smaller than k={_KA_K} is
    re-identifiable. Three generalization levels (full QI → drop the
    cohort → drop the hour) produce the decision table: how much
    generalization buys how much anonymity (min class size, rows and
    ppm below the bar per level — suppress, generalize further, or
    release).

    All-integer output (counts and a truncating-division ppm), so the
    audit is exact cross-engine — no float rates.

    Scale: the ladder is one union of three grouped counts (Catalyst
    shares the scan), each a partial/final agg on a bounded-cardinality
    QI key (|types| x 24 x 100 at the widest); the per-level rollup
    runs on class-count-sized frames. No joins, no windows, no skew
    (class keys are the audit's SUBJECT — a hot class is a large sz
    value, not a hot shuffle key, because the combine happens
    map-side).
    """
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("long").alias("hr"),
        (F.col("user_id") % 100).alias("cohort"),
    )
    levels = (
        ev.select(F.lit(0).alias("level"), "event_type", "hr", "cohort")
        .unionByName(
            ev.select(
                F.lit(1).alias("level"),
                "event_type",
                "hr",
                F.lit(None).cast("long").alias("cohort"),
            )
        )
        .unionByName(
            ev.select(
                F.lit(2).alias("level"),
                "event_type",
                F.lit(None).cast("long").alias("hr"),
                F.lit(None).cast("long").alias("cohort"),
            )
        )
    )
    classes = levels.groupBy("level", "event_type", "hr", "cohort").agg(
        F.count(F.lit(1)).alias("sz")
    )
    below = F.sum(F.when(F.col("sz") < _KA_K, F.col("sz")).otherwise(F.lit(0)))
    return classes.groupBy("level").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("sz").cast("long").alias("min_class_size"),
        below.cast("long").alias("rows_below_k"),
        F.expr(
            f"CAST(SUM(CASE WHEN sz < {_KA_K} THEN sz ELSE 0 END) * {_KA_PPM}"
            " DIV SUM(sz) AS BIGINT)"
        ).alias("ppm_below_k"),
    )
