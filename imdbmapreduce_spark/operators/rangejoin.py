"""Banded range joins — point-in-interval and interval-overlap.

Spark has no RANGE JOIN operator (DuckDB and Databricks Photon do); a
naive ``ON p.key = i.key AND p.ts BETWEEN i.start AND i.end`` plans as a
theta join — per-key cartesian — which is quadratic in per-key activity
and a guaranteed scale-killer at 100 TB. The classic fix, implemented
here, is *banding*: quantize time into fixed-width buckets, replicate
each interval into every bucket it overlaps, give each point its single
containing bucket, and equi-join on (key, bucket) with the exact range
predicate as a residual filter. The theta join becomes a hash join whose
output is bounded by true-match volume plus an O(interval_len/bucket)
replication factor.

The reference has no time-dimension operators at all (SURVEY.md §2.5);
this module is part of the additive events vertical, sibling to the
as-of join in plans/events.py (as-of = nearest single predecessor; range
join = ALL rows inside a window).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    point_ts: str,
    start: str,
    end: str,
    bucket: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with matching ``keys``
    and ``start <= point_ts < end`` (half-open, like window semantics).

    All time columns are BIGINT (microsecond epochs — the repo's
    engine-neutral timestamp convention). ``bucket`` is the band width in
    the same unit; choose it near the TYPICAL interval length so each
    interval replicates into ~2 buckets (len/bucket + 1).

    No post-join dedup is needed: an interval is replicated once per
    overlapped bucket, but a (point, interval) pair meets ONLY in the
    point's single containing bucket — the pair multiplicity is exactly 1
    by construction.

    Scale: one shuffle per side on (keys..., bucket) into a hash join.
    Shuffle volume is |points| + |intervals| × replication; join output
    is |true matches| + the same-bucket near-misses the residual filter
    drops — collision-bounded, never per-key cartesian. Skewed keys
    (one hot user) stay bounded because the band splits a key's rows
    across its time range; a key hot WITHIN one bucket is the residual
    skew, handled by AQE skew-join splitting on the equi-join.

    ``how='left'`` keeps unmatched points (interval columns null) —
    implemented as the inner banded join plus an anti-join union, so the
    equi-join core stays a plain hash join.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how={how!r}: only inner/left supported")
    p = points.withColumn("__bkt", (F.col(point_ts) / bucket).cast("long"))
    # sequence() is inclusive on both ends; end is exclusive so the last
    # overlapped bucket is floor((end-1)/bucket). Empty/negative-length
    # intervals produce an empty sequence and match nothing.
    i = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                (F.col(start) / bucket).cast("long"),
                F.floor((F.col(end) - 1) / bucket).cast("long"),
            )
        ),
    )
    cond = [p["__bkt"] == i["__bkt"]]
    for k in keys:
        cond.append(p[k] == i[k])
    residual = (p[point_ts] >= i[start]) & (p[point_ts] < i[end])
    matched = (
        p.join(i, functools_and(cond) & residual, "inner")
        .drop(i["__bkt"])
        .drop(*[i[k] for k in keys])
        .drop("__bkt")
    )
    if how == "inner":
        return matched
    # left: points with no interval at all, padded with nulls
    int_cols = [c for c in intervals.columns if c not in keys and c not in (start, end)]
    pad = points
    for c in [start, end, *int_cols]:
        pad = pad.withColumn(c, F.lit(None).cast(dict(intervals.dtypes)[c]))
    only_points = pad.join(
        matched.select(*points.columns), points.columns, "left_anti"
    )
    return matched.unionByName(only_points.select(*matched.columns))


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    lstart: str,
    lend: str,
    rstart: str,
    rend: str,
    bucket: int,
) -> DataFrame:
    """Inner-join interval rows whose half-open ranges OVERLAP:
    ``lstart < rend AND rstart < lend`` with matching ``keys``.

    Banding with a multiplicity-1 guard: both sides replicate into the
    buckets they cover, and a pair is emitted ONLY in the bucket
    containing ``max(lstart, rstart)`` — the overlap's first instant,
    which every overlapping pair has exactly once. No dedup pass, so
    the downstream agg can stream off the join.

    Scale: same banded equi-join shape as point_in_interval_join —
    shuffle on (keys..., bucket), hash join, residual filter; output
    bounded by true overlaps. Replication factor is interval_len/bucket
    per side; pick ``bucket`` near the typical interval length.
    """
    l = left.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                (F.col(lstart) / bucket).cast("long"),
                F.floor((F.col(lend) - 1) / bucket).cast("long"),
            )
        ),
    )
    r = right.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                (F.col(rstart) / bucket).cast("long"),
                F.floor((F.col(rend) - 1) / bucket).cast("long"),
            )
        ),
    )
    cond = [l["__bkt"] == r["__bkt"]]
    for k in keys:
        cond.append(l[k] == r[k])
    overlap = (l[lstart] < r[rend]) & (r[rstart] < l[lend])
    once = l["__bkt"] == F.floor(
        F.greatest(l[lstart], r[rstart]) / bucket
    ).cast("long")
    return (
        l.join(r, functools_and(cond) & overlap & once, "inner")
        .drop(r["__bkt"])
        .drop(*[r[k] for k in keys])
        .drop("__bkt")
    )


def functools_and(conds: list[Column]) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out
