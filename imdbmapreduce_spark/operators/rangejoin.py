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

All bucket arithmetic is FLOOR division (never long-cast truncation,
which rounds toward zero and disagrees with floor for negative epochs —
pre-1970 microsecond timestamps are valid inputs).

The reference has no time-dimension operators at all (SURVEY.md §2.5);
this module is part of the additive events vertical, sibling to the
as-of join in plans/events.py (as-of = nearest single predecessor; range
join = ALL rows inside a window).
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _and_all(conds: list[Column]) -> Column:
    return functools.reduce(operator.and_, conds)


def _bkt(col: Column, bucket: int) -> Column:
    return F.floor(col / bucket).cast("long")


def _interval_buckets(start: str, end: str, bucket: int) -> Column:
    """Every bucket a half-open [start, end) interval overlaps, as an
    explodable array. Empty or reversed intervals (end <= start) yield
    an EMPTY array — explode drops the row. The guard matters: Spark's
    ``sequence(a, b)`` silently counts DOWN when b < a, so one corrupt
    end-before-start row would otherwise replicate across its whole
    (reversed) span instead of matching nothing."""
    return F.when(
        F.col(end) > F.col(start),
        F.sequence(
            _bkt(F.col(start), bucket), _bkt(F.col(end) - 1, bucket)
        ),
    ).otherwise(F.array().cast("array<long>"))


def _check_disjoint(left: DataFrame, right: DataFrame, keys: list[str]) -> None:
    clash = (set(left.columns) & set(right.columns)) - set(keys)
    if clash:
        raise ValueError(
            f"column name collision between join sides: {sorted(clash)}; "
            "rename/alias non-key columns so the joined schema is unambiguous"
        )


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
    engine-neutral timestamp convention; negative pre-1970 epochs
    included). ``bucket`` is the band width in the same unit; choose it
    near the TYPICAL interval length so each interval replicates into
    ~2 buckets (len/bucket + 1).

    No post-join dedup is needed: an interval is replicated once per
    overlapped bucket, but a (point, interval) pair meets ONLY in the
    point's single containing bucket — the pair multiplicity is exactly
    1 by construction.

    Scale: one shuffle per side on (keys..., bucket) into a hash join.
    Shuffle volume is |points| + |intervals| × replication; join output
    is |true matches| + the same-bucket near-misses the residual filter
    drops — collision-bounded, never per-key cartesian. Skewed keys
    (one hot user) stay bounded because the band splits a key's rows
    across its time range; a key hot WITHIN one bucket is the residual
    skew, handled by AQE skew-join splitting on the equi-join.

    ``how='left'`` keeps unmatched points (interval columns null) —
    the points side is never exploded, so plain left-outer semantics on
    the banded join are exact.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how={how!r}: only inner/left supported")
    _check_disjoint(points, intervals, keys)
    p = points.withColumn("__bkt", _bkt(F.col(point_ts), bucket))
    i = intervals.withColumn(
        "__bkt", F.explode(_interval_buckets(start, end, bucket))
    )
    cond = [p["__bkt"] == i["__bkt"]]
    for k in keys:
        cond.append(p[k] == i[k])
    residual = (p[point_ts] >= i[start]) & (p[point_ts] < i[end])
    return (
        p.join(i, _and_all(cond) & residual, how)
        .drop(i["__bkt"])
        .drop(*[i[k] for k in keys])
        .drop("__bkt")
    )


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
    which every overlapping pair has exactly once (and which both sides
    are guaranteed to have replicated into, since it lies inside each
    interval). No dedup pass, so the downstream agg can stream off the
    join. Degenerate rows with ``end <= start`` match nothing.

    Scale: same banded equi-join shape as point_in_interval_join —
    shuffle on (keys..., bucket), hash join, residual filter; output
    bounded by true overlaps. Replication factor is interval_len/bucket
    per side; pick ``bucket`` near the typical interval length.
    """
    _check_disjoint(left, right, keys)
    l = left.withColumn("__bkt", F.explode(_interval_buckets(lstart, lend, bucket)))
    r = right.withColumn("__bkt", F.explode(_interval_buckets(rstart, rend, bucket)))
    cond = [l["__bkt"] == r["__bkt"]]
    for k in keys:
        cond.append(l[k] == r[k])
    overlap = (l[lstart] < r[rend]) & (r[rstart] < l[lend])
    once = l["__bkt"] == _bkt(F.greatest(l[lstart], r[rstart]), bucket)
    return (
        l.join(r, _and_all(cond) & overlap & once, "inner")
        .drop(r["__bkt"])
        .drop(*[r[k] for k in keys])
        .drop("__bkt")
    )
