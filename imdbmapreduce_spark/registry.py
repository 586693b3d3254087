"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers itself here with a
Spark plan and (when SQL-expressible) the exact DuckDB oracle SQL. The
driver's ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin reads of
this registry.

Determinism contract for oracle-checked queries:
- money math in DECIMAL (bit-exact in both engines), cast to DOUBLE last;
- every computed column aliased identically in the plan and the SQL;
- every LIMIT preceded by a total order (tiebreaker keys) so the row *set*
  is deterministic;
- timestamps surfaced as DATE or formatted strings (engine-neutral).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None for non-SQL-expressible ops
    doc: str = ""
    bench: bool = True  # False: correctness-gated but out of the perf sweep


_REGISTRY: dict[str, RegisteredQuery] = {}


def query(
    name: str, oracle: str | None = None, bench: bool = True
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``.

    ``bench=False`` keeps a query in the driver's correctness gate but out
    of bench.py's timed sweep — used for the streaming twins, whose
    wall-clock is micro-batch trigger machinery (fixed seconds regardless
    of data volume), not plan execution.
    """

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle, fn.__doc__ or "", bench)
        return fn

    return wrap


def driver_verified_names() -> frozenset[str]:
    """Names whose MOST RECENT driver CORRECTNESS row is green.

    Reads the committed ``CORRECTNESS_r*.json`` files at the repo root
    (the driver's own output); for each query the latest round that
    checked it wins, so a query that was green in an early round but
    regressed later counts as UNVERIFIED and re-enters tier 1 of the
    sweep. A row is green when the value hash matched, or when the
    check was ``no_oracle`` by design (the weak rows-only audit —
    re-sweeping it cannot strengthen the signal). Missing/unreadable
    files degrade to "nothing verified", which only makes the sweep
    order more conservative.
    """
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    status: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path, encoding="utf-8") as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():  # later rounds overwrite earlier
            status[name] = bool(
                row.get("hash_match") or row.get("err") == "no_oracle"
            )
    return frozenset(n for n, ok in status.items() if ok)


def sweep_order() -> list[str]:
    """Driver sweep order: never-verified queries first.

    The driver checks queries in the order ``queries()`` yields them,
    under a fixed ~50-query budget — so ordering IS the verification
    policy. Three tiers, each in registration order:

    1. batch queries with NO green driver row in any prior round —
       these need the external signal most;
    2. the streaming vertical, as one contiguous block — after every
       batch query that still needs a row (its micro-batch wall-clock
       must never starve one: the round-2 regression), but still inside
       the budget so post-fix streaming rows actually land (the round-3
       gap);
    3. batch queries already green in a prior round — re-verification
       is a bonus, not a need.
    """
    _load_plans()
    names = list(_REGISTRY)
    green = driver_verified_names()
    tier1 = [n for n in names if n not in green and not n.startswith("streaming_")]
    tier2 = [n for n in names if n.startswith("streaming_")]
    tier3 = [n for n in names if n in green and not n.startswith("streaming_")]
    return tier1 + tier2 + tier3


def bench_queries() -> dict[str, QueryFn]:
    _load_plans()
    return {name: rq.fn for name, rq in _REGISTRY.items() if rq.bench}


def all_queries() -> dict[str, QueryFn]:
    _load_plans()
    return {name: _REGISTRY[name].fn for name in sweep_order()}


def all_oracles() -> dict[str, str]:
    _load_plans()
    return {
        name: _REGISTRY[name].oracle
        for name in sweep_order()
        if _REGISTRY[name].oracle is not None
    }


def get(name: str) -> RegisteredQuery:
    _load_plans()
    return _REGISTRY[name]


_LOADED = False


def _load_plans() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    # Imported for their registration side effects. The driver-facing
    # sweep order is computed by sweep_order() from the committed
    # CORRECTNESS_r*.json results (never-verified first, streaming
    # block second, verified batch last — pinned by
    # tests/test_scale_claims.py); registration order here only breaks
    # ties WITHIN a tier, so imports are grouped by vertical for
    # readability, nothing more.
    from imdbmapreduce_spark.operators import cooccurrence  # noqa: F401
    from imdbmapreduce_spark.operators import text  # noqa: F401
    from imdbmapreduce_spark.operators import pipeline  # noqa: F401
    from imdbmapreduce_spark.operators import similarity  # noqa: F401
    from imdbmapreduce_spark.operators import graph  # noqa: F401
    from imdbmapreduce_spark.operators import ml  # noqa: F401
    from imdbmapreduce_spark.sources import movies_csv  # noqa: F401
    from imdbmapreduce_spark.operators import dedup  # noqa: F401
    from imdbmapreduce_spark.operators import multimodal  # noqa: F401
    from imdbmapreduce_spark.plans import tpch2  # noqa: F401
    from imdbmapreduce_spark.streaming import windowed  # noqa: F401
    from imdbmapreduce_spark.plans import events  # noqa: F401
    from imdbmapreduce_spark.plans import relational  # noqa: F401
