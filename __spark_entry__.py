"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``imdbmapreduce_spark.registry`` — every operator from
SURVEY.md §2 registers a Spark plan plus (when SQL-expressible) its DuckDB
oracle there; this module just reads the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from imdbmapreduce_spark import registry

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's signature workload: the title-similarity query
    (shared-member counting with level bucketing) over the exploded
    membership table.
    """
    return registry.get("title_similarity_orders").fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return registry.all_oracles()
