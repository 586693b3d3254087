"""Table catalog for the driver's synthetic parquet tables.

One place that knows the physical layout (``<sf_dir>/<name>.parquet``) so
query plans stay purely logical. Reading through ``spark.read.parquet``
keeps predicate pushdown / column pruning / partition splitting intact —
the 100 TB path is identical, just with a bigger directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

__all__ = ["TABLES", "table", "load_tables", "register_views"]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL entry point)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
