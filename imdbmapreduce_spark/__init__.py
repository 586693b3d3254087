"""PySpark-native analytics engine with the query and data-processing
capabilities of HaimCohen96/ImdbMapReduce (see SURVEY.md), rebuilt
Spark-first: DataFrame/SQL plans optimized by Catalyst, designed for the
100 TB / 1000-executor scale point, tested against a DuckDB oracle.
"""

from imdbmapreduce_spark.session import get_spark
from imdbmapreduce_spark.catalog import load_tables, register_views, table
from imdbmapreduce_spark.operators.cooccurrence import Engine

__all__ = ["get_spark", "load_tables", "register_views", "table", "Engine"]
