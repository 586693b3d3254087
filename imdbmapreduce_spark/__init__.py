"""PySpark-native analytics engine with the query and data-processing
capabilities of HaimCohen96/ImdbMapReduce (see SURVEY.md), rebuilt
Spark-first: DataFrame/SQL plans optimized by Catalyst, designed for the
100 TB / 1000-executor scale point, tested against a DuckDB oracle.
"""

from imdbmapreduce_spark.session import get_spark
from imdbmapreduce_spark.catalog import load_tables, register_views, table
from imdbmapreduce_spark.operators.cooccurrence import Engine


def queries():
    """All registered queries: name -> fn(spark, sf_dir) -> DataFrame.
    The complete query surface (SURVEY.md §2 + the LLM-pipeline
    verticals), same registry the driver contract reads."""
    from imdbmapreduce_spark import registry

    return registry.all_queries()


def run(name: str, spark, sf_dir: str):
    """Run one registered query by name."""
    from imdbmapreduce_spark import registry

    return registry.get(name).fn(spark, sf_dir)


def persist_indexes(spark, sf_dir: str) -> dict:
    """Build and persist BOTH index groups (vector IVF/PQ + text dedup)
    for a corpus; returns {group: directory}. Later sessions' ANN and
    dedup queries then answer from the prebuilt on-disk index."""
    from imdbmapreduce_spark.operators.dedup import persist_text_index
    from imdbmapreduce_spark.operators.similarity import persist_vector_index

    return {
        "vector": persist_vector_index(spark, sf_dir),
        "text": persist_text_index(spark, sf_dir),
    }


__all__ = [
    "get_spark",
    "load_tables",
    "register_views",
    "table",
    "Engine",
    "queries",
    "run",
    "persist_indexes",
]
