"""SQL entry point (Engine.sql) — the ANSI-SQL door over the catalog.

Proof obligation: a SQL-first user gets the SAME answers through
``Engine.sql`` that the DataFrame plans are verified against. We take
registered ORACLE SQL strings (written for DuckDB) whose syntax lies in
the dialect subset both engines share, run them VERBATIM through
Engine.sql (Spark/Catalyst) and through DuckDB on the same parquet, and
compare values exactly with the driver-replica normalizer.
"""

from __future__ import annotations

import pytest

from imdbmapreduce_spark import registry
from imdbmapreduce_spark.operators.cooccurrence import Engine
from tests.oracle_util import compare, duckdb_connection

# Oracle strings in the shared DuckDB∩Spark dialect (plain ANSI: CTEs,
# joins, grouped aggregates, CASE, LEAST, CAST). The deliberately
# DuckDB-specific oracles (string_split, unnest, strftime, MATERIALIZED
# recurrences, ...) stay out — they exist to CHECK Spark plans, not to
# run on them.
PORTABLE = [
    "q1_pricing_summary",
    "q4_order_priority",
    "coactor_parts",
    "events_distinct_exact",
    "nation_customer_supplier_union",
]


@pytest.mark.parametrize("name", PORTABLE)
def test_sql_door_matches_duckdb_verbatim(spark, sf_dir, name):
    sql = registry.get(name).oracle
    assert sql is not None
    eng = Engine(spark)  # SQL-first construction: no movies table needed
    got = eng.sql(sql, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    want = con.execute(sql).df()
    compare(got, want, name)


def test_sql_door_requires_movies_only_for_reference_queries(spark):
    eng = Engine(spark)
    with pytest.raises(ValueError, match="movies"):
        eng.query("Actor", "whoever")
