"""Every registered oracle-checked query must match DuckDB exactly —
the local replica of the driver's CORRECTNESS gate (SURVEY.md §5 item 1).
"""

from __future__ import annotations

import pytest

from imdbmapreduce_spark import registry
from tests.oracle_util import compare, duckdb_connection

_NAMES = sorted(registry.all_oracles())


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", _NAMES)
def test_oracle_parity(spark, sf_dir, oracle_con, name):
    rq = registry.get(name)
    spark_pdf = rq.fn(spark, sf_dir).toPandas()
    oracle_pdf = oracle_con.execute(rq.oracle).fetchdf()
    compare(spark_pdf, oracle_pdf, name)


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle must still run and have a stable schema."""
    for name, fn in registry.all_queries().items():
        if name in registry.all_oracles():
            continue
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()
