"""Local replica of the driver's DuckDB-oracle gate (see __spark_entry__).

Runs a registered Spark plan and its oracle SQL side by side, normalizes
(sort columns by name, sort rows), and compares values exactly. Stricter
than the driver's hash compare is impossible, so passing here should mean
passing there.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import pandas as pd

from imdbmapreduce_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        ts = pd.Timestamp(v)
        return ts.tz_localize(None) if ts.tzinfo else ts
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in row))
    out.sort(key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    return out


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str) -> None:
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch spark={sorted(spark_df.columns)} "
        f"oracle={sorted(oracle_df.columns)}"
    )
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count mismatch spark={len(spark_df)} oracle={len(oracle_df)}"
    )
    s, o = normalize(spark_df), normalize(oracle_df)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s, o)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )
