"""Property tests for the table-audit operators: checksum order
invariance + tamper sensitivity (pure-Python replay), and column-stats
consistency with a naive profile."""

from __future__ import annotations

import hashlib
import random

import duckdb

from imdbmapreduce_spark import registry


def _row_words(row) -> tuple[int, int]:
    okey, ckey, status, price, odate, prio = row
    canon = "|".join(
        [
            str(okey),
            str(ckey),
            status,
            str(int(round(price * 100))),
            odate.strftime("%Y-%m-%d %H:%M:%S"),
            prio,
        ]
    )
    h = hashlib.md5(canon.encode()).hexdigest()
    return int(h[:8], 16), int(h[8:16], 16)


def test_orders_checksum_order_invariant_and_tamper_sensitive(spark, sf_dir):
    rows = duckdb.connect().execute(
        f"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   o_orderdate, o_orderpriority
            FROM read_parquet('{sf_dir}/orders.parquet')"""
    ).fetchall()
    # replay in a shuffled order: the aggregate must not care
    shuffled = list(rows)
    random.Random(7).shuffle(shuffled)
    sum_hi = sum_lo = xor_hi = xor_lo = 0
    for r in shuffled:
        hi, lo = _row_words(r)
        sum_hi += hi
        sum_lo += lo
        xor_hi ^= hi
        xor_lo ^= lo

    got = registry.get("orders_table_checksum").fn(spark, sf_dir).collect()
    assert len(got) == 1
    g = got[0]
    assert (g.n_rows, g.sum_hi, g.sum_lo, g.xor_hi, g.xor_lo) == (
        len(rows),
        sum_hi,
        sum_lo,
        xor_hi,
        xor_lo,
    )

    # tamper witness: perturbing one row's price by a cent moves the sum
    okey, ckey, status, price, odate, prio = rows[0]
    hi0, lo0 = _row_words(rows[0])
    hi1, lo1 = _row_words((okey, ckey, status, price + 0.01, odate, prio))
    assert (hi0, lo0) != (hi1, lo1)
    assert (sum_hi - hi0 + hi1, sum_lo - lo0 + lo1) != (sum_hi, sum_lo)


def test_lineitem_column_stats_matches_naive_profile(spark, sf_dir):
    con = duckdb.connect()
    got = {
        r.column_name: r
        for r in registry.get("lineitem_column_stats").fn(spark, sf_dir).collect()
    }
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchone()[0]
    assert set(got) == {
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_returnflag",
        "l_shipdate",
    }
    for col, r in got.items():
        assert r.n_rows == n
        nulls, ndv = con.execute(
            f"""SELECT COUNT(*) - COUNT({col}), COUNT(DISTINCT {col})
                FROM read_parquet('{sf_dir}/lineitem.parquet')"""
        ).fetchone()
        assert r.n_nulls == nulls
        assert r.ndv == ndv
        assert r.min_val <= r.max_val or r.ndv <= 1


def test_roundtrip_checksums_equal_parquet_checksum(spark, sf_dir):
    """All three interchange certifications (ORC, CSV, JSONL) must agree
    with the native-parquet checksum inside the engine too — the
    cross-format half of what the DuckDB oracle certifies cross-engine."""
    base = registry.get("orders_table_checksum").fn(spark, sf_dir).first()
    for q in ("orc_roundtrip_checksum", "csv_roundtrip_checksum"):
        got = registry.get(q).fn(spark, sf_dir).first()
        assert got == base, q

    jsonl = registry.get("jsonl_roundtrip_checksum").fn(spark, sf_dir).first()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert jsonl.n_rows == docs.count()  # permissive reject lane stayed empty
