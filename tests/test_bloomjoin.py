"""Property tests for the Bloom semi-join audit: exact replay of the
md5-position filter in pure Python, and the no-false-negative guarantee
that makes Bloom pre-filtering semantics-preserving."""

from __future__ import annotations

import hashlib

import duckdb

from imdbmapreduce_spark import registry
from imdbmapreduce_spark.operators.bloomjoin import (
    _BLOOM_NATION,
    BLOOM_K_HASHES,
    BLOOM_M_BITS,
)


def _pos(key: int, i: int) -> int:
    h = hashlib.md5(f"bloom:{i}:{key}".encode()).hexdigest()
    return int(h[:8], 16) % BLOOM_M_BITS


def test_bloom_audit_matches_python_replay(spark, sf_dir):
    con = duckdb.connect()
    build = {
        r[0]
        for r in con.execute(
            f"""SELECT s_suppkey
                FROM read_parquet('{sf_dir}/supplier.parquet') s
                JOIN read_parquet('{sf_dir}/nation.parquet') n
                  ON s_nationkey = n_nationkey
                WHERE n_name = '{_BLOOM_NATION}'"""
        ).fetchall()
    }
    rows_per_key = dict(
        con.execute(
            f"""SELECT l_suppkey, COUNT(*)
                FROM read_parquet('{sf_dir}/lineitem.parquet') GROUP BY 1"""
        ).fetchall()
    )
    bloom = {_pos(s, i) for s in build for i in range(BLOOM_K_HASHES)}
    passes = {
        s
        for s in rows_per_key
        if all(_pos(s, i) in bloom for i in range(BLOOM_K_HASHES))
    }
    true_keys = set(rows_per_key) & build

    # no false negatives: every member with probe rows passes the filter
    assert true_keys <= passes

    got = registry.get("bloom_semijoin_audit").fn(spark, sf_dir).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_build_keys == len(build)
    assert r.m_bits == BLOOM_M_BITS and r.k_hashes == BLOOM_K_HASHES
    assert r.n_set_bits == len(bloom)
    assert r.n_probe_keys == len(rows_per_key)
    assert r.n_pass_keys == len(passes)
    assert r.n_true_keys == len(true_keys)
    assert r.n_fp_keys == len(passes - true_keys)
    assert r.n_probe_rows == sum(rows_per_key.values())
    assert r.n_pass_rows == sum(rows_per_key[s] for s in passes)
    assert r.n_true_rows == sum(rows_per_key[s] for s in true_keys)
    n_neg = len(set(rows_per_key) - true_keys)
    assert r.fp_rate == len(passes - true_keys) / n_neg
    # the audit's point: pass set admits members plus a measured leak
    assert r.n_pass_rows >= r.n_true_rows
