"""Relational-family tests beyond the oracle gate: the approx-percentile
sketch's rank-error bound and the hash sampler's statistical properties
(the parts a value-hash compare can't express)."""

from __future__ import annotations

from imdbmapreduce_spark import registry


def test_approx_percentile_within_error_bound(spark, sf_dir):
    rows = registry.get("approx_quantile_error").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        rel_err = abs(r.approx_p50 - r.exact_p50) / max(abs(r.exact_p50), 1)
        assert rel_err < 0.01, (r.l_returnflag, r.approx_p50, r.exact_p50)


def test_stratified_sample_rate_and_determinism(spark, sf_dir):
    from imdbmapreduce_spark.catalog import table

    sample = registry.get("stratified_sample").fn(spark, sf_dir)
    n_total = table(spark, sf_dir, "orders").count()
    kept = sample.collect()
    # ~10% +- generous tolerance at small sf (binomial noise)
    assert 0.05 * n_total < len(kept) < 0.15 * n_total, (len(kept), n_total)
    # deterministic: a second run keeps the exact same row set
    again = {r.o_orderkey for r in sample.collect()}
    assert {r.o_orderkey for r in kept} == again
