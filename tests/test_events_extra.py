"""Events-family tests beyond the oracle gate: the HLL sketch's error
bound vs the exact distinct count."""

from __future__ import annotations

from imdbmapreduce_spark import registry


def test_approx_distinct_within_error_bound(spark, sf_dir):
    rows = registry.get("events_approx_distinct").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        rel_err = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert rel_err < 0.05, (r.event_type, r.approx_users, r.exact_users)
