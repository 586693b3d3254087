

def test_zipf_slope_degenerate_source_yields_null(spark, tmp_path):
    """ADVICE r6: a source with a single distinct term has OLS
    denominator 0 — the slope must surface as NULL (mirrored CASE in
    the oracle), not engine-dependent NaN."""
    from imdbmapreduce_spark import registry

    spark.createDataFrame(
        [
            (1, "solo solo solo solo", "en", "mono", 19),
            (2, "a b c d e f g", "en", "multi", 13),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    rows = {
        r.source: r
        for r in registry.get("zipf_slope_by_source").fn(spark, str(tmp_path)).collect()
    }
    assert rows["mono"].n_terms == 1
    assert rows["mono"].zipf_slope is None and rows["mono"].ln_c is None
    assert rows["multi"].zipf_slope is not None


def test_join_cardinality_audit_matches_python_and_orders_methods(spark, sf_dir):
    """All three estimators replayed in pure Python from the token
    counts; the accuracy ordering end_biased >= equi_width >= naive
    (by q_error) must hold."""
    import hashlib
    from collections import Counter

    from imdbmapreduce_spark import registry
    from imdbmapreduce_spark.catalog import table
    from imdbmapreduce_spark.operators.text import (
        _CARD_BUCKETS,
        _CARD_SCALE,
        _CARD_TOPK,
    )

    c: Counter = Counter()
    for r in table(spark, sf_dir, "documents").select("text").collect():
        c.update(t for t in r.text.strip().split() if t)
    n, d = sum(c.values()), len(c)
    truth = sum(v * v for v in c.values())

    est_naive = (n * n * _CARD_SCALE) // d
    buckets: dict[int, list[int]] = {}
    for tok, v in c.items():
        b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % _CARD_BUCKETS
        buckets.setdefault(b, []).append(v)
    est_hist = sum(
        (sum(vs) * sum(vs) * _CARD_SCALE) // len(vs) for vs in buckets.values()
    )
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:_CARD_TOPK]
    s2t, nt, k = sum(v * v for _, v in top), sum(v for _, v in top), len(top)
    est_eb = s2t * _CARD_SCALE + ((n - nt) * (n - nt) * _CARD_SCALE) // max(d - k, 1)

    rows = {
        r.method: r
        for r in registry.get("join_cardinality_estimate_audit")
        .fn(spark, sf_dir)
        .collect()
    }
    assert rows["naive_uniform"].estimate_q == est_naive
    assert rows[f"equi_width_hash_{_CARD_BUCKETS}"].estimate_q == est_hist
    assert rows[f"end_biased_{_CARD_TOPK}"].estimate_q == est_eb
    assert all(r.true_pairs == truth for r in rows.values())
    assert (
        rows[f"end_biased_{_CARD_TOPK}"].q_error
        <= rows[f"equi_width_hash_{_CARD_BUCKETS}"].q_error
        <= rows["naive_uniform"].q_error
    )
    assert all(r.q_error >= 1.0 for r in rows.values())
