

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
