"""Semantics tests for text-analysis helpers not covered by the oracle gate."""

from __future__ import annotations

from pyspark.sql import Row

from imdbmapreduce_spark.operators.text import lang_id


def test_lang_id_picks_marker_majority(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat and the dog is in that house"),
            Row(doc_id=2, text="le chat et la maison est un une de"),
            Row(doc_id=3, text="der hund und die katze ist ein nicht mit"),
        ]
    )
    out = {r.doc_id: (r.lang_pred, r.lang_score) for r in lang_id(df).collect()}
    assert out[1][0] == "en" and out[1][1] >= 4
    assert out[2][0] == "fr"
    assert out[3][0] == "de"


def test_lang_id_no_markers_scores_zero(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="zzz qqq xxx")])
    row = lang_id(df).first()
    assert row.lang_score == 0


def test_pii_scrub_redacts_planted_pii(spark, tmp_path):
    """The driver fixtures contain no PII, so the oracle row only proves
    the no-op path; this locks the actual redaction on planted data
    (through the registered query, via a documents-shaped parquet)."""
    from imdbmapreduce_spark import registry

    rows = [
        (1, "contact me at jane.doe+spam@mail.example.org for details", "en", "s", 0),
        (2, "docs at https://example.com/a_b/c?q=1&x=2#frag and more", "en", "s", 0),
        (3, "mixed https://x.io/p bob@x.io trailing", "en", "s", 0),
        (4, "no pii here at all", "en", "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf}/documents.parquet")
    out = {
        r.doc_id: r for r in registry.get("doc_pii_scrub").fn(spark, sf).collect()
    }
    assert (out[1].n_emails, out[1].n_urls) == (1, 0)
    assert (out[2].n_emails, out[2].n_urls) == (0, 1)
    assert (out[3].n_emails, out[3].n_urls) == (1, 1)
    assert (out[4].n_emails, out[4].n_urls) == (0, 0)
    # redaction really shortens: "<EMAIL>"/"<URL>" replace longer spans
    assert out[1].scrubbed_len == out[1].orig_len - len("jane.doe+spam@mail.example.org") + len("<EMAIL>")
    assert out[2].scrubbed_len == out[2].orig_len - len("https://example.com/a_b/c?q=1&x=2#frag") + len("<URL>")
    assert out[4].scrubbed_len == out[4].orig_len


def test_readability_twins_agree_and_use_their_claimed_surfaces(spark, sf_dir):
    """The codegen form and the Arrow pandas_udf form must produce
    IDENTICAL rows (same IEEE double math), and each must run on the
    surface it claims: no Python eval in the builtin plan, vectorized
    ArrowEvalPython (never row-at-a-time BatchEvalPython) in the UDF
    plan."""
    from imdbmapreduce_spark import registry

    a = registry.get("doc_readability").fn(spark, sf_dir)
    b = registry.get("doc_readability_udf").fn(spark, sf_dir)
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]
    plan_a = a._jdf.queryExecution().sparkPlan().toString()
    plan_b = b._jdf.queryExecution().sparkPlan().toString()
    assert "EvalPython" not in plan_a
    assert "ArrowEvalPython" in plan_b and "BatchEvalPython" not in plan_b
