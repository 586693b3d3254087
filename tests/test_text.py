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
