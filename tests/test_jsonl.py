"""JSONL source/sink (sources/jsonl.py): round-trip fidelity, corrupt-line
quarantine, and batch/stream contract equality."""

from __future__ import annotations

from pyspark.sql import functions as F

from imdbmapreduce_spark.catalog import table
from imdbmapreduce_spark.sources.jsonl import (
    CORRUPT_COL,
    clean_documents,
    read_documents_jsonl,
    stream_documents_jsonl,
    write_documents_jsonl,
)


def test_jsonl_round_trip(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(docs, path)
    back = clean_documents(read_documents_jsonl(spark, path))
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, back.select(*docs.columns).collect()))
    assert a == b


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json at all\n"
        '{"doc_id": "NOT_A_NUMBER", "text": "bad type", "lang": "en", "source": "s", "n_chars": 8}\n'
        '{"doc_id": 2, "text": "also ok", "lang": "fr", "source": "s", "n_chars": 7}\n'
    )
    df = read_documents_jsonl(spark, str(p))
    good = clean_documents(df)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    assert {r.doc_id for r in good.collect()} == {1, 2}
    # both the non-JSON line and the type-mismatch line are quarantined
    # verbatim, not silently dropped or nulled
    rejects = [r[CORRUPT_COL] for r in bad.collect()]
    assert len(rejects) == 2
    assert any("not json" in r for r in rejects)
    assert any("NOT_A_NUMBER" in r for r in rejects)


def test_jsonl_stream_equals_batch(spark, sf_dir, tmp_path):
    """The streaming reader over the same JSONL directory drains to the
    batch result — live ingest and backfill share one contract."""
    import tempfile

    docs = table(spark, sf_dir, "documents").limit(50)
    path = str(tmp_path / "stream_src")
    write_documents_jsonl(docs, path)
    stream = clean_documents(stream_documents_jsonl(spark, path))
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.format("memory")
            .queryName("jsonl_stream_sink")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = sorted(map(tuple, spark.table("jsonl_stream_sink").select(*docs.columns).collect()))
    want = sorted(map(tuple, docs.collect()))
    assert got == want
