"""JSONL (newline-delimited JSON) source/sink for the documents table.

The reference ingests only CSV (/root/reference/Code/dataAnalyze.erl:42-104);
JSONL is the interchange format a training-data pipeline actually
receives (crawl dumps, API exports), so this module rounds out the source
surface with the same dirty-data posture the CSV path has: explicit
schema (NEVER inferred — inference costs an extra full pass and lets a
single odd shard silently retype a column at 100 TB), PERMISSIVE parsing
with the malformed line preserved in a corrupt-record column, and a
streaming twin over the identical schema so live ingest and batch
backfill share one contract.

Scale: Spark's JSON reader splits by newline within files, so a JSONL
directory parallelizes exactly like parquet (maxPartitionBytes applies).
JSONL is the INGEST format, not the working format — pipelines convert
to parquet (write_documents_parquet is the catalog's native layout) in
the first pass; every downstream operator then gets pruning/pushdown the
text format can't give.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "DOCUMENTS_JSONL_SCHEMA",
    "CORRUPT_COL",
    "write_documents_jsonl",
    "read_documents_jsonl",
    "clean_documents",
    "stream_documents_jsonl",
]

CORRUPT_COL = "_corrupt_record"

# The documents schema plus the corrupt-record capture column. Explicit
# so every shard parses identically; a line that doesn't parse (or whose
# types don't match) lands whole in CORRUPT_COL with all data columns
# null — callers dispose of rejects deliberately, never silently.
DOCUMENTS_JSONL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
        StructField(CORRUPT_COL, StringType()),
    ]
)


def write_documents_jsonl(df: DataFrame, path: str) -> None:
    """documents → JSONL directory (one JSON object per line, one file
    per partition — the shard layout crawl pipelines expect)."""
    df.write.mode("overwrite").json(path)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL directory → documents DataFrame + reject lane.

    PERMISSIVE mode: well-formed rows parse to typed columns; malformed
    lines survive verbatim in CORRUPT_COL for quarantine (the JSONL
    analog of the CSV path's dropped-row accounting). Filter
    ``CORRUPT_COL IS NULL`` for the clean lane; select it IS NOT NULL
    for the reject audit.
    """
    return (
        spark.read.schema(DOCUMENTS_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def clean_documents(df: DataFrame) -> DataFrame:
    """The accepted lane: parsed rows only, corrupt column dropped."""
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def stream_documents_jsonl(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming twin of :func:`read_documents_jsonl` — same schema, same
    permissive contract, so the live-ingest topology (dedup at ingest,
    quality gates, decontamination) runs unchanged over a growing JSONL
    directory. ``max_files_per_trigger`` bounds each micro-batch's file
    count (so an AvailableNow drain exercises MULTIPLE micro-batches —
    the shape a live deployment sees — instead of one giant batch)."""
    reader = (
        spark.readStream.schema(DOCUMENTS_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)
