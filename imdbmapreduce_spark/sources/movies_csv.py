"""Movies CSV ingest (SURVEY.md §1.2, §2.1 S1–S5, F1–F3, R17).

Reference input: UTF-8 CSV with header, rows ``movie_id,title,"a1, a2, ..."``
parsed by a hand-rolled quote-aware parser with ``""`` → ``"`` escapes
(/root/reference/Code/dataAnalyze.erl:42-104). Dirty-data semantics baked
into the reference and reproduced here:

- per-actor Unicode whitespace trim (/root/reference/Code/mapReduce.erl:146-148)
- stray-quote strip per actor (/root/reference/Code/csv_to_ets.erl:52)
- empty/malformed rows dropped (/root/reference/Code/csv_to_ets.erl:46-59,
  Code/dataAnalyze.erl:46)
- optional first-N row cap (/root/reference/Code/csv_to_ets.erl:21)
- duplicate-key last-write-wins — ETS ``set`` insert order semantics
  (/root/reference/Code/server.erl:119-135, Code/csv_to_ets.erl:27-53) —
  surfaced as an explicit, tested policy instead of an accident.

Deliberate divergence (documented per SURVEY §1.2): the reference has TWO
parsers that disagree — the master's naive every-comma split corrupts
comma-containing titles (/root/reference/Code/csv_to_ets.erl:47-53). We
standardize on the quote-aware semantics everywhere.

The cast string is tokenized ONCE at ingest into ``array<string>`` —
the reference re-tokenizes per use (/root/reference/Code/mapReduce.erl:140-143),
an anti-pattern SURVEY §4 flags.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MOVIES_SCHEMA = T.StructType(
    [
        T.StructField("movie_id", T.LongType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("actors_csv", T.StringType(), True),
    ]
)

# Unicode-aware whitespace trim (covers NBSP etc.) via Java regex's
# UNICODE_CHARACTER_CLASS flag — same semantics as the reference's
# [[:space:]]+ with the `unicode` option (mapReduce.erl:146-148).
_TRIM_RE = r"(?U)^\s+|\s+$"


def read_movies_csv(
    spark: SparkSession,
    path: str,
    limit: int | None = None,
    dedup: str = "last",
) -> DataFrame:
    """Read a movies CSV into the normalized schema
    ``(movie_id: long, title: string, actors: array<string>)``.

    ``limit``: optional first-N cap (R17; the reference hard-codes 85000).
    ``dedup``: 'last' (ETS last-write-wins), 'first', or None (keep all).

    Scale: Spark's CSV reader splits the file across executors; the
    row-order-dependent pieces (the cap, last-write-wins) are expressed
    with explicit total orders so they stay deterministic under
    parallelism — at 100 TB "file order" is not a thing.
    """
    raw = (
        spark.read.schema(MOVIES_SCHEMA)
        .csv(
            path,
            header=True,
            quote='"',
            escape='"',
            encoding="UTF-8",
            mode="DROPMALFORMED",  # malformed rows silently dropped (S2)
        )
    )
    # Malformed = missing id or title; empty lines come back all-null.
    rows = raw.filter(F.col("movie_id").isNotNull() & F.col("title").isNotNull())
    if limit is not None:
        # Reference caps by file position; we need a total order for the
        # cap to be well-defined distributed — use the key (R17 note in
        # plans/relational.limit_scan).
        rows = rows.orderBy("movie_id").limit(limit)
    empty = F.array().cast("array<string>")
    movies = rows.select(
        "movie_id",
        F.col("title"),
        # null/empty cast field → empty array (reference keeps the movie
        # with an empty cast rather than dropping it)
        F.coalesce(normalize_cast(F.col("actors_csv")), empty).alias("actors"),
    )
    if dedup in ("last", "first"):
        # ETS `set` semantics: one row per key. 'last' = last-write-wins
        # (insert order ≈ movie_id order here, made explicit).
        order = F.desc("movie_id") if dedup == "last" else F.asc("movie_id")
        from pyspark.sql.window import Window

        w = Window.partitionBy("title").orderBy(order)
        movies = (
            movies.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    return movies


def normalize_cast(col: F.Column) -> F.Column:
    """Comma-joined cast string → trimmed ``array<string>`` (F1–F3).

    Split on ',' then per-token: strip Unicode whitespace and stray
    quotes, drop empties. One ingest-time pass replacing the reference's
    per-query re-tokenization.
    """
    toks = F.split(col, ",")
    cleaned = F.transform(
        toks,
        lambda x: F.regexp_replace(
            F.regexp_replace(x, _TRIM_RE, ""), r'^"|"$', ""
        ),
    )
    return F.filter(cleaned, lambda x: x != "")
