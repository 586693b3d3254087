"""ORC source/sink — the second columnar interchange format.

The reference persists tables two ways only: ETS in memory and its CSV
input (/root/reference/Code/csv_to_ets.erl:19-60). The engine's native
working format is parquet (catalog.py); ORC is the other columnar format
a Spark shop actually meets (Hive/Trino estates emit it), and Spark's ORC
reader/writer is built-in — same vectorized scan, predicate pushdown and
column pruning as parquet, so interchange costs no capability.

Posture matches the JSONL source: explicit schema on read (never
inferred — ORC files carry one, but enforcing the CALLER's schema
catches a mis-shaped shard at the scan instead of poisoning downstream
types), deliberate compression choice, and layout controls exposed where
they matter at 100 TB:

- ``sort_by`` orders rows WITHIN each output file so ORC's built-in
  min/max stripe indexes actually prune (the same reasoning as the
  Z-order rewrite in operators/layout.py, for the single-column case);
- ``partitions`` caps output file count — a 100 TB table wants a few
  thousand fat files, not millions of small ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["write_orc", "read_orc"]


def write_orc(
    df: DataFrame,
    path: str,
    sort_by: list[str] | None = None,
    partitions: int | None = None,
) -> None:
    """Write ``df`` to an ORC directory.

    ``sort_by``: cluster rows within files on these columns so stripe
    min/max indexes prune point/range scans. ``repartition(cols)`` +
    ``sortWithinPartitions`` keeps the sort file-local — a global
    ``orderBy`` would be an all-to-all range exchange for no extra
    pruning power.
    """
    out = df
    if sort_by:
        out = out.repartition(*(partitions and [partitions] or []), *sort_by)
        out = out.sortWithinPartitions(*sort_by)
    elif partitions:
        out = out.repartition(partitions)
    out.write.mode("overwrite").option("compression", "zstd").orc(path)


def read_orc(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Read an ORC directory under the caller's explicit schema.

    Spark's ORC reader silently CASTS when the requested schema disagrees
    with the files (long → string, etc.), which at 100 TB turns one
    mis-shaped shard into a silently retyped column. So the footer schema
    is checked against the caller's first — a mismatch raises here, at
    the source, with both schemas in the message. The footer read lists
    file metadata only; no data pass.
    """
    actual = spark.read.orc(path).schema
    expected = [(f.name, f.dataType) for f in schema.fields]
    found = [(f.name, f.dataType) for f in actual.fields]
    if expected != found:
        raise ValueError(
            f"ORC schema mismatch at {path!r}: files carry {found}, caller expects {expected}"
        )
    return spark.read.schema(schema).orc(path)
