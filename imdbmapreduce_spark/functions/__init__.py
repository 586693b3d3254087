"""Shared column-expression helpers (all JVM-side, codegen-friendly).

Money math runs in **long cents**: double sums depend on accumulation
order (nondeterministic under parallelism) and Spark DECIMAL aggregation
with result precision >18 falls off the compact-long fast path (~20×
slower, measured in BENCH). ``round(x*100)`` as BIGINT is exact for
2-decimal inputs, sums stay in whole-stage codegen as plain long adds,
and DuckDB reproduces every bit. Final division by the scale factor
happens once, on identical integers, in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["cents", "cents_sum", "one_minus_cents", "one_plus_cents", "tokens"]


def cents(col: str | Column) -> Column:
    """2-decimal double → exact BIGINT hundredths (scale 1e2)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def cents_sum(col: str | Column, alias: str) -> Column:
    """Order-independent exact sum of a money column, surfaced as DOUBLE."""
    return (F.sum(cents(col)).cast("double") / F.lit(100.0)).alias(alias)


def one_minus_cents(col: str | Column) -> Column:
    """``100 - cents(col)`` — the factor ``(1 - x)`` at scale 1e2."""
    return F.lit(100) - cents(col)


def one_plus_cents(col: str | Column) -> Column:
    """``100 + cents(col)`` — the factor ``(1 + x)`` at scale 1e2."""
    return F.lit(100) + cents(col)


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization with empty-token removal.

    Generalizes the reference's per-use cast tokenizer
    (/root/reference/Code/mapReduce.erl:140-148): split + trim, done once,
    producing ArrayType(StringType).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda x: x != "")
