"""Physical-layout optimization: Z-order (Morton-curve) clustering.

Partition pruning and parquet row-group skipping work off per-file
min/max statistics; they only bite when the writer CLUSTERS the data so
each file covers a narrow slice of the filter columns. Sorting clusters
one column perfectly and leaves the second uncorrelated; interleaving
the bits of both columns (the Morton / Z-order curve) makes every file a
small rectangle in (c1, c2) space, so selective filters on EITHER column
skip most files — the OPTIMIZE ZORDER primitive of lakehouse engines,
here as a plain DataFrame transform + range-partitioned write.

Everything is built-in integer expressions (shifts, masks, unrolled
interleave) — JVM-side, codegen-friendly, no UDF.
"""

from __future__ import annotations

import threading

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from imdbmapreduce_spark.catalog import table
from imdbmapreduce_spark.registry import query

__all__ = [
    "morton_interleave",
    "zorder_key",
    "zorder_layout",
    "compact_parquet",
    "write_partitioned",
    "overwrite_partitions",
    "write_with_metrics",
    "write_bucketed_table",
    "bucketed_colocated_join",
    "ensure_bucketed_layout",
    "bucketed_layout_if_exists",
]

_BITS = 16  # per-dimension resolution; 2 dims × 16 bits = 32-bit key


def morton_interleave(u1: Column, u2: Column, bits: int = _BITS) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: u1's bit i
    lands at 2i+1, u2's at 2i — the Morton code. Unrolled shifts/masks,
    whole-stage-codegen friendly."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + (F.shiftleft(F.shiftrightunsigned(u1, i).bitwiseAND(F.lit(1)), 2 * i + 1))
            + (F.shiftleft(F.shiftrightunsigned(u2, i).bitwiseAND(F.lit(1)), 2 * i))
        )
    return z


def zorder_key(df: DataFrame, c1: str, c2: str, bits: int = _BITS) -> DataFrame:
    """Append a ``_z`` Morton key over two numeric columns.

    Each column is linearly scaled to [0, 2^bits) using its global
    min/max (two scalars to the driver — one cheap agg, the same pattern
    the exact-quantile plan uses). The scaling runs in DOUBLE and
    quantizes to an integer grid only at the end, so fractional columns
    (prices, ratios) keep their resolution instead of collapsing to a
    degenerate coordinate under an early integer cast. Linear scaling
    keeps the transform order-preserving per dimension, which is all the
    curve needs.

    An empty (or all-NULL) input has no min/max; the key degenerates to a
    constant 0 — the write is a no-op layout anyway.
    """
    lo1, hi1, lo2, hi2 = df.agg(
        F.min(c1), F.max(c1), F.min(c2), F.max(c2)
    ).first()
    if lo1 is None or lo2 is None:
        return df.withColumn("_z", F.lit(0).cast("long"))
    span1 = max(float(hi1) - float(lo1), 1e-12)
    span2 = max(float(hi2) - float(lo2), 1e-12)
    m = float((1 << bits) - 1)
    u1 = ((F.col(c1).cast("double") - float(lo1)) / span1 * m).cast("long")
    u2 = ((F.col(c2).cast("double") - float(lo2)) / span2 * m).cast("long")
    return df.withColumn("_z", morton_interleave(u1, u2, bits))


def zorder_layout(
    df: DataFrame, c1: str, c2: str, path: str, n_files: int = 8, bits: int = _BITS
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered along the
    Z-curve of (c1, c2): range-partition on the Morton key (a sampled
    range exchange — no global sort barrier), sort within each partition,
    drop the key, write.

    Scale: one range exchange + per-partition sort, the same cost as any
    ordered write; n_files tracks the table's size/file-size target. The
    payoff is at read time: per-file min/max on BOTH columns become
    tight, so predicate-driven file skipping works for either column —
    verified quantitatively in tests/test_layout.py (bounding-box area
    vs an unclustered write).
    """
    (
        zorder_key(df, c1, c2, bits)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark, src_dir: str, dst_dir: str, target_bytes: int = 128 << 20
) -> int:
    """Small-files maintenance: rewrite a parquet directory into
    right-sized files (~``target_bytes`` each, matching the scan-split
    size session.py configures); returns the file count written.

    The small-files problem is the steady-state failure of streaming
    sinks and over-parallel writers — thousands of KB-sized files turn
    every scan into open/footer overhead and every listing into a
    metadata storm. Compaction = one read + one round-robin repartition
    to ceil(total_bytes / target) + one write: even output sizes by
    construction (repartition, not coalesce — coalesce merges adjacent
    partitions and inherits their skew).

    Scale: this is the lakehouse OPTIMIZE primitive (without the
    transaction log); on object storage the same three-step plan runs
    with the listing swapped for the table manifest, and composes with
    :func:`zorder_layout` when the rewrite should also cluster.
    """
    import math
    import os
    import shutil

    total = 0
    for root, _, files in os.walk(src_dir):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    n = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(src_dir).repartition(n)
    if os.path.abspath(src_dir) == os.path.abspath(dst_dir):
        # in-place compaction: a direct overwrite would delete the source
        # files while the lazy scan still needs them (the indexstore
        # self-overwrite failure mode) — stage beside the target, then
        # swap with driver-side renames
        stage = dst_dir.rstrip("/") + ".compact-stage"
        old = dst_dir.rstrip("/") + ".compact-old"
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        df.write.parquet(stage)
        # Swap via rename-aside, not delete-then-rename: between rmtree
        # and os.replace the dataset would not exist at all, and a crash
        # there would strand the ONLY copy in a hidden stage dir. Here
        # the reader-visible gap is one rename, and a crash at any point
        # leaves a recoverable full copy (.compact-old or .compact-stage).
        os.replace(dst_dir, old)
        os.replace(stage, dst_dir)
        shutil.rmtree(old)
    else:
        df.write.mode("overwrite").parquet(dst_dir)
    return n


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet write: one ``col=value/`` directory
    per distinct partition tuple, so equality/IN filters on the partition
    columns prune at the DIRECTORY level — the listing never touches
    non-matching partitions, the strongest data-skipping there is.

    Choose LOW-cardinality columns (day, region, event_type): at 100 TB
    the failure mode is over-partitioning — millions of tiny dirs turn
    listings into the bottleneck and files into the small-files problem
    (see :func:`compact_parquet`). Rule of thumb: partitions of 1-10 GB.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """DYNAMIC partition overwrite: replace exactly the partitions the
    incoming DataFrame contains rows for; every other partition is left
    byte-identical. This is the idempotent daily-backfill primitive —
    re-running a day's job rewrites that day's directories and nothing
    else (static overwrite mode would first DELETE the whole table).

    Per-write option, not a session conf mutation (repo rule: no global
    state side effects from an operator).
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_with_metrics(
    df: DataFrame, path: str, metrics: dict[str, Column] | None = None
) -> dict:
    """Parquet write that OBSERVES pipeline metrics during the write
    itself — row count plus any caller-supplied aggregate expressions —
    via Spark's Observation API. One pass: the metrics accumulate on the
    executors as the rows stream to the sink, so there is no second scan
    and no extra job (``df.count(); df.write...`` reads the source
    twice — the naive form every pipeline starts with).

    This is the freshness/volume check a production ingest job records
    next to each output (rows written, sum of a value column, null
    counts) and alerts on. Returns the observed metric dict.

    Scale: observed aggregates must be commutative partial aggregates
    (Spark enforces this — no distinct/order-dependent metrics); cost is
    a few accumulator longs per task.
    """
    from pyspark.sql import Observation

    if metrics and "rows_written" in metrics:
        raise ValueError(
            "metric name 'rows_written' is reserved for the built-in row "
            "count — a duplicate observed column silently replaces it"
        )
    obs = Observation("write_metrics")
    exprs = [F.count(F.lit(1)).alias("rows_written")]
    for name, col in (metrics or {}).items():
        exprs.append(col.alias(name))
    df.observe(obs, *exprs).write.mode("overwrite").parquet(path)
    return obs.get


# --- driver-verified pruning audit -----------------------------------------

# Probe boxes in grid units [0, 2^_BITS): (name, lo1, hi1, lo2, hi2).
# Unconstrained dimensions carry the full range so flag/selection math is
# uniform across probes.
_GRID_MAX = (1 << _BITS) - 1
_PROBES = [
    ("c1_mid16", 28672, 32767, 0, _GRID_MAX),  # 1/16 slice of column 1
    ("c2_mid16", 0, _GRID_MAX, 28672, 32767),  # 1/16 slice of column 2
    ("both_low_quad", 0, 16383, 0, 16383),  # selective box on both
    ("c2_top16", 0, _GRID_MAX, 61440, _GRID_MAX),  # tail slice of column 2
]
_N_FILE_SHIFT = 28  # z in [0, 2^32) >> 28 -> 16 files
_SORT_SHIFT = _BITS - 4  # u1 >> 12 -> 16 files for the sorted-by-c1 layout


def _morton_sql(u1: str, u2: str, bits: int, dialect: str) -> str:
    """The Morton interleave as ONE parsed SQL expression (the round-8
    fresh-plan rule: O(bits)-term expression families parse once as SQL,
    not as a Python loop of Column ops). Spark spells shifts as
    functions, DuckDB as operators; the bit math is identical."""
    terms = []
    for i in range(bits):
        if dialect == "spark":
            terms.append(
                f"shiftleft(shiftrightunsigned({u1}, {i}) & 1, {2 * i + 1})"
                f" + shiftleft(shiftrightunsigned({u2}, {i}) & 1, {2 * i})"
            )
        else:
            terms.append(
                f"((({u1} >> {i}) & 1) << {2 * i + 1})"
                f" + ((({u2} >> {i}) & 1) << {2 * i})"
            )
    return "(" + " + ".join(terms) + ")"


def _zorder_oracle() -> str:
    probes_values = ",\n      ".join(
        f"('{p}', {a}, {b}, {c}, {d})" for p, a, b, c, d in _PROBES
    )
    return f"""
    WITH mm AS (
      SELECT CAST(MIN(l_orderkey) AS BIGINT) AS lo1,
             CAST(MAX(l_orderkey) AS BIGINT) AS hi1,
             CAST(MIN(l_partkey) AS BIGINT) AS lo2,
             CAST(MAX(l_partkey) AS BIGINT) AS hi2
      FROM lineitem
    ),
    g AS MATERIALIZED (
      SELECT ((CAST(l_orderkey AS BIGINT) - mm.lo1) * {_GRID_MAX})
               // GREATEST(mm.hi1 - mm.lo1, 1) AS u1,
             ((CAST(l_partkey AS BIGINT) - mm.lo2) * {_GRID_MAX})
               // GREATEST(mm.hi2 - mm.lo2, 1) AS u2
      FROM lineitem, mm
    ),
    z AS (SELECT u1, u2, {_morton_sql("u1", "u2", _BITS, "duckdb")} AS z FROM g),
    files AS (
      SELECT 'zorder' AS layout, z >> {_N_FILE_SHIFT} AS file_id, u1, u2 FROM z
      UNION ALL
      SELECT 'sorted_c1' AS layout, u1 >> {_SORT_SHIFT} AS file_id, u1, u2 FROM z
    ),
    stats AS (
      SELECT layout, file_id,
             MIN(u1) AS min1, MAX(u1) AS max1,
             MIN(u2) AS min2, MAX(u2) AS max2
      FROM files GROUP BY 1, 2
    ),
    probes(probe, plo1, phi1, plo2, phi2) AS (VALUES
      {probes_values}),
    scan AS (
      SELECT s.layout, p.probe,
             CAST(COUNT(*) AS BIGINT) AS n_files,
             CAST(SUM(CASE WHEN s.min1 <= p.phi1 AND s.max1 >= p.plo1
                            AND s.min2 <= p.phi2 AND s.max2 >= p.plo2
                           THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned
      FROM stats s CROSS JOIN probes p GROUP BY 1, 2
    ),
    sel AS (
      SELECT p.probe,
             CAST(SUM(CASE WHEN g.u1 BETWEEN p.plo1 AND p.phi1
                            AND g.u2 BETWEEN p.plo2 AND p.phi2
                           THEN 1 ELSE 0 END) AS BIGINT) AS rows_selected
      FROM g CROSS JOIN probes p GROUP BY 1
    )
    SELECT scan.layout, scan.probe, scan.n_files, scan.files_scanned,
           sel.rows_selected
    FROM scan JOIN sel USING (probe)
    """


@query("zorder_pruning_audit", oracle=_zorder_oracle())
def zorder_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified data-skipping audit for the Z-order layout: lay
    lineitem out 16-files-per-layout two ways — clustered on the
    Morton curve of (l_orderkey, l_partkey) vs sorted by l_orderkey
    alone — and for four probe boxes report how many files each
    layout's per-file min/max stats would let a scan SKIP. This is
    the measurement behind :func:`zorder_layout`'s claim (selective
    filters on EITHER column prune under Z-order; the single-column
    sort only prunes its own column), expressed as the file-pruning
    arithmetic every lakehouse reader runs against footer stats.

    Determinism: coordinates quantize to the 16-bit grid with pure
    integer arithmetic ((x-lo)·65535 // span — floor division on
    non-negatives, identical in both engines); file assignment is a
    value-range split of the key space (z >> 28 / u1 >> 12 — the
    static form of repartitionByRange, no sampling); probe bounds
    are literals. No floats anywhere.

    Plan: ONE pass over the scan computes both layouts' per-file
    stats (the layout twin-row explode is map-only); probe flags are
    literal-array explodes (map-only, no join); the rows-selected
    leg is a second aggregate over the same base. Total: two
    aggregations over one cached grid projection, a broadcast join
    of two ≤8-row results.

    Scale: per-file min/max over value-range files is exactly the
    parquet footer-stats model; at 100 TB file count grows with data
    but the stats table stays |files|-sized and the audit's cost is
    the one scan. Reference analog: the reference has no layout
    optimizer — this is north-star surface (SURVEY.md §2 additive).
    """
    li = table(spark, sf_dir, "lineitem")
    mm = li.agg(
        F.min("l_orderkey"),
        F.max("l_orderkey"),
        F.min("l_partkey"),
        F.max("l_partkey"),
    ).first()
    if mm[0] is None:
        return spark.createDataFrame(
            [],
            "layout string, probe string, n_files long, "
            "files_scanned long, rows_selected long",
        )
    lo1, hi1, lo2, hi2 = (int(v) for v in mm)
    span1, span2 = max(hi1 - lo1, 1), max(hi2 - lo2, 1)
    g = li.select(
        F.expr(
            f"((CAST(l_orderkey AS BIGINT) - {lo1}) * {_GRID_MAX}) div {span1}"
        ).alias("u1"),
        F.expr(
            f"((CAST(l_partkey AS BIGINT) - {lo2}) * {_GRID_MAX}) div {span2}"
        ).alias("u2"),
    ).withColumn("z", F.expr(_morton_sql("u1", "u2", _BITS, "spark")))

    files = g.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.shiftrightunsigned("z", _N_FILE_SHIFT).alias("file_id"),
                ),
                F.struct(
                    F.lit("sorted_c1").alias("layout"),
                    F.shiftrightunsigned("u1", _SORT_SHIFT).alias("file_id"),
                ),
            )
        ).alias("f"),
        "u1",
        "u2",
    ).select("f.layout", "f.file_id", "u1", "u2")
    stats = files.groupBy("layout", "file_id").agg(
        F.min("u1").alias("min1"),
        F.max("u1").alias("max1"),
        F.min("u2").alias("min2"),
        F.max("u2").alias("max2"),
    )
    scan = (
        stats.select(
            "layout",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(p).alias("probe"),
                            (
                                (F.col("min1") <= phi1)
                                & (F.col("max1") >= plo1)
                                & (F.col("min2") <= phi2)
                                & (F.col("max2") >= plo2)
                            )
                            .cast("long")
                            .alias("hit"),
                        )
                        for p, plo1, phi1, plo2, phi2 in _PROBES
                    ]
                )
            ).alias("x"),
        )
        .select("layout", "x.probe", "x.hit")
        .groupBy("layout", "probe")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("hit").alias("files_scanned"),
        )
    )
    sel = (
        g.agg(
            *[
                F.sum(
                    (
                        F.col("u1").between(plo1, phi1)
                        & F.col("u2").between(plo2, phi2)
                    ).cast("long")
                ).alias(p)
                for p, plo1, phi1, plo2, phi2 in _PROBES
            ]
        )
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(p).alias("probe"),
                            F.col(p).alias("rows_selected"),
                        )
                        for p, *_ in _PROBES
                    ]
                )
            ).alias("x")
        )
        .select("x.probe", "x.rows_selected")
    )
    return scan.join(F.broadcast(sel), "probe").select(
        "layout", "probe", "n_files", "files_scanned", "rows_selected"
    )




# --- small-file compaction planner (OPTIMIZE's planning half) ---------------

# Simulated current layout: the corpus as 64 written "files" (doc_id mod
# 64 — an over-parallel writer's output), sized by exact content bytes.
_CMP_FILES = 64
_CMP_TARGET = 16_384  # target output file size (bytes); scaled to fixture
# files at or above half the target are left alone (rewriting them buys
# nothing); everything smaller is packed into target-sized groups.
_CMP_SMALL = _CMP_TARGET // 2


@query(
    "file_compaction_plan",
    oracle=f"""
    WITH f AS (
      SELECT doc_id % {_CMP_FILES} AS file_id,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS bytes
      FROM documents GROUP BY 1
    ), s AS (
      SELECT file_id, n_docs, bytes, bytes < {_CMP_SMALL} AS is_small,
             CASE WHEN bytes < {_CMP_SMALL} THEN
               CAST(SUM(CASE WHEN bytes < {_CMP_SMALL} THEN bytes ELSE 0 END)
                    OVER (ORDER BY bytes DESC, file_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - bytes AS BIGINT)
             END AS off
      FROM f
    )
    SELECT file_id, n_docs, bytes,
           CASE WHEN is_small THEN 'compact' ELSE 'keep' END AS action,
           CASE WHEN is_small THEN off // {_CMP_TARGET} END AS target_file
    FROM s
    """,
)
def file_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction PLAN — the decision half of lakehouse
    OPTIMIZE (the execution half is :func:`compact_parquet`): per
    current file, keep it (already at least half the target size) or
    assign it to a target-sized merge group. Grouping is the
    deterministic sequential fill over files in (bytes DESC, file_id)
    order — the same running-sum assignment shape as
    ``pipeline.sequence_packing``, reused on purpose: file bin-packing
    and token packing are one primitive at different granularities.
    Size-descending order is the classic bin-packing heuristic (big
    items first ⇒ per-group waste bounded by the smallest member).

    The "files" are simulated (doc_id mod {_CMP_FILES}, sized by exact
    content bytes) because the planner's INPUT in production is the
    table manifest's (file, bytes) listing — a metadata-sized frame.
    That is also the scale story: the plan runs entirely on file STATS
    (one agg to |files| rows, then bounded-frame window math); no data
    moves until the execution half rewrites exactly the 'compact'
    groups.
    """
    docs = table(spark, sf_dir, "documents")
    files = docs.groupBy((F.col("doc_id") % _CMP_FILES).alias("file_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("bytes"),
    )
    is_small = F.col("bytes") < _CMP_SMALL
    w = (
        Window.orderBy(F.col("bytes").desc(), "file_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    small_bytes = F.when(is_small, F.col("bytes")).otherwise(F.lit(0))
    off = (F.sum(small_bytes).over(w) - F.col("bytes")).cast("long")
    return files.select(
        "file_id",
        "n_docs",
        "bytes",
        F.when(is_small, F.lit("compact")).otherwise(F.lit("keep")).alias("action"),
        F.when(is_small, F.floor(off / _CMP_TARGET)).alias("target_file"),
    )


# --- bucketed tables: co-located joins without the exchange ----------------

_N_BUCKETS = 16
# bump when the bucketed tables' schema/derivation changes: the tag keys
# the warehouse table names, so stale layouts are never silently reused
_BUCKET_SCHEMA_V = 1

_ENSURE_LOCK = threading.Lock()


def write_bucketed_table(
    df: DataFrame, name: str, key: str, n_buckets: int = _N_BUCKETS
) -> None:
    """Persist ``df`` as a warehouse table BUCKETED and SORTED on
    ``key``: rows are hash-partitioned into ``n_buckets`` files per
    write task and each file is sorted on the key, and the layout is
    recorded in the catalog. Every later equi-join between two tables
    bucketed on their join keys with the same bucket count — and every
    aggregation on the bucket key — then runs with ZERO exchanges: the
    scan itself satisfies the hash-partitioning requirement, and the
    per-file sort satisfies sort-merge join's ordering. This is the
    amortize-the-shuffle primitive for fact tables joined on the same
    key query after query (the r10-scale complement to partitionBy's
    directory pruning: partitioning prunes READS, bucketing removes
    SHUFFLES).

    Incremental maintenance: deliveries APPEND (``mode("append")`` with
    the same bucket spec) — Spark hashes new rows into the same bucket
    layout, so the exchange-free property survives arrivals without a
    rebuild (value + zero-exchange pin in tests/test_layout.py).

    SHARP EDGE — bucket counts must MATCH across join sides: the
    exchange-free sort-merge join requires both scans to report the
    same hash partitioning, and Spark's bucket hashing at count N is
    not a refinement of count 2N, so a 16-bucket table joined to a
    32-bucket table silently reintroduces the full shuffle on BOTH
    sides (the negative pin in tests/test_layout.py). Pick ONE count
    per join key family and size it for the end state, not today's
    data: buckets ≈ total_table_bytes / target_file_size (128-512 MB
    files), e.g. a 100 TB fact at 256 MB files wants ~400k buckets —
    and every table sharing the key uses the same number, even the
    small ones (their per-bucket files are tiny; that is the price of
    the standing co-location, paid at write time, not per query)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(name)
    )


def _bucketed_table_name(sf_dir: str, name: str) -> str:
    """Warehouse table name for a bucketed layout: corpus+schema md5
    tag PLUS the process id as a parseable ``_p<pid>`` suffix. The pid
    rides OUTSIDE the hash on purpose (ADVICE r11): bucketed tables are
    session-scoped anyway (in-memory catalog), so the nonce loses
    nothing, makes orphan clearing same-process-only by construction
    even in a SHARED warehouse (a session the engine didn't configure —
    an external driver's — uses cwd/spark-warehouse), and lets the
    sweep below reap any dead process's leftovers regardless of
    schema-tag vintage."""
    import hashlib
    import os

    tag = hashlib.md5(f"{sf_dir}|v{_BUCKET_SCHEMA_V}".encode()).hexdigest()[:8]
    return f"b_{name}_{tag}_p{os.getpid()}"


def _sweep_dead_bucketed_dirs(spark: SparkSession) -> None:
    """Remove ``b_*_p<pid>`` warehouse dirs whose owning process is gone
    — dead sessions' bucketed layouts are garbage by definition,
    whatever schema tag wrote them (the shared liveness probe lives in
    session.reap_dead_pid_dirs)."""
    from urllib.parse import urlparse

    from imdbmapreduce_spark.session import reap_dead_pid_dirs

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    if wh:
        reap_dead_pid_dirs(wh, r"b_.*_p(\d+)")


def _ensure_bucketed(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    key: str,
    build_df,
    n_buckets: int = _N_BUCKETS,
) -> str:
    """Shared once-per-(session, corpus) bucketed-table setup (factored
    from the two pair builders — ADVICE r11): returns the warehouse
    table name for ``name`` bucketed on ``key``, writing it from
    ``build_df()`` if this session hasn't yet. Table names carry a
    corpus+schema tag plus the pid nonce (:func:`_bucketed_table_name`);
    the in-memory catalog scopes them to the session, so a fresh
    session rebuilds (the same once-per-session contract as the index
    artifacts).

    Orphan clearing is same-PROCESS-only by construction: the pid is in
    the table name, so the pre-write rmtree can only ever hit a dir a
    previous session of THIS process left behind (in-memory catalog
    forgot it; CREATE would refuse the occupied path with
    LOCATION_ALREADY_EXISTS). Dead processes' leftovers — any schema
    vintage — are reaped by :func:`_sweep_dead_bucketed_dirs` on the
    first ensure of the session; engine-built sessions additionally
    run in a PID-scoped warehouse (session._warehouse_dir), making the
    shared-warehouse case the external-session fallback, not the
    norm."""
    import shutil
    from urllib.parse import urlparse

    tbl = _bucketed_table_name(sf_dir, name)
    # serialize concurrent first-ensures within the process: bench's
    # 4-lane TPC-H pass (and any user running q18 from two threads of
    # one session) must not race the exists-check/saveAsTable pair
    with _ENSURE_LOCK:
        if not spark.catalog.tableExists(tbl):
            _sweep_dead_bucketed_dirs(spark)
            wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
            if wh:
                shutil.rmtree(f"{wh}/{tbl.lower()}", ignore_errors=True)
            write_bucketed_table(build_df(), tbl, key, n_buckets)
    return tbl


def _bucketed_pair(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Idempotent setup of the bucketed orders/customer pair — the
    one-time layout cost a warehouse pays at ingest so every later
    custkey join is exchange-free (:func:`_ensure_bucketed`)."""
    bo = _ensure_bucketed(
        spark,
        sf_dir,
        "orders",
        "o_custkey",
        lambda: table(spark, sf_dir, "orders").select(
            "o_custkey",
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        ),
    )
    bc = _ensure_bucketed(
        spark,
        sf_dir,
        "customer",
        "c_custkey",
        lambda: table(spark, sf_dir, "customer").select("c_custkey", "c_name"),
    )
    return bo, bc


@query(
    "bucketed_colocated_join",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o.o_totalprice*100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
    """,
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order stats off the BUCKETED table pair — the
    co-located join the brief names as a first-class 100 TB lever:
    both sides were written bucketed+sorted on the join key
    (:func:`write_bucketed_table`, {n} buckets), so the sort-merge
    join needs NO exchange and NO sort on either side, and the
    downstream per-customer aggregation reuses the same bucketing —
    the whole plan runs without a single shuffle
    (tests/test_layout.py pins zero Exchange nodes, against >= 2 for
    the identical plain-parquet join).

    Why this matters at scale: a 100 TB fact table joined on the same
    key in every report pays its shuffle ONCE, at write time; the
    merge hint makes the demonstration explicit (Spark would otherwise
    broadcast the small test dim and hide the exchange question
    entirely — on the real cluster the dim side is a 100M-row customer
    table no one broadcasts). The oracle is the plain join over the
    raw parquet, so hash equality also proves the bucketed layout
    lost/duplicated nothing.

    Reference analog: the reference ships every partition to a fixed
    worker and queries it in place
    (/root/reference/Code/mapReduce.erl:24-46) — bucketing is that
    placement idea done declaratively, with the catalog carrying the
    layout contract instead of process state.
    """
    bo, bc = _bucketed_pair(spark, sf_dir)
    o, c = spark.table(bo), spark.table(bc)
    j = c.join(o.hint("merge"), c.c_custkey == o.o_custkey)
    return (
        j.groupBy(
            F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
        )
    )


bucketed_colocated_join.__doc__ = bucketed_colocated_join.__doc__.replace(
    "{n}", str(_N_BUCKETS)
)


def _bucketed_fact_pair(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """The FACT-FACT bucketed pair (lineitem + orders on the order
    key) — same :func:`_ensure_bucketed` contract as the dim pair."""
    bl = _ensure_bucketed(
        spark,
        sf_dir,
        "lineitem",
        "l_orderkey",
        lambda: table(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("line_cents"),
        ),
    )
    bo = _ensure_bucketed(
        spark,
        sf_dir,
        "orders_ok",
        "o_orderkey",
        lambda: table(spark, sf_dir, "orders").select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("order_cents"),
        ),
    )
    return bl, bo


# --- the standing-consumer seam (r11 verdict task 2) ------------------------

# Full-column bucketed twins a standing query can route through:
# (table, join key) -> the layout every consumer of that join edge
# shares. One bucket count per key family (see write_bucketed_table's
# sizing note) — lineitem and orders share the orderkey family.
BUCKETED_LAYOUTS = {
    ("lineitem", "l_orderkey"): "lineitem_ok_full",
    ("orders", "o_orderkey"): "orders_ok_full",
}


def ensure_bucketed_layout(
    spark: SparkSession, sf_dir: str, name: str, key: str
) -> str:
    """Build (once per session) the FULL-COLUMN bucketed twin of a
    catalog table on its standing join key, and return its warehouse
    table name. This is the ingest-time layout a production warehouse
    maintains for its hottest join edge; standing queries reach it
    through ``catalog.table(..., prefer_bucketed_on=...)``, which routes
    to the twin when it exists and falls back to plain parquet when it
    doesn't — so the same query text runs anywhere and goes
    exchange-free exactly where the layout investment was made.
    Column pruning still applies (the twin is parquet), so a narrow
    consumer reads narrow files either way."""
    layout = BUCKETED_LAYOUTS[(name, key)]
    return _ensure_bucketed(
        spark, sf_dir, layout, key, lambda: table(spark, sf_dir, name)
    )


def bucketed_layout_if_exists(
    spark: SparkSession, sf_dir: str, name: str, key: str
) -> str | None:
    """The read side of the seam: the warehouse table name of the
    full-column bucketed twin IF this session has built it, else None
    (caller falls back to plain parquet). Never builds — the write is
    an explicit ingest-time decision (:func:`ensure_bucketed_layout`),
    not a read-path side effect."""
    layout = BUCKETED_LAYOUTS.get((name, key))
    if layout is None:
        return None
    tbl = _bucketed_table_name(sf_dir, layout)
    return tbl if spark.catalog.tableExists(tbl) else None


@query(
    "bucketed_fact_fact_join",
    oracle="""
    SELECT o.o_orderkey AS orderkey,
           CAST(round(o.o_totalprice*100) AS BIGINT) AS order_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT)) AS BIGINT)
             AS line_cents
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
    """,
)
def bucketed_fact_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FACT-FACT co-located join — the case where bucketing is
    irreplaceable at 100 TB: lineitem ⨝ orders on the order key, with
    BOTH sides far too big to broadcast, so without the bucketed
    layout every run shuffles the two largest tables in the warehouse.
    Written bucketed+sorted once (:func:`write_bucketed_table`), the
    sort-merge join and the per-order aggregation both run with ZERO
    Exchange nodes (pinned in tests/test_layout.py beside the
    dim-join's pin).

    This is TPC-H's hottest join edge (q3/q4/q12/q18 all traverse it);
    the bucketed layout converts its per-query shuffle — the single
    largest recurring data movement in the schema — into a one-time
    write-side cost, which is exactly how production warehouses lay
    out their order/line tables. Oracle = the plain join over raw
    parquet (hash equality: the layout lost nothing).
    """
    bl, bo = _bucketed_fact_pair(spark, sf_dir)
    l, o = spark.table(bl), spark.table(bo)
    j = o.join(l.hint("merge"), o.o_orderkey == l.l_orderkey)
    return (
        j.groupBy(F.col("o_orderkey").alias("orderkey"), "order_cents")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("line_cents").alias("line_cents"),
        )
        .select("orderkey", "order_cents", "n_lines", "line_cents")
    )
