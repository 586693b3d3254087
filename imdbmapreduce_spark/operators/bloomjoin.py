"""Bloom-filter semi-join reduction with a false-positive audit.

THE shuffle-avoidance pattern for selective joins at 100 TB: instead of
shuffling the fact table to join a selective dimension, broadcast a
compact Bloom filter of the dimension keys, pre-filter the fact scan,
and run the exact join only on the survivors. Spark's own runtime-filter
feature (``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects
exactly this plan; the operator here builds the filter EXPLICITLY —
deterministic md5-derived hash positions, so DuckDB reproduces every bit
— and audits what the engine-internal feature never exposes: the
measured false-positive rate against the exact semi-join.

Generalizes the reference's broadcast probe set (X4,
/root/reference/Code/master.erl:210-240 ships full name lists to every
worker): a Bloom of m bits replaces the full key set when the build side
stops fitting in a broadcast — the 100 TB continuation of the same idea.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from imdbmapreduce_spark.catalog import table
from imdbmapreduce_spark.registry import query

# Demonstration-scale parameters, deliberately small so the audit has
# something to measure at bench scale (sf0.1: ~40 build keys -> expected
# fp ~0.9% over ~960 negative keys). Production sizing is
# m = -n*ln(p)/(ln 2)^2, k = (m/n)*ln 2; the audit below is the query
# you run to confirm the sizing held after the data grew.
BLOOM_M_BITS = 512
BLOOM_K_HASHES = 3
_BLOOM_NATION = "NATION_7"  # build side: suppliers of one nation


def _pos_expr_spark(key: Column, i: int) -> Column:
    """Hash position i of a key: leading 32 bits of md5('bloom:i:key'),
    mod m. Same string recipe as the DuckDB oracle — bit-identical."""
    h = F.md5(F.concat_ws(":", F.lit("bloom"), F.lit(str(i)), key.cast("string")))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % BLOOM_M_BITS
    ).alias(f"pos_{i}")


def _pos_expr_sql(key_sql: str, i: int) -> str:
    return (
        f"CAST(CONCAT('0x', substr(md5(CONCAT('bloom:{i}:', "
        f"CAST({key_sql} AS VARCHAR))), 1, 8)) AS BIGINT) % {BLOOM_M_BITS}"
    )


def _bloom_oracle_sql() -> str:
    k = BLOOM_K_HASHES
    build_pos = " UNION ".join(
        f"SELECT DISTINCT {_pos_expr_sql('s_suppkey', i)} AS pos FROM build"
        for i in range(k)
    )
    probe_pos = " UNION ALL ".join(
        f"SELECT skey, {_pos_expr_sql('skey', i)} AS pos FROM probe_keys"
        for i in range(k)
    )
    return f"""
    WITH build AS (
      SELECT s_suppkey FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = '{_BLOOM_NATION}'
    ), bloom AS ({build_pos}),
    probe_keys AS (
      SELECT DISTINCT l_suppkey AS skey FROM lineitem
    ), probe_pos AS ({probe_pos}),
    matched AS (
      SELECT p.skey, CAST(COUNT(b.pos) AS BIGINT) AS n_hit
      FROM probe_pos p LEFT JOIN bloom b ON p.pos = b.pos
      GROUP BY p.skey
    ), classified AS (
      SELECT m.skey,
             (m.n_hit = {k}) AS bloom_pass,
             (bu.s_suppkey IS NOT NULL) AS is_member
      FROM matched m LEFT JOIN build bu ON m.skey = bu.s_suppkey
    ), rows_per_key AS (
      SELECT l_suppkey AS skey, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem GROUP BY 1
    )
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM build) AS n_build_keys,
      CAST({BLOOM_M_BITS} AS BIGINT) AS m_bits,
      CAST({k} AS BIGINT) AS k_hashes,
      (SELECT CAST(COUNT(DISTINCT pos) AS BIGINT) FROM bloom) AS n_set_bits,
      CAST(COUNT(*) AS BIGINT) AS n_probe_keys,
      CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
        AS n_pass_keys,
      CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
        AS n_true_keys,
      CAST(SUM(CASE WHEN bloom_pass AND NOT is_member THEN 1 ELSE 0 END)
           AS BIGINT) AS n_fp_keys,
      CAST(SUM(r.n_rows) AS BIGINT) AS n_probe_rows,
      CAST(SUM(CASE WHEN bloom_pass THEN r.n_rows ELSE 0 END) AS BIGINT)
        AS n_pass_rows,
      CAST(SUM(CASE WHEN is_member THEN r.n_rows ELSE 0 END) AS BIGINT)
        AS n_true_rows,
      CASE WHEN SUM(CASE WHEN NOT is_member THEN 1 ELSE 0 END) = 0
           THEN 0.0
           ELSE CAST(SUM(CASE WHEN bloom_pass AND NOT is_member THEN 1 ELSE 0 END)
                     AS DOUBLE)
                / SUM(CASE WHEN NOT is_member THEN 1 ELSE 0 END)
      END AS fp_rate
    FROM classified c JOIN rows_per_key r ON c.skey = r.skey
    """


@query("bloom_semijoin_audit", oracle=_bloom_oracle_sql())
def bloom_semijoin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom semi-join reduction, audited: build a {BLOOM_M_BITS}-bit /
    {BLOOM_K_HASHES}-hash Bloom filter over a selective build side (the
    suppliers of one nation), classify every probe key (distinct
    lineitem supplier) as bloom-pass vs true member, and report the
    filter's measured effectiveness — set bits, pass/true/false-positive
    key counts, the row volumes the filter would admit vs the exact
    semi-join, and the realized false-positive rate.

    Semantics guarantee under test: a Bloom filter has NO false
    negatives — every true member passes (n_pass >= n_true always;
    the exact join after the filter removes the n_fp leakage), so
    pre-filtering a scan with it never changes the final join result.

    Determinism: positions are md5('bloom:i:key') leading 32 bits mod m
    — bit-identical in both engines (the corpus_shard_manifest idiom);
    every count is exact-integer; fp_rate is one exact-int division
    exported as the only double.

    Plan: the filter is the DISTINCT of build_keys x k positions —
    at most m=512 values regardless of build cardinality, broadcast
    to the probe side (BroadcastHashJoin); probe classification is one
    distinct on the probe key + k exploded position lookups against the
    broadcast + one membership lookup against the (also broadcast)
    build; row-volume weighting joins the per-key row counts computed
    by one map-side-combinable aggregate over the fact table. The fact
    table is never shuffled.

    Scale: at 100 TB the filter stays m bits however large the build
    side grows (vs broadcasting the full key set, which dies first),
    the probe-key distinct is the only exchange, and the audited
    fp_rate is the signal that m needs resizing before the pruned join
    silently degrades to a full shuffle's worth of leaked rows.
    """
    k = BLOOM_K_HASHES
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation").filter(F.col("n_name") == _BLOOM_NATION)
    build = sup.join(
        F.broadcast(nat), sup.s_nationkey == nat.n_nationkey
    ).select("s_suppkey")
    bloom = (
        build.select(
            F.explode(
                F.array(*[_pos_expr_spark(F.col("s_suppkey"), i) for i in range(k)])
            ).alias("pos")
        )
        .distinct()
    )
    li = table(spark, sf_dir, "lineitem")
    rows_per_key = li.groupBy(F.col("l_suppkey").alias("skey")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    probe = rows_per_key.select("skey")
    probe_pos = probe.select(
        "skey",
        F.explode(
            F.array(*[_pos_expr_spark(F.col("skey"), i) for i in range(k)])
        ).alias("pos"),
    )
    matched = (
        probe_pos.join(F.broadcast(bloom), "pos", "left_semi")
        .groupBy("skey")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    classified = (
        probe.join(matched, "skey", "left")
        .join(
            F.broadcast(build.select(F.col("s_suppkey").alias("skey"), F.lit(True).alias("mem"))),
            "skey",
            "left",
        )
        .select(
            "skey",
            (F.coalesce(F.col("n_hit"), F.lit(0)) == k).alias("bloom_pass"),
            F.coalesce(F.col("mem"), F.lit(False)).alias("is_member"),
        )
    )
    per_key = classified.join(rows_per_key, "skey")
    agg = per_key.agg(
        F.count(F.lit(1)).cast("long").alias("n_probe_keys"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0)).cast("long").alias("n_pass_keys"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0)).cast("long").alias("n_true_keys"),
        F.sum(F.when(F.col("bloom_pass") & ~F.col("is_member"), 1).otherwise(0))
        .cast("long")
        .alias("n_fp_keys"),
        F.sum("n_rows").cast("long").alias("n_probe_rows"),
        F.sum(F.when(F.col("bloom_pass"), F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("n_pass_rows"),
        F.sum(F.when(F.col("is_member"), F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("n_true_rows"),
        F.sum(F.when(~F.col("is_member"), 1).otherwise(0)).cast("long").alias("_n_neg"),
    )
    consts = build.agg(F.count(F.lit(1)).cast("long").alias("n_build_keys")).crossJoin(
        bloom.agg(F.count(F.lit(1)).cast("long").alias("n_set_bits"))
    )
    return (
        consts.crossJoin(agg)
        .select(
            "n_build_keys",
            F.lit(BLOOM_M_BITS).cast("long").alias("m_bits"),
            F.lit(k).cast("long").alias("k_hashes"),
            "n_set_bits",
            "n_probe_keys",
            "n_pass_keys",
            "n_true_keys",
            "n_fp_keys",
            "n_probe_rows",
            "n_pass_rows",
            "n_true_rows",
            # Guard the all-members corpus (_n_neg = 0): Spark's x/0 is
            # NULL while DuckDB's can differ by settings — pin 0.0.
            F.when(F.col("_n_neg") == 0, F.lit(0.0))
            .otherwise(F.col("n_fp_keys").cast("double") / F.col("_n_neg"))
            .alias("fp_rate"),
        )
    )
