"""TPC-H suite completion, part 1 — the five correlated/nested shapes
(Q2, Q8, Q9, Q11, Q20 adaptations) that round 3 left uncovered.

With these plus relational.py's tail (Q6/Q12/Q15) the engine adapts all
22 TPC-H query shapes to the driver's star schema. The schema has no
``partsupp`` table and lineitem carries no commitdate/receiptdate/shipmode,
so the partsupp-rooted queries are re-rooted on lineitem as the
part-supplier bridge — the *shape* (correlated min, market-share ratio,
scalar-subquery threshold, dominant-share semi-join) is preserved, which
is what the reference's dataflow generalization is about
(/root/reference/Code/mapReduce.erl:44-105 does filter/agg/intersect; these
are the industry-standard compositions of the same primitives).

Registration order: this module imports AFTER the multimodal vertical and
BEFORE streaming — its queries have no driver CORRECTNESS row yet, and the
driver sweeps in registration order under a ~50-query budget, so the five
land at indices 39-43 with streaming still inside the budget
(tests/test_scale_claims.py pins both invariants).

Money math in long cents throughout (see imdbmapreduce_spark.functions);
ratios are double divisions of identical integers in both engines, so
hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from imdbmapreduce_spark.catalog import table
from imdbmapreduce_spark.functions import cents, one_minus_cents
from imdbmapreduce_spark.registry import query

_C = "CAST(round({col}*100) AS BIGINT)"


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN({_C.format(col='l_extendedprice')}) AS cost_cents
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey, MIN(cost_cents) AS best_cents
      FROM cost GROUP BY l_partkey
    )
    SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal,
           s_name, n_name,
           c.l_partkey AS p_partkey, p_name,
           CAST(c.cost_cents AS DOUBLE)/100.0 AS supply_cost
    FROM cost c
    JOIN best b ON c.l_partkey = b.l_partkey AND c.cost_cents = b.best_cents
    JOIN part     ON c.l_partkey = p_partkey
    JOIN supplier ON c.l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_type = 'LARGE' AND p_size <= 15
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery — for each qualifying part,
    the EUROPE supplier(s) achieving the minimum supply cost.

    Adaptation: no partsupp table, so supply cost := the minimum observed
    line price (exact long cents) per (part, supplier) in lineitem.

    Scale: the correlated `= (SELECT MIN ...)` decorrelates into one
    grouped aggregation (part, supplier) plus a per-part min — here the
    per-part min is a window over the already-aggregated cost relation,
    which is |parts|×|suppliers| at most, orders of magnitude smaller
    than the fact. The region filter prunes suppliers BEFORE the fact
    aggregation (broadcast semi side), so the big groupBy only sees
    EUROPE lines. part/supplier/nation are broadcast into the slim cost
    relation for the final decoration. Top-100 is TakeOrdered with a
    total order.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 15)
    )
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.join(
            F.broadcast(euro_supp.select("s_suppkey")),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(cents("l_extendedprice")).alias("cost_cents"))
    )
    best = F.min("cost_cents").over(Window.partitionBy("l_partkey"))
    return (
        cost.withColumn("best_cents", best)
        .filter(F.col("cost_cents") == F.col("best_cents"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(F.broadcast(euro_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            (F.col("cost_cents").cast("double") / 100.0).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CASE WHEN sn.n_name = 'NATION_1'
                         THEN {_C.format(col='l_extendedprice')}
                              * (100 - {_C.format(col='l_discount')})
                         ELSE 0 END) AS DOUBLE)
             / CAST(SUM({_C.format(col='l_extendedprice')}
                        * (100 - {_C.format(col='l_discount')})) AS DOUBLE)
             AS mkt_share,
           CAST(SUM({_C.format(col='l_extendedprice')}
                    * (100 - {_C.format(col='l_discount')})) AS DOUBLE)/10000.0
             AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region   ON cn.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN part     ON l_partkey = p_partkey
    WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY year(o_orderdate)
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — NATION_1's fraction of
    ECONOMY-part revenue sold into AMERICA, by order year.

    Scale: the ratio-of-conditional-sums form needs NO self-join — one
    pass over the filtered fact with two parallel long accumulators per
    year. nation/region are bounded broadcasts; customer/supplier/part
    carry no hint (AQE decides). The share is a double division of two
    exact longs, bit-identical across engines. Shuffle carries |years|
    groups after map-side combine.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = table(spark, sf_dir, "customer")
    cn = table(spark, sf_dir, "nation").alias("cn")
    sn = (
        table(spark, sf_dir, "nation")
        .select(
            F.col("n_nationkey").alias("sn_nationkey"),
            F.col("n_name").alias("sn_name"),
        )
    )
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    supp = table(spark, sf_dir, "supplier")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    vol = cents("l_extendedprice") * one_minus_cents("l_discount")
    nation_vol = F.sum(F.when(F.col("sn_name") == "NATION_1", vol).otherwise(F.lit(0)))
    total_vol = F.sum(vol)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn.n_nationkey"))
        .join(F.broadcast(region), F.col("cn.n_regionkey") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_nationkey"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (nation_vol.cast("double") / total_vol.cast("double")).alias("mkt_share"),
            (total_vol.cast("double") / 10000.0).alias("volume"),
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT sn.n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM({_C.format(col='l_extendedprice')}
                    * (100 - {_C.format(col='l_discount')})
                    - {_C.format(col='p_retailprice')}
                      * {_C.format(col='l_quantity')}) AS DOUBLE)/10000.0
             AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY sn.n_name, year(o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and year
    over a part-name LIKE filter.

    Adaptation: no ps_supplycost, so unit cost := p_retailprice; profit =
    disc_price − retailprice×quantity, both terms at scale 1e4 in exact
    longs (cents × cents), summed as a single long accumulator.

    Scale: the LIKE '%widget%' filter cannot prune at the parquet
    footer (no leading prefix) but DOES slash the part dim before the
    fact join — part is the broadcast side, so the fact shuffles once on
    orderkey for the orders join. Group count is |nations|×|years|
    (bounded), map-side combined.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = table(spark, sf_dir, "supplier")
    sn = (
        table(spark, sf_dir, "nation")
        .select(
            F.col("n_nationkey").alias("sn_nationkey"),
            F.col("n_name").alias("nation"),
        )
    )
    orders = table(spark, sf_dir, "orders")
    profit = cents("l_extendedprice") * one_minus_cents("l_discount") - cents(
        "p_retailprice"
    ) * cents("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_nationkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg((F.sum(profit).cast("double") / 10000.0).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "q11_important_stock",
    oracle=f"""
    WITH v AS (
      SELECT l_partkey,
             SUM({_C.format(col='l_extendedprice')}) AS value_cents
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_nationkey = 7
      GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey,
           CAST(value_cents AS DOUBLE)/100.0 AS total_value
    FROM v
    WHERE value_cents * 1000 > (SELECT SUM(value_cents) FROM v)
    ORDER BY total_value DESC, p_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value filtered against a global scalar
    threshold (HAVING > fraction × grand total) for one nation's suppliers.

    Adaptation: no partsupp, so value := summed extended price of
    NATION_7-supplied lines per part; threshold = 0.1% of that nation's
    grand total. The comparison runs in integers (value×1000 > total), so
    no float threshold ambiguity exists between engines.

    Scale: the per-part aggregate and its grand total REUSE one shuffle —
    the grand total is a second-level agg over the |parts|-sized result,
    then a 1-row broadcast joined back (BroadcastNestedLoop over a
    single-row build side — the scalar-subquery shape, bounded by
    construction). The nation filter broadcasts a pruned supplier set
    into the fact scan.
    """
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 7)
    v = (
        li.join(F.broadcast(supp.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(cents("l_extendedprice")).alias("value_cents"))
    )
    total = v.agg(F.sum("value_cents").alias("grand_cents"))
    return (
        v.join(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("grand_cents"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("value_cents").cast("double") / 100.0).alias("total_value"),
        )
        .orderBy(F.desc("total_value"), "p_partkey")
    )


@query(
    "q20_dominant_suppliers",
    oracle=f"""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             SUM({_C.format(col='l_quantity')}) AS qty_cents
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ),
    part_total AS (
      SELECT l_partkey, SUM(qty_cents) AS part_cents
      FROM shipped GROUP BY l_partkey
    )
    SELECT s_suppkey, s_name, n_name,
           COUNT(*) AS n_dominated_parts
    FROM shipped sh
    JOIN part_total pt ON sh.l_partkey = pt.l_partkey
    JOIN supplier ON sh.l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE sh.qty_cents * 10 >= pt.part_cents * 3
    GROUP BY s_suppkey, s_name, n_name
    ORDER BY s_suppkey
    """,
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers selected by a correlated-threshold
    aggregate over their shipped share of specific parts.

    Adaptation: no partsupp availqty, so the predicate becomes "supplied
    ≥30% of a small-named part's 1996 shipped quantity" — the same
    nested structure (inner name-filtered part set, correlated per-part
    aggregate, outer semi-join to supplier) with the threshold compared
    in exact integers (qty×10 ≥ total×3).

    Scale: both aggregates reuse the (partkey) shuffle — part_total is a
    regrouping of the |parts|×|suppliers| `shipped` relation, re-joined
    on partkey (AQE broadcasts it: it is ≤|parts| rows). The name/date
    filters prune the fact before any exchange; supplier/nation decorate
    the final slim result via broadcast.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    shipped = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(cents("l_quantity")).alias("qty_cents"))
    )
    part_total = shipped.groupBy("l_partkey").agg(
        F.sum("qty_cents").alias("part_cents")
    )
    return (
        shipped.join(
            part_total.withColumnRenamed("l_partkey", "pt_partkey"),
            shipped.l_partkey == F.col("pt_partkey"),
        )
        .filter(F.col("qty_cents") * 10 >= F.col("part_cents") * 3)
        .join(F.broadcast(supp), shipped.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("s_suppkey", "s_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
        .orderBy("s_suppkey")
    )
