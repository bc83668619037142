"""Inherited relational surface (SURVEY.md §2.3-§2.8).

The reference takes joins/aggregations/windows/set-ops wholesale from
DataFusion (tests/cases/standalone/common/{join,aggregate,window,setops,
subquery,cte}); Spark SQL has native equivalents for all of them. These
queries lock that surface in against the DuckDB oracle on the driver's
TPC-H-ish tables.

Scale notes: dimension tables (region/nation/customer/supplier/part) are
broadcast; fact-side aggregations are partial-agg friendly groupBys; every
top-k is `orderBy().limit()` which Spark executes as TakeOrderedAndProject
(no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from greptimedb_spark.queries import QuerySpec, read, read_spread, table_view


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


# -- q01: TPC-H Q1-shaped pricing summary (groupBy agg, partial+final) --------

def q01_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    # spread on the (unused-downstream) high-card key: the decimal partial
    # aggregate is ~0.6 s serial on a single-row-group scan (r11 breakdown:
    # scan-only 0.36 s, double-agg 0.48 s, decimal-agg 1.05 s) — parallelize it.
    # Single SQL statement over the registered view: one Catalyst analysis
    # instead of an eager analysis per chained DataFrame op (r11 third pass).
    v = table_view(spark, sf, "lineitem", "l_orderkey")
    return spark.sql(f"""
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(AVG(CAST(l_quantity AS DECIMAL(18,2))), 4) AS DOUBLE) AS avg_qty,
       CAST(ROUND(AVG(CAST(l_discount AS DECIMAL(18,2))), 4) AS DOUBLE) AS avg_disc,
       COUNT(1) AS count_order
FROM {v}
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""")


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(AVG(CAST(l_quantity AS DECIMAL(18,2))), 4) AS DOUBLE) AS avg_qty,
       CAST(ROUND(AVG(CAST(l_discount AS DECIMAL(18,2))), 4) AS DOUBLE) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# -- q02: multi-way broadcast join, revenue rollup by region/nation -----------

def q02_revenue_by_nation(spark: SparkSession, sf: str) -> DataFrame:
    # spread: parallelizes the broadcast-join probes + decimal partial agg
    vl = table_view(spark, sf, "lineitem", "l_orderkey")
    vs = table_view(spark, sf, "supplier")
    vn = table_view(spark, sf, "nation")
    vr = table_view(spark, sf, "region")
    return spark.sql(f"""
SELECT /*+ BROADCAST(s), BROADCAST(n), BROADCAST(r) */ r_name, n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
       COUNT(1) AS n_items
FROM {vl} l
JOIN {vs} s ON l.l_suppkey = s.s_suppkey
JOIN {vn} n ON s.s_nationkey = n.n_nationkey
JOIN {vr} r ON n.n_regionkey = r.r_regionkey
GROUP BY r_name, n_name
""")


Q02_SQL = """
SELECT r_name, n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# -- q03: join + agg + deterministic top-k (TakeOrderedAndProject) -----------

def q03_top_orders(spark: SparkSession, sf: str) -> DataFrame:
    # spread ON the groupBy key: the 150k-group partial aggregate was serial
    # on the single-split scan, and hash-partitioning by l_orderkey lets the
    # groupBy reuse this exchange (no second shuffle). r11 A/B: 1.15→0.60 s.
    vl = table_view(spark, sf, "lineitem", "l_orderkey")
    vo = table_view(spark, sf, "orders")
    return spark.sql(f"""
SELECT o_orderkey, o_orderpriority, revenue
FROM {vo} o
JOIN (
  SELECT l_orderkey,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
  FROM {vl} GROUP BY l_orderkey
) r ON o.o_orderkey = r.l_orderkey
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 20
""")


Q03_SQL = """
SELECT o_orderkey, o_orderpriority, revenue
FROM orders
JOIN (
  SELECT l_orderkey,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
  FROM lineitem GROUP BY l_orderkey
) r ON o_orderkey = l_orderkey
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 20
"""


# -- q04: EXISTS semi-join (reference join/ tests exercise via subqueries) ----

def q04_priority_with_lineitems(spark: SparkSession, sf: str) -> DataFrame:
    o = read(spark, sf, "orders")
    l = read(spark, sf, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(l.select("l_orderkey").distinct(), o.o_orderkey == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q04_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
"""


# -- q05: ranking + analytic window functions (§2.5) --------------------------

def q05_window_functions(spark: SparkSession, sf: str) -> DataFrame:
    o = read(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.lag("o_totalprice", 1).over(w).cast("double").alias("prev_price"),
            F.lead("o_totalprice", 1).over(w).cast("double").alias("next_price"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(
                F.sum(_dec("o_totalprice")).over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
                2,
            )
            .cast("double")
            .alias("running_spend"),
        )
        .filter(F.col("o_custkey") % 10 == 0)
    )


Q05_SQL = """
SELECT o_custkey, o_orderkey,
       ROW_NUMBER() OVER w AS rn,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       CAST(LAG(o_totalprice, 1) OVER w AS DOUBLE) AS prev_price,
       CAST(LEAD(o_totalprice, 1) OVER w AS DOUBLE) AS next_price,
       NTILE(4) OVER w AS quartile,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_spend
FROM orders
WHERE o_custkey % 10 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
"""


# -- q06: set operations (§2.7) -----------------------------------------------

def q06_setops(spark: SparkSession, sf: str) -> DataFrame:
    c = read(spark, sf, "customer").select(F.col("c_nationkey").alias("nk"))
    s = read(spark, sf, "supplier").select(F.col("s_nationkey").alias("nk"))
    both = c.intersect(s).withColumn("src", F.lit("both"))
    cust_only = c.distinct().exceptAll(s.distinct()).withColumn("src", F.lit("cust_only"))
    return both.unionAll(cust_only)


Q06_SQL = """
SELECT nk, 'both' AS src FROM (SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey AS nk FROM supplier) t
UNION ALL
SELECT nk, 'cust_only' AS src FROM (SELECT DISTINCT c_nationkey AS nk FROM customer EXCEPT SELECT DISTINCT s_nationkey AS nk FROM supplier) t
"""


# -- q07: CTE + HAVING + join-back --------------------------------------------

def q07_cte_big_spenders(spark: SparkSession, sf: str) -> DataFrame:
    o = read(spark, sf, "orders")
    c = read(spark, sf, "customer")
    spend = (
        o.groupBy("o_custkey")
        .agg(F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("total_spend"),
             F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 8)
    )
    return (
        spend.join(broadcast(c), spend.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("total_spend"), 4).alias("avg_spend"),
        )
    )


Q07_SQL = """
WITH spend AS (
  SELECT o_custkey,
         CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_spend,
         COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 8
)
SELECT c_mktsegment, COUNT(*) AS n_customers, ROUND(AVG(total_spend), 4) AS avg_spend
FROM spend JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# -- q08: statistical aggregates (§2.4 surface) --------------------------------

def q08_stats(spark: SparkSession, sf: str) -> DataFrame:
    l = read(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 3).alias("std_price"),
        F.round(F.var_pop("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 5).alias("corr_qty_price"),
        F.round(F.covar_pop("l_quantity", "l_discount"), 5).alias("covar_qty_disc"),
        F.round(F.percentile("l_extendedprice", 0.5), 3).alias("median_price"),
        F.round(F.percentile("l_extendedprice", 0.9), 3).alias("p90_price"),
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
    )


Q08_SQL = """
SELECT l_returnflag,
       ROUND(STDDEV_SAMP(l_extendedprice), 3) AS std_price,
       ROUND(VAR_POP(l_discount), 6) AS var_disc,
       ROUND(CORR(l_quantity, l_extendedprice), 5) AS corr_qty_price,
       ROUND(COVAR_POP(l_quantity, l_discount), 5) AS covar_qty_disc,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 3) AS median_price,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 3) AS p90_price,
       CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
       CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
FROM lineitem
GROUP BY l_returnflag
"""


# -- q09: ROLLUP + GROUPING (GROUPING SETS family) ----------------------------

def q09_rollup(spark: SparkSession, sf: str) -> DataFrame:
    o = read(spark, sf, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("total"),
            F.grouping("o_orderstatus").alias("g_status"),
            F.grouping("o_orderpriority").alias("g_prio"),
        )
    )


Q09_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total,
       CAST(GROUPING(o_orderstatus) AS TINYINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS TINYINT) AS g_prio
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


# -- q10: conditional aggregation (CASE/if → when) -----------------------------

def q10_conditional_agg(spark: SparkSession, sf: str) -> DataFrame:
    # Single SQL statement over the registered view (r11: one Catalyst
    # analysis per build instead of one per chained op). Double literals use
    # the D suffix so the comparisons match the DataFrame form bit-for-bit.
    v = table_view(spark, sf, "lineitem")
    return spark.sql(f"""
SELECT l_linestatus,
       SUM(CASE WHEN l_discount > 0.05D THEN 1 ELSE 0 END) AS n_discounted,
       SUM(CASE WHEN l_tax = 0 THEN 1 ELSE 0 END) AS n_taxfree,
       CAST(ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS returned_value
FROM {v}
GROUP BY l_linestatus
""")


Q10_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
       CAST(SUM(CASE WHEN l_tax = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxfree,
       CAST(ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS returned_value
FROM lineitem
GROUP BY l_linestatus
"""


# -- q11: anti join -------------------------------------------------------------

def q11_customers_without_orders(spark: SparkSession, sf: str) -> DataFrame:
    c = read(spark, sf, "customer")
    o = read(spark, sf, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o.select("o_custkey").distinct(), c.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_idle_customers"))
    )


Q11_SQL = """
SELECT c_nationkey, COUNT(*) AS n_idle_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
GROUP BY c_nationkey
"""


# -- q12: correlated scalar subquery (decorrelated to join by both engines) ----

def q12_above_avg_orders(spark: SparkSession, sf: str) -> DataFrame:
    o = read(spark, sf, "orders")
    avg_per_cust = o.groupBy("o_custkey").agg(F.avg("o_totalprice").alias("avg_price"))
    return (
        o.alias("o")
        .join(avg_per_cust.alias("a"), F.col("o.o_custkey") == F.col("a.o_custkey"))
        .filter(F.col("o.o_totalprice") > F.col("a.avg_price") * 1.5)
        .groupBy("o.o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_above"))
    )


Q12_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_above
FROM orders o
WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey)
GROUP BY o_orderstatus
"""


# -- q13: distinct aggregates ---------------------------------------------------

def q13_distinct_aggs(spark: SparkSession, sf: str) -> DataFrame:
    l = read(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("nd_parts"),
        F.countDistinct("l_suppkey").alias("nd_supps"),
        F.round(F.sum_distinct(_dec("l_quantity")), 2).cast("double").alias("sum_d_qty"),
    )


Q13_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS nd_parts,
       COUNT(DISTINCT l_suppkey) AS nd_supps,
       CAST(ROUND(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_d_qty
FROM lineitem
GROUP BY l_returnflag
"""


# -- q14: first/last value per group (argmax; reference first_last.sql) --------

def q14_first_last(spark: SparkSession, sf: str) -> DataFrame:
    o = read(spark, sf, "orders")
    # Total order inside each customer: (o_orderdate, o_orderkey) is unique.
    return o.groupBy("o_custkey").agg(
        F.expr("min_by(o_orderkey, struct(o_orderdate, o_orderkey))").alias("first_order"),
        F.expr("max_by(o_orderkey, struct(o_orderdate, o_orderkey))").alias("last_order"),
        F.expr("max_by(o_totalprice, struct(o_orderdate, o_orderkey))").cast("double").alias("last_price"),
    ).filter(F.col("o_custkey") % 7 == 0)


Q14_SQL = """
SELECT o_custkey,
       (ARRAY_AGG(o_orderkey ORDER BY o_orderdate ASC, o_orderkey ASC))[1] AS first_order,
       (ARRAY_AGG(o_orderkey ORDER BY o_orderdate DESC, o_orderkey DESC))[1] AS last_order,
       CAST((ARRAY_AGG(o_totalprice ORDER BY o_orderdate DESC, o_orderkey DESC))[1] AS DOUBLE) AS last_price
FROM orders
WHERE o_custkey % 7 = 0
GROUP BY o_custkey
"""


# -- q15: inequality (theta) join — reference inequality_join.sql --------------

def q15_inequality_join(spark: SparkSession, sf: str) -> DataFrame:
    p = read(spark, sf, "part")
    # Bucketed self-join: parts in the same size bucket with strictly higher retail price.
    a = p.alias("a")
    b = p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_retailprice") > F.col("b.p_retailprice")),
        )
        .groupBy(F.col("a.p_size").alias("p_size"))
        .agg(F.count(F.lit(1)).alias("n_dominating_pairs"))
    )


Q15_SQL = """
SELECT a.p_size AS p_size, COUNT(*) AS n_dominating_pairs
FROM part a JOIN part b
  ON a.p_size = b.p_size AND a.p_retailprice > b.p_retailprice
GROUP BY a.p_size
"""


QUERIES = {
    "q01_pricing_summary": QuerySpec(q01_pricing_summary, Q01_SQL, "TPC-H Q1 groupBy agg"),
    "q02_revenue_by_nation": QuerySpec(q02_revenue_by_nation, Q02_SQL, "4-way broadcast join rollup"),
    "q03_top_orders": QuerySpec(q03_top_orders, Q03_SQL, "join + agg + deterministic top-k"),
    "q04_exists_semijoin": QuerySpec(q04_priority_with_lineitems, Q04_SQL, "EXISTS → left_semi"),
    "q05_window_functions": QuerySpec(q05_window_functions, Q05_SQL, "rank/lag/lead/ntile/running sum"),
    "q06_setops": QuerySpec(q06_setops, Q06_SQL, "INTERSECT/EXCEPT/UNION ALL"),
    "q07_cte_having": QuerySpec(q07_cte_big_spenders, Q07_SQL, "CTE + HAVING + join-back"),
    "q08_stats": QuerySpec(q08_stats, Q08_SQL, "stddev/var/corr/covar/percentile"),
    "q09_rollup": QuerySpec(q09_rollup, Q09_SQL, "ROLLUP + GROUPING"),
    "q10_conditional_agg": QuerySpec(q10_conditional_agg, Q10_SQL, "CASE-based aggregation"),
    "q11_anti_join": QuerySpec(q11_customers_without_orders, Q11_SQL, "NOT EXISTS → left_anti"),
    "q12_correlated_subquery": QuerySpec(q12_above_avg_orders, Q12_SQL, "correlated scalar subquery"),
    "q13_distinct_aggs": QuerySpec(q13_distinct_aggs, Q13_SQL, "COUNT/SUM DISTINCT"),
    "q14_first_last": QuerySpec(q14_first_last, Q14_SQL, "argmin/argmax per group"),
    "q15_inequality_join": QuerySpec(q15_inequality_join, Q15_SQL, "theta join with equi prefilter"),
}
