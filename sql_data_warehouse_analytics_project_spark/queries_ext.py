"""Oracle-checked queries: remaining Spark-surface coverage — CUBE
grouping sets, date/interval arithmetic, non-equi (theta) broadcast
joins, array functions, RANGE window frames, correlated subqueries
(SURVEY.md §2.3 theta-ON, §2.5 frame specs, §2.7 free extensions, §2.8
date/array scalar rows, P5 correlation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sql_data_warehouse_analytics_project_spark.functions.scalars import money
from sql_data_warehouse_analytics_project_spark.plans import lineage
from sql_data_warehouse_analytics_project_spark.queries import register
from sql_data_warehouse_analytics_project_spark.sources.readers import load_table


@register(
    "q28_cube",
    """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           o_orderstatus,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY CUBE (order_year, o_orderstatus)
    """,
)
def q28_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets — all 4 combinations of (year, status) subtotals.
    One pass: Spark expands grouping sets map-side, no extra scans."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("order_year"),
            "o_orderstatus",
            money("o_totalprice").alias("v"),
        )
        .cube("order_year", "o_orderstatus")
        .agg(
            F.sum("v").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "q29_date_arithmetic",
    """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           ROUND(CAST(SUM(date_diff('day', o_orderdate, l_shipdate)) AS DOUBLE)
                 / COUNT(*), 4) AS avg_ship_delay_days,
           CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY order_year, order_quarter
    """,
)
def q29_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 date/time scalars — datediff, date_add(INTERVAL), year/quarter
    (reference EXTRACT/AGE/INTERVAL sites, ``common_queries.py:374-378,
    540``). Avg is computed as SUM/COUNT in double on both sides so the
    arithmetic is bit-identical."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    j = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
    return (
        j.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.quarter("o_orderdate").alias("order_quarter"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.round(
                F.sum(F.datediff("l_shipdate", "o_orderdate")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_ship_delay_days"),
            F.sum(
                F.when(
                    F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_late"),
        )
    )


#: Price bands for the theta join — half-open [lo, hi).
PRICE_BANDS = [
    ("budget", 0, 50_000),
    ("mid", 50_000, 150_000),
    ("premium", 150_000, 300_000),
    ("luxury", 300_000, 10_000_000),
]


@register(
    "q30_theta_band_join",
    f"""
    SELECT b.band,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN (VALUES {", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in PRICE_BANDS)})
         AS b(band, lo, hi)
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def q30_theta_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 theta-ON — non-equi join against a tiny banding dimension.
    The band table is explicitly broadcast: Spark plans a
    BroadcastNestedLoopJoin, so the fact side streams with no shuffle —
    the only sane physical strategy for interval predicates at scale."""
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(PRICE_BANDS, "band string, lo long, hi long")
    j = orders.join(
        F.broadcast(bands),
        (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
    )
    return j.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(money("o_totalprice")).cast("double").alias("revenue"),
    )


@register(
    "q31_array_functions",
    """
    SELECT l_orderkey,
           list_sort(list(l_linenumber)) AS line_numbers,
           CAST(len(list(l_linenumber)) AS INTEGER) AS n_lines,
           list_contains(list(l_linenumber), 7) AS has_line_7
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    GROUP BY l_orderkey
    """,
)
def q31_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 array scalars — collect_list/sort_array/size/array_contains
    (reference ARRAY path accumulator, ``data_lineage.py:393,413,420``).
    collect_list is order-nondeterministic distributed, so the array is
    sorted before compare — the same discipline the lineage BFS uses."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_orderkey") % 100 == 0)
        .groupBy("l_orderkey")
        .agg(
            F.sort_array(F.collect_list("l_linenumber")).alias("line_numbers"),
            F.count(F.lit(1)).cast("int").alias("n_lines"),
        )
        .select(
            "l_orderkey",
            "line_numbers",
            "n_lines",
            F.array_contains("line_numbers", 7).alias("has_line_7"),
        )
    )


@register(
    "q32_range_frame",
    """
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 29 DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_30d_spend
    FROM orders
    """,
)
def q32_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 frame specs — RANGE frame (value-based, vs q12's ROWS frame):
    30-day rolling spend per customer. Spark range frames need a numeric
    ORDER BY, so the date becomes a day index; RANGE semantics (all peers
    of the current value included) then match the oracle's INTERVAL frame
    exactly."""
    orders = load_table(spark, sf_dir, "orders")
    day_idx = F.datediff("o_orderdate", F.lit("1990-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day_idx)
        .rangeBetween(-29, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(money("o_totalprice")).over(w).cast("double").alias("rolling_30d_spend"),
    )


@register(
    "q33_correlated_subquery",
    """
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders o
    WHERE o_totalprice > (
        SELECT 1.5 * CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*)
        FROM orders i WHERE i.o_custkey = o.o_custkey
    )
    """,
)
def q33_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 correlation — orders 50% above their customer's average order
    value. The DataFrame plan is the decorrelated form (groupBy + equi
    join) — exactly the rewrite a SQL optimizer applies; the per-customer
    aggregate is tiny relative to the fact side and shuffles once on the
    join key. Average computed as SUM/COUNT in double on both sides."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        (
            F.lit(1.5)
            * F.sum(money("o_totalprice")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bar")
    )
    return (
        orders.join(per_cust, "o_custkey")
        .filter(F.col("o_totalprice") > F.col("avg_bar"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
        )
    )


@register(
    "q34_recursive_traversal",
    """
    WITH RECURSIVE edges AS (
      SELECT DISTINCT 'crm.customer_' || (c_custkey % 100) AS src,
                      'src.nation_' || c_nationkey AS dst
      FROM customer
      UNION
      SELECT DISTINCT 'src.nation_' || n_nationkey,
                      'silver.region_' || n_regionkey
      FROM nation
      UNION
      SELECT DISTINCT 'silver.region_' || r_regionkey, 'gold.world'
      FROM region
    ), walk AS (
      SELECT 'gold.world' AS node, 0 AS depth, ['gold.world'] AS path
      UNION ALL
      SELECT e.src, w.depth + 1, list_append(w.path, e.src)
      FROM walk w JOIN edges e ON e.dst = w.node
      WHERE NOT list_contains(w.path, e.src) AND w.depth < 4
    )
    SELECT node,
           CAST(MIN(depth) AS INTEGER) AS depth,
           CAST(COUNT(DISTINCT array_to_string(path, '/')) AS BIGINT) AS n_paths
    FROM walk WHERE depth > 0 GROUP BY node
    """,
)
def q34_recursive_traversal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/U3/L8 — recursive upstream traversal (reference recursive CTE
    with ARRAY path + cycle guard, ``logs/data_lineage.py:378-435``) as the
    engine's iterative DataFrame BFS, oracle-checked against DuckDB's real
    WITH RECURSIVE on the same edge list. The DAG is derived from the
    TPC-H FK structure (customer-bucket → nation → region → world), so
    fan-out and multi-path counts are data-dependent, not hand-written."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    e1 = customer.select(
        F.lit("crm").alias("source_schema"),
        F.concat(F.lit("customer_"), F.col("c_custkey") % 100).alias("source_table"),
        F.lit("src").alias("target_schema"),
        F.concat(F.lit("nation_"), F.col("c_nationkey")).alias("target_table"),
    ).distinct()
    e2 = nation.select(
        F.lit("src").alias("source_schema"),
        F.concat(F.lit("nation_"), F.col("n_nationkey")).alias("source_table"),
        F.lit("silver").alias("target_schema"),
        F.concat(F.lit("region_"), F.col("n_regionkey")).alias("target_table"),
    ).distinct()
    e3 = region.select(
        F.lit("silver").alias("source_schema"),
        F.concat(F.lit("region_"), F.col("r_regionkey")).alias("source_table"),
        F.lit("gold").alias("target_schema"),
        F.lit("world").alias("target_table"),
    ).distinct()
    edges = e1.unionByName(e2).unionByName(e3)
    walk = lineage.traverse(edges, "gold.world", "upstream", max_depth=4)
    return walk.groupBy("node").agg(
        F.min("depth").cast("int").alias("depth"),
        F.countDistinct(F.array_join("path", "/")).alias("n_paths"),
    )
