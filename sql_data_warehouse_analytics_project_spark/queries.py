"""Oracle-checked query catalog — the driver-facing surface of the engine.

Each entry pairs a Spark implementation (built from the operator library,
``operators/``) with an ANSI-SQL oracle DuckDB runs on the same parquet.
Registry keys map 1:1 to SURVEY.md §2 operator rows (noted per query).

Determinism contract (why these hash-match a single-threaded oracle):
- Money math casts the 2-decimal doubles to ``DECIMAL(18,2)`` first
  (exact, order-independent sums — see ``functions.scalars.MONEY``), and
  casts back to DOUBLE only in the final projection. Both sides do the
  identical cast chain.
- Every aggregate/computed column is aliased identically on both sides.
- Counts are BIGINT on both sides (DuckDB aggregates are CAST explicitly).
- Ordering never matters (driver compare is order-insensitive) except
  where LIMIT/OFFSET applies, which always rides a total order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sql_data_warehouse_analytics_project_spark.functions.scalars import money
from sql_data_warehouse_analytics_project_spark.operators import (
    aggregates,
    joins,
    relational,
    setops,
    windows,
)
from sql_data_warehouse_analytics_project_spark.sources.readers import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# One decimal literal used on both sides for (1 - discount).
_ONE = "CAST(1 AS DECIMAL(18,2))"
_REV = f"CAST(l_extendedprice AS DECIMAL(18,2)) * ({_ONE} - CAST(l_discount AS DECIMAL(18,2)))"


# ---------------------------------------------------------------------------
# §2.2 Projections / filters
# ---------------------------------------------------------------------------


@register(
    "q01_filter_project",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 5000
    """,
)
def q01_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2 — select_builder + where_builder (dict conditions → predicate)."""
    customer = load_table(spark, sf_dir, "customer")
    return relational.select(
        customer,
        ["c_custkey", "c_name", "c_acctbal"],
        conditions=[
            {"column": "c_mktsegment", "operator": "=", "value": "BUILDING"},
            {"column": "c_acctbal", "operator": ">", "value": 5000},
        ],
    )


@register(
    "q02_topk_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q02_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O4 — top-k via TakeOrderedAndProject (no global sort)."""
    orders = load_table(spark, sf_dir, "orders")
    return relational.top_k(
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        10,
    )


@register(
    "q19_in_subquery",
    """
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
    """,
)
def q19_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/J2 — IN (subquery) → left-semi join."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    hot = lineitem.filter(F.col("l_quantity") > 45)
    return relational.in_subquery(
        part.select("p_partkey", "p_name", "p_retailprice"),
        "p_partkey",
        hot,
        "l_partkey",
    )


@register(
    "q17_pagination",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 40
    """,
)
def q17_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/O3 — LIMIT/OFFSET pagination over an explicit total order."""
    orders = load_table(spark, sf_dir, "orders")
    return relational.paginate(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        page=3,
        page_size=20,
    )


# ---------------------------------------------------------------------------
# §2.4 Aggregations
# ---------------------------------------------------------------------------


@register(
    "q03_agg_having",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS BIGINT) AS n_discounted
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    HAVING COUNT(*) > 100
    """,
)
def q03_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/A4 — groupBy + SUM/COUNT/conditional COUNT + HAVING.

    TPC-H Q1-shaped; partial aggregation map-side, one shuffle on the
    2-value group keys.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp")
    )
    rev = money("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - money("l_discount"))
    return aggregates.group_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        [
            F.sum(money("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
            aggregates.count_if(F.col("l_discount") > 0.05, "n_discounted"),
        ],
        having=[F.col("n_rows") > 100],
    )


@register(
    "q04_duplicate_count",
    """
    SELECT CAST(
        (SELECT COUNT(*) FROM orders)
        - (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey, o_orderstatus FROM orders))
      AS BIGINT) AS duplicate_rows
    """,
)
def q04_duplicate_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — COUNT(*) - COUNT(DISTINCT multi-col) duplicate detector."""
    orders = load_table(spark, sf_dir, "orders")
    return aggregates.duplicate_count(orders, ["o_custkey", "o_orderstatus"])


@register(
    "q05_pivot",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "O",
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "F"
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q05_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — pivot with explicit pivot values (static schema, single pass)."""
    li = load_table(spark, sf_dir, "lineitem").withColumn("qty_dec", money("l_quantity"))
    out = aggregates.pivot_table(
        li, ["l_returnflag"], "l_linestatus", "qty_dec", ["O", "F"], "sum"
    )
    return out.select(
        "l_returnflag",
        F.col("O").cast("double").alias("O"),
        F.col("F").cast("double").alias("F"),
    )


@register(
    "q06_percentiles",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.50), 4) AS p50,
           ROUND(quantile_cont(value, 0.95), 4) AS p95
    FROM events
    GROUP BY event_type
    """,
)
def q06_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — exact interpolated percentiles (PERCENTILE_CONT semantics);
    rounded to absorb last-ulp interpolation differences between engines."""
    ev = load_table(spark, sf_dir, "events")
    out = aggregates.percentiles(ev, "value", [0.50, 0.95], ["event_type"], exact=True)
    return out.select(
        "event_type",
        F.round(F.col("p50"), 4).alias("p50"),
        F.round(F.col("p95"), 4).alias("p95"),
    )


@register(
    "q07_monthly_revenue",
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY CAST(date_trunc('month', o_orderdate) AS DATE)
    """,
)
def q07_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — time-bucketed aggregation (GROUP BY date_trunc)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.trunc(F.col("o_orderdate"), "month").alias("order_month")
    ).agg(
        F.sum(money("o_totalprice")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "q08_quality_report",
    """
    WITH agg AS (
      SELECT COUNT(*) AS total_rows,
             SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS c0,
             COUNT(*) - COUNT(DISTINCT l_orderkey || '|' || l_linenumber) AS c1,
             SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS c2
      FROM lineitem
    ), tall AS (
      SELECT 'null_check_l_quantity' AS check_name, 'null_check' AS check_type,
             CAST(c0 AS BIGINT) AS issue_count, CAST(total_rows AS BIGINT) AS total_rows FROM agg
      UNION ALL
      SELECT 'duplicate_check_l_orderkey_l_linenumber', 'duplicate_check',
             CAST(c1 AS BIGINT), CAST(total_rows AS BIGINT) FROM agg
      UNION ALL
      SELECT 'range_check_l_discount', 'range_check',
             CAST(c2 AS BIGINT), CAST(total_rows AS BIGINT) FROM agg
    )
    SELECT check_name, check_type, issue_count, total_rows,
           ROUND(CASE WHEN total_rows = 0 THEN 0.0
                      ELSE issue_count * 100.0 / total_rows END, 2) AS issue_percentage,
           CASE WHEN issue_count = 0 THEN 'PASS'
                WHEN ROUND(CASE WHEN total_rows = 0 THEN 0.0
                           ELSE issue_count * 100.0 / total_rows END, 2) <= 5.0 THEN 'WARNING'
                ELSE 'FAIL' END AS status
    FROM tall
    """,
)
def q08_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/Q1-Q4 — multi-check data-quality report in one table scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return aggregates.quality_checks(
        li,
        [
            {"type": "null_check", "column": "l_quantity"},
            {"type": "duplicate_check", "columns": ["l_orderkey", "l_linenumber"]},
            {"type": "range_check", "column": "l_discount", "min": 0.0, "max": 0.1},
        ],
    )


# ---------------------------------------------------------------------------
# §2.3 Joins
# ---------------------------------------------------------------------------


@register(
    "q09_star_join",
    f"""
    SELECT n.n_name,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q09_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — 5-table star join. Only the genuinely tiny dims (nation 25
    rows, region 5 rows) are broadcast; customer scales with the fact
    side (millions of rows at 100×), so customer⋈facts stays a shuffle
    hash join — AQE still auto-broadcasts it when it truly fits, without
    hard-wiring an OOM at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    dims = joins.join(
        customer,
        joins.join(
            nation,
            region.filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
            broadcast_right=True,
        ).select("n_nationkey", "n_name"),
        F.col("c_nationkey") == F.col("n_nationkey"),
        broadcast_right=True,
    ).select("c_custkey", "n_name")
    facts = joins.join(
        li.select("l_orderkey", "l_extendedprice", "l_discount"),
        orders.select("o_orderkey", "o_custkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    rev = money("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - money("l_discount"))
    return (
        joins.join(facts, dims, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q10_anti_join",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q10_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — NOT EXISTS → left-anti join (customers without orders)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return relational.not_exists(
        customer.select("c_custkey", "c_name"),
        orders.select(F.col("o_custkey").alias("c_custkey")),
        ["c_custkey"],
    )


@register(
    "q11_merge_classify",
    """
    SELECT c.c_custkey,
           CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
                THEN 'UPDATE' ELSE 'INSERT' END AS operation
    FROM customer c
    WHERE c.c_acctbal > 9000
    """,
)
def q11_merge_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — merge classification (source LEFT JOIN target → INSERT/UPDATE)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    src = customer.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    tgt = orders.select(F.col("o_custkey").alias("c_custkey"))
    return joins.classify_changes(src, tgt, ["c_custkey"])


# ---------------------------------------------------------------------------
# §2.5 Window functions
# ---------------------------------------------------------------------------

_MONTHLY_PRIORITY_CTE = """
    WITH monthly AS (
      SELECT o_orderpriority,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders
      GROUP BY 1, 2
    )
"""


@register(
    "q12_running_total",
    _MONTHLY_PRIORITY_CTE
    + """
    SELECT o_orderpriority, order_month,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(SUM(rev) OVER (
                PARTITION BY o_orderpriority ORDER BY order_month
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE
           ) AS running_revenue
    FROM monthly
    """,
)
def q12_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — running total over months, partitioned by priority. Revenue
    stays DECIMAL through the window sum (exact), DOUBLE only on output."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        "o_orderpriority",
        F.trunc(F.col("o_orderdate"), "month").alias("order_month"),
    ).agg(F.sum(money("o_totalprice")).alias("rev"))
    out = windows.running_totals(
        monthly, "rev", "order_month", ["o_orderpriority"]
    )
    return out.select(
        "o_orderpriority",
        "order_month",
        F.col("rev").cast("double").alias("revenue"),
        F.col("running_total").cast("double").alias("running_revenue"),
    )


@register(
    "q13_lag_lead",
    _MONTHLY_PRIORITY_CTE
    + """
    , d AS (
      SELECT o_orderpriority, order_month, CAST(rev AS DOUBLE) AS revenue
      FROM monthly
    )
    SELECT o_orderpriority, order_month, revenue,
           lag(revenue, 1)  OVER w AS lag_1,
           lead(revenue, 1) OVER w AS lead_1,
           revenue - lag(revenue, 1) OVER w AS change_1,
           ROUND(CASE WHEN lag(revenue, 1) OVER w = 0 THEN NULL
                      ELSE (revenue - lag(revenue, 1) OVER w) * 100.0
                           / lag(revenue, 1) OVER w END, 2) AS pct_change_1
    FROM d
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY order_month)
    """,
)
def q13_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — multi-period lag/lead with change & % change (NULLIF guard)."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        "o_orderpriority",
        F.trunc(F.col("o_orderdate"), "month").alias("order_month"),
    ).agg(F.sum(money("o_totalprice")).cast("double").alias("revenue"))
    out = windows.lag_lead(monthly, "revenue", "order_month", ["o_orderpriority"], [1])
    return out.select(
        "o_orderpriority", "order_month", "revenue",
        "lag_1", "lead_1", "change_1", "pct_change_1",
    )


@register(
    "q14_gap_detection",
    """
    WITH d AS (
      SELECT DISTINCT o_orderpriority, CAST(o_orderdate AS DATE) AS d
      FROM orders
    ), l AS (
      SELECT o_orderpriority, d,
             lead(d) OVER (PARTITION BY o_orderpriority ORDER BY d) AS nd
      FROM d
    )
    SELECT o_orderpriority,
           d AS gap_start, nd AS gap_end,
           CAST(datediff('day', d, nd) AS INTEGER) AS gap_length_days
    FROM l
    WHERE datediff('day', d, nd) > 1
    """,
)
def q14_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — lead-based time-series gap detection (daily frequency)."""
    orders = load_table(spark, sf_dir, "orders")
    return windows.detect_gaps(orders, "o_orderdate", ["o_orderpriority"], "daily")


@register(
    "q15_cohort_retention",
    """
    WITH f AS (
      SELECT o_custkey, min(o_orderdate) AS cohort_dt FROM orders GROUP BY 1
    ), e AS (
      SELECT o.o_custkey,
             CAST(date_trunc('month', f.cohort_dt) AS DATE) AS cohort_month,
             CAST((year(o.o_orderdate) - year(f.cohort_dt)) * 12
                  + (month(o.o_orderdate) - month(f.cohort_dt)) AS INTEGER) AS period_number
      FROM orders o JOIN f USING (o_custkey)
    ), a AS (
      SELECT cohort_month, period_number,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS metric_value
      FROM e WHERE period_number BETWEEN 0 AND 12
      GROUP BY 1, 2
    ), s AS (
      SELECT cohort_month, metric_value AS cohort_size FROM a WHERE period_number = 0
    )
    SELECT a.cohort_month, a.period_number, a.metric_value, s.cohort_size,
           ROUND(CASE WHEN s.cohort_size = 0 THEN NULL
                      ELSE a.metric_value * 100.0 / s.cohort_size END, 2) AS retention_pct
    FROM a LEFT JOIN s USING (cohort_month)
    """,
)
def q15_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 — cohort retention matrix on orders (cohort = first-order month)."""
    orders = load_table(spark, sf_dir, "orders")
    first = orders.groupBy("o_custkey").agg(F.min("o_orderdate").alias("cohort_dt"))
    joined = orders.select("o_custkey", "o_orderdate").join(first, "o_custkey")
    return windows.cohort_retention(
        joined, "o_custkey", "o_orderdate", "cohort_dt", metric_column=None, periods=12
    )


@register(
    "q20_ranks",
    """
    SELECT c_nationkey, c_custkey, c_acctbal,
           CAST(row_number() OVER (PARTITION BY c_nationkey
                ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rn,
           CAST(rank() OVER (PARTITION BY c_nationkey
                ORDER BY c_acctbal DESC) AS INTEGER) AS rnk
    FROM customer
    QUALIFY rn <= 3
    """,
)
def q20_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — generic ranking window (row_number + rank, top-3 per nation)."""
    customer = load_table(spark, sf_dir, "customer")
    w_rn = windows.window_spec(
        ["c_nationkey"], [F.col("c_acctbal").desc(), F.col("c_custkey")]
    )
    w_rk = windows.window_spec(["c_nationkey"], [F.col("c_acctbal").desc()])
    return (
        customer.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w_rn).alias("rn"),
            F.rank().over(w_rk).alias("rnk"),
        )
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# §2.7 Set operations  +  §2.8 scalars
# ---------------------------------------------------------------------------


@register(
    "q16_union_distinct",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def q16_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — UNION (distinct) of two keyed selections."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = orders.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return setops.union_distinct(a, b)


@register(
    "q18_case_scalars",
    """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS price_band,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM orders
    GROUP BY 1, 2
    """,
)
def q18_case_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 — CASE WHEN banding + date extraction + grouped rollup."""
    orders = load_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    return (
        orders.select(
            F.year("o_orderdate").alias("order_year"),
            band.alias("price_band"),
            "o_totalprice",
        )
        .groupBy("order_year", "price_band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(money("o_totalprice")).cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Flagship (driver smoke check)
# ---------------------------------------------------------------------------


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation monthly revenue with running total:
    orders ⋈ customer ⋈ nation → monthly agg → window.
    Exercises P1/J1/A1/W2 end-to-end (SURVEY.md §7.1 step 3).
    Only nation (25 rows) is broadcast; customer grows with the fact
    side at scale, so orders⋈customer is a shuffle join (AQE promotes
    it to broadcast at small SF automatically)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    enriched = joins.join(
        joins.join(
            orders.select("o_custkey", "o_orderdate", "o_totalprice"),
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        ),
        nation.select("n_nationkey", "n_name"),
        F.col("c_nationkey") == F.col("n_nationkey"),
        broadcast_right=True,
    )
    monthly = enriched.groupBy(
        "n_name", F.trunc(F.col("o_orderdate"), "month").alias("order_month")
    ).agg(F.sum(money("o_totalprice")).alias("rev"))
    out = windows.running_totals(monthly, "rev", "order_month", ["n_name"])
    return out.select(
        "n_name",
        "order_month",
        F.col("rev").cast("double").alias("revenue"),
        F.col("running_total").cast("double").alias("running_revenue"),
    )
