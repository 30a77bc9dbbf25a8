"""Oracle-checked queries: event-time windows (tumbling/sliding/session),
grouping sets (rollup/cube), set operations, JSON extraction — the
streaming-adjacent and free-extension operator surface (SURVEY.md §2.7
note, §2.13). The window helpers are the SAME code used by the streaming
module (batch/stream parity invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_data_warehouse_analytics_project_spark.functions.scalars import money
from sql_data_warehouse_analytics_project_spark.queries import register
from sql_data_warehouse_analytics_project_spark.sources.readers import load_table
from sql_data_warehouse_analytics_project_spark.streaming.ingest import (
    sessionized_counts,
    windowed_event_counts,
)

# DuckDB: epoch-aligned naive-timestamp window start (to_timestamp would
# yield TIMESTAMPTZ; make_timestamp(µs) stays naive like Spark's collect)
_WSTART = "make_timestamp(CAST(floor(epoch(ts) / {w}) * {w} AS BIGINT) * 1000000)"


@register(
    "q25_tumbling_window",
    f"""
    WITH w AS (
      SELECT {_WSTART.format(w=600)} AS window_start, event_type,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events
    )
    SELECT window_start,
           window_start + INTERVAL 10 MINUTE AS window_end,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(v) AS DOUBLE) AS total_value
    FROM w GROUP BY window_start, event_type
    """,
)
def q25_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute event-time windows (same helper as streaming)."""
    ev = load_table(spark, sf_dir, "events").withColumn("value", money("value"))
    out = windowed_event_counts(ev, window_duration="10 minutes")
    return out.select(
        "window_start", "window_end", "event_type", "n_events",
        F.col("total_value").cast("double").alias("total_value"),
    )


@register(
    "q26_sliding_window",
    f"""
    WITH w AS (
      SELECT make_timestamp(
               (CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) - off) * 1000000
             ) AS window_start,
             event_type, CAST(value AS DECIMAL(18,2)) AS v
      FROM events, unnest([0, 300]) AS t(off)
    )
    SELECT window_start,
           window_start + INTERVAL 10 MINUTE AS window_end,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(v) AS DOUBLE) AS total_value
    FROM w GROUP BY window_start, event_type
    """,
)
def q26_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 10-minute length, 5-minute slide (each event lands
    in exactly two windows; the oracle enumerates both starts)."""
    ev = load_table(spark, sf_dir, "events").withColumn("value", money("value"))
    out = windowed_event_counts(
        ev, window_duration="10 minutes", slide_duration="5 minutes"
    )
    return out.select(
        "window_start", "window_end", "event_type", "n_events",
        F.col("total_value").cast("double").alias("total_value"),
    )


@register(
    "q27_session_windows",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 5 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 5 MINUTE AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def q27_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (5-minute timeout) per user — Spark's
    stateful ``session_window`` vs the oracle's gaps-and-islands SQL."""
    ev = load_table(spark, sf_dir, "events")
    return sessionized_counts(ev, gap="5 minutes")


@register(
    "q21_rollup",
    """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY ROLLUP (order_year, o_orderpriority)
    """,
)
def q21_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (year, priority) → subtotals + grand total."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("order_year"),
            "o_orderpriority",
            money("o_totalprice").alias("v"),
        )
        .rollup("order_year", "o_orderpriority")
        .agg(
            F.sum("v").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "q22_intersect",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def q22_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — building-segment customers with big orders."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = orders.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.intersect(b)


@register(
    "q23_except",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def q23_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — building-segment customers without big orders."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = orders.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.subtract(b)


@register(
    "q24_json_extract",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def q24_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction (§2.8 JSON surface: get_json_object)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("sum_k"),
        F.avg(k).alias("avg_k"),
    )


@register(
    "q53_event_funnel",
    """
    WITH s0 AS (
      SELECT user_id, min(ts) AS t0 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s1 AS (
      SELECT e.user_id, min(e.ts) AS t1
      FROM events e JOIN s0 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts >= s0.t0
      GROUP BY e.user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= s1.t1
      GROUP BY e.user_id
    ), c AS (
      SELECT (SELECT count(*) FROM s0) AS n0,
             (SELECT count(*) FROM s1) AS n1,
             (SELECT count(*) FROM s2) AS n2
    )
    SELECT 'view' AS step, CAST(0 AS INTEGER) AS step_index,
           CAST(n0 AS BIGINT) AS n_users, n0 / n0 AS pct_of_first FROM c
    UNION ALL
    SELECT 'click', CAST(1 AS INTEGER), CAST(n1 AS BIGINT), n1 / n0 FROM c
    UNION ALL
    SELECT 'purchase', CAST(2 AS INTEGER), CAST(n2 AS BIGINT), n2 / n0 FROM c
    """,
)
def q53_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel (``windows.funnel_analysis``):
    per-step user counts where each step happens at-or-after the user's
    FIRST completion of the previous step. Every later step is one
    user-keyed join + conditional min (exchange reused — same key), so
    per-user state is three timestamps, never an event array. The oracle
    replays each step's earliest-completion semantics exactly."""
    from sql_data_warehouse_analytics_project_spark.operators.windows import (
        funnel_analysis,
    )

    events = load_table(spark, sf_dir, "events")
    return funnel_analysis(events, ["view", "click", "purchase"])


@register(
    "q56_sessionize",
    """
    WITH s AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER (
                            PARTITION BY user_id ORDER BY ts)) > 1800
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    )
    SELECT user_id, event_id,
           CAST(SUM(is_start) OVER (
                 PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
    FROM s
    """,
)
def q56_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level sessionization (``windows.sessionize``): every event
    tagged with its 30-minute-inactivity-gap session number — the
    per-event twin of the q27 session-window aggregate. lag + running sum
    over one window partitioning; the oracle replays gap detection and
    the running session count for every event."""
    from sql_data_warehouse_analytics_project_spark.operators.windows import (
        sessionize,
    )

    events = load_table(spark, sf_dir, "events")
    return sessionize(events, ["user_id"], "ts", gap_seconds=1800).select(
        "user_id", "event_id", F.col("session_id").cast("bigint")
    )


@register(
    "q57_rolling_zscore",
    """
    WITH v AS (
      SELECT user_id, event_id, ts,
             CAST(value AS DECIMAL(18,2)) AS vd
      FROM events WHERE event_type = 'purchase'
    ), m AS (
      SELECT user_id, event_id, vd,
             count(vd) OVER w AS n,
             CAST(sum(vd) OVER w AS DOUBLE) AS s1,
             CAST(sum(vd * vd) OVER w AS DOUBLE) AS s2
      FROM v
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id,
           CASE WHEN n >= 2 AND (s2 - s1 * s1 / n) / (n - 1) > 0
                THEN (CAST(vd AS DOUBLE) - s1 / n)
                     / sqrt((s2 - s1 * s1 / n) / (n - 1))
           END AS zscore,
           COALESCE(abs(CASE WHEN n >= 2 AND (s2 - s1 * s1 / n) / (n - 1) > 0
                             THEN (CAST(vd AS DOUBLE) - s1 / n)
                                  / sqrt((s2 - s1 * s1 / n) / (n - 1))
                        END) > 3.0, FALSE) AS is_anomaly
    FROM m
    """,
)
def q57_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly scores (``windows.rolling_zscore``): each
    purchase scored against its user's previous 30 purchase values
    (current row excluded from its own baseline). The value rides as
    DECIMAL so the window moments are EXACT and order-insensitive — the
    oracle's replay is bit-identical, z-scores included, not just flags."""
    from sql_data_warehouse_analytics_project_spark.operators.windows import (
        rolling_zscore,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id", "event_id", "ts",
            F.col("value").cast("decimal(18,2)").alias("vd"),
        )
    )
    out = rolling_zscore(
        ev, ["user_id"], ["ts", "event_id"], "vd", window_rows=30, threshold=3.0
    )
    return out.select(
        "user_id", "event_id", F.col("vd_zscore").alias("zscore"), "is_anomaly"
    )


@register(
    "q67_user_feature_pipeline",
    """
    WITH s AS (
      SELECT user_id, ts, event_type, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts, event_type, value,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM s
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(session_id) AS BIGINT) AS n_sessions,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_active_days,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(value AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
               AS total_purchase_value,
           CAST(MIN(CAST(ts AS DATE)) AS DATE) AS first_day,
           CAST(MAX(CAST(ts AS DATE)) AS DATE) AS last_day,
           COALESCE(MIN(CASE WHEN event_type = 'view' THEN ts END)
                    < MAX(CASE WHEN event_type = 'purchase' THEN ts END),
                    FALSE) AS converted
    FROM sess
    GROUP BY user_id
    """,
)
def q67_user_feature_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed per-user feature-engineering pipeline — the
    training-data shape a feature store materializes: sessionization
    (`windows.sessionize`, 30-min gap) feeding one grouped aggregate of
    activity, spend (exact DECIMAL sum — order-independent, so the
    distributed sum hash-matches the oracle), calendar span, and an
    ordered view→purchase conversion flag. Two key-partitioned window
    frames + one aggregate: two shuffles total on user_id, all
    map-side-combinable."""
    from sql_data_warehouse_analytics_project_spark.operators.windows import (
        sessionize,
    )

    ev = load_table(spark, sf_dir, "events")
    sess = sessionize(ev, ["user_id"], "ts", gap_seconds=1800)
    money0 = F.lit(0).cast("decimal(18,2)")
    return sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("session_id").cast("bigint").alias("n_sessions"),
        F.count_distinct(F.to_date("ts")).alias("n_active_days"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(18,2)"),
            ).otherwise(money0)
        )
        .cast("double")
        .alias("total_purchase_value"),
        F.min(F.to_date("ts")).alias("first_day"),
        F.max(F.to_date("ts")).alias("last_day"),
        F.coalesce(
            F.min(F.when(F.col("event_type") == "view", F.col("ts")))
            < F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
            F.lit(False),
        ).alias("converted"),
    )
