"""Aggregation operators (maps reference §2.4: A1 group/having
``sql/query_builder.py:129-137``, A2/A3 conditional + distinct counts
``sql/common_queries.py:224-242``, A5 pivot :297-341, A6 percentiles
``logs/performance_monitor.py:589-593``, A8/Q1-Q4 quality checks
``sql/common_queries.py:196-294``).

All aggregations are single-pass ``groupBy().agg()`` — Spark computes
partial (map-side) aggregates before the shuffle, so only one combined row
per group per partition moves. HAVING is a post-agg filter.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sql_data_warehouse_analytics_project_spark.operators.relational import where

_AGG_FNS = {
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "stddev": F.stddev,
}


def group_agg(
    df: DataFrame,
    group_by: Sequence[str],
    aggs: Sequence[Column],
    having: Sequence[Mapping[str, Any] | Column | str] | None = None,
) -> DataFrame:
    """A1 — GROUP BY + aggregates + HAVING (post-aggregation filter)."""
    out = df.groupBy(*group_by).agg(*aggs)
    if having:
        out = where(out, having)
    return out


def count_if(cond: Column, alias: str) -> Column:
    """A2 — ``COUNT(CASE WHEN cond THEN 1 END)``."""
    return F.count(F.when(cond, F.lit(1))).alias(alias)


def duplicate_count(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """A3 — ``COUNT(*) - COUNT(DISTINCT c1, c2)`` duplicate detector
    (``common_queries.py:238-242``). Exact; at extreme cardinality swap the
    distinct count for ``approx_count_distinct``."""
    return df.agg(
        (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in columns])).alias("duplicate_rows")
    )


def pivot_table(
    df: DataFrame,
    row_columns: Sequence[str],
    pivot_column: str,
    value_column: str,
    pivot_values: Sequence[str],
    aggregate_function: str = "sum",
) -> DataFrame:
    """A5 — rows × pivot-values matrix (reference ``compute_pivot_table``
    ``common_queries.py:297-341``). Explicit ``pivot_values`` avoids the
    extra distinct-values job AND makes the output schema static — required
    for a deterministic plan at scale."""
    fn = _AGG_FNS[aggregate_function.lower()]
    return (
        df.groupBy(*row_columns)
        .pivot(pivot_column, list(pivot_values))
        .agg(fn(F.col(value_column)))
    )


def percentiles(
    df: DataFrame,
    value_column: str,
    probabilities: Sequence[float],
    group_by: Sequence[str] | None = None,
    *,
    exact: bool = True,
) -> DataFrame:
    """A6 — PERCENTILE_CONT equivalent. ``exact=True`` → ``percentile()``
    (exact interpolated, needs per-group sort — fine for telemetry tables);
    ``exact=False`` → ``percentile_approx`` (mergeable sketch, the 100 TB
    path)."""
    fn = "percentile" if exact else "percentile_approx"
    aggs = [
        F.expr(f"{fn}({value_column}, {p})").alias(f"p{int(p * 100):02d}")
        for p in probabilities
    ]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


# ---------------------------------------------------------------------------
# A8 / Q1-Q4 — data-quality report
# ---------------------------------------------------------------------------


def quality_checks(
    df: DataFrame,
    checks: Sequence[Mapping[str, Any]],
) -> DataFrame:
    """Multi-check data-quality report in ONE pass (reference
    ``check_data_quality`` ``sql/common_queries.py:196-294`` glues N
    SELECTs with UNION ALL — N table scans; here all checks are columns of
    a single ``.agg()`` then unpivoted with ``stack``, so the table is
    scanned once regardless of check count).

    Check specs:
      {"type": "null_check", "column": c}
      {"type": "duplicate_check", "columns": [c, ...]}
      {"type": "range_check", "column": c, "min": lo, "max": hi}

    Output rows: (check_name, check_type, issue_count, total_rows,
    issue_percentage, status) with PASS/WARNING/FAIL at 0% / ≤5% / >5%
    (``common_queries.py:286-290``).
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("_total")]
    names: list[tuple[str, str]] = []
    for i, spec in enumerate(checks):
        ctype = spec["type"]
        if ctype == "null_check":
            col = spec["column"]
            expr = F.sum(F.col(col).isNull().cast("long"))
            name = f"null_check_{col}"
        elif ctype == "duplicate_check":
            cols = spec["columns"]
            expr = F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols])
            name = "duplicate_check_" + "_".join(cols)
        elif ctype == "range_check":
            col = spec["column"]
            lo, hi = spec["min"], spec["max"]
            expr = F.sum(
                ((F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi))).cast("long")
            )
            name = f"range_check_{col}"
        else:
            raise ValueError(f"unknown check type: {ctype!r}")
        aggs.append(F.coalesce(expr, F.lit(0)).alias(f"_c{i}"))
        names.append((name, ctype))

    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', '{ctype}', _c{i}" for i, (name, ctype) in enumerate(names)
    )
    tall = wide.select(
        F.expr(
            f"stack({len(names)}, {stack_args}) as (check_name, check_type, issue_count)"
        ),
        F.col("_total").alias("total_rows"),
    )
    issue_pct = F.round(
        F.when(F.col("total_rows") == 0, F.lit(0.0)).otherwise(
            F.col("issue_count") * 100.0 / F.col("total_rows")
        ),
        2,
    )
    return tall.select(
        "check_name",
        "check_type",
        "issue_count",
        "total_rows",
        issue_pct.alias("issue_percentage"),
        F.when(F.col("issue_count") == 0, "PASS")
        .when(issue_pct <= 5.0, "WARNING")
        .otherwise("FAIL")
        .alias("status"),
    )


def key_skew_stats(
    df: DataFrame, keys: Sequence[str], *, top_n: int = 20
) -> DataFrame:
    """Heavy-hitter / skew diagnostics for a prospective shuffle key.

    Returns the ``top_n`` most frequent key values with their row count,
    share of all rows, and the global ``skew_ratio`` (max key count over
    mean key count — 1.0 is perfectly uniform). This is the pre-flight
    check for the §2 join/agg operators: a skew_ratio in the hundreds says
    "salt this key or let AQE split it" BEFORE the 100 TB shuffle runs.

    Plan shape: one map-side-combined ``groupBy(keys).count()`` shuffle,
    a 1-row global summary broadcast back over the counts, and a
    TakeOrderedAndProject for the top-N (count desc, then keys asc — the
    deterministic tiebreak keeps the selection oracle-stable).
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("_tot"),
        F.avg("n_rows").alias("_avg"),
        F.max("n_rows").alias("_max"),
        F.count(F.lit(1)).alias("_nkeys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *keys,
            "n_rows",
            F.round(F.col("n_rows") / F.col("_tot"), 6).alias("share"),
            F.col("_nkeys").alias("n_distinct_keys"),
            F.round(F.col("_max") / F.col("_avg"), 4).alias("skew_ratio"),
        )
        .orderBy(F.col("n_rows").desc(), *[F.col(k) for k in keys])
        .limit(top_n)
    )


def histogram(
    df: DataFrame,
    col: str,
    *,
    lo: float,
    hi: float,
    n_bins: int = 20,
) -> DataFrame:
    """Fixed-width histogram: ``(bin, bin_lo, bin_hi, n_rows)`` with
    under/overflow clamped into the edge bins (bin 0 / n_bins-1) so the
    row count is conserved — a profile that silently drops outliers lies
    about the distribution. One map-side-combined shuffle keyed on the
    bin id (≤ n_bins rows move); bins with no rows are absent (join the
    spine of expected bins if a dense axis is needed)."""
    if not hi > lo:
        raise ValueError("histogram needs hi > lo")
    width = (hi - lo) / n_bins
    # F.floor yields LongType; clamp BEFORE any narrowing cast — a non-ANSI
    # long→int cast of an extreme outlier's bin would wrap (a huge positive
    # value landing in bin 0), breaking row-conserving clamping exactly in
    # the outlier case it exists for. Bin ids are bounded by n_bins after
    # the clamp, so the int cast is then always safe.
    raw = F.floor((F.col(col) - lo) / width)
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * width).alias("bin_lo"),
            (F.lit(lo) + (F.col("bin") + 1) * width).alias("bin_hi"),
            "n_rows",
        )
    )


def grouped_corr(
    df: DataFrame,
    group_by: Sequence[str],
    x: Column | str,
    y: Column | str,
    *,
    alias: str = "corr",
) -> DataFrame:
    """Per-group Pearson correlation from MOMENTS (n, Σx, Σy, Σxy, Σx²,
    Σy²) instead of a floating corr buffer: feed DECIMAL columns and the
    sums are exact and order-insensitive, so the coefficient is
    bit-reproducible across engines and partitionings (the same trick as
    ``windows.rolling_zscore``; a float corr aggregate varies with
    accumulation order at scale). NULL when either variance is 0 or
    n < 2, like ``corr``.

    Like ``corr``, only PAIRWISE-COMPLETE rows (both x and y non-null)
    feed every moment INCLUDING the count — conditional aggregates rather
    than a pre-filter so groups whose rows are all incomplete still
    appear (with a NULL coefficient), matching ``corr`` exactly."""
    cx = F.col(x) if isinstance(x, str) else x
    cy = F.col(y) if isinstance(y, str) else y
    both = cx.isNotNull() & cy.isNotNull()
    m = df.groupBy(*group_by).agg(
        F.count(F.when(both, 1)).alias("_n"),
        F.sum(F.when(both, cx)).alias("_sx"),
        F.sum(F.when(both, cy)).alias("_sy"),
        F.sum(F.when(both, cx * cy)).alias("_sxy"),
        F.sum(F.when(both, cx * cx)).alias("_sxx"),
        F.sum(F.when(both, cy * cy)).alias("_syy"),
    )
    n = F.col("_n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    cov = sxy - sx * sy / n
    vx = sxx - sx * sx / n
    vy = syy - sy * sy / n
    r = F.when((F.col("_n") >= 2) & (vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
    return m.select(*group_by, r.alias(alias))
