"""Projection / filter / predicate operators (maps reference §2.2:
``sql/query_builder.py`` P1 select_builder :49-151, P2 where_builder
:190-224, P3 standing medallion filter :121-124, P5 subquery_builder
:330-358; pagination O2/O3 :144-149,227-242).

Where the reference composes SQL *strings*, these compose lazy DataFrames —
Catalyst is the analyzer/optimizer, so WHERE conditions built here are
pushed into the parquet scan and unused columns are pruned for free.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# ---------------------------------------------------------------------------
# P2 — condition compilation (dict spec → Column predicate)
# ---------------------------------------------------------------------------

_OPERATORS = {
    "=": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    "<>": lambda c, v: c != v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    "like": lambda c, v: c.like(v),
    "not like": lambda c, v: ~c.like(v),
    "rlike": lambda c, v: c.rlike(v),
    "in": lambda c, v: c.isin(list(v)),
    "not in": lambda c, v: ~c.isin(list(v)),
    "is null": lambda c, v: c.isNull(),
    "is not null": lambda c, v: c.isNotNull(),
    "between": lambda c, v: c.between(v[0], v[1]),
}


def compile_condition(cond: Mapping[str, Any] | Column | str) -> Column:
    """One condition → Column predicate.

    Accepts the reference's dict shape ``{column, operator, value}``
    (``query_builder.py:203-218``; list value ⇒ IN), a raw SQL string
    (parsed by Spark — the reference passes strings through verbatim), or an
    already-built Column.
    """
    if isinstance(cond, Column):
        return cond
    if isinstance(cond, str):
        return F.expr(cond)
    col = F.col(cond["column"])
    op = str(cond.get("operator", "=")).lower()
    value = cond.get("value")
    if op == "=" and isinstance(value, (list, tuple, set)):
        op = "in"
    if op not in _OPERATORS:
        raise ValueError(f"unsupported operator: {op!r}")
    return _OPERATORS[op](col, value)


def where(
    df: DataFrame,
    conditions: Sequence[Mapping[str, Any] | Column | str],
    combine: str = "AND",
) -> DataFrame:
    """AND/OR-combined filter (reference ``where_builder`` P2)."""
    if not conditions:
        return df
    preds = [compile_condition(c) for c in conditions]
    combined = preds[0]
    for p in preds[1:]:
        combined = (combined & p) if combine.upper() == "AND" else (combined | p)
    return df.filter(combined)


# ---------------------------------------------------------------------------
# P1 — select
# ---------------------------------------------------------------------------


def select(
    df: DataFrame,
    columns: Sequence[str | Column] | None = None,
    *,
    distinct: bool = False,
    conditions: Sequence[Mapping[str, Any] | Column | str] | None = None,
    order_by: Sequence[str | Column] | None = None,
    limit: int | None = None,
    alias: str | None = None,
) -> DataFrame:
    """Composable SELECT (reference ``select_builder`` P1): projection,
    DISTINCT, WHERE, ORDER BY, LIMIT, table alias."""
    out = df
    if conditions:
        out = where(out, conditions)
    if columns:
        out = out.select(*columns)
    if distinct:
        out = out.distinct()
    if order_by:
        out = out.orderBy(*order_by)
    if limit is not None:
        out = out.limit(limit)
    if alias:
        out = out.alias(alias)
    return out


def exclude_soft_deleted(df: DataFrame, flag_column: str = "is_deleted") -> DataFrame:
    """P3 standing medallion filter — the reference appends
    ``"is_deleted" = FALSE`` to every query (``query_builder.py:121-124``).
    Engine table reads route through this; the predicate is pushdown-friendly
    (reaches the parquet scan as a PushedFilter)."""
    if flag_column not in df.columns:
        return df
    return df.filter(~F.coalesce(F.col(flag_column), F.lit(False)))


# ---------------------------------------------------------------------------
# P5 — subquery correlation (EXISTS / NOT EXISTS / IN / NOT IN)
# ---------------------------------------------------------------------------


def analyze_medallion_layer(
    df: DataFrame,
    *,
    business_date=None,
    source_system: str | None = None,
    batch_id: str | None = None,
    columns: Sequence[str] | None = None,
    order_by_latest: bool = True,
) -> DataFrame:
    """P4 — medallion layer analysis filterset (reference
    ``analyze_medallion_layer`` ``sql/common_queries.py:40-110``):
    ``created_at::date = business_date`` + source_system + batch_id
    equality filters, latest-first. When the table is partitioned on the
    derived date these filters become partition pruning."""
    out = df
    if business_date is not None:
        out = out.filter(F.to_date(F.col("created_at")) == F.lit(business_date))
    if source_system is not None:
        out = out.filter(F.col("source_system") == source_system)
    if batch_id is not None:
        out = out.filter(F.col("batch_id") == batch_id)
    if columns:
        out = out.select(*columns)
    if order_by_latest and "created_at" in out.columns:
        out = out.orderBy(F.col("created_at").desc())
    return out


def exists(df: DataFrame, sub: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """EXISTS correlation → left-semi join (no row duplication, no shuffle of
    sub's payload columns — only join keys move)."""
    return df.join(sub, on, "left_semi")


def not_exists(df: DataFrame, sub: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """NOT EXISTS → left-anti join."""
    return df.join(sub, on, "left_anti")


def in_subquery(df: DataFrame, column: str, sub: DataFrame, sub_column: str) -> DataFrame:
    """IN (SELECT ...) → semi join on renamed key."""
    keyed = sub.select(F.col(sub_column).alias(column)).distinct()
    return df.join(keyed, column, "left_semi")


def not_in_subquery(df: DataFrame, column: str, sub: DataFrame, sub_column: str) -> DataFrame:
    """NOT IN (SELECT ...) with SQL NULL semantics: if the subquery yields
    any NULL, NOT IN is never true. Anti-join alone has the wrong NULL
    behavior, so NULL keys are excluded explicitly."""
    keyed = sub.select(F.col(sub_column).alias(column)).where(F.col(column).isNotNull()).distinct()
    return df.filter(F.col(column).isNotNull()).join(keyed, column, "left_anti")


# ---------------------------------------------------------------------------
# O2/O3 — pagination
# ---------------------------------------------------------------------------


def paginate(
    df: DataFrame,
    order_by: Sequence[str | Column],
    page: int,
    page_size: int,
) -> DataFrame:
    """LIMIT/OFFSET pagination (reference ``pagination_builder``
    ``query_builder.py:227-242``). OFFSET without a total order is
    nondeterministic on a distributed engine (SURVEY.md §7.2 risk 4), so an
    explicit ``order_by`` is required; implemented as a row_number window
    filter. The single-partition window sort is inherent to global
    pagination — fine for result-page serving, not a bulk-data path."""
    if not order_by:
        raise ValueError("paginate() requires an explicit total order")
    if page < 1 or page_size < 1:
        raise ValueError("page and page_size must be >= 1")
    if "_rn" in df.columns:
        # the row-number helper column would silently replace (and drop) it
        raise ValueError("paginate reserves the internal column name '_rn'")
    # deliberate global window — inherent to OFFSET pagination semantics
    # (keyset_paginate below is the scale path); greppable opt-in
    from sql_data_warehouse_analytics_project_spark.operators.windows import window_spec

    w = window_spec(None, list(order_by), allow_unpartitioned=True)
    lo = (page - 1) * page_size
    hi = lo + page_size
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") > lo) & (F.col("_rn") <= hi))
        .drop("_rn")
    )


def keyset_paginate(
    df: DataFrame,
    keys: Sequence[str],
    page_size: int,
    after: "Sequence | None" = None,
) -> DataFrame:
    """Keyset ("seek") pagination — the scale-correct alternative to
    OFFSET: resume from the last row's key tuple instead of skipping
    ``offset`` rows. OFFSET pagination costs O(offset) per page (the
    window must still rank everything before the page); the keyset
    predicate is sargable — the tuple comparison expands to
    ``k1 > a1 OR (k1 = a1 AND k2 > a2) OR ...``, pushes toward the scan,
    and the page itself plans as TakeOrderedAndProject (per-partition
    heap, no global sort). Page N costs the same as page 1.

    ``keys`` must form a unique total order (add a unique id as the last
    key); ``after`` is the previous page's last key tuple (None ⇒ first
    page). NULL key values are not supported (NULL > x is never true —
    filter them or coalesce first).
    """
    if not keys:
        raise ValueError("keyset_paginate() requires at least one key column")
    if page_size < 1:
        raise ValueError("page_size must be >= 1")
    out = df
    if after is not None:
        if len(after) != len(keys):
            raise ValueError(
                f"after tuple has {len(after)} values for {len(keys)} keys"
            )
        cond = F.lit(False)
        eqs = F.lit(True)
        for k, v in zip(keys, after):
            cond = cond | (eqs & (F.col(k) > F.lit(v)))
            eqs = eqs & (F.col(k) == F.lit(v))
        out = out.filter(cond)
    return out.orderBy(*[F.col(k) for k in keys]).limit(page_size)


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """O4 top-k — ``orderBy(...).limit(k)``; Spark plans
    TakeOrderedAndProject (per-partition heap + driver merge: no full sort,
    no single-node shuffle — scales to any input size)."""
    return df.orderBy(*order_by).limit(k)
