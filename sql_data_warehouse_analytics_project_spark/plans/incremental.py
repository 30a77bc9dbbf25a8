"""Incremental aggregate maintenance — the materialized-rollup refresh
pattern (extends reference M5 high-watermark loads, ``sql/dml.py:339-392``,
from row appends to AGGREGATE state).

At 100 TB you never re-aggregate the whole fact table because one day of
data arrived. Instead the rollup is stored as mergeable PARTIAL state
(sum/count/min/max per group), new partitions are aggregated alone, and
the two states merge by key: ``agg(full) == merge(agg(old), agg(delta))``
for any algebraic aggregate. AVG is kept as (sum, count) and finalized at
read time — storing the quotient would make the state non-mergeable.

Plan shape: each ``partial_aggs`` is one map-side-combined shuffle over
ONLY its input slice; ``merge_partials`` shuffles just group rows (the
rollup cardinality, not the fact cardinality); ``finalize`` is a pure
projection. The delta pass therefore touches delta-sized data only.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: measure spec: out_name -> (fn, column-expression). fn in _PARTIAL_FNS.
MeasureSpec = Mapping[str, tuple[str, "str | Column"]]

_PARTIAL_FNS = ("sum", "count", "avg", "min", "max", "approx_distinct", "stddev")


def _as_col(c: "str | Column") -> Column:
    return F.col(c) if isinstance(c, str) else c


def partial_aggs(df: DataFrame, keys: Sequence[str], measures: MeasureSpec) -> DataFrame:
    """Aggregate one slice into mergeable partial-state columns.

    State encoding (by suffix, which ``merge_partials`` keys on):
    ``m__sum`` / ``m__cnt`` / ``m__min`` / ``m__max`` / ``m__hll``. AVG
    emits both ``__sum`` and ``__cnt``; COUNT counts non-null values of
    its column (pass a literal, e.g. ``F.lit(1)``, for ``COUNT(*)``
    semantics). ``stddev`` keeps moments (sum, sum², count) —
    mergeable by addition, finalized with the usual one-pass formula
    (beware: float moments lose precision when variance << mean²; keep
    the column DECIMAL through the sums if that matters).
    ``approx_distinct`` keeps a Datasketches HLL sketch as
    binary state — the ONLY way a distinct count can be refreshed
    incrementally (exact distincts are not mergeable: distinct(old) +
    distinct(delta) double-counts keys seen in both). Sketch union is
    order-insensitive, so merge(old, delta) estimates EXACTLY what a
    from-scratch sketch of old+delta estimates (tested as a property).
    """
    aggs: list[Column] = []
    for name, (fn, col) in measures.items():
        if fn not in _PARTIAL_FNS:
            raise ValueError(f"unsupported measure fn {fn!r} for {name!r}")
        c = _as_col(col)
        if fn in ("sum", "avg", "stddev"):
            aggs.append(F.sum(c).alias(f"{name}__sum"))
        if fn in ("count", "avg", "stddev"):
            aggs.append(F.count(c).alias(f"{name}__cnt"))
        if fn == "stddev":
            aggs.append(F.sum(c * c).alias(f"{name}__sum2"))
        if fn == "min":
            aggs.append(F.min(c).alias(f"{name}__min"))
        if fn == "max":
            aggs.append(F.max(c).alias(f"{name}__max"))
        if fn == "approx_distinct":
            aggs.append(F.hll_sketch_agg(c).alias(f"{name}__hll"))
    return df.groupBy(*keys).agg(*aggs)


def merge_partials(keys: Sequence[str], *parts: DataFrame) -> DataFrame:
    """Merge partial states by key: sums and counts add, mins/maxs fold.

    The combine rule is carried by the column-name suffix, so states from
    different refresh generations merge without re-declaring the measure
    spec. Groups present in only one input pass through unchanged (union
    + re-aggregate — NOT a join, so N-way merges stay one shuffle).
    """
    if not parts:
        raise ValueError("merge_partials needs at least one input")
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    aggs = []
    for c in unioned.columns:
        if c in keys:
            continue
        if c.endswith(("__sum", "__cnt", "__sum2")):
            aggs.append(F.sum(c).alias(c))
        elif c.endswith("__min"):
            aggs.append(F.min(c).alias(c))
        elif c.endswith("__max"):
            aggs.append(F.max(c).alias(c))
        elif c.endswith("__hll"):
            aggs.append(F.hll_union_agg(c).alias(c))
        else:
            raise ValueError(f"column {c!r} is not a partial-state column")
    return unioned.groupBy(*keys).agg(*aggs)


def finalize(partials: DataFrame, keys: Sequence[str], measures: MeasureSpec) -> DataFrame:
    """Project partial state to final measure values (AVG = sum/count)."""
    cols: list[Column] = [F.col(k) for k in keys]
    for name, (fn, _col) in measures.items():
        if fn == "sum":
            cols.append(F.col(f"{name}__sum").alias(name))
        elif fn == "count":
            cols.append(F.col(f"{name}__cnt").alias(name))
        elif fn == "avg":
            cols.append(
                (F.col(f"{name}__sum") / F.col(f"{name}__cnt")).alias(name)
            )
        elif fn in ("min", "max"):
            cols.append(F.col(f"{name}__{fn}").alias(name))
        elif fn == "approx_distinct":
            cols.append(F.hll_sketch_estimate(f"{name}__hll").alias(name))
        elif fn == "stddev":
            n = F.col(f"{name}__cnt")
            sm = F.col(f"{name}__sum").cast("double")
            s2 = F.col(f"{name}__sum2").cast("double")
            # sample stddev from moments; NULL for n < 2 like stddev_samp.
            # greatest(0, ...) guards the tiny negative residue float
            # cancellation can leave when variance is ~0.
            cols.append(
                F.when(
                    n >= 2,
                    F.sqrt(F.greatest((s2 - sm * sm / n) / (n - 1), F.lit(0.0))),
                ).alias(name)
            )
        else:
            raise ValueError(f"unsupported measure fn {fn!r} for {name!r}")
    return partials.select(*cols)


def incremental_refresh(
    old_partials: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    measures: MeasureSpec,
) -> DataFrame:
    """One refresh step: aggregate ONLY the delta slice, merge into the
    stored state. Equivalent to re-aggregating old+delta from scratch
    (tested as a property), at delta-sized cost."""
    return merge_partials(keys, old_partials, partial_aggs(delta, keys, measures))
