"""Declarative table constraints (S7 — maps reference ``sql/ddl.py:300-344``:
PRIMARY KEY / FOREIGN KEY / UNIQUE / CHECK constraint DDL).

The reference declares constraints once in PostgreSQL DDL and the database
enforces them on every write. Parquet tables have no enforcement engine, so
the Spark-native analogue is: declare once (persisted to
``logs.table_constraints``, latest declaration per table wins), and every
checked write (``Catalog.checked_append``) compiles the declaration to
``operators.validate`` rules plus referential anti-join probes, refuses the
write on ERROR violations, and records failures to ``logs.error_log``.

Constraint specs are plain JSON-serializable dicts:

    {"rule": "primary_key", "columns": [c, ...]}          → not_null + unique
    {"rule": "foreign_key", "columns": [c, ...],
     "ref_layer": L, "ref_table": T, "ref_columns": [...]} → anti-join probe
    any ``operators.validate`` rule spec                   → CHECK analogue
      (unique / not_null / range / regex / data_type)

FK semantics match SQL: rows with any NULL key column never violate the
foreign key (they fail a not_null/primary_key rule if one is declared).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sql_data_warehouse_analytics_project_spark.operators.validate import validate

CONSTRAINTS_TABLE = "table_constraints"

CONSTRAINTS_SCHEMA = T.StructType(
    [
        T.StructField("layer", T.StringType(), False),
        T.StructField("table_name", T.StringType(), False),
        T.StructField("constraints_json", T.StringType(), False),
        T.StructField("declared_at", T.TimestampType(), False),
        T.StructField("declared_by", T.StringType(), True),
    ]
)


class ConstraintViolationError(Exception):
    """A checked write found ERROR-severity constraint violations; the
    target table was NOT written."""

    def __init__(self, table: str, failures: Sequence[Mapping[str, Any]]):
        self.table = table
        self.failures = list(failures)
        detail = "; ".join(
            f"{f['rule_name']}: {f['violation_count']} violation(s)"
            for f in self.failures
        )
        super().__init__(f"constraint violations writing {table}: {detail}")


_CHECK_KINDS = ("not_null", "unique", "range", "regex", "data_type")


def compile_constraints(
    specs: Sequence[Mapping[str, Any]],
) -> tuple[list[dict], list[dict]]:
    """Split declarations into single-table validate rules and FK probes.
    ``primary_key`` expands to per-column not_null + a composite unique —
    exactly the checks PostgreSQL's PK constraint implies.

    Rule kinds and severities are validated HERE, at declaration time —
    a typo'd spec must fail the ``declare_constraints`` call, not brick
    every later ``checked_append`` (enforcement also compares
    ``severity == 'ERROR'``, so a miscased severity would otherwise
    silently disable write refusal)."""
    from sql_data_warehouse_analytics_project_spark.operators.validate import SEVERITIES

    rules: list[dict] = []
    fks: list[dict] = []
    for spec in specs:
        kind = spec["rule"]
        sev = spec.get("severity", "ERROR")
        if sev not in SEVERITIES:
            raise ValueError(f"severity must be one of {SEVERITIES}: {sev!r}")
        if kind == "primary_key":
            for c in spec["columns"]:
                rules.append({"rule": "not_null", "column": c, "severity": "ERROR"})
            rules.append(
                {"rule": "unique", "columns": list(spec["columns"]), "severity": "ERROR"}
            )
        elif kind == "foreign_key":
            fks.append(dict(spec))
        elif kind in _CHECK_KINDS:
            rules.append(dict(spec))
        else:
            raise ValueError(
                f"unknown constraint rule {kind!r}; expected primary_key,"
                f" foreign_key, or one of {_CHECK_KINDS}"
            )
    return rules, fks


def fk_summary(
    df: DataFrame,
    spec: Mapping[str, Any],
    parent: DataFrame,
    *,
    totals: DataFrame | None = None,
) -> DataFrame:
    """One summary row (same shape as ``validate``'s output) counting child
    rows whose fully-non-NULL key has no match in the parent. The probe is
    a left-anti join on the key columns — a plain shuffle join at scale
    (AQE broadcasts small parents automatically); the parent side is
    key-projected and deduplicated before the join so only distinct keys
    shuffle.

    LAZY: the row comes back as an unevaluated 1-row aggregate, so
    :func:`check` can union every constraint's probe into one plan and a
    single action evaluates them all in one job — no per-FK driver round
    trips. ``totals`` is a shared 1-row ``(total_rows)`` aggregate."""
    cols = list(spec["columns"])
    ref_cols = list(spec.get("ref_columns", cols))
    sev = spec.get("severity", "ERROR")
    name = "foreign_key_" + "_".join(cols)
    child = df.select(*[F.col(c) for c in cols])
    for c in cols:
        child = child.filter(F.col(c).isNotNull())
    keys = parent.select(
        *[F.col(rc).alias(c) for rc, c in zip(ref_cols, cols)]
    ).dropDuplicates()
    orphans = (
        child.join(keys, cols, "left_anti")
        .agg(F.count(F.lit(1)).alias("violation_count"))
    )
    if totals is None:
        totals = df.agg(F.count(F.lit(1)).alias("total_rows"))
    return orphans.crossJoin(F.broadcast(totals)).select(
        F.lit(name).alias("rule_name"),
        F.lit("foreign_key").alias("rule_type"),
        F.lit(sev).alias("severity"),
        F.col("violation_count").cast("long"),
        F.col("total_rows").cast("long"),
        (F.col("violation_count") == 0).alias("passed"),
    )


def check(catalog, df: DataFrame, specs: Sequence[Mapping[str, Any]]) -> DataFrame:
    """Evaluate every declared constraint against ``df``; returns the
    per-rule summary (rule_name, rule_type, severity, violation_count,
    total_rows, passed). ``catalog`` resolves FK parents via
    ``Catalog.read`` (soft-deleted parent rows don't count as match
    targets, mirroring the standing ``is_deleted`` filter).

    All probes (validate pass + every FK anti-join + the shared row
    count) are unioned into ONE lazy plan, so the caller's single action
    evaluates the whole constraint set in one job. Each branch still
    scans the batch — callers with an expensive upstream lineage should
    hand in a materialized batch; ``Catalog.checked_append``
    localCheckpoints before calling."""
    rules, fks = compile_constraints(specs)
    parts: list[DataFrame] = []
    if rules or not fks:
        parts.append(validate(df, rules))
    totals = df.agg(F.count(F.lit(1)).alias("total_rows")) if fks else None
    for fk in fks:
        parent = catalog.read(fk["ref_layer"], fk["ref_table"])
        parts.append(fk_summary(df, fk, parent, totals=totals))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
