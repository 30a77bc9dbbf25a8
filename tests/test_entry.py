"""Smoke tests for the driver contract: entry() runs, every queries() entry
returns rows at sf0.001, and registry/oracle keys are consistent."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"n_name", "order_month", "revenue", "running_revenue"} <= set(df.columns)


def test_queries_all_run(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        # small SF: every query must at least produce a stable schema;
        # count forces execution
        df.count()


def test_oracle_keys_subset_of_queries():
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert os_ <= qs


def test_no_complex_typed_output_columns(spark, sf_dir):
    """The driver's canonicalizer sorts result cells with pandas, which
    cannot hash list/dict cells — array/map/struct columns must be
    serialized (array_join/to_json) in each query's final projection.
    Guards the q31/qd13 regression from round 1."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    for name, fn in entrymod.queries().items():
        schema = fn(spark, sf_dir).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        assert not bad, f"{name} returns complex-typed columns {bad}"
