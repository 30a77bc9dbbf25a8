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
