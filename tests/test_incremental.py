"""Incremental silver refresh: batch-ledger bookkeeping, dirty-key
recompute for cross-row transforms (dedup-keep-latest, SCD2), append for
row-local facts — and the core guarantee: two incremental runs over two
bronze batches produce EXACTLY the silver a full rebuild of the combined
bronze produces."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from sql_data_warehouse_analytics_project_spark.catalog import (
    MEDALLION_METADATA_COLUMNS,
    Catalog,
)
from sql_data_warehouse_analytics_project_spark.medallion import silver

CUST_SCHEMA = (
    "cst_id int, cst_key string, cst_firstname string, cst_lastname string, "
    "cst_marital_status string, cst_gndr string, cst_create_date date"
)
PROD_SCHEMA = (
    "prd_id int, prd_key string, prd_nm string, prd_cost int, "
    "prd_line string, prd_start_dt date, prd_end_dt date"
)
SALES_SCHEMA = (
    "sls_ord_num string, sls_prd_key string, sls_cust_id int, "
    "sls_order_dt long, sls_ship_dt long, sls_due_dt long, "
    "sls_sales long, sls_quantity long, sls_price long"
)

CUST_B1 = [
    (1, "K1", " Ann", "Lee ", "M", "F", date(2025, 1, 1)),
    (2, "K2", "Bob", "Ray", "S", "M", date(2025, 1, 1)),
    (None, "K0", "X", "Y", "S", "", date(2025, 1, 1)),
]
CUST_B2 = [
    (1, "K1", "Ann2", "Lee", "S", "F", date(2025, 2, 1)),  # newer dup of id 1
    (3, "K3", "Cyd", "Zed", "", "F", date(2025, 2, 2)),
]
PROD_B1 = [(10, "CO-RF-X1", "Thing", 5, "R", date(2025, 1, 1), None)]
PROD_B2 = [(11, "CO-RF-X1", "Thing v2", 6, "R", date(2025, 3, 1), None)]
SALES_B1 = [("O1", "X1", 1, 20250105, 20250110, 20250115, 10, 2, 5)]
SALES_B2 = [
    ("O2", "X1", 3, 0, 20250210, 20250215, None, 3, 4),  # bad date, null sales
]


def _bronze(spark, rows, schema, batch):
    return (
        spark.createDataFrame(rows, schema)
        .withColumn("_ingestion_batch_id", F.lit(batch))
        .withColumn("_is_current", F.lit(True))
    )


def _data_rows(cat, table):
    df = cat.spark.table(cat.qualified("silver", table))
    cols = sorted(
        c for c in df.columns
        if c not in MEDALLION_METADATA_COLUMNS or c == "row_hash"
    )
    return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())


@pytest.fixture()
def cats(spark):
    inc, full = Catalog(spark, prefix="inc_"), Catalog(spark, prefix="incf_")
    for c in (inc, full):
        c.drop_layers()
        c.create_layers()
    yield inc, full
    for c in (inc, full):
        c.drop_layers()


def test_incremental_silver_matches_full_rebuild(spark, cats):
    inc, full = cats
    batches = {
        "crm_customers_raw": (CUST_SCHEMA, CUST_B1, CUST_B2),
        "crm_products_raw": (PROD_SCHEMA, PROD_B1, PROD_B2),
        "crm_sales_raw": (SALES_SCHEMA, SALES_B1, SALES_B2),
    }

    # incremental catalog: batch 1 → refresh, batch 2 → refresh
    for raw, (schema, b1, _) in batches.items():
        inc.append(_bronze(spark, b1, schema, "b1"), "bronze", raw)
    r1 = silver.run_silver_incremental(inc)
    assert r1["crm_customers"]["mode"] == "full"  # first run = full fallback
    for raw, (schema, _, b2) in batches.items():
        inc.append(_bronze(spark, b2, schema, "b2"), "bronze", raw)
    r2 = silver.run_silver_incremental(inc)
    assert r2["crm_customers"] == {"mode": "keyed", "batches": 1, "rows": 2}
    assert r2["crm_products"]["mode"] == "keyed"
    assert r2["crm_sales"]["mode"] == "append"

    # third run: ledger says everything is processed → all noop
    r3 = silver.run_silver_incremental(inc)
    assert all(v["mode"] == "noop" for v in r3.values())

    # full-rebuild catalog over the combined bronze
    for raw, (schema, b1, b2) in batches.items():
        full.append(_bronze(spark, b1, schema, "b1"), "bronze", raw)
        full.append(_bronze(spark, b2, schema, "b2"), "bronze", raw)
    silver.run_silver(full)

    for table in ("crm_customers", "crm_products", "crm_sales"):
        assert _data_rows(inc, table) == _data_rows(full, table), table

    # the SCD2 cross-row effect actually happened incrementally: batch 2's
    # new product version closed the OLD version's open end date
    prods = {
        r.prd_id: r.prd_end_dt
        for r in inc.spark.table(inc.qualified("silver", "crm_products")).collect()
    }
    assert prods[10] == date(2025, 2, 28) and prods[11] is None
    # dedup-keep-latest picked batch 2's newer duplicate for cst_id 1
    cust = {
        r.cst_id: r.cst_firstname
        for r in inc.spark.table(inc.qualified("silver", "crm_customers")).collect()
    }
    assert cust[1] == "Ann2" and set(cust) == {1, 2, 3}
