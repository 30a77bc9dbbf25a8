from sql_data_warehouse_analytics_project_spark.functions.scalars import (
    money,
    pct,
    row_hash,
    safe_div,
    yyyymmdd_to_date,
)

__all__ = ["money", "pct", "row_hash", "safe_div", "yyyymmdd_to_date"]
