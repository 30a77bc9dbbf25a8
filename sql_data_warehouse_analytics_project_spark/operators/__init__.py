from sql_data_warehouse_analytics_project_spark.operators import (
    aggregates,
    joins,
    relational,
    setops,
    windows,
)

__all__ = ["aggregates", "joins", "relational", "setops", "windows"]
