from sql_data_warehouse_analytics_project_spark.sources.readers import (
    TABLES,
    load_table,
    load_tables,
    register_views,
)

__all__ = ["TABLES", "load_table", "load_tables", "register_views"]
