from sql_data_warehouse_analytics_project_spark.medallion import bronze, gold, silver

__all__ = ["bronze", "gold", "silver"]
