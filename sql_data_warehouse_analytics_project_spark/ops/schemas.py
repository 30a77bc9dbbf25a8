"""Declared StructTypes for the five ``logs`` tables (maps reference ORM
models ``models/logs_models.py:58-305``; shapes restated in FIXTURES.md §D).

JSONB ``process_metadata`` → MapType(string,string); SQLAlchemy
``func.now()`` column defaults → expressions applied at append time (Spark
tables have no server-side defaults).
"""

from __future__ import annotations

from pyspark.sql import types as T

PROCESS_LOG = T.StructType(
    [
        T.StructField("log_id", T.LongType(), False),
        T.StructField("process_name", T.StringType(), False),
        T.StructField("process_description", T.StringType(), True),
        T.StructField("start_time", T.TimestampType(), True),
        T.StructField("end_time", T.TimestampType(), True),
        T.StructField("status", T.StringType(), True),  # RUNNING/SUCCESS/FAILED/CANCELLED
        T.StructField("rows_processed", T.LongType(), True),
        T.StructField("rows_inserted", T.LongType(), True),
        T.StructField("rows_updated", T.LongType(), True),
        T.StructField("rows_deleted", T.LongType(), True),
        T.StructField("source_system", T.StringType(), True),
        T.StructField("target_layer", T.StringType(), True),
        T.StructField("error_message", T.StringType(), True),
        T.StructField("process_metadata", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("created_by", T.StringType(), True),
    ]
)

ERROR_LOG = T.StructType(
    [
        T.StructField("error_id", T.LongType(), False),
        T.StructField("process_log_id", T.LongType(), True),
        T.StructField("error_timestamp", T.TimestampType(), True),
        T.StructField("error_level", T.StringType(), True),  # DEBUG..CRITICAL
        T.StructField("error_code", T.StringType(), True),
        T.StructField("error_message", T.StringType(), True),
        T.StructField("error_detail", T.StringType(), True),
        T.StructField("table_name", T.StringType(), True),
        T.StructField("column_name", T.StringType(), True),
        T.StructField("row_context", T.StringType(), True),
        T.StructField("recovery_suggestion", T.StringType(), True),
        T.StructField("is_resolved", T.BooleanType(), True),
        T.StructField("resolved_by", T.StringType(), True),
        T.StructField("resolved_timestamp", T.TimestampType(), True),
    ]
)

DATA_LINEAGE = T.StructType(
    [
        T.StructField("lineage_id", T.LongType(), False),
        T.StructField("process_log_id", T.LongType(), True),
        T.StructField("source_schema", T.StringType(), True),
        T.StructField("source_table", T.StringType(), True),
        T.StructField("source_column", T.StringType(), True),
        T.StructField("target_schema", T.StringType(), True),
        T.StructField("target_table", T.StringType(), True),
        T.StructField("target_column", T.StringType(), True),
        T.StructField("transformation_logic", T.StringType(), True),
        T.StructField("record_count", T.LongType(), True),
        T.StructField("created_timestamp", T.TimestampType(), True),
    ]
)

PERFORMANCE_METRICS = T.StructType(
    [
        T.StructField("metric_id", T.LongType(), False),
        T.StructField("process_log_id", T.LongType(), True),
        T.StructField("metric_name", T.StringType(), True),
        T.StructField("metric_value", T.DecimalType(15, 4), True),
        T.StructField("metric_unit", T.StringType(), True),
        T.StructField("measurement_timestamp", T.TimestampType(), True),
        T.StructField("additional_context", T.StringType(), True),
    ]
)

CONFIGURATION_LOG = T.StructType(
    [
        T.StructField("config_log_id", T.LongType(), False),
        T.StructField("config_key", T.StringType(), False),
        T.StructField("old_value", T.StringType(), True),
        T.StructField("new_value", T.StringType(), True),
        T.StructField("change_reason", T.StringType(), True),
        T.StructField("changed_by", T.StringType(), True),
        T.StructField("change_timestamp", T.TimestampType(), True),
        T.StructField("environment", T.StringType(), True),
    ]
)

LOGS_TABLES = {
    "process_log": PROCESS_LOG,
    "error_log": ERROR_LOG,
    "data_lineage": DATA_LINEAGE,
    "performance_metrics": PERFORMANCE_METRICS,
    "configuration_log": CONFIGURATION_LOG,
}
