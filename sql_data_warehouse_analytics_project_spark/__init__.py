"""PySpark-native medallion-warehouse analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference warehouse framework
(``LaurentVaughan/SQL-Data-Warehouse-Analytics-Project``): medallion layers
(bronze/silver/gold/logs), a relational operator library (select / join /
window / pivot / cohort / gap-detection / quality checks), write-path DML
(upsert / merge / soft-delete / incremental / hash-CDC), bronze CSV
ingestion with metadata enrichment, an operational-metadata subsystem
(process audit, error log, performance metrics, recursive data lineage),
and large-scale training-data pipeline extensions (dedup, similarity
search, text analysis, multimodal columns).

Design stance (SURVEY.md §7.0): every operator is a DataFrame-in →
DataFrame-out function; layers are Spark databases; Catalyst is the
optimizer — operators are declared with the DataFrame/SQL API so predicate
pushdown, column pruning, broadcast selection and AQE apply automatically.
No driver-side row loops on data paths; built-in column expressions over
UDFs everywhere semantics allow.
"""

from sql_data_warehouse_analytics_project_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]

__version__ = "0.1.0"
