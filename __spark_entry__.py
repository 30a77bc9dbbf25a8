"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — registry of implemented operators (SURVEY.md §2).
``oracle_sql()`` — DuckDB twins for the t2 correctness gate.

Implementations live in ``sql_data_warehouse_analytics_project_spark``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sql_data_warehouse_analytics_project_spark import queries as _q
from sql_data_warehouse_analytics_project_spark import queries_events as _qev  # noqa: F401 — registers window/setop/json queries
from sql_data_warehouse_analytics_project_spark import queries_ext as _qext  # noqa: F401 — registers cube/theta/array/range-frame queries
from sql_data_warehouse_analytics_project_spark import queries_llm as _qllm  # noqa: F401 — registers LLM queries
from sql_data_warehouse_analytics_project_spark import queries_medallion as _qmed  # noqa: F401 — registers CSV→silver→gold replay queries (appended last: registry stays append-only)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per queries() key (omitted ⇒ rows-only check)."""
    return dict(_q.ORACLES)
