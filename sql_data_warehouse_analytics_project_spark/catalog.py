"""Medallion catalog & table manager (maps reference ``setup/`` + ``sql/ddl.py``).

The reference bootstraps PostgreSQL databases/schemas/tables with generated
DDL (``setup/setup_orchestrator.py:536-603``, strict order
database → schemas → logging → samples). Here layers are Spark databases
and tables are parquet-backed managed tables; everything is idempotent
(``IF NOT EXISTS`` semantics of ``sql/ddl.py:86-88,148-150``).

Medallion metadata columns (``sql/ddl.py:178-189``) are appended to every
managed table at write time: Spark tables have no server-side column
defaults, so defaults become expressions (``current_timestamp()`` etc.)
applied by ``with_medallion_metadata``.

The ``is_deleted`` standing filter (``sql/query_builder.py:121-124``) is
enforced by ``read()`` — the predicate is a plain column equality, so it
pushes down to the parquet scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sql_data_warehouse_analytics_project_spark.functions.scalars import row_hash
from sql_data_warehouse_analytics_project_spark.operators.relational import (
    exclude_soft_deleted,
)

LAYERS = ("bronze", "silver", "gold", "logs")

#: Managed-table metadata columns (reference ``sql/ddl.py:178-189``;
#: README list README.md:517-525).
MEDALLION_METADATA_FIELDS = [
    T.StructField("created_at", T.TimestampType(), True),
    T.StructField("updated_at", T.TimestampType(), True),
    T.StructField("created_by", T.StringType(), True),
    T.StructField("updated_by", T.StringType(), True),
    T.StructField("source_system", T.StringType(), True),
    T.StructField("batch_id", T.StringType(), True),
    T.StructField("is_deleted", T.BooleanType(), True),
    T.StructField("row_hash", T.StringType(), True),
]
MEDALLION_METADATA_COLUMNS = [f.name for f in MEDALLION_METADATA_FIELDS]


def with_medallion_metadata(
    df: DataFrame,
    *,
    created_by: str = "engine",
    source_system: str = "unknown",
    batch_id: str | None = None,
) -> DataFrame:
    """Append the eight managed-table metadata columns. ``row_hash`` covers
    the *data* columns only (sorted by name — order-normalized like the
    reference's sorted row dict, ``medallion/bronze.py:255-268``)."""
    data_cols = [c for c in df.columns if c not in MEDALLION_METADATA_COLUMNS]
    now = F.current_timestamp()
    return (
        df.withColumn("created_at", now)
        .withColumn("updated_at", now)
        .withColumn("created_by", F.lit(created_by))
        .withColumn("updated_by", F.lit(created_by))
        .withColumn("source_system", F.lit(source_system))
        .withColumn("batch_id", F.lit(batch_id))
        .withColumn("is_deleted", F.lit(False))
        .withColumn("row_hash", row_hash(*data_cols))
    )


class Catalog:
    """Layer databases + idempotent table lifecycle + metadata-aware I/O."""

    def __init__(self, spark: SparkSession, prefix: str = ""):
        # prefix lets tests isolate their own set of layer databases
        self.spark = spark
        self.prefix = prefix

    def db(self, layer: str) -> str:
        return f"{self.prefix}{layer}"

    def qualified(self, layer: str, table: str) -> str:
        return f"{self.db(layer)}.{table}"

    # -- setup (maps setup_orchestrator.run_complete_setup) -----------------

    def create_layers(self) -> None:
        """logs first so later steps can audit-log
        (``setup/create_schemas.py:348-351``)."""
        for layer in ("logs", "bronze", "silver", "gold"):
            self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {self.db(layer)}")

    def drop_layers(self) -> None:
        for layer in LAYERS:
            self.spark.sql(f"DROP DATABASE IF EXISTS {self.db(layer)} CASCADE")

    def create_table(
        self,
        layer: str,
        table: str,
        schema: T.StructType,
        *,
        medallion_metadata: bool = True,
        partition_by: Sequence[str] = (),
        comment: str | None = None,
    ) -> None:
        """Idempotent CREATE TABLE (maps ``sql/ddl.py:102-232``). Postgres
        RANGE/HASH/LIST partitioning and indexes (``ddl.py:199-297``) map to
        parquet directory partitioning + file statistics."""
        if self.spark.catalog.tableExists(self.qualified(layer, table)):
            return
        fields = list(schema.fields)
        if medallion_metadata:
            present = {f.name for f in fields}
            fields += [f for f in MEDALLION_METADATA_FIELDS if f.name not in present]
        empty = self.spark.createDataFrame([], T.StructType(fields))
        writer = empty.write.format("parquet")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.saveAsTable(self.qualified(layer, table))
        if comment:
            # escape quotes — an apostrophe in a comment must not break
            # (or inject into) the generated DDL
            escaped = comment.replace("\\", "\\\\").replace("'", "\\'")
            self.spark.sql(
                f"COMMENT ON TABLE {self.qualified(layer, table)} IS '{escaped}'"
            )

    def table_exists(self, layer: str, table: str) -> bool:
        """S5 probe (maps ``BronzeManager.table_exists`` ``bronze.py:303-331``)."""
        return self.spark.catalog.tableExists(self.qualified(layer, table))

    def drop_table(self, layer: str, table: str) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.qualified(layer, table)}")

    def add_column(self, layer: str, table: str, name: str, dtype: str) -> None:
        """Maps ``alter_table_add_column`` (``sql/ddl.py:347-385``)."""
        self.spark.sql(
            f"ALTER TABLE {self.qualified(layer, table)} ADD COLUMNS ({name} {dtype})"
        )

    # -- I/O ----------------------------------------------------------------

    def read(self, layer: str, table: str, *, include_deleted: bool = False) -> DataFrame:
        """Table read with the standing ``is_deleted = FALSE`` filter (P3)."""
        df = self.spark.table(self.qualified(layer, table))
        return df if include_deleted else exclude_soft_deleted(df)

    def append(self, df: DataFrame, layer: str, table: str) -> None:
        """S3/S4 sink — bulk columnar append (replaces the reference's
        per-row INSERT loop, ``bronze.py:495-527``)."""
        df.write.mode("append").format("parquet").saveAsTable(
            self.qualified(layer, table)
        )

    def overwrite(self, df: DataFrame, layer: str, table: str) -> None:
        """Full-table replace via staged write + metastore swap.

        The new state is written completely to ``<table>__staging`` first,
        then swapped in (DROP target + RENAME staging). A crash while
        writing leaves the target untouched; a crash inside the swap
        leaves the new state durable in the staging table (recovered by
        :meth:`recover_staging` or the next overwrite) — at no point is
        the only copy of the data a half-written directory, unlike a
        direct ``mode("overwrite")`` (the reference gets this atomicity
        from PostgreSQL transactions, ``sql/dml.py:96-167,248-337``; a
        Delta deployment would make the swap a single-commit MERGE).

        Writing to staging also materializes the plan, which typically
        READS the target table (upsert/soft-delete reconcile) — Spark
        cannot overwrite files it is still scanning, and here it never
        has to."""
        target = self.qualified(layer, table)
        staging = f"{target}__staging"
        self.spark.sql(f"DROP TABLE IF EXISTS {staging}")
        df.write.mode("overwrite").format("parquet").saveAsTable(staging)
        self.spark.sql(f"DROP TABLE IF EXISTS {target}")
        self.spark.sql(f"ALTER TABLE {staging} RENAME TO {target}")

    def recover_staging(self, layer: str, table: str) -> bool:
        """Finish an overwrite interrupted between its two swap steps:
        if the target is gone but its fully-written staging table exists,
        promote the staging table. Returns True if a recovery happened."""
        target = self.qualified(layer, table)
        staging = f"{target}__staging"
        if self.spark.catalog.tableExists(target) or not self.spark.catalog.tableExists(
            staging
        ):
            return False
        self.spark.sql(f"ALTER TABLE {staging} RENAME TO {target}")
        return True

    # -- catalog introspection (maps S8, sql/query_builder.py:390-567) ------

    def list_tables(self, layer: str):
        return [t.name for t in self.spark.catalog.listTables(self.db(layer))]

    def table_stats(self, layer: str, table: str) -> dict:
        """Maps ``get_table_stats_sql`` (row estimate + size)."""
        q = self.qualified(layer, table)
        n = self.spark.table(q).count()
        detail = self.spark.sql(f"DESCRIBE EXTENDED {q}").collect()
        props = {r.col_name: r.data_type for r in detail}
        return {"table": q, "row_count": n, "location": props.get("Location")}
