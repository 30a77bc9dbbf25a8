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
        # optional auto-capture hook (RunContext.enable_auto_capture):
        # an object with begin_write(df, layer, table, mode) ->
        # (instrumented_df, finish_callable | None). See
        # ops/lineage_capture.py for the contract.
        self.observer = None

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
        per-row INSERT loop, ``bronze.py:495-527``). Appends into a
        partitioned table restate its partition columns (saveAsTable
        refuses a writer whose partitioning differs from the table's)."""
        q = self.qualified(layer, table)
        finish = None
        if self.observer is not None:
            df, finish = self.observer.begin_write(df, layer, table, mode="append")
        writer = df.write.mode("append").format("parquet")
        if self.spark.catalog.tableExists(q):
            pcols = [
                c.name for c in self.spark.catalog.listColumns(q) if c.isPartition
            ]
            if pcols:
                writer = writer.partitionBy(*pcols)
        writer.saveAsTable(q)
        if finish is not None:
            finish()

    def overwrite(
        self,
        df: DataFrame,
        layer: str,
        table: str,
        *,
        partition_by: Sequence[str] = (),
    ) -> None:
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
        finish = None
        if self.observer is not None:
            # instrument BEFORE the staging write (the row count rides that
            # job); finish fires only after the swap, so lineage/metrics
            # describe the materialized TARGET, never a half-done staging
            df, finish = self.observer.begin_write(df, layer, table, mode="overwrite")
        self.spark.sql(f"DROP TABLE IF EXISTS {staging}")
        writer = df.write.mode("overwrite").format("parquet")
        if partition_by:
            # directory partitioning survives the metastore rename, so the
            # swapped-in table keeps partition pruning (the scale lever for
            # month-scoped fact scans)
            writer = writer.partitionBy(*partition_by)
        writer.saveAsTable(staging)
        self.spark.sql(f"DROP TABLE IF EXISTS {target}")
        self.spark.sql(f"ALTER TABLE {staging} RENAME TO {target}")
        if partition_by:
            # the metastore stores per-partition LOCATIONs, which still
            # point at the pre-rename staging directory after the swap —
            # rebuild them from the (moved) directory tree or every read
            # silently sees zero rows
            self.spark.sql(f"MSCK REPAIR TABLE {target}")
        if finish is not None:
            finish()

    def vacuum_staging(self, layer: str) -> list[str]:
        """Drop abandoned ``__staging`` tables whose target exists — the
        leftover of a crash AFTER the overwrite swap (or an aborted
        rewrite). A staging table whose target is MISSING is the crash-
        between-swap-steps state and is deliberately left for
        :meth:`recover_staging` to promote. Returns the dropped names.

        MAINTENANCE-WINDOW operation: run it only while no
        :meth:`overwrite` is in flight on the layer. An overwrite that
        has finished writing staging but not yet swapped looks exactly
        like an abandoned staging table — vacuuming it mid-swap would
        fail the rename and lose both copies. (The reference's
        terminate-connections DDL has the same quiesce-first contract.)
        Temporary views are skipped — only this layer's persisted tables
        are candidates."""
        dropped: list[str] = []
        db = self.db(layer)
        for t in self.spark.catalog.listTables(db):
            # listTables also returns session temp views (database=None)
            if t.database != db or t.isTemporary:
                continue
            if t.name.endswith("__staging"):
                target = t.name[: -len("__staging")]
                if self.spark.catalog.tableExists(f"{db}.{target}"):
                    self.spark.sql(f"DROP TABLE {db}.{t.name}")
                    dropped.append(t.name)
        return dropped

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
        if any(c.isPartition for c in self.spark.catalog.listColumns(target)):
            # partitioned staging: per-partition locations still reference
            # the pre-rename path (same hazard as overwrite's swap)
            self.spark.sql(f"MSCK REPAIR TABLE {target}")
        return True

    # -- declared constraints (S7, maps sql/ddl.py:300-344) -----------------

    def declare_constraints(
        self,
        layer: str,
        table: str,
        specs: Sequence[dict],
        *,
        declared_by: str = "engine",
    ) -> None:
        """Persist a table's constraint declaration (PK/FK/UNIQUE/CHECK
        specs — see :mod:`constraints`) to ``logs.table_constraints``.
        Latest declaration wins; an empty list clears enforcement.
        Enforcement happens on :meth:`checked_append`."""
        import datetime
        import json

        from sql_data_warehouse_analytics_project_spark import constraints as C

        C.compile_constraints(specs)  # validate the spec shape up front
        self.create_table(
            "logs", C.CONSTRAINTS_TABLE, C.CONSTRAINTS_SCHEMA, medallion_metadata=False
        )
        row = {
            "layer": layer,
            "table_name": table,
            "constraints_json": json.dumps(list(specs)),
            "declared_at": datetime.datetime.now(datetime.timezone.utc).replace(
                tzinfo=None
            ),
            "declared_by": declared_by,
        }
        self.append(
            self.spark.createDataFrame([row], C.CONSTRAINTS_SCHEMA),
            "logs",
            C.CONSTRAINTS_TABLE,
        )

    def get_constraints(self, layer: str, table: str) -> list[dict]:
        """Latest declared constraint specs for a table ([] if none)."""
        import json

        from sql_data_warehouse_analytics_project_spark import constraints as C

        if not self.table_exists("logs", C.CONSTRAINTS_TABLE):
            return []
        rows = (
            self.spark.table(self.qualified("logs", C.CONSTRAINTS_TABLE))
            .filter((F.col("layer") == layer) & (F.col("table_name") == table))
            .orderBy(F.col("declared_at").desc())
            .limit(1)
            .collect()
        )
        return json.loads(rows[0]["constraints_json"]) if rows else []

    def checked_append(
        self,
        df: DataFrame,
        layer: str,
        table: str,
        *,
        run_context=None,
        process_log_id: int | None = None,
    ) -> DataFrame | None:
        """Append with declared-constraint enforcement: evaluate the
        table's constraints against the batch, record every failed rule to
        ``logs.error_log`` (when ``run_context`` is given), REFUSE the
        write on any ERROR-severity violation (raises
        :class:`constraints.ConstraintViolationError` — the target is
        untouched, matching the all-or-nothing write the reference gets
        from PostgreSQL constraints), and append otherwise. Returns the
        per-rule summary, or None when no constraints are declared."""
        from sql_data_warehouse_analytics_project_spark import constraints as C

        specs = self.get_constraints(layer, table)
        if not specs:
            self.append(df, layer, table)
            return None
        # materialize once: the constraint scans AND the append below all
        # read the checkpointed batch instead of re-running its lineage
        df = df.localCheckpoint(eager=True)
        summary = C.check(self, df, specs)
        failed = summary.filter(~F.col("passed")).collect()
        if run_context is not None:
            for r in failed:
                run_context.log_error(
                    f"CONSTRAINT_{r['rule_type'].upper()} {r['rule_name']}:"
                    f" {r['violation_count']} violation(s) in batch for"
                    f" {self.qualified(layer, table)}",
                    level=r["severity"],
                    table_name=self.qualified(layer, table),
                    process_log_id=process_log_id,
                )
        errors = [r.asDict() for r in failed if r["severity"] == "ERROR"]
        if errors:
            raise C.ConstraintViolationError(self.qualified(layer, table), errors)
        self.append(df, layer, table)
        return summary

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

    def analyze(
        self, layer: str, table: str, columns: "Sequence[str] | None" = None
    ) -> dict:
        """ANALYZE TABLE — collect table (and optionally per-column)
        statistics into the metastore so Catalyst's cost-based optimizer
        has real cardinalities: with column stats, join reordering and
        broadcast decisions stop guessing from file sizes. The Postgres
        reference leans on autovacuum/ANALYZE implicitly; a Spark
        warehouse must run this explicitly after large loads — call it
        from ingest jobs the way ``table_stats`` is called from audits.

        Returns the recorded stats (rowCount/sizeInBytes, plus distinct/
        null counts per analyzed column) read back via DESCRIBE.
        """
        q = self.qualified(layer, table)
        stmt = f"ANALYZE TABLE {q} COMPUTE STATISTICS"
        if columns:
            cols = ", ".join(f"`{c}`" for c in columns)
            stmt += f" FOR COLUMNS {cols}"
        self.spark.sql(stmt)
        detail = self.spark.sql(f"DESCRIBE EXTENDED {q}").collect()
        props = {r.col_name: r.data_type for r in detail}
        out: dict = {"table": q, "statistics": props.get("Statistics")}
        for c in columns or []:
            rows = self.spark.sql(f"DESCRIBE EXTENDED {q} `{c}`").collect()
            out[c] = {r.info_name: r.info_value for r in rows}
        return out

    def column_info(self, layer: str, table: str) -> list[dict]:
        """Per-column metadata (maps ``get_column_info_sql``,
        ``sql/query_builder.py:437-489``: name/type/nullable/position plus
        the partition flag Postgres expresses via table DDL)."""
        cols = self.spark.catalog.listColumns(self.qualified(layer, table))
        return [
            {
                "name": c.name,
                "data_type": c.dataType,
                "nullable": c.nullable,
                "is_partition": c.isPartition,
                "is_bucket": c.isBucket,
                "ordinal_position": i,
            }
            for i, c in enumerate(cols)
        ]

    def table_info(self, layer: str, table: str) -> dict:
        """Table-level metadata (maps ``get_table_info_sql``)."""
        t = self.spark.catalog.getTable(self.qualified(layer, table))
        return {
            "name": t.name,
            "database": self.db(layer),
            "table_type": t.tableType,
            "is_temporary": t.isTemporary,
            "description": t.description,
        }

    def database_info(self, layer: str) -> dict:
        """Layer-database metadata (maps ``get_database_info_sql``)."""
        d = self.spark.catalog.getDatabase(self.db(layer))
        return {
            "name": d.name,
            "catalog": d.catalog,
            "description": d.description,
            "location": d.locationUri,
        }

    def schema_info(self) -> list[dict]:
        """All layer databases with their table inventory (maps
        ``get_schema_info_sql`` — one row per schema with object counts)."""
        out = []
        for layer in LAYERS:
            db = self.db(layer)
            if not self.spark.catalog.databaseExists(db):
                continue
            tables = sorted(t.name for t in self.spark.catalog.listTables(db))
            out.append(
                {"layer": layer, "database": db, "table_count": len(tables), "tables": tables}
            )
        return out
