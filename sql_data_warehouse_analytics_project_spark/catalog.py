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

Atomic publish (round 9): a managed table is a metastore VIEW pointing
at a physical GENERATION table (``<table>__gNNNNNN``). ``overwrite``
writes the new state as a brand-new generation table, then republishes
the view with ONE ``CREATE OR REPLACE VIEW`` statement — a single
metastore update, so a concurrent ``spark.table()``/``Catalog.read``
never observes a missing table or a half-swapped state (the reference
gets this from PostgreSQL transactions, ``sql/dml.py:96-167,248-337``;
Delta would make it a table-format commit — this is the metastore-native
equivalent, the same pointer-commit idea as ``sources/manifest.py``).
Readers resolve through the view automatically; filters and column
pruning push through view resolution into the physical scan unchanged.
The previous generation is retained for one publish cycle (in-flight
scans drain), older ones are pruned; a crash anywhere leaves the old
view intact plus at most an orphan generation for
:meth:`Catalog.vacuum_generations`.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sql_data_warehouse_analytics_project_spark.functions.scalars import row_hash
from sql_data_warehouse_analytics_project_spark.operators.relational import (
    exclude_soft_deleted,
)

LAYERS = ("bronze", "silver", "gold", "logs")

#: physical generation tables backing a published view: <table>__gNNNNNN
GEN_RE = re.compile(r"^(?P<base>.+)__g(?P<seq>\d{6})$")
#: view property holding the qualified name of the published generation
GEN_PROP = "spark_graft.generation"

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

    # -- generation plumbing (atomic view-pointer publish) -------------------

    def _gen_name(self, table: str, seq: int) -> str:
        return f"{table}__g{seq:06d}"

    def _is_view(self, qualified: str) -> bool:
        try:
            return self.spark.catalog.getTable(qualified).tableType == "VIEW"
        except Exception:  # noqa: BLE001 — missing table
            return False

    def resolve_table(self, layer: str, table: str) -> str:
        """The qualified PHYSICAL table behind a published view (reads the
        view's generation pointer property) — the view's own name for a
        legacy plain table. Physical-only operations (append, ANALYZE,
        DESCRIBE location, insertInto) go through this; plain reads never
        need it (``spark.table`` resolves the view)."""
        q = self.qualified(layer, table)
        if not self._is_view(q):
            return q
        rows = self.spark.sql(f"SHOW TBLPROPERTIES {q}").collect()
        for r in rows:
            if r["key"] == GEN_PROP:
                return r["value"]
        raise RuntimeError(f"view {q} has no {GEN_PROP} pointer")

    def _generations(self, layer: str, table: str) -> list[str]:
        """Existing generation table NAMES for ``table``, seq-ascending
        (includes orphans a crash may have left)."""
        db = self.db(layer)
        out = []
        for t in self.spark.catalog.listTables(db):
            if t.database != db or t.isTemporary:
                continue
            m = GEN_RE.match(t.name)
            if m and m.group("base") == table:
                out.append((int(m.group("seq")), t.name))
        return [name for _, name in sorted(out)]

    def _publish(self, layer: str, table: str, gen_q: str,
                 comment: str | None = None) -> None:
        """Point the table view at ``gen_q`` without the view EVER being
        absent.

        For an existing view the repoint is ``ALTER VIEW … AS`` — ONE
        ``catalog.alterTable`` call, so a concurrent reader resolves the
        old or the new definition, never a missing view. ``CREATE OR
        REPLACE VIEW`` is NOT that: Spark's ``CreateViewCommand``
        implements replace as ``dropTable`` + ``createTable`` ("nothing
        we need to retain… just drop and create"), leaving a real
        TABLE_OR_VIEW_NOT_FOUND window that the concurrent-reader test
        hit under a loaded box (round 12). The generation pointer (and
        an explicit comment) follow as ``ALTER VIEW … SET
        TBLPROPERTIES`` — a reader between the two statements sees the
        new definition with the previous pointer, whose generation
        table is still retained, i.e. consistent-but-stale, never
        broken. Only the FIRST publish of a table creates the view —
        no reader can hold its name before it ever exists."""
        q = self.qualified(layer, table)
        escaped = (
            comment.replace("\\", "\\\\").replace("'", "\\'")
            if comment else None
        )
        if self._is_view(q):
            self.spark.sql(f"ALTER VIEW {q} AS SELECT * FROM {gen_q}")
            props = f"'{GEN_PROP}'='{gen_q}'"
            if escaped:
                props += f", 'comment'='{escaped}'"
            self.spark.sql(f"ALTER VIEW {q} SET TBLPROPERTIES ({props})")
            return
        stmt = f"CREATE OR REPLACE VIEW {q} "
        if escaped:
            stmt += f"COMMENT '{escaped}' "
        stmt += (
            f"TBLPROPERTIES ('{GEN_PROP}'='{gen_q}') AS SELECT * FROM {gen_q}"
        )
        self.spark.sql(stmt)

    #: previous generations retained per table after a publish (in-flight
    #: readers' grace window); older ones are pruned by overwrite itself
    generation_retention = 1

    def _prune_generations(self, layer: str, table: str, keep: set[str]) -> None:
        gens = self._generations(layer, table)
        keep_tail = set(gens[-(self.generation_retention + 1):])
        for name in gens:
            q = f"{self.db(layer)}.{name}"
            if q in keep or name in keep_tail:
                continue
            self.spark.sql(f"DROP TABLE IF EXISTS {q}")

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
        parquet directory partitioning + file statistics. Creates the first
        generation table plus the published view (module docstring), so
        every later overwrite is an atomic pointer republish."""
        if self.spark.catalog.tableExists(self.qualified(layer, table)):
            return
        fields = list(schema.fields)
        if medallion_metadata:
            present = {f.name for f in fields}
            fields += [f for f in MEDALLION_METADATA_FIELDS if f.name not in present]
        empty = self.spark.createDataFrame([], T.StructType(fields))
        gen_q = f"{self.db(layer)}.{self._gen_name(table, 1)}"
        self.spark.sql(f"DROP TABLE IF EXISTS {gen_q}")
        writer = empty.write.format("parquet")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.saveAsTable(gen_q)
        self._publish(layer, table, gen_q, comment=comment)

    def table_exists(self, layer: str, table: str) -> bool:
        """S5 probe (maps ``BronzeManager.table_exists`` ``bronze.py:303-331``)."""
        return self.spark.catalog.tableExists(self.qualified(layer, table))

    def drop_table(self, layer: str, table: str) -> None:
        q = self.qualified(layer, table)
        if self._is_view(q):
            self.spark.sql(f"DROP VIEW IF EXISTS {q}")
        else:
            self.spark.sql(f"DROP TABLE IF EXISTS {q}")
        for name in self._generations(layer, table):
            self.spark.sql(f"DROP TABLE IF EXISTS {self.db(layer)}.{name}")

    def add_column(self, layer: str, table: str, name: str, dtype: str) -> None:
        """Maps ``alter_table_add_column`` (``sql/ddl.py:347-385``). Alters
        the physical generation, then republishes the view (a view's star
        expansion is frozen at creation — without the republish the new
        column would stay invisible)."""
        phys = self.resolve_table(layer, table)
        self.spark.sql(f"ALTER TABLE {phys} ADD COLUMNS ({name} {dtype})")
        q = self.qualified(layer, table)
        if self._is_view(q):
            self.spark.catalog.refreshTable(phys)
            self._publish(layer, table, phys)

    # -- I/O ----------------------------------------------------------------

    def read(self, layer: str, table: str, *, include_deleted: bool = False) -> DataFrame:
        """Table read with the standing ``is_deleted = FALSE`` filter (P3).
        Resolves through the published view — a concurrent overwrite
        republishes the pointer atomically, so this never sees a missing
        or half-swapped table."""
        df = self.spark.table(self.qualified(layer, table))
        return df if include_deleted else exclude_soft_deleted(df)

    def refresh(self, layer: str, table: str) -> None:
        """Invalidate cached file listings for the table AND its published
        physical generation — needed when another session (a streaming
        micro-batch clone) appended files this session's cache predates."""
        q = self.qualified(layer, table)
        if not self.spark.catalog.tableExists(q):
            return
        self.spark.catalog.refreshTable(q)
        phys = self.resolve_table(layer, table)
        if phys != q:
            self.spark.catalog.refreshTable(phys)

    def append(self, df: DataFrame, layer: str, table: str) -> None:
        """S3/S4 sink — bulk columnar append (replaces the reference's
        per-row INSERT loop, ``bronze.py:495-527``) into the CURRENT
        physical generation behind the view. Appends into a partitioned
        table restate its partition columns (saveAsTable refuses a writer
        whose partitioning differs from the table's)."""
        q = self.qualified(layer, table)
        finish = None
        if self.observer is not None:
            df, finish = self.observer.begin_write(df, layer, table, mode="append")
        publish_gen = None
        if self.spark.catalog.tableExists(q):
            target = self.resolve_table(layer, table)
        else:
            # first write creates generation 1 + the published view, so
            # every table is pointer-committed from birth
            target = f"{self.db(layer)}.{self._gen_name(table, 1)}"
            self.spark.sql(f"DROP TABLE IF EXISTS {target}")
            publish_gen = target
        writer = df.write.mode("append").format("parquet")
        if self.spark.catalog.tableExists(target):
            pcols = [
                c.name for c in self.spark.catalog.listColumns(target) if c.isPartition
            ]
            if pcols:
                writer = writer.partitionBy(*pcols)
        writer.saveAsTable(target)
        if publish_gen is not None:
            self._publish(layer, table, publish_gen)
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
        """Full-table replace via generation write + ATOMIC view republish.

        The new state is written completely as a brand-new generation
        table (``<table>__gNNNNNN``), then one ``ALTER VIEW … AS`` — a
        single ``alterTable`` metastore update — repoints the table at it
        (see :meth:`_publish` for why CREATE OR REPLACE VIEW is not
        atomic in Spark).
        A concurrent reader resolves the view to the old or the new
        generation, never to a missing table or a half-swapped state (the
        reference gets this atomicity from PostgreSQL transactions,
        ``sql/dml.py:96-167,248-337``; a Delta deployment would make it a
        table-format commit). A crash while writing leaves the view — and
        every reader — on the old generation, with at most an orphan
        generation table for :meth:`vacuum_generations`; there is no
        recovery step because no partial state is ever published.

        The previous generation is retained for ``generation_retention``
        further publishes (grace for scans already resolved to it), then
        pruned. Writing the new generation also materializes the plan,
        which typically READS the current generation (upsert/soft-delete
        reconcile) — Spark cannot overwrite files it is still scanning,
        and here it never has to.

        A LEGACY plain table (created outside this catalog) is adopted:
        its state is republished as a generation + view, with a one-time
        DROP TABLE + CREATE VIEW window — every subsequent overwrite is
        atomic."""
        target = self.qualified(layer, table)
        finish = None
        if self.observer is not None:
            # instrument BEFORE the generation write (the row count rides
            # that job); finish fires only after the publish, so lineage/
            # metrics describe the published TARGET, never a half-done write
            df, finish = self.observer.begin_write(df, layer, table, mode="overwrite")
        gens = self._generations(layer, table)
        seq = int(GEN_RE.match(gens[-1]).group("seq")) + 1 if gens else 1
        gen_q = f"{self.db(layer)}.{self._gen_name(table, seq)}"
        self.spark.sql(f"DROP TABLE IF EXISTS {gen_q}")
        writer = df.write.mode("overwrite").format("parquet")
        if partition_by:
            # directory partitioning lives on the generation table, so the
            # published view keeps partition pruning (the scale lever for
            # month-scoped fact scans)
            writer = writer.partitionBy(*partition_by)
        writer.saveAsTable(gen_q)
        exists = self.spark.catalog.tableExists(target)
        if exists and not self._is_view(target):
            # one-time adoption of a legacy plain table (docstring)
            self.spark.sql(f"DROP TABLE {target}")
        self._publish(layer, table, gen_q)
        self._prune_generations(layer, table, keep={gen_q})
        if finish is not None:
            finish()

    def vacuum_staging(self, layer: str) -> list[str]:
        """Reclaim generation tables a crash or retention left behind:
        drop every ``__gNNNNNN`` generation that is neither the published
        pointer of its view nor within the retention tail, plus legacy
        ``__staging`` leftovers whose target exists. A generation (or
        staging table) whose TARGET VIEW is missing is the interrupted-
        adoption state and is deliberately left for
        :meth:`recover_staging` to promote. Returns the dropped names.

        Safe against concurrent readers of the PUBLISHED state (nothing
        referenced is touched); run it while no :meth:`overwrite` is in
        flight on the layer, or an overwrite's freshly-written-but-not-
        yet-published generation could be vacuumed out from under it
        (that overwrite would fail and retry — the published data is
        never at risk, unlike the old staged-rename protocol). Temporary
        views are skipped — only this layer's persisted tables are
        candidates."""
        dropped: list[str] = []
        db = self.db(layer)
        published: dict[str, str] = {}
        gens: dict[str, list[tuple[int, str]]] = {}
        for t in self.spark.catalog.listTables(db):
            # listTables also returns session temp views (database=None)
            if t.database != db or t.isTemporary:
                continue
            m = GEN_RE.match(t.name)
            if m:
                gens.setdefault(m.group("base"), []).append(
                    (int(m.group("seq")), t.name)
                )
                continue
            if t.name.endswith("__staging"):
                target = t.name[: -len("__staging")]
                if self.spark.catalog.tableExists(f"{db}.{target}"):
                    self.spark.sql(f"DROP TABLE {db}.{t.name}")
                    dropped.append(t.name)
        for base, pairs in gens.items():
            q = f"{db}.{base}"
            if not self.spark.catalog.tableExists(q):
                continue  # interrupted adoption: leave for recover_staging
            if self._is_view(q):
                published[base] = self.resolve_table(layer, base)
            names = [name for _, name in sorted(pairs)]
            keep_tail = set(names[-(self.generation_retention + 1):])
            for name in names:
                full = f"{db}.{name}"
                if full == published.get(base) or name in keep_tail:
                    continue
                self.spark.sql(f"DROP TABLE IF EXISTS {full}")
                dropped.append(name)
        return dropped

    def recover_staging(self, layer: str, table: str) -> bool:
        """Finish an interrupted one-time ADOPTION (legacy plain table →
        view) or a legacy staged overwrite: if the target is gone but a
        fully-written generation (or legacy staging table) exists,
        publish the newest one. Returns True if a recovery happened.
        Uninterrupted generation overwrites never need this — a crash
        before the publish leaves the old view live."""
        target = self.qualified(layer, table)
        if self.spark.catalog.tableExists(target):
            return False
        gens = self._generations(layer, table)
        if gens:
            self._publish(layer, table, f"{self.db(layer)}.{gens[-1]}")
            return True
        staging = f"{target}__staging"
        if not self.spark.catalog.tableExists(staging):
            return False
        # legacy staged overwrite: promote the staging table into the
        # generation protocol (rename to g1, publish the view)
        gen_q = f"{self.db(layer)}.{self._gen_name(table, 1)}"
        self.spark.sql(f"DROP TABLE IF EXISTS {gen_q}")
        self.spark.sql(f"ALTER TABLE {staging} RENAME TO {gen_q}")
        if any(c.isPartition for c in self.spark.catalog.listColumns(gen_q)):
            # partitioned staging: per-partition locations still reference
            # the pre-rename path
            self.spark.sql(f"MSCK REPAIR TABLE {gen_q}")
        self._publish(layer, table, gen_q)
        return True

    def vacuum_generations(self, layer: str) -> list[str]:
        """Alias of :meth:`vacuum_staging` under its round-9 name — the
        generation protocol made staging tables a legacy concept."""
        return self.vacuum_staging(layer)

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
        # materialize once (eager): the constraint summary is a UNION of
        # per-rule scans of this batch — concurrent leaf stages that would
        # race on an unmaterialized pin's block locks — and the append
        # below reads it a further time
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
        """Logical tables of a layer — internal generation/staging
        physicals are implementation detail and filtered out."""
        db = self.db(layer)
        return [
            t.name
            for t in self.spark.catalog.listTables(db)
            if t.database == db
            and not GEN_RE.match(t.name)
            and not t.name.endswith("__staging")
        ]

    def table_stats(self, layer: str, table: str) -> dict:
        """Maps ``get_table_stats_sql`` (row estimate + size). Location
        comes from the published physical generation."""
        q = self.qualified(layer, table)
        n = self.spark.table(q).count()
        detail = self.spark.sql(
            f"DESCRIBE EXTENDED {self.resolve_table(layer, table)}"
        ).collect()
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
        null counts per analyzed column) read back via DESCRIBE. Stats
        live on the published physical generation — exactly the relation
        every read through the view resolves to, so CBO uses them.
        """
        q = self.qualified(layer, table)
        phys = self.resolve_table(layer, table)
        stmt = f"ANALYZE TABLE {phys} COMPUTE STATISTICS"
        if columns:
            cols = ", ".join(f"`{c}`" for c in columns)
            stmt += f" FOR COLUMNS {cols}"
        self.spark.sql(stmt)
        detail = self.spark.sql(f"DESCRIBE EXTENDED {phys}").collect()
        props = {r.col_name: r.data_type for r in detail}
        out: dict = {"table": q, "statistics": props.get("Statistics")}
        for c in columns or []:
            rows = self.spark.sql(f"DESCRIBE EXTENDED {phys} `{c}`").collect()
            out[c] = {r.info_name: r.info_value for r in rows}
        return out

    def column_info(self, layer: str, table: str) -> list[dict]:
        """Per-column metadata (maps ``get_column_info_sql``,
        ``sql/query_builder.py:437-489``: name/type/nullable/position plus
        the partition flag Postgres expresses via table DDL — read from
        the physical generation, where partitioning lives)."""
        cols = self.spark.catalog.listColumns(self.resolve_table(layer, table))
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
        """Table-level metadata (maps ``get_table_info_sql``). The
        ``table_type`` reported is the PHYSICAL generation's (MANAGED) —
        the pointer view is plumbing, not what a catalog audit asks
        about; ``storage`` names the published generation."""
        q = self.qualified(layer, table)
        t = self.spark.catalog.getTable(q)
        phys = self.resolve_table(layer, table)
        ttype = t.tableType
        if ttype == "VIEW":
            ttype = self.spark.catalog.getTable(phys).tableType
        return {
            "name": t.name,
            "database": self.db(layer),
            "table_type": ttype,
            "is_temporary": t.isTemporary,
            "description": t.description,
            "storage": phys,
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
            tables = sorted(self.list_tables(layer))
            out.append(
                {"layer": layer, "database": db, "table_count": len(tables), "tables": tables}
            )
        return out
