"""Parquet/CSV source readers (maps reference S1/S2 — ``medallion/bronze.py:473``,
``sql/dml.py:394-445``).

The reference reads whole CSVs into pandas on the driver; here every read is
a distributed ``spark.read`` whose scan Catalyst can prune (column pruning +
predicate pushdown reach the parquet reader — verify with
``df.explain('formatted')``: look for ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Tables the driver generates at /root/testdata/sf*/ (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_conf(spark: SparkSession, key: str, value: str) -> None:
    """Set a session conf only when it differs — keeps ``load_table``
    side-effect-free on every call after the first."""
    try:
        current = spark.conf.get(key)
    except Exception:
        current = None
    if current != value:
        spark.conf.set(key, value)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table. Lazy — no data moves until an action.

    ``events.ts`` is written as TIMESTAMP(NANOS), which the Spark parquet
    reader rejects; it is read as raw nanos (legacy long mode) and converted
    to a microsecond timestamp with exact integer division (``DIV 1000`` —
    double division would lose precision at 1e18 ns), truncating exactly
    like DuckDB's ns→µs parquet conversion so oracle comparisons agree.
    """
    # Pin the session timezone: the caller may hand us a vanilla session
    # (the correctness driver does); naive parquet timestamps must collect
    # as UTC wall-times to agree with the DuckDB oracle (SURVEY §7.2 r5).
    # _ensure_conf writes at most once per session — repeated load_table
    # calls never re-mutate session state (and never clobber a caller who
    # pinned these deliberately, since the target value is identical).
    _ensure_conf(spark, "spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        _ensure_conf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    else:
        df = spark.read.parquet(path)
    # Parquet timestamps written without isAdjustedToUTC are inferred as
    # TIMESTAMP_NTZ by Spark 4. Normalize to TIMESTAMP so the whole engine
    # sees one timestamp semantic (session tz is pinned UTC above, so the
    # cast preserves wall-times and agrees with DuckDB's naive reading).
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for ``spark.sql`` use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def read_csv(
    spark: SparkSession,
    path: str,
    *,
    header: bool = True,
    infer_schema: bool = True,
    sep: str = ",",
    encoding: str = "UTF-8",
    null_value: str | None = None,
    quote: str = '"',
    escape: str = "\\",
) -> DataFrame:
    """CSV scan with the option surface of the reference's COPY generator
    (``sql/dml.py:394-445``: DELIMITER/ENCODING/NULL/QUOTE/ESCAPE/HEADER).

    Schema inference runs distributed on executors (one extra pass); for
    production-scale loads pass an explicit schema via ``spark.read.schema``.
    """
    reader = (
        spark.read.option("header", header)
        .option("inferSchema", infer_schema)
        .option("sep", sep)
        .option("encoding", encoding)
        .option("quote", quote)
        .option("escape", escape)
    )
    if null_value is not None:
        reader = reader.option("nullValue", null_value)
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    *,
    schema: "str | None" = None,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-Lines scan — the lingua franca of LLM corpus interchange.

    With an explicit ``schema`` (DDL string) the scan is single-pass and
    malformed lines are captured PERMISSIVE-ly into ``corrupt_col``
    instead of killing the job — at 100 TB a handful of broken lines must
    never fail the read, and the corrupt rows stay queryable for triage
    (filter ``corrupt_col IS NOT NULL`` → error table). Without a schema,
    Spark runs a distributed inference pass first (fine interactively;
    pass the schema in production to halve the I/O).
    """
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", corrupt_col
    )
    if schema is not None:
        reader = reader.schema(f"{schema}, {corrupt_col} STRING")
    return reader.json(path)
