"""Layout-aware dataset sinks (extends reference S3/S4 bulk-load intent,
``sql/dml.py:169-246``, to distributed columnar output).

At 100 TB the WRITE layout decides every later read: partition directories
give partition pruning, in-file sort gives min/max row-group skipping and
better encodings, and a records-per-file cap keeps any single file
re-processable. These writers only arrange the plan — Spark executors
write in parallel; nothing funnels through the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_dataset(
    df: DataFrame,
    path: str,
    *,
    fmt: str = "parquet",
    partition_by: Sequence[str] | None = None,
    sort_by: Sequence[str] | None = None,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """Write a pruning- and skipping-friendly dataset.

    - ``partition_by``: hash-repartition on the partition columns first so
      each partition value is written by one task — without this, every
      task holding any row of a value opens a file there and a 1000-task
      write emits 1000 small files PER partition directory.
    - ``sort_by``: ``sortWithinPartitions`` so parquet row-group min/max
      stats are tight → scans with predicates on the sort key skip whole
      row groups.
    - ``max_records_per_file``: bounds file size so a single file never
      becomes an un-splittable straggler.
    """
    out = df
    if partition_by:
        out = out.repartition(*[F.col(c) for c in partition_by])
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    writer = out.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.save(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    compression: str | None = None,
    num_files: int | None = None,
) -> None:
    """JSON-Lines sink (corpus interchange). ``num_files`` coalesces small
    exports; leave unset for large data so every executor writes."""
    out = df.coalesce(num_files) if num_files else df
    writer = out.write.mode(mode)
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.json(path)
