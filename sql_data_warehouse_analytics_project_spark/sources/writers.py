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

from sql_data_warehouse_analytics_project_spark.sources import manifest

#: optional auto-capture hook for PATH-based writes — the twin of
#: ``Catalog.observer`` for datasets that live outside the metastore
#: (curation ``write_through`` stages, streaming dedup/BM25 index sinks).
#: Set by ``RunContext.enable_auto_capture()`` via :func:`set_path_observer`;
#: one active observer per process (last enable wins — same contract as
#: ``Catalog.observer``, which is per-catalog only because catalogs are).
_path_observer = None


def set_path_observer(observer):
    """Install (or clear, with ``None``) the process-wide path-write
    observer. Returns the previous observer so callers can restore it.
    The observer contract is ``begin_path_write(df, path, mode=...) ->
    (instrumented_df, finish_callable | None)`` — see
    ``RunContext.begin_path_write``."""
    global _path_observer
    prev = _path_observer
    _path_observer = observer
    return prev


def _observe_path_write(df: DataFrame, path: str, mode: str):
    """Route a dataset write through the active observer (no-op without
    one). Observation failures must never break a write — the same
    best-effort contract as catalog auto-capture."""
    if _path_observer is None:
        return df, None
    try:
        return _path_observer.begin_path_write(df, path, mode=mode)
    except Exception:  # noqa: BLE001 — capture never breaks a write
        return df, None


def split_partition_suffix(path: str) -> "tuple[str, str]":
    """Split a slice path into (dataset root, ``k=v/...`` partition
    suffix): the root is everything before the first path component
    containing ``=``. Lets slice writers resolve the DATASET through its
    generation manifest and re-apply the partition segments inside the
    current generation."""
    parts = path.rstrip("/").split("/")
    for i, comp in enumerate(parts):
        if "=" in comp and comp not in ("", "."):
            return "/".join(parts[:i]), "/".join(parts[i:])
    return path.rstrip("/"), ""


def write_partitioned_slice(df: DataFrame, path: str) -> None:
    """Overwrite ONE partition directory of a larger dataset (the
    streaming sinks' per-(checkpoint, batch) layout contract — replays
    rewrite their own slice byte-for-byte instead of double-appending).
    Routed through the path observer so sink maintenance emits the same
    auto-captured lineage edges and write metrics as any other dataset
    write; the recorded dataset name strips the ``k=v`` partition
    segments, so every slice of one sink dataset aggregates under one
    lineage node (``postings``, not ``batch_id=7``). When the dataset
    has been adopted under a generation manifest (a
    :func:`compact_dataset` ran), the slice resolves into the CURRENT
    generation directory."""
    root, suffix = split_partition_suffix(path)
    if suffix and manifest.is_managed(root):
        path = f"{manifest.resolve(root)}/{suffix}"
    out, finish = _observe_path_write(df, path, "overwrite")
    out.write.mode("overwrite").parquet(path)
    if finish is not None:
        finish()


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

    When a path observer is active (``RunContext.enable_auto_capture``),
    the write emits auto-captured ``data_lineage`` edges to
    ``(external, <dataset>)`` and write metrics — the same zero-caller
    contract catalog writes have.

    When ``path`` is a generation-managed dataset (``sources/manifest``),
    an ``overwrite`` lands in a NEW generation and publishes atomically
    (concurrent readers resolving the manifest never observe a partial
    or mixed dataset), and an ``append`` resolves into the current
    generation directory.
    """
    publish_gid = None
    if manifest.is_managed(path):
        if mode == "overwrite":
            publish_gid, gdir = manifest.new_generation(path)
            root, path = path, gdir
        else:
            path = manifest.resolve(path)
    out, finish = _observe_path_write(df, path, mode)
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
    if publish_gid is not None:
        manifest.publish(root, publish_gid)
    if finish is not None:
        finish()


def read_dataset(spark, path: str, *, fmt: str = "parquet") -> DataFrame:
    """Read a path dataset THROUGH its generation manifest when it has
    one (``sources/manifest.resolve``) — the reader half of the atomic-
    publish protocol — and as a plain path otherwise. Partition-directory
    discovery, pushdown, and pruning behave exactly as a direct read of
    the resolved directory."""
    return spark.read.format(fmt).load(manifest.resolve(path))


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    compression: str | None = None,
    num_files: int | None = None,
) -> None:
    """JSON-Lines sink (corpus interchange). ``num_files`` coalesces small
    exports; leave unset for large data so every executor writes.
    Observed like :func:`write_dataset`."""
    out, finish = _observe_path_write(df, path, mode)
    if num_files:
        out = out.coalesce(num_files)
    writer = out.write.mode(mode)
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.json(path)
    if finish is not None:
        finish()


def zorder_key(cols: Sequence[str], *, bits: int = 16) -> "F.Column":
    """Morton (Z-order) interleave of already-bucketed non-negative ints.

    Sorting a dataset by this key before writing clusters EVERY listed
    dimension at once, so parquet row-group min/max stats stay tight on
    all of them — the multi-column generalization of ``write_dataset``'s
    single ``sort_by`` (the trick behind Delta/Iceberg Z-ORDER, built here
    from plain bit arithmetic, fully codegen'd).

    Callers bucket each column into ``[0, 2**bits)`` first (e.g. modulo,
    or quantile bucket via ``ntile``); values outside the range are
    masked. ``bits * len(cols)`` must fit a signed int64 (≤ 62).
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits * n > 62:
        raise ValueError(f"{bits} bits x {n} cols overflows int64")
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        v = F.col(c).cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for b in range(bits):
            key = key + F.shiftleft(
                F.shiftright(v, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return key


def zorder_key_sql(cols: Sequence[str], *, bits: int = 16) -> str:
    """ANSI-SQL twin of :func:`zorder_key` (arithmetic only — runs on any
    engine, used by the oracle check): bit b of col i via
    ``(x // 2^b) % 2`` scaled by ``2^(b*n+i)``."""
    n = len(cols)
    mask = (1 << bits) - 1
    terms = [
        f"(((({c}) % {mask + 1}) // {1 << b}) % 2) * {1 << (b * n + i)}"
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def dataset_file_stats(path: str) -> dict:
    """File-layout health probe for a parquet dataset: file count, total
    bytes, mean file size, and the small-file ratio (files under 8 MiB).
    The number that decides whether :func:`compact_dataset` is worth a
    rewrite — a 100 TB table of 4 KiB files spends its scan time on open
    overhead and its driver memory on file listings, not on data.

    A plain filesystem walk, O(files) with no executors: cheap enough to
    run before every maintenance window. Managed datasets
    (``sources/manifest``) stat their CURRENT generation only."""
    import os

    n_files = total = small = 0
    for dirpath, _dirs, files in os.walk(manifest.resolve(path)):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            size = os.path.getsize(os.path.join(dirpath, f))
            n_files += 1
            total += size
            if size < 8 * 1024 * 1024:
                small += 1
    return {
        "n_files": n_files,
        "total_bytes": total,
        "mean_bytes": total // n_files if n_files else 0,
        "small_file_ratio": round(small / n_files, 4) if n_files else 0.0,
    }


def compact_dataset(
    spark,
    path: str,
    *,
    target_bytes_per_file: int = 128 * 1024 * 1024,
    partition_by: Sequence[str] | None = None,
    sort_by: Sequence[str] | None = None,
) -> dict:
    """Small-file compaction: rewrite a parquet dataset into
    ceil(total/target)-sized files, preserving (or re-establishing)
    partition directories and in-file sort order. The 100 TB hygiene op a
    streaming sink needs periodically — micro-batches emit files per
    trigger, and a month of 30-second triggers is 86k tiny files per
    partition.

    Generation-manifest commit (``sources/manifest``): the compacted
    copy lands completely in a NEW generation directory under the
    dataset root, then ONE atomic manifest replace publishes it —
    concurrent readers resolving through the manifest (every engine
    reader does: ``read_dataset``, the streaming-sink loaders,
    ``read_bm25_index``) see the old or the new generation, never a
    mixture, with no maintenance window. The first compaction ADOPTS a
    plain directory into the managed layout; its pre-migration files
    stay at the root (complete and untouched — a legacy direct
    ``spark.read.parquet(root)`` still works until vacuum) and later
    slice appends resolve into the current generation. A crash mid-write
    leaves the live generation untouched plus an unreferenced directory
    for :func:`sources.manifest.vacuum` — which is the only destructive
    operation and the only one with a readers-drained contract. Returns
    before/after file stats. On Delta this is OPTIMIZE; here it is the
    parquet-native equivalent."""
    import math

    before = dataset_file_stats(path)
    df = spark.read.parquet(manifest.resolve(path))
    n_out = max(1, math.ceil(before["total_bytes"] / target_bytes_per_file))
    gid, gdir = manifest.new_generation(path)
    out = df
    if partition_by:
        out = out.repartition(*[F.col(c) for c in partition_by])
    else:
        out = out.repartition(n_out)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    writer = out.write.mode("overwrite").format("parquet")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(gdir)
    manifest.publish(path, gid)
    after = dataset_file_stats(path)
    return {
        "before": before,
        "after": after,
        "target_files": n_out,
        "generation": gid,
    }
