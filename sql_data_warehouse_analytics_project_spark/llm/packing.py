"""Sequence packing for LLM training pipelines (north-star extension —
no reference counterpart; the closest surface is the batched ingest
``medallion/bronze.py:495-527``, which buckets rows by count where this
buckets documents by token budget).

Training consumes fixed-length context windows; feeding one document per
window wastes the tail of every window on padding. The standard fix is
**concat-and-chunk packing**: lay the (deterministically shuffled)
document stream end-to-end and cut it every ``capacity`` tokens. This
module computes that layout declaratively — each document's byte/token
span in the packed stream — without materializing any concatenated text.

Scale design: a single global stream would serialize the cumulative sum
through one partition. Instead documents are hash-assigned to
``n_streams`` independent streams (the way real pipelines shard: each
stream maps to a writer/worker), and the running offset is a window
cumsum **partitioned by stream** — one shuffle, parallelism = n_streams,
no global sort, no driver state. Order within a stream is a second
content hash, giving a reproducible global shuffle of the corpus (same
property as :mod:`~.llm.sampling`: membership and order are pure
functions of the id, stable across reruns and cluster layouts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sql_data_warehouse_analytics_project_spark.llm.sampling import hash_bucket


def pack_concat_chunks(
    df: DataFrame,
    id_col: str,
    token_count: Column,
    *,
    capacity: int,
    n_streams: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """Assign every document a position in fixed-capacity packed windows.

    Returns the input's ``id_col`` plus:

    - ``stream_id`` — which independent packing stream the doc landed in
    - ``pack_id`` — 0-based window index within the stream
    - ``pack_offset`` — token offset of the doc's first token in that pack
    - ``n_tokens`` — the doc's token count (echo of ``token_count``)
    - ``crosses_boundary`` — true iff the doc spans into the next pack
      (training consumers either split the doc across windows or re-pad;
      the flag lets them choose without recomputing the layout)

    ``token_count`` is any integral Column (e.g. ``text.token_count`` or
    a pre-materialized exact-tokenizer count column).
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if n_streams <= 0:
        raise ValueError(f"n_streams must be positive, got {n_streams}")
    staged = df.select(
        F.col(id_col),
        token_count.cast("bigint").alias("n_tokens"),
        hash_bucket(id_col, salt=f"{salt}:stream", mod=n_streams).alias("stream_id"),
        hash_bucket(id_col, salt=f"{salt}:order").alias("sort_key"),
    )
    w = (
        Window.partitionBy("stream_id")
        .orderBy("sort_key", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("start")
    laid = staged.select(id_col, "stream_id", "n_tokens", start)
    pack_id = F.floor(F.col("start") / capacity)
    end_pack = F.when(
        F.col("n_tokens") > 0,
        F.floor((F.col("start") + F.col("n_tokens") - 1) / capacity),
    ).otherwise(pack_id)
    return laid.select(
        id_col,
        "stream_id",
        pack_id.alias("pack_id"),
        (F.col("start") % capacity).alias("pack_offset"),
        "n_tokens",
        (end_pack > pack_id).alias("crosses_boundary"),
    )


def pack_utilization(packed: DataFrame, *, capacity: int) -> DataFrame:
    """Roll the per-doc layout up to per-stream packing stats: docs,
    token totals, pack count, and fill ratio (tokens / (packs ×
    capacity)) — the metric that tells you whether capacity/n_streams
    are sized right before a 100 TB run."""
    return (
        packed.groupBy("stream_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.max(F.col("pack_id")) + 1).alias("n_packs"),
            F.sum(F.col("crosses_boundary").cast("long")).alias("n_boundary_docs"),
        )
        .select(
            "stream_id",
            "n_docs",
            "total_tokens",
            "n_packs",
            "n_boundary_docs",
            F.round(
                F.col("total_tokens") / (F.col("n_packs") * F.lit(capacity)), 6
            ).alias("fill_ratio"),
        )
    )
