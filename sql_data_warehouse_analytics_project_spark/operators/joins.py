"""Join operators (maps reference §2.3: J1 join_builder
``sql/query_builder.py:154-187``, J2 semi/anti :330-358, J3
merge-classification ``sql/dml.py:283-293``).

The reference delegates physical join choice to PostgreSQL; here Catalyst +
AQE choose broadcast / sort-merge / shuffled-hash. ``broadcast_small``
gives the explicit hint for dimensions known to be small (region, nation,
part categories) — at 100 TB fact scale a broadcast dim join avoids
shuffling the fact table entirely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

JOIN_TYPES = {
    "inner": "inner",
    "left": "left",
    "left outer": "left",
    "right": "right",
    "right outer": "right",
    "full": "full",
    "full outer": "full",
    "cross": "cross",
    "semi": "left_semi",
    "left_semi": "left_semi",
    "anti": "left_anti",
    "left_anti": "left_anti",
}


def join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
    *,
    broadcast_right: bool = False,
) -> DataFrame:
    """J1 — INNER/LEFT/RIGHT/FULL (+semi/anti/cross) with optional explicit
    broadcast of the build side. Equi-`on` (names) keeps one copy of the key
    columns; Column `on` supports theta joins (Spark falls back to BNLJ —
    use only with a broadcastable side)."""
    how_norm = JOIN_TYPES.get(how.lower())
    if how_norm is None:
        raise ValueError(f"unsupported join type: {how!r}")
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, how_norm)


def broadcast_small(df: DataFrame) -> DataFrame:
    """Explicit broadcast hint for small dimensions."""
    return F.broadcast(df)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    *,
    salt_buckets: int = 16,
    salt_col: str = "_salt",
) -> DataFrame:
    """Skew-mitigated equi join: the skewed (fact) side gets a random salt
    in [0, salt_buckets); the other side is replicated once per salt value
    (explode of a literal range — a salt_buckets× blowup of the SMALLER
    side only). Joining on (keys + salt) splits each hot key into
    ``salt_buckets`` shuffle partitions instead of one straggler task.

    AQE's skew-join splitting handles moderate skew automatically; manual
    salting is for the pathological case (one key = 30% of a 100 TB
    table) where even a split partition exceeds executor memory. Join
    types: inner/left (the salted side's rows each appear exactly once —
    salt is dropped before return)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (salted side preserved)")
    keys = list(on)
    s = skewed.withColumn(salt_col, (F.rand(seed=42) * salt_buckets).cast("int"))
    o = other.withColumn(
        salt_col,
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    return s.join(o, keys + [salt_col], how).drop(salt_col)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_columns: Sequence[str],
    num_buckets: int = 32,
    *,
    sort_columns: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table hash-bucketed on its join key (Spark bucketing ≈
    the reference's physical-design indexes, ``sql/ddl.py:235-297``, but
    for co-location instead of point lookup). Two tables bucketed on the
    same key with the same bucket count join with ZERO shuffle — the
    scan's output partitioning already satisfies the join's requirement.
    That turns every repeated big-big join (fact ⋈ fact, bronze ⋈
    current-state) from an O(data) shuffle into a local zipper."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_columns)
    if sort_columns:
        writer = writer.sortBy(*sort_columns)
    writer.saveAsTable(table)


def classify_changes(
    source: DataFrame,
    target: DataFrame,
    key_columns: Sequence[str],
) -> DataFrame:
    """J3 — merge classification: ``source LEFT JOIN target ON keys`` +
    ``CASE WHEN t.key IS NULL THEN 'INSERT' ELSE 'UPDATE'``
    (reference ``merge_statement`` inner join, ``sql/dml.py:283-293``).

    Returns the source rows with an ``operation`` column ∈
    {'INSERT','UPDATE'}. Only the target's key columns are shuffled
    (projected before the join), not its payload.
    """
    tgt_keys = target.select(*key_columns).distinct().withColumn("_matched", F.lit(True))
    out = source.join(tgt_keys, list(key_columns), "left")
    return out.withColumn(
        "operation",
        F.when(F.col("_matched").isNull(), F.lit("INSERT")).otherwise(F.lit("UPDATE")),
    ).drop("_matched")
