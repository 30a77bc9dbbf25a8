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
    if salt_col in skewed.columns or salt_col in other.columns:
        # would silently overwrite (then drop) the caller's column
        raise ValueError(
            f"salted_join salt column {salt_col!r} collides with an input "
            "column; pass a different salt_col"
        )
    # DETERMINISTIC salt, not rand(): a retried/speculative map task
    # re-draws rand() values, so rows can be duplicated or lost when a
    # fetch failure re-runs part of the salted exchange (SPARK-38388 —
    # the guide's §2.5 hazard). Hashing the whole row spreads a hot
    # key's rows across buckets (they differ in their other columns)
    # while staying stable under any retry. Any salt value in
    # [0, buckets) yields the same join result — the replicated side
    # carries every value — so this is semantically invisible.
    s = skewed.withColumn(
        salt_col,
        F.pmod(F.xxhash64(F.struct(*skewed.columns)), F.lit(salt_buckets))
        .cast("int"),
    )
    o = other.withColumn(
        salt_col,
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    # Force the shuffle-join shape the operator exists for: salting only
    # helps when the join SHUFFLES on (keys + salt) — exactly the regime
    # where the other side is too big to broadcast. Left to estimates,
    # the planner happily broadcasts the salt_buckets×-EXPLODED side
    # (measured on q43: the ×8 replica collected to the driver as one
    # serial BroadcastExchange and the probe ran on the scan's few
    # splits), which inflates the broadcast by the salt factor and
    # defeats the partition-splitting entirely. Sort-merge spills
    # gracefully at the pathological-skew scale this operator targets.
    return s.join(o.hint("merge"), keys + [salt_col], how).drop(salt_col)


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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    *,
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    tolerance_seconds: float | None = None,
    suffix: str = "_asof",
    validate: str = "none",
) -> DataFrame:
    """As-of (most-recent-match) join: every left row picks up the right
    row with the greatest ``right_ts <= left_ts`` for the same ``by`` keys
    — the time-series primitive Spark lacks as a built-in (DuckDB/Polars
    expose it as ASOF JOIN; kdb as aj).

    NOT implemented as the naive theta join (``l.ts >= r.ts`` explodes
    into a per-key cross product before ranking). Instead the classic
    merge formulation: tag and union both sides, sort each key's single
    timeline once, and carry the latest right payload forward with
    ``last(..., ignorenulls=True)`` over rows-unbounded-preceding. ONE
    shuffle on the key columns, O(n log n) in each key's row count, no
    row-pair blowup — survives 100 TB where both sides are fact-scale
    (the window refuses nothing: every partition is one user's stream).

    Right rows must be unique per (by, ts) — pre-aggregate if not
    (equal-timestamp duplicates would make "the" most recent row
    ambiguous). ``validate="unique"`` enforces that contract IN-PLAN
    (``assert_true`` behind a filter, so the check cannot be pruned and
    fails the job with a clear message instead of silently picking one
    duplicate) at the cost of one extra window pass over the right side.
    ``tolerance_seconds`` nulls out matches staler than the given horizon
    (pandas ``merge_asof(tolerance=...)`` semantics).
    Output: all left columns + ``<col><suffix>`` for each right value
    column + ``<right_ts><suffix>`` for the matched timestamp.
    """
    if validate not in ("none", "unique"):
        raise ValueError(f"validate must be 'none' or 'unique', got {validate!r}")
    keys = list(by)
    vals = list(right_values)
    # reserved internals: a user column with one of these names would be
    # silently overwritten and dropped (same guard class as
    # interval_overlap_join's _cell)
    reserved = {"_ts", "_side", "_payload"} | (
        {"_n_dup"} if validate == "unique" else set()
    )
    clash = sorted(reserved & (set(left.columns) | set(right.columns)))
    if clash:
        raise ValueError(f"asof_join reserves internal column name(s) {clash}")
    if "_pts" in vals:
        raise ValueError("asof_join reserves '_pts' inside the payload struct")
    if validate == "unique":
        from pyspark.sql.window import Window as _W

        right = right.withColumn(
            "_n_dup", F.count(F.lit(1)).over(_W.partitionBy(*keys, right_ts))
        )
        right = right.filter(
            F.assert_true(
                F.col("_n_dup") == 1,
                F.concat(
                    F.lit("asof_join: right side has duplicate rows per ("),
                    F.lit(", ".join([*keys, right_ts])),
                    F.lit("): key="),
                    F.concat_ws("/", *[F.col(k).cast("string") for k in keys]),
                    F.lit(" ts="),
                    F.col(right_ts).cast("string"),
                ),
            ).isNull()
        ).drop("_n_dup")
    out_ts = f"{right_ts}{suffix}"
    # the right payload travels as ONE struct so the match is always a
    # whole right row — carrying each value column independently with
    # last(ignorenulls) would backfill a NULL field from an OLDER right
    # row, fabricating composite rows no engine's ASOF join produces
    payload = F.struct(F.col(right_ts).alias("_pts"), *[F.col(c) for c in vals])
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[c for c in left.columns if c not in keys],
        F.lit(None).cast(
            "struct<_pts:"
            + right.schema[right_ts].dataType.simpleString()
            + "".join(f",{c}:{right.schema[c].dataType.simpleString()}" for c in vals)
            + ">"
        ).alias("_payload"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
        payload.alias("_payload"),
    )
    from pyspark.sql.window import Window

    # right rows sort before left at equal ts (_side 0 < 1) → inclusive
    # "<=" match, the ASOF default
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        r_tagged.unionByName(l_tagged)
        .withColumn("_payload", F.last("_payload", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance_seconds is not None:
        stale = (
            F.unix_micros(F.col("_ts")) - F.unix_micros(F.col("_payload._pts"))
        ) > int(tolerance_seconds * 1_000_000)
        out = out.withColumn(
            "_payload", F.when(stale, F.lit(None)).otherwise(F.col("_payload"))
        )
    return out.select(
        *[c for c in out.columns if c not in ("_ts", "_side", "_payload")],
        *[F.col(f"_payload.{c}").alias(f"{c}{suffix}") for c in vals],
        F.col("_payload._pts").alias(out_ts),
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    *,
    left_start: str,
    left_end: str,
    right_point: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval range join at scale: every right row whose
    ``right_point`` timestamp falls in a left row's
    ``[left_start, left_end]`` (inclusive), matched per ``by`` keys.

    Spark plans a raw inequality ON as BroadcastNestedLoopJoin (or a
    per-key cross product) — quadratic per key. This is the standard
    bucketization instead: intervals explode into the time buckets they
    touch (⌈interval/bucket⌉+1 rows), points land in exactly ONE bucket,
    and the join is a plain EQUI join on (keys, bucket) + an exact range
    filter. Because each point has a single bucket, every true pair
    appears exactly once — no dedup pass. Pick ``bucket_seconds`` near
    the typical interval length: the left-side blowup stays ~2× and each
    shuffle partition holds one key×bucket slice — this is how DuckDB/
    Trino execute range joins internally (IEJoin-adjacent), expressed in
    DataFrame ops.

    ``how='left'`` has exact SQL LEFT JOIN multiplicity: one row per
    matching pair, and exactly ONE all-NULL-right row for an interval
    with no matches (implemented as inner matches ∪ anti-joined leftovers
    — the bucket explosion never leaks phantom rows into the output)."""
    if how not in ("inner", "left"):
        raise ValueError("range_join supports inner/left")
    keys = list(by)
    if "_bucket" in left.columns or "_bucket" in right.columns:
        # would be silently overwritten by the cell column and dropped
        raise ValueError("range_join reserves the internal column name '_bucket'")
    w = F.lit(bucket_seconds * 1_000_000).cast("long")
    lid = "_range_join_lid"
    # row identity for the left-join leftovers; stable because both the
    # matched and anti-join branches derive from this one tagged plan
    # over a deterministic scan partitioning
    left_tagged = left.withColumn(lid, F.monotonically_increasing_id())
    l = left_tagged.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.unix_micros(F.col(left_start)) / w).cast("long"),
                (F.unix_micros(F.col(left_end)) / w).cast("long"),
            )
        ),
    )
    r = right.withColumn("_bucket", (F.unix_micros(F.col(right_point)) / w).cast("long"))
    in_range = F.col(right_point).isNotNull() & F.col(right_point).between(
        F.col(left_start), F.col(left_end)
    )
    matched = l.join(r, [*keys, "_bucket"]).filter(in_range).drop("_bucket")
    if how == "inner":
        return matched.drop(lid)
    unmatched = left_tagged.join(
        matched.select(lid).distinct(), lid, "left_anti"
    ).select(
        "*", *[F.lit(None).cast(right.schema[c].dataType).alias(c)
               for c in right.columns if c not in keys]
    )
    return matched.unionByName(unmatched).drop(lid)


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


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    block_keys: Sequence[str],
    left_col: str,
    right_col: str,
    *,
    max_distance: int = 2,
    distance_col: str = "edit_distance",
) -> DataFrame:
    """Approximate string match (entity resolution): candidate pairs come
    from an EQUI join on ``block_keys``, then Levenshtein prunes to
    ``max_distance`` — never an all-pairs cross product. Blocking is the
    caller's contract (same as every production ER system): pick keys
    coarse enough to catch true matches (phonetic code, prefix, length
    band, sorted-token key) and fine enough to bound block sizes; recall
    is bounded by the blocking, exactness within a block is total.

    Scale shape: one shuffle per side on the block keys; Levenshtein
    runs codegen'd on JVM rows, only within blocks. Watch block-size skew
    with ``aggregates.key_skew_stats`` on the block keys first."""
    keys = list(block_keys)
    if left_col in keys or right_col in keys:
        raise ValueError(
            "fuzzy_join match columns must not be block keys "
            f"(left_col={left_col!r}, right_col={right_col!r}, "
            f"block_keys={keys}): a block key is equal within the block, "
            "so its edit distance is always 0 — pick a separate match column"
        )
    lcols = [c for c in left.columns if c not in keys]
    rcols = [c for c in right.columns if c not in keys]
    for side, cols, prefix in (("left", lcols, "l_"), ("right", rcols, "r_")):
        clash = sorted({prefix + c for c in cols} & set(keys))
        if clash:
            raise ValueError(
                f"fuzzy_join block key(s) {clash} collide with the {prefix}* "
                f"prefixed payload of the {side} input — rename one of them"
            )
    l = left.select(*keys, *[F.col(c).alias(f"l_{c}") for c in lcols])
    r = right.select(*keys, *[F.col(c).alias(f"r_{c}") for c in rcols])
    # The per-pair Levenshtein dominates this operator by orders of
    # magnitude over row movement, so probe-side parallelism must come
    # from the BLOCK layout, not from however many file splits the input
    # happens to arrive as: a small single-split side would otherwise run
    # every in-block DP comparison on one core (measured: the whole q58
    # broadcast-join probe executed as ONE task). Hash-partitioning the
    # probe side by the block keys (pinned count — AQE would coalesce a
    # small keyed exchange right back to one partition) spreads blocks
    # across the cluster and is the same exchange a sort-merge plan would
    # need anyway; the row payload here is thin (keys + match column).
    nparts = int(
        left.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    l = l.repartition(nparts, *[F.col(k) for k in keys])
    lc, rc = F.col(f"l_{left_col}"), F.col(f"r_{right_col}")
    # Two-tier prune inside the block: (1) |len(a)-len(b)| <= max_distance
    # is a lower bound on edit distance and costs O(1) per pair — the
    # conjunct short-circuits before any DP table is built; (2) the
    # thresholded levenshtein bails out of the DP early (O(d·min(m,n))
    # band instead of O(m·n) full table) returning -1 above the bound.
    dist = F.levenshtein(lc, rc, max_distance)
    return (
        l.join(r, keys)
        .filter(F.abs(F.length(lc) - F.length(rc)) <= max_distance)
        .withColumn(distance_col, dist)
        .filter(F.col(distance_col) >= 0)
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket: int,
) -> DataFrame:
    """Interval×interval overlap join (half-open: ``ls < re AND rs < le``)
    — the two-sided companion of :func:`range_join`'s point-in-interval.
    A raw inequality join plans as a per-key cross product; instead both
    sides explode their intervals into fixed-width cells
    (``floor(t / bucket)``), candidates come from an EQUI join on
    (keys, cell), and the exact predicate refilters.

    De-dup without a shuffle: a pair overlapping several cells is kept
    only where ``cell == floor(greatest(ls, rs) / bucket)`` — the first
    cell of the overlap — so each qualifying pair appears EXACTLY once
    and no distinct pass is needed.

    Start/end must be numeric (cast dates to a day index first). Pick
    ``bucket`` near the typical interval length: cells-per-interval is
    ``len/bucket + 1`` (blow-up factor of the explode), while candidates
    per cell grow as bucket widens — the classic space/selectivity
    trade. Column naming mirrors :func:`fuzzy_join`: join keys keep
    their names, payloads get ``l_``/``r_`` prefixes.
    """
    ks = list(keys)
    if bucket < 1:
        raise ValueError("bucket must be >= 1")
    if "_cell" in ks:
        # payload columns are protected by the l_/r_ prefixes, but a KEY
        # literally named _cell would silently corrupt the equi-join
        # condition (it doubles as the internal cell column below)
        raise ValueError(
            "interval_overlap_join keys may not contain the reserved "
            "internal column name '_cell'"
        )
    lcols = [c for c in left.columns if c not in ks]
    rcols = [c for c in right.columns if c not in ks]
    for side, cols, prefix in (("left", lcols, "l_"), ("right", rcols, "r_")):
        clash = sorted({prefix + c for c in cols} & set(ks))
        if clash:
            raise ValueError(
                f"interval_overlap_join key(s) {clash} collide with the "
                f"{prefix}* prefixed payload of the {side} input"
            )

    def cells(df: DataFrame, cols: Sequence[str], prefix: str, s: str, e: str):
        d = df.select(*ks, *[F.col(c).alias(prefix + c) for c in cols])
        # empty/inverted intervals (s >= e) are empty sets under half-open
        # semantics: they match nothing. Without this filter, sequence()
        # would happily count DOWN from lo to hi for an inverted interval
        # and emit garbage candidate cells.
        d = d.filter(F.col(prefix + s) < F.col(prefix + e))
        lo = F.floor(F.col(prefix + s) / bucket).cast("long")
        hi = F.floor(F.col(prefix + e) / bucket).cast("long")
        return d.withColumn("_cell", F.explode(F.sequence(lo, hi)))

    l = cells(left, lcols, "l_", left_start, left_end)
    r = cells(right, rcols, "r_", right_start, right_end)
    ls, le = F.col("l_" + left_start), F.col("l_" + left_end)
    rs, re_ = F.col("r_" + right_start), F.col("r_" + right_end)
    return (
        l.join(r, [*ks, "_cell"])
        .filter((ls < re_) & (rs < le))
        .filter(
            F.col("_cell") == F.floor(F.greatest(ls, rs) / bucket).cast("long")
        )
        .drop("_cell")
    )
