"""Data-lineage traversal & impact analysis (maps reference
``logs/data_lineage.py``: L8 recursive upstream/downstream
:358-584, L9 medallion flow summary :586-655, L10 impact analysis
:670-751).

PostgreSQL recursive CTEs (``WITH RECURSIVE`` + ``ARRAY`` path accumulator
+ ``= ANY(path)`` cycle guard, ``data_lineage.py:393,413,420``) become the
engine-wide bounded fixpoint loop (``operators.setops.iterate``): each
depth is one distributed self-join of the edge table against the frontier;
the path is an ``ArrayType`` column and ``array_contains`` is the cycle
guard. Depth is bounded like the reference (default 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sql_data_warehouse_analytics_project_spark.operators.setops import iterate

#: node identity = "schema.table" (the reference keys edges the same way)


def _edges(lineage: DataFrame) -> DataFrame:
    return lineage.select(
        F.concat_ws(".", "source_schema", "source_table").alias("src"),
        F.concat_ws(".", "target_schema", "target_table").alias("dst"),
    ).distinct()


def traverse(
    lineage: DataFrame,
    start_node: str,
    direction: str = "upstream",
    max_depth: int = 5,
    *,
    broadcast_frontier: bool = True,
    driver_max_edges: int = 1_000_000,
    driver_max_rows: int = 2_000_000,
) -> DataFrame:
    """All nodes reachable from ``start_node``, with depth and full path.

    ``direction='upstream'`` walks target→source (what feeds this table);
    ``'downstream'`` walks source→target (what this table feeds).
    Returns (node, depth, path:array<string>).

    ``broadcast_frontier`` hash-joins each depth without shuffling either
    side: the frontier (just-checkpointed, a handful of paths) broadcasts
    and the edge table stays in place. Right for lineage metadata graphs —
    a warehouse has thousands of tables, so frontiers are KBs. Pass False
    for dense million-edge graphs where path enumeration can explode past
    broadcast size; the loop then falls back to plain shuffle joins.

    Graphs at or under ``driver_max_edges`` oriented edges (known for
    free — the edge list is pinned and counted anyway) traverse with a
    plain BFS on the driver: a lineage graph is metadata (thousands of
    tables), and the distributed loop's cost is per-round driver JOB
    overhead — broadcast build + join + checkpoint + emptiness probe
    per depth — not data, so the in-memory walk beats ``max_depth``
    rounds of fixed cost by ~5× (the ``connected_components``
    ``driver_max_edges`` pattern, third use). The BFS replays the
    fixpoint step EXACTLY (same join/cycle-guard/distinct per depth,
    same short-circuit), so the row set is identical; if path
    enumeration explodes past ``driver_max_rows`` mid-walk, the
    distributed loop takes over from scratch on the already-pinned
    edges. Million-edge graphs go distributed as before.
    """
    if direction not in ("upstream", "downstream"):
        raise ValueError(direction)
    edges = _edges(lineage)
    # orient edges so traversal is always "from 'node' to 'next'"
    if direction == "upstream":
        oriented = edges.select(F.col("dst").alias("node"), F.col("src").alias("next"))
    else:
        oriented = edges.select(F.col("src").alias("node"), F.col("dst").alias("next"))
    # the bounded fixpoint embeds this subtree once per depth level —
    # materialize so the edge derivation (scan + distinct) computes once
    # (localCheckpoint, not persist: no CacheManager residue — see dedup).
    # In small-graph mode, coalesce first: every depth's join launches one
    # task per edge partition, and 8 beats the session's full
    # shuffle-partition count for a KB-sized edge list. The dense-graph
    # escape hatch (broadcast_frontier=False) keeps the edge table's
    # native parallelism — a hardcoded coalesce would cap every depth at
    # 8 tasks on exactly the graphs that need the cluster.
    if broadcast_frontier:
        oriented = oriented.coalesce(8)
    # lazy: the driver_max_edges count below scans the whole edge list,
    # so it doubles as the pin's materializing action (one driver job)
    oriented = oriented.localCheckpoint(eager=False)

    spark = lineage.sparkSession
    if oriented.count() <= driver_max_edges:
        adj: dict[str, list[str]] = {}
        for row in oriented.collect():
            adj.setdefault(row["node"], []).append(row["next"])
        frontier: set[tuple] = {(start_node, 0, (start_node,))}
        rows: list[tuple] = []
        overflow = False
        for depth in range(1, max_depth + 1):
            nxt: set[tuple] = set()
            for node, _d, path in frontier:
                for nb in adj.get(node, ()):
                    if nb not in path:  # cycle guard
                        nxt.add((nb, depth, path + (nb,)))
            if not nxt:
                break
            rows.extend(nxt)
            if len(rows) > driver_max_rows:
                overflow = True  # dense enumeration → distributed loop
                break
            frontier = nxt
        if not overflow:
            return spark.createDataFrame(
                [(n, d, list(p)) for n, d, p in rows],
                "node string, depth int, path array<string>",
            )

    base = spark.createDataFrame(
        [(start_node, 0, [start_node])], "node string, depth int, path array<string>"
    )

    def step(frontier: DataFrame, depth: int) -> DataFrame:
        if broadcast_frontier:
            frontier = F.broadcast(frontier)
        return (
            oriented.join(frontier, "node")
            .filter(~F.array_contains(F.col("path"), F.col("next")))  # cycle guard
            .select(
                F.col("next").alias("node"),
                F.lit(depth).alias("depth"),
                F.concat(F.col("path"), F.array(F.col("next"))).alias("path"),
            )
            .distinct()
        )

    out = iterate(base, step, max_depth)
    return out.filter(F.col("depth") > 0)


def upstream(lineage: DataFrame, node: str, max_depth: int = 5) -> DataFrame:
    return traverse(lineage, node, "upstream", max_depth)


def downstream(lineage: DataFrame, node: str, max_depth: int = 5) -> DataFrame:
    return traverse(lineage, node, "downstream", max_depth)


def flow_summary(lineage: DataFrame) -> DataFrame:
    """L9 — per source→target edge: transformation count, distinct
    transforms, latest update, record sum; bucketed by medallion stage
    (``data_lineage.py:586-655``)."""
    stage = (
        F.when(
            F.col("source_schema").contains("bronze")
            & F.col("target_schema").contains("silver"),
            "bronze→silver",
        )
        .when(
            F.col("source_schema").contains("silver")
            & F.col("target_schema").contains("gold"),
            "silver→gold",
        )
        .when(F.col("target_schema").contains("bronze"), "source→bronze")
        .otherwise("other")
    )
    return (
        lineage.groupBy("source_schema", "source_table", "target_schema", "target_table")
        .agg(
            F.count(F.lit(1)).alias("transformation_count"),
            F.count_distinct("transformation_logic").alias("unique_transformations"),
            F.max("created_timestamp").alias("latest_update"),
            F.sum("record_count").alias("total_records"),
        )
        .withColumn("flow_stage", stage)
    )


def impact_analysis(lineage: DataFrame, node: str, max_depth: int = 5) -> dict:
    """L10 — downstream blast radius: severity LOW/MEDIUM/HIGH at >2/>5
    downstream tables (``data_lineage.py:694-698``), critical paths that
    reach gold, recommendations."""
    down = downstream(lineage, node, max_depth).cache()
    affected = [r.node for r in down.select("node").distinct().collect()]
    n = len(affected)
    severity = "HIGH" if n > 5 else "MEDIUM" if n > 2 else "LOW"
    critical = [
        r.path
        for r in down.filter(F.col("node").contains("gold")).select("path").collect()
    ]
    recommendations = []
    if n:
        recommendations.append(
            f"validate {n} downstream table(s) before altering {node}"
        )
    if critical:
        recommendations.append(
            f"{len(critical)} path(s) reach the gold layer — coordinate with consumers"
        )
    down.unpersist()
    return {
        "node": node,
        "downstream_count": n,
        "severity": severity,
        "affected_tables": sorted(affected),
        "critical_paths": critical,
        "recommendations": recommendations,
    }
