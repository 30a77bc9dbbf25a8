"""Automatic lineage capture from executed plans (SURVEY §4's
strictly-better-than-reference move; reference contract is the MANUAL
``log_data_movement`` call, ``logs/data_lineage.py:179-307``).

The reference relies on every ETL author remembering to record lineage;
forget one call and the graph silently loses an edge. On Spark the
DataFrame being materialized *carries* its provenance: the analyzed
logical plan's leaves are exactly the relations the write read. This
module extracts them, and :class:`~..catalog.Catalog` + ``RunContext``
use it to emit ``logs.data_lineage`` edges and ``performance_metrics``
rows per materialization with ZERO caller involvement — enable once via
``RunContext.enable_auto_capture()``.

Cost discipline: source extraction is a driver-side walk of plan
metadata (no job, no file listing — ``df.inputFiles()`` would list every
file of a 100 TB table); the row count rides the write job itself via
``df.observe`` (zero extra jobs, unlike the medallion builds' explicit
post-write ``count()``); timing is a wall clock around the write.
Capture must never break a write, so extraction failures degrade to "no
edges", not an exception.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: schema recorded for path-based (non-catalog) relations, e.g. the raw
#: CSV/parquet files a bronze load scans
EXTERNAL_SCHEMA = "external"


def _logical_table(name: str) -> str:
    """Strip the ``__gNNNNNN`` generation suffix (the catalog's atomic
    view-pointer protocol): lineage nodes must be the stable LOGICAL
    table, not the physical generation a particular publish used — the
    graph would otherwise fragment across republishes."""
    from sql_data_warehouse_analytics_project_spark.catalog import GEN_RE

    m = GEN_RE.match(name)
    return m.group("base") if m else name


def _ident_from_option(opt) -> tuple[str, str] | None:
    """(db, table) from a py4j Option[CatalogTable]-ish identifier."""
    if not opt.isDefined():
        return None
    ident = opt.get().identifier()
    db = ident.database()
    return (db.get() if db.isDefined() else "", _logical_table(ident.table()))


def _strip_generations(segs: list[str]) -> list[str]:
    """Drop trailing ``_generations/gNNNNNN`` segments (the generation-
    manifest layout, ``sources/manifest.py``) so a physical generation
    directory reports the LOGICAL dataset it belongs to — lineage nodes
    must be stable across republishes (``postings``, not ``g000004``)."""
    import re

    while (
        len(segs) >= 2
        and segs[-2] == "_generations"
        and re.fullmatch(r"g\d+", segs[-1])
    ):
        segs = segs[:-2]
    return segs


def _path_leaf(path: str) -> str:
    """`file:/a/b/region.parquet` → `region` — the dataset name a human
    would use for the external source (mirrors bronze's manual calls,
    ``medallion/bronze.py:101``). Generation directories resolve to
    their dataset root first."""
    segs = _strip_generations([s for s in path.rstrip("/").split("/") if s])
    leaf = segs[-1] if segs else path.rstrip("/")
    return leaf.split(".")[0] if "." in leaf else leaf


def dataset_leaf(path: str) -> str:
    """Dataset name for a PATH-based WRITE target: the last path segment
    that is not a ``k=v`` partition directory or a generation dir —
    ``/x/index/postings/cp=a/batch_id=3`` → ``postings``, and so does
    ``/x/index/postings/_generations/g000002/cp=a/batch_id=3`` — so
    every slice of one partitioned dataset aggregates under one lineage
    node. (Reads resolve via ``rootPaths``, which is already the dataset
    root; writes of a single partition slice need the strip.)"""
    segs = [s for s in path.rstrip("/").split("/") if s]
    while segs and "=" in segs[-1]:
        segs.pop()
    segs = _strip_generations(segs)
    return _path_leaf(segs[-1]) if segs else path


def _seq(jseq) -> list:
    """Scala Seq → python list of py4j objects."""
    return [jseq.apply(i) for i in range(jseq.size())]


def _attr_ids(attrset) -> set[int]:
    """Scala AttributeSet → python set of exprId longs."""
    out: set[int] = set()
    it = attrset.iterator()
    while it.hasNext():
        out.add(it.next().exprId().id())
    return out


def _leaf_identity(node) -> tuple[str, str] | None:
    """(schema, table) identity of a leaf relation — the same naming
    rules :func:`plan_sources` uses (catalog tables by name, path
    relations as ``(external, <leaf>)``), shared by the column walk."""
    cls = node.getClass().getSimpleName()
    if cls == "LogicalRelation":
        pair = _ident_from_option(node.catalogTable())
        if pair is not None:
            return pair
        paths = node.relation().location().rootPaths()
        if paths.size():
            return (EXTERNAL_SCHEMA, _path_leaf(paths.apply(0).toString()))
        return None
    if cls == "HiveTableRelation":
        ident = node.tableMeta().identifier()
        db = ident.database()
        return (db.get() if db.isDefined() else "",
                _logical_table(ident.table()))
    if cls == "DataSourceV2Relation":
        ident = node.identifier()
        if ident.isDefined():
            v2 = ident.get()
            ns = v2.namespace()
            db = ns[-1] if len(ns) else ""
            return (str(db), _logical_table(str(v2.name())))
    return None


def plan_column_lineage(df: DataFrame) -> list[tuple[str, str, str, str]]:
    """COLUMN-level provenance of ``df``'s output: one
    ``(source_schema, source_table, source_column, target_column)``
    edge per (leaf column → output column) dependency — round-10
    verdict #6, upgrading auto-capture from table to column granularity
    (reference contract: the manual ``source_column``/``target_column``
    fields of ``logs/data_lineage.py:271-307``, which the reference
    relies on authors to fill by hand).

    The analyzed plan carries this for free in its expression tree:
    every derived column is an ``Alias`` whose references name the
    attribute ids it reads; renames/passthroughs keep their ids; Union
    remaps positionally; Generate (explode) maps generator outputs to
    the generator's inputs. The walk records those id→ids dependency
    edges, then resolves each output attribute transitively down to
    leaf-relation attributes (BFS over ids — driver-side plan metadata
    only, no job, no file listing). Multi-source derivations emit one
    edge per contributing source column; ``Expand``-style nodes that
    mint ids outside these rules simply contribute no edges. Returns
    ``[]`` on any extraction failure (capture is best-effort by
    contract)."""
    out: list[tuple[str, str, str, str]] = []
    try:
        plan = df._jdf.queryExecution().analyzed()
        leaf_attr: dict[int, tuple[str, str, str]] = {}
        for leaf in _seq(plan.collectLeaves()):
            ident = _leaf_identity(leaf)
            if ident is None:
                continue
            for a in _seq(leaf.output()):
                leaf_attr[a.exprId().id()] = (ident[0], ident[1], a.name())
        deps: dict[int, set[int]] = {}
        stack = [plan]
        while stack:
            node = stack.pop()
            stack.extend(_seq(node.children()))
            cls = node.getClass().getSimpleName()
            if cls == "Union":
                outs = _seq(node.output())
                for child in _seq(node.children()):
                    for o, c in zip(outs, _seq(child.output())):
                        deps.setdefault(o.exprId().id(), set()).add(
                            c.exprId().id()
                        )
            elif cls == "Generate":
                refs = _attr_ids(node.generator().references())
                for o in _seq(node.generatorOutput()):
                    deps.setdefault(o.exprId().id(), set()).update(refs)
            estack = _seq(node.expressions())
            while estack:
                e = estack.pop()
                estack.extend(_seq(e.children()))
                if e.getClass().getSimpleName() == "Alias":
                    deps.setdefault(e.exprId().id(), set()).update(
                        _attr_ids(e.references())
                    )
        seen: set[tuple[str, str, str, str]] = set()
        for o in _seq(plan.output()):
            target = o.name()
            frontier = [o.exprId().id()]
            visited: set[int] = set()
            while frontier:
                nid = frontier.pop()
                if nid in visited:
                    continue
                visited.add(nid)
                if nid in leaf_attr:
                    edge = (*leaf_attr[nid], target)
                    if edge not in seen:
                        seen.add(edge)
                        out.append(edge)
                frontier.extend(deps.get(nid, ()))
    except Exception:  # noqa: BLE001 — capture never breaks a write
        return []
    return out


def plan_sources(df: DataFrame) -> list[tuple[str, str]]:
    """The (schema, table) relations ``df``'s plan reads, in leaf order,
    deduplicated.

    Catalog tables (V1 ``LogicalRelation`` with a defined catalogTable,
    Hive relations, V2 relations with an identifier) report their real
    database + table name; path-based file relations report
    ``(EXTERNAL_SCHEMA, <path leaf>)``; in-memory ``LocalRelation`` /
    ``Range`` leaves are not data sources and are skipped. Walks plan
    METADATA only via the JVM plan tree — never lists files, never runs
    a job. Returns ``[]`` on any extraction failure (capture is
    best-effort by contract)."""
    out: list[tuple[str, str]] = []
    seen: set[tuple[str, str]] = set()

    def add(pair: tuple[str, str] | None) -> None:
        if pair is not None and pair not in seen:
            seen.add(pair)
            out.append(pair)

    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        for i in range(leaves.size()):
            node = leaves.apply(i)
            cls = node.getClass().getSimpleName()
            if cls == "LogicalRelation":
                pair = _ident_from_option(node.catalogTable())
                if pair is not None:
                    add(pair)
                    continue
                paths = node.relation().location().rootPaths()
                for j in range(paths.size()):
                    add((EXTERNAL_SCHEMA, _path_leaf(paths.apply(j).toString())))
            elif cls == "HiveTableRelation":
                ident = node.tableMeta().identifier()
                db = ident.database()
                add((db.get() if db.isDefined() else "",
                     _logical_table(ident.table())))
            elif cls == "DataSourceV2Relation":
                ident = node.identifier()
                if ident.isDefined():
                    v2 = ident.get()
                    ns = v2.namespace()
                    db = ns[-1] if len(ns) else ""
                    add((str(db), _logical_table(str(v2.name()))))
            # LocalRelation / OneRowRelation / Range / streaming sources:
            # not persisted data sources — skipped on purpose
    except Exception:  # noqa: BLE001 — capture never breaks a write
        return []
    return out
