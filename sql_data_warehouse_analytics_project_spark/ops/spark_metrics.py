"""Executor-level telemetry from Spark's own status store (SURVEY §4:
"re-point the reference's psutil-based perf telemetry at Spark metrics
— task time, shuffle bytes — via the status/listener infrastructure";
reference anchor: ``logs/performance_monitor.py:184-334``, whose
MetricsCollector samples driver-process psutil numbers that say nothing
about where a distributed job actually spent its time).

Spark's ``AppStatusStore`` (the store behind the UI and the REST API —
fed by the always-on ``AppStatusListener``, so reading it costs nothing
extra) keeps per-stage totals of exactly the quantities that
distinguish a shuffle-bound stage from a slow one: shuffle read/write
bytes, executor task time, and spill. This module snapshots the stage
counter before a materialization and aggregates the stages that ran
after it — giving ``RunContext`` auto-capture per-write executor
metrics with zero caller involvement and zero extra jobs.

Attribution contract: stages are attributed by WHEN they ran (stage id
> the pre-write snapshot), which is exact for the engine's serialized
write paths and best-effort when other jobs interleave on the same
SparkContext (parallel bronze loader threads) — the same caveat every
wall-clock-window profiler carries. Extraction failures degrade to
``None``; telemetry must never break a write.
"""

from __future__ import annotations

#: StageData accessor -> (metric suffix, unit, scale) for the totals a
#: bottleneck analysis needs; executorRunTime is milliseconds in the store
_STAGE_FIELDS = (
    ("shuffleWriteBytes", "shuffle_write_bytes", "bytes", 1.0),
    ("shuffleReadBytes", "shuffle_read_bytes", "bytes", 1.0),
    ("executorRunTime", "task_time", "seconds", 1e-3),
    ("memoryBytesSpilled", "spill_memory_bytes", "bytes", 1.0),
    ("diskBytesSpilled", "spill_disk_bytes", "bytes", 1.0),
)


def _stage_iter(spark):
    """Iterate the JVM ``v1.StageData`` rows of every stage attempt the
    status store retains (bounded by ``spark.ui.retainedStages``; recent
    stages — the ones a just-finished write cares about — are always
    present). Raises on any py4j surprise; callers wrap."""
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    gw = sc._gateway
    jvm = sc._jvm
    # stageList(statuses, details, withSummaries, unsortedQuantiles, taskStatus)
    # — empty statuses list = all stages; no task details / summaries
    stages = store.stageList(
        jvm.java.util.ArrayList(),
        False,
        False,
        gw.new_array(jvm.double, 0),
        jvm.java.util.ArrayList(),
    )
    it = stages.iterator()
    while it.hasNext():
        yield it.next()


def latest_stage_id(spark) -> int:
    """The highest stage id submitted so far (-1 before any job) — the
    snapshot to take BEFORE a write; returns -1 on extraction failure so
    a broken snapshot over-attributes rather than raises."""
    try:
        return max((s.stageId() for s in _stage_iter(spark)), default=-1)
    except Exception:  # noqa: BLE001 — telemetry is best-effort
        return -1


def stage_metrics_since(spark, after_stage_id: int) -> "dict[str, float] | None":
    """Aggregate executor metrics over every COMPLETE stage with
    ``stageId > after_stage_id`` — the stages the bracketed action ran.

    Returns ``{suffix: value}`` per ``_STAGE_FIELDS`` plus ``n_stages``,
    in final units (seconds for task time, bytes for the rest), or
    ``None`` when extraction fails or no stage ran (a metadata-only
    write) — callers record nothing rather than zeros that would skew
    per-metric percentiles."""
    try:
        totals = {suffix: 0.0 for _, suffix, _, _ in _STAGE_FIELDS}
        n = 0
        for s in _stage_iter(spark):
            if s.stageId() <= after_stage_id:
                continue
            if str(s.status()) != "COMPLETE":
                continue  # SKIPPED reused an earlier stage's output; ACTIVE isn't ours
            n += 1
            for accessor, suffix, _unit, scale in _STAGE_FIELDS:
                totals[suffix] += float(getattr(s, accessor)()) * scale
        if n == 0:
            return None
        totals["n_stages"] = float(n)
        return totals
    except Exception:  # noqa: BLE001 — telemetry is best-effort
        return None


def metric_unit(suffix: str) -> str:
    """The recording unit for a :func:`stage_metrics_since` key."""
    for _, s, unit, _ in _STAGE_FIELDS:
        if s == suffix:
            return unit
    return "count"
