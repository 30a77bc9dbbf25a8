"""Per-query profiling harness (optimization guide §1: measure first).

For each requested query key this runs the query through the same noop-sink
methodology as ``bench.py`` but additionally records, via the status
tracker and a per-query job group:

- wall seconds (noop sink, context purged between queries like the bench)
- number of Spark jobs the query submitted (driver fixed cost ~ #jobs)
- number of stages and tasks (scheduling overhead ~ #tasks)
- ``explain("formatted")`` of the returned DataFrame, written to
  ``plans/$SPARK_GRAFT_PLANS_ROUND/<key>_<tag>.txt`` (default r12) when ``--plans <tag>`` is given

Usage:
    python tools/profile_queries.py [--plans before] [key ...]
Defaults to the 25 slowest keys of bench_result.json when no keys given.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_data_warehouse_analytics_project_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _purge(spark) -> None:
    gc.collect()
    try:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    except Exception:  # noqa: BLE001
        pass
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001
        pass


def main() -> None:
    args = sys.argv[1:]
    plans_tag = None
    if "--plans" in args:
        i = args.index("--plans")
        plans_tag = args[i + 1]
        args = args[:i] + args[i + 2:]
    reps = 1
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2:]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = entrymod.queries()
    if args:
        keys = args
    else:
        with open(os.path.join(REPO, "bench_result.json")) as fh:
            prior = json.load(fh)["queries"]
        keys = [k for k, _ in sorted(prior.items(), key=lambda kv: -kv[1])[:25]]

    spark = get_spark("profile")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out = {}
    plans_dir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12")
    )
    os.makedirs(plans_dir, exist_ok=True)

    for key in keys:
        fn = qs[key]
        best = None
        for r in range(reps):
            _purge(spark)
            group = f"prof_{key}_{r}"
            sc.setJobGroup(group, key)
            t0 = time.time()
            df = fn(spark, sf_dir)
            t_build = time.time() - t0
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            sc.setJobGroup("prof_idle", "idle")
            job_ids = tracker.getJobIdsForGroup(group)
            nstages = ntasks = 0
            for jid in job_ids:
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is not None:
                        nstages += 1
                        ntasks += si.numTasks
            rec = {
                "wall": round(wall, 3),
                "build": round(t_build, 3),
                "jobs": len(job_ids),
                "stages": nstages,
                "tasks": ntasks,
            }
            if best is None or rec["wall"] < best["wall"]:
                best = rec
        out[key] = best
        if plans_tag:
            try:
                txt = fn(spark, sf_dir)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
                with open(
                    os.path.join(plans_dir, f"{key}_{plans_tag}.txt"), "w"
                ) as fh:
                    fh.write(txt)
            except Exception as exc:  # noqa: BLE001
                print(f"plan capture failed for {key}: {exc}", file=sys.stderr)
        print(json.dumps({key: best}), flush=True)

    print("TOTAL", round(sum(v["wall"] for v in out.values()), 2),
          "jobs", sum(v["jobs"] for v in out.values()),
          "tasks", sum(v["tasks"] for v in out.values()))
    with open("/tmp/profile_out.json", "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
