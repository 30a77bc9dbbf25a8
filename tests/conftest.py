from __future__ import annotations

import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

import pytest

sys.path.insert(0, "/root/repo")

from sql_data_warehouse_analytics_project_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"

#: Shard-worker marker env var. Set in workers so they run the normal
#: sequential loop (and never re-shard recursively).
_SHARD_ENV = "_SPARK_GRAFT_TEST_SHARD"
#: Per-worker warehouse dir (managed-table writes must not collide).
_WAREHOUSE_ENV = "_SPARK_GRAFT_TEST_WAREHOUSE"
#: Worker-side per-test outcome log (tab-separated: outcome, nodeid).
_RESULTS_ENV = "_SPARK_GRAFT_TEST_RESULTS"


def pytest_runtest_logreport(report):
    """In shard WORKERS, append each test's final outcome to the results
    file the parent reads back — the parent replays them as TestReports
    so the top-level run prints the true '[N] passed' summary (and exits
    nonzero on failures) exactly like a sequential run."""
    path = os.environ.get(_RESULTS_ENV)
    if not path:
        return
    final = (
        report.when == "call"
        or (report.when in ("setup", "teardown") and report.outcome != "passed")
    )
    if not final:
        return
    with open(path, "a", encoding="utf-8") as fh:
        fh.write(f"{report.outcome}\t{report.when}\t{report.nodeid}\n")


@pytest.fixture(scope="session")
def spark():
    # A crashed previous run can leave managed-table directories behind while
    # the (in-memory) metastore forgets them, making saveAsTable fail with
    # LOCATION_ALREADY_EXISTS. The warehouse dir is pure test scratch — start
    # each session from a clean slate before the JVM pins it.
    warehouse = os.environ.get(_WAREHOUSE_ENV, "/root/repo/spark-warehouse")
    shutil.rmtree(Path(warehouse), ignore_errors=True)
    s = get_spark(
        "tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


# ---------------------------------------------------------------------------
# Sharded execution (round-12, verdict item 1: the 315-test suite at
# 43–48 min outran the driver's verify window — `tests_ok: false`).
#
# pytest-xdist is not installable here (no network), so the conftest
# shards the collected items itself: the top-level `pytest tests/ -x -q`
# process collects as usual, then — instead of running — splits the item
# ids round-robin (sorted by module, so every worker gets a proportional
# slice of the heavy modules) across N subprocess workers, each a plain
# `pytest <ids> -q` with its own SparkSession, its own warehouse dir,
# and a fair share of the cores. Workers inherit this same conftest but
# run the normal loop (the _SPARK_GRAFT_TEST_SHARD guard). Safety:
# tests already isolate state per test (unique catalog prefixes,
# tmp_path); the only cross-process hazards — the shared warehouse dir
# and core oversubscription — are handled via _SPARK_GRAFT_TEST_WAREHOUSE
# and SPARK_GRAFT_CPUS derating.
#
# SPARK_GRAFT_TEST_SHARDS=1 disables sharding (plain sequential run);
# any orchestration error falls back to the sequential loop rather than
# failing the suite.
# ---------------------------------------------------------------------------


def _shard_count() -> int:
    env = os.environ.get("SPARK_GRAFT_TEST_SHARDS")
    if env is not None:
        try:
            return max(1, int(env))
        except ValueError:
            return 1
    cpus = os.cpu_count() or 8
    return max(1, min(6, cpus // 5))


def pytest_runtestloop(session):
    if os.environ.get(_SHARD_ENV) is not None:
        return None  # worker: normal sequential loop
    if session.config.option.collectonly:
        return None
    n = _shard_count()
    if n <= 1 or len(session.items) < 2 * n:
        return None
    try:
        return _run_sharded(session, n)
    except Exception as exc:  # noqa: BLE001 — orchestration must not
        # lose the suite; fall back to the plain sequential loop
        sys.stderr.write(f"\n[shard] orchestration failed ({exc}); "
                         "running sequentially\n")
        return None


#: Modules whose tests may run in DIFFERENT workers: verified to have
#: no module-scoped fixture that accumulates cross-test state (test_llm's
#: module fixtures are read-only parquet frames; the other four have
#: none). Everything else ships as one unit to one worker — e.g.
#: test_ops's `ctx` fixture logs errors that later tests in the module
#: assert on, so splitting it would manufacture failures.
_SPLIT_OK = {
    "tests/test_entry.py",
    "tests/test_incremental.py",
    "tests/test_llm.py",
    "tests/test_properties.py",
    "tests/test_streaming.py",
}

#: Approximate per-module wall seconds (round-12 baseline `--durations`
#: profile of the full sequential run) — bin-packing weights, not
#: assertions; unknown modules default small.
_MODULE_WEIGHTS = {
    "tests/test_streaming.py": 731,
    "tests/test_entry.py": 624,
    "tests/test_incremental.py": 322,
    "tests/test_llm.py": 309,
    "tests/test_ops.py": 242,
    "tests/test_medallion.py": 180,
    "tests/test_properties.py": 144,
    "tests/test_operators.py": 76,
    "tests/test_sources.py": 56,
    "tests/test_dml.py": 32,
    "tests/test_cli.py": 25,
    "tests/test_plans.py": 21,
    "tests/test_local_oracles.py": 16,
    "tests/test_edges.py": 12,
}


def _run_sharded(session, n: int) -> bool:
    t0 = time.time()
    # Work units: (weight, [nodeids]) — whole modules by default,
    # per-item for the _SPLIT_OK modules; greedy heaviest-first onto the
    # least-loaded worker. Items keep collection order within a worker.
    by_module: dict[str, list] = {}
    for it in session.items:
        by_module.setdefault(it.nodeid.split("::", 1)[0], []).append(it)
    units: list[tuple[float, list[str]]] = []
    for mod, its in by_module.items():
        w = float(_MODULE_WEIGHTS.get(mod, 10))
        if mod in _SPLIT_OK:
            units.extend((w / len(its), [it.nodeid]) for it in its)
        else:
            units.append((w, [it.nodeid for it in its]))
    units.sort(key=lambda u: -u[0])
    loads = [0.0] * n
    order: list[list[tuple[int, str]]] = [[] for _ in range(n)]
    pos = {it.nodeid: j for j, it in enumerate(session.items)}
    for w, ids in units:
        k = loads.index(min(loads))
        loads[k] += w
        order[k].extend((pos[i], i) for i in ids)
    shards = [
        [nid for _, nid in sorted(bucket)] for bucket in order if bucket
    ]
    items = session.items

    cpus = os.cpu_count() or 8
    per_worker_cpus = str(max(3, cpus // len(shards)))
    # -x/--exitfirst is stored as maxfail=1; honor any maxfail as
    # stop-early (workers get -x, peers are terminated on first failure)
    exitfirst = bool(session.config.getoption("maxfail", 0))

    out_dir = Path(f"/tmp/spark_graft_test_shards_{os.getpid()}")
    out_dir.mkdir(parents=True, exist_ok=True)
    procs = []
    for i, ids in enumerate(shards):
        env = dict(
            os.environ,
            **{
                _SHARD_ENV: str(i),
                _WAREHOUSE_ENV: f"/tmp/spark_graft_test_wh_{os.getpid()}_{i}",
                _RESULTS_ENV: str(out_dir / f"shard_{i}.results"),
                "SPARK_GRAFT_CPUS": per_worker_cpus,
                "SPARK_DRIVER_MEMORY": os.environ.get(
                    "SPARK_DRIVER_MEMORY", "12g"
                ),
            },
        )
        cmd = [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider"]
        if exitfirst:
            cmd.append("-x")
        cmd += ids
        # stdout goes to a FILE, not a pipe: a worker dumping large
        # tracebacks into a full pipe buffer would block forever with
        # nobody reading until exit
        log = open(out_dir / f"shard_{i}.out", "w+", encoding="utf-8")
        procs.append(
            (
                i,
                subprocess.Popen(
                    cmd,
                    cwd="/root/repo",
                    env=env,
                    stdout=log,
                    stderr=subprocess.STDOUT,
                    text=True,
                ),
                log,
            )
        )

    outputs: dict[int, str] = {}
    rcs: dict[int, int] = {}
    failed_early = False
    pending = {i: (p, log) for i, p, log in procs}
    while pending:
        for i, (p, log) in list(pending.items()):
            rc = p.poll()
            if rc is None:
                continue
            log.flush()
            log.seek(0)
            outputs[i] = log.read()
            log.close()
            rcs[i] = rc
            del pending[i]
            sys.stderr.write(f"[shard {i}] done rc={rc} "
                             f"({time.time() - t0:.0f}s)\n")
            if rc not in (0, 1) or (rc != 0 and exitfirst):
                failed_early = True
        if failed_early and pending:
            for p, _log in pending.values():
                p.terminate()
            for i, (p, log) in pending.items():
                try:
                    p.wait(timeout=30)
                except subprocess.TimeoutExpired:
                    p.kill()
                    p.wait(timeout=30)
                log.flush()
                log.seek(0)
                outputs[i] = log.read()
                log.close()
                rcs[i] = p.returncode if p.returncode is not None else -1
            pending.clear()
        time.sleep(0.5)

    # Replay each worker's per-test outcomes as real TestReports: the
    # standard terminal reporter then prints the true combined summary
    # ("N passed, M skipped in ...s") as the final line, Session counts
    # testsfailed itself, and the exit status falls out exactly as in a
    # sequential run.
    from _pytest.reports import TestReport

    tw = session.config.get_terminal_writer()
    seen = 0
    for i in sorted(outputs):
        res_path = out_dir / f"shard_{i}.results"
        lines = []
        if res_path.exists():
            lines = res_path.read_text(encoding="utf-8").splitlines()
        for line in lines:
            outcome, when, nodeid = line.split("\t", 2)
            seen += 1
            longrepr = None
            if outcome == "skipped":
                longrepr = (nodeid.split("::")[0], 0, "skipped (in shard)")
            elif outcome == "failed":
                longrepr = f"failed in shard {i} — full output above"
            rep = TestReport(
                nodeid=nodeid,
                location=(nodeid.split("::")[0], None, nodeid),
                keywords={},
                outcome=outcome,
                longrepr=longrepr,
                when=when,
                sections=[],
                duration=0.0,
                start=0.0,
                stop=0.0,
            )
            session.ihook.pytest_runtest_logreport(report=rep)
        if rcs[i] != 0:
            tw.line(f"\n===== shard {i} output (rc={rcs[i]}) =====")
            tw.write(outputs[i])
    # a worker that died without reporting all its tests (crash, rc>1)
    # must fail the run even if every written outcome passed
    bad_rc = any(rc not in (0, 1) for rc in rcs.values())
    if (seen < len(items) and not exitfirst) or bad_rc:
        session.testsfailed += 1
        tw.line(
            f"\n[shards] INCOMPLETE: {seen}/{len(items)} outcomes "
            f"reported, worker rcs={rcs}"
        )
    tw.line(f"\n[shards: {len(shards)}] wall {time.time() - t0:.1f}s")
    return True
