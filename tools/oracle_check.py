"""Local mirror of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, then compares row count, column names, and
order-insensitive values (columns sorted by name, rows sorted, cells
normalized to strings). Exact match required — this is intentionally at
least as strict as any reasonable value-hash the driver computes.

Besides the stdout log (which interleaves with Spark's console chatter),
the per-key evidence is written to a PER-SCALE artifact at the repo root
— ``gate_result.sf0_01.json`` for ``/root/testdata/sf0.01`` and so on —
after EVERY key (atomic replace): machine-readable regardless of log
noise, still useful if the process is killed mid-run (``complete``
flips to true only at the end), and a run at one scale can never
clobber the evidence of a completed run at another (round-6 verdict
artifact-hygiene item). ``failures`` is always recomputed from the full
merged ``results`` map, so a subset re-run cannot mask a prior FAIL.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from sql_data_warehouse_analytics_project_spark.session import get_spark  # noqa: E402
from sql_data_warehouse_analytics_project_spark.sources.readers import TABLES  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def _norm_cell(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        return repr(v)  # shortest round-trip repr → bit-exact compare
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return sorted_cols, out


#: Keys whose floating-point cells may differ by summation ORDER between
#: engines with no rounding convention available to absorb it:
#: ``corr``'s covariance accumulation is order-dependent in the last
#: ulp, and q60 emits the raw double (changing the emitted value to a
#: rounded one would change the declared query's output — forbidden in
#: optimization rounds). Verified: the one observed divergence
#: (q60 at sf0.001) is EXACTLY one float ulp and reproduces on every
#: commit since the key landed (round-11 close-out). Everything else
#: still compares bit-exactly; a tolerant key's cells must agree within
#: ``_ULP_TOL`` ulps or the key FAILS as before.
_ULP_TOLERANT = {"q60_grouped_correlation"}
_ULP_TOL = 2


def _within_ulps(a: str, b: str, n: int = _ULP_TOL) -> bool:
    """True when two normalized cell strings are floats within n ulps."""
    if a == b:
        return True
    try:
        fa, fb = float(a), float(b)
    except ValueError:
        return False
    if math.isnan(fa) or math.isnan(fb):
        return False
    hi = max(abs(fa), abs(fb))
    return abs(fa - fb) <= n * math.ulp(hi)


def _rows_within_ulps(sr, dr) -> bool:
    return all(
        len(a) == len(b) and all(_within_ulps(x, y) for x, y in zip(a, b))
        for a, b in zip(sr, dr)
    )


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gate_path(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    return os.path.join(_REPO_ROOT, f"gate_result.{tag}.json")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    path = gate_path(sf_dir)

    def _write_gate(doc: dict) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(json.dumps(doc, indent=1) + "\n")
        os.replace(tmp, path)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # Gate-local twins for the xxhash64 production paths (qd09/qd10/qd11/
    # qd16): register the Spark-bit-exact xxh64 scalar/vector functions on
    # THIS connection and value-check keys the driver can only rows-check
    # (its DuckDB has no UDF registration hook, so these stay out of the
    # driver-facing oracle_sql()).
    from tools import local_oracles

    local_oracles.register(con)
    local = local_oracles.local_oracle_sql()

    spark = get_spark("oracle_check")
    qs = entrymod.queries()
    oracles = {**entrymod.oracle_sql(), **local}

    doc: dict = {
        "sf_dir": sf_dir,
        "complete": False,
        "failures": [],
        "results": {},
    }
    # Subset runs MERGE into an existing same-sf artifact instead of
    # truncating it: re-verifying two keys must not discard the other
    # 120 keys' evidence. Stale keys of a prior registry are dropped;
    # `complete` below means "every current registry key has a result".
    if only and os.path.exists(path):
        try:
            with open(path) as fh:
                prior = json.load(fh)
            if prior.get("sf_dir") == sf_dir:
                doc["results"] = {
                    k: v for k, v in prior.get("results", {}).items() if k in qs
                }
        except (OSError, ValueError):
            pass

    def _merged_failures() -> list[str]:
        # ALWAYS derived from the merged results map: a subset re-run
        # must surface a prior full run's FAILs, not hide them
        return sorted(
            k for k, v in doc["results"].items() if v.get("status") == "FAIL"
        )

    def record(name, status, rows, t0, detail=None):
        entry = {
            "status": status,
            "rows": rows,
            "seconds": round(time.time() - t0, 2),
        }
        if name in local:
            entry["oracle"] = "local-xxh64-twin"
        if detail:
            entry["detail"] = detail[:500]
        doc["results"][name] = entry
        doc["failures"] = _merged_failures()
        _write_gate(doc)

    failures = []  # this run's failures, for the console log
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            record(name, "FAIL", None, t0, f"spark error: {e}")
            continue
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows-only: {len(s_rows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            record(name, "SKIP", len(s_rows), t0)
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            record(name, "FAIL", len(s_rows), t0, f"duckdb error: {e}")
            continue

        sc, sr = _norm_rows(s_cols, s_rows)
        dc, dr = _norm_rows(d_cols, d_rows)
        status = "ok"
        if sc != dc:
            status = f"COLUMN MISMATCH spark={sc} duckdb={dc}"
        elif len(sr) != len(dr):
            status = f"ROWCOUNT MISMATCH spark={len(sr)} duckdb={len(dr)}"
        elif sr != dr:
            if name in _ULP_TOLERANT and _rows_within_ulps(sr, dr):
                status = "ok"  # documented corr summation-order tolerance
            else:
                diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
                status = f"VALUE MISMATCH first-diffs={diffs}"
        if status == "ok":
            print(f"PASS  {name} ({len(sr)} rows, {time.time()-t0:.1f}s)")
            record(name, "PASS", len(sr), t0)
        else:
            print(f"FAIL  {name}: {status}")
            failures.append(name)
            record(name, "FAIL", len(sr), t0, status)

    doc["complete"] = set(doc["results"]) >= set(qs)
    doc["failures"] = _merged_failures()
    _write_gate(doc)
    merged = doc["failures"]
    if only:
        print(f"\nthis run: {len(failures)} failures"
              + (f": {failures}" if failures else ""))
    print(f"{len(merged)} failures (merged artifact)"
          + (f": {merged}" if merged else ""))
    return 1 if merged else 0


if __name__ == "__main__":
    raise SystemExit(main())
