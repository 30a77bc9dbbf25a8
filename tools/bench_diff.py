"""Calibration-normalized diff of two bench artifacts.

Every round the judge (and NOTES_r*) compares per-query times across
rounds by hand, dividing each side by its own ``cpu_calibration_sec`` to
cancel box-speed drift — this round's artifacts record per-pass
calibrations precisely so that comparison is honest. This tool automates
it: common queries are compared on ``best_normalized`` when present
(per-pass-calibrated best-of, the most drift-resistant number) else on
``best / cpu_calibration_sec``.

Usage: python tools/bench_diff.py OLD.json NEW.json [--top N] [--pct P]
       python tools/bench_diff.py OLD.json NEW.json --markdown

Prints the total normalized delta over common queries, queries only in
one artifact, and the top-N improvements/regressions beyond ±P%
(default 15% — below that is calibration noise per NOTES_r4/r5).
``--markdown`` instead emits the COMPLETE per-query delta table as
GitHub markdown, ready to paste into NOTES_r{N} (round-6 verdict #3:
the next verdict's regression section should be a one-command diff).
"""

from __future__ import annotations

import argparse
import json


def _unwrap(doc: dict) -> dict:
    # the driver's BENCH_r{N}.json wraps the bench line under "parsed"
    if "queries" not in doc and isinstance(doc.get("parsed"), (dict, str)):
        p = doc["parsed"]
        return json.loads(p) if isinstance(p, str) else p
    return doc


def _normalized(doc: dict) -> dict[str, float]:
    qn = doc.get("queries_normalized")
    if isinstance(qn, dict) and qn:
        return dict(qn)
    # match bench.py's convention exactly (raw * 0.40 / calib) so a
    # fallback side is comparable with a queries_normalized side
    calib = doc.get("cpu_calibration_sec") or 0.40
    return {k: v * (0.40 / calib) for k, v in doc.get("queries", {}).items()}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--pct", type=float, default=15.0,
                    help="noise band: hide |delta| below this percent")
    ap.add_argument("--markdown", action="store_true",
                    help="emit the complete per-query delta table as markdown")
    args = ap.parse_args()

    with open(args.old) as fh:
        old = _unwrap(json.load(fh))
    with open(args.new) as fh:
        new = _unwrap(json.load(fh))

    o, n = _normalized(old), _normalized(new)
    common = sorted(set(o) & set(n))
    only_old, only_new = sorted(set(o) - set(n)), sorted(set(n) - set(o))

    # Bronze-ingest control (round-6 verdict #5): the bronze loader code
    # has been untouched since round 1, so its throughput ratio is a
    # multi-core box-speed proxy that the single-thread calibration can't
    # see (neighbor contention). ratio < 1 means the NEW run's box window
    # was slower (its runtimes inflated by ~1/ratio); multiplying the new
    # total by the ratio control-corrects it back to the old box speed.
    bo = old.get("bronze_rows_per_second")
    bn = new.get("bronze_rows_per_second")
    control = (bn / bo) if (bo and bn) else None

    if args.markdown:
        to, tn = sum(o[k] for k in common), sum(n[k] for k in common)
        print(f"| query | old (norm s) | new (norm s) | delta |")
        print("|---|---|---|---|")
        for k in common:
            d = f"{(n[k] - o[k]) / o[k] * 100.0:+.0f}%" if o[k] else "n/a"
            print(f"| {k} | {o[k]:.2f} | {n[k]:.2f} | {d} |")
        for k in only_new:
            print(f"| {k} | — | {n[k]:.2f} | new |")
        for k in only_old:
            print(f"| {k} | {o[k]:.2f} | — | removed |")
        pct = f" ({(tn - to) / to * 100.0:+.1f}%)" if to else ""
        print(f"| **total (common)** | **{to:.1f}** | **{tn:.1f}** |"
              f" **{pct.strip() or '—'}** |")
        if control:
            corrected = tn * control
            cpct = f"{(corrected - to) / to * 100.0:+.1f}%" if to else "—"
            print(f"| **bronze control (rows/s)** | **{bo:.0f}** |"
                  f" **{bn:.0f}** | **ratio {control:.2f}** |")
            print(f"| **total, control-corrected** | **{to:.1f}** |"
                  f" **{corrected:.1f}** | **{cpct}** |")
        return 0

    to, tn = sum(o[k] for k in common), sum(n[k] for k in common)
    print(f"common queries: {len(common)}")
    pct_total = f"  ({(tn - to) / to * 100.0:+.1f}%)" if to else ""
    print(f"normalized total  old={to:.1f}  new={tn:.1f}{pct_total}")
    print(f"calibration       old={old.get('cpu_calibration_sec')}  "
          f"new={new.get('cpu_calibration_sec')}")
    if control:
        corrected = tn * control
        cpct = f"  ({(corrected - to) / to * 100.0:+.1f}%)" if to else ""
        print(f"bronze control    old={bo:.0f}  new={bn:.0f} rows/s  "
              f"ratio={control:.2f} (multi-core box proxy; loader untouched)")
        print(f"control-corrected new total = {corrected:.1f}{cpct}")
    if only_old:
        print(f"only in old ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"only in new ({len(only_new)}): {', '.join(only_new)}")

    deltas = sorted(
        ((n[k] - o[k]) / o[k] * 100.0, k) for k in common if o[k] > 0
    )
    regress = [(p, k) for p, k in reversed(deltas) if p >= args.pct]
    improve = [(p, k) for p, k in deltas if p <= -args.pct]
    print(f"\nregressions beyond +{args.pct:.0f}% (top {args.top}):")
    for p, k in regress[: args.top]:
        print(f"  {k:40s} {o[k]:7.2f} -> {n[k]:7.2f}  ({p:+.0f}%)")
    if not regress:
        print("  none")
    print(f"\nimprovements beyond -{args.pct:.0f}% (top {args.top}):")
    for p, k in improve[: args.top]:
        print(f"  {k:40s} {o[k]:7.2f} -> {n[k]:7.2f}  ({p:+.0f}%)")
    if not improve:
        print("  none")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
