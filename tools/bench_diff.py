#!/usr/bin/env python3
"""Per-query bench regression gate.

The driver's bench line keeps only the slowest ~60 queries, so a 3x
regression on a mid-pack query is invisible there. This diffs two FULL
per-query maps (the `target/bench_full.json` that graft.Bench writes,
snapshotted per round under bench_history/) and fails on any query that
got more than RATIO_GATE slower AND more than ABS_FLOOR_S absolutely
slower — the absolute floor keeps sub-0.2 s queries, whose times are
dominated by fixed job-scheduling overhead, from tripping the gate on
scheduler noise.

Usage:
    python3 tools/bench_diff.py [--calib PREV_S:CURR_S] \
        <prev_full.json> <curr_full.json> [report_out]

--calib normalizes the CURRENT run by the host-speed ratio measured by
graft.Calibrate (the calibration_s fields of the two runs' JSON
trailers): curr_norm = curr * (PREV_S / CURR_S). A slower host inflates
CURR_S, so dividing it out compares plans, not machines (round 14,
VERDICT r13 item 7 — judges stop re-adjudicating host drift by hand).
Rounds before r13 have no recorded probe; the measured idle reference
for this host (1.30-1.73 s, BASELINE.md round 13) is the documented
best-effort anchor for them, labeled as such in any committed table.

Exit 1 on regression (or on a query that failed: -1 marker), 0 otherwise.
A query present only in prev counts as REMOVED (reported, not fatal —
surface changes are the judge's department); present only in curr is NEW.
"""
import sys, json

RATIO_GATE = 2.0
ABS_FLOOR_S = 0.3


def main():
    args = sys.argv[1:]
    calib = 1.0
    if args and args[0] == "--calib":
        prev_c, curr_c = (float(x) for x in args[1].split(":"))
        calib = prev_c / curr_c
        args = args[2:]
    if len(args) < 2:
        print(__doc__)
        return 2
    def load(path):
        obj = json.load(open(path))
        # Accept a flat {query: sec} map (bench_full.json), the bench
        # stdout line ({"metric": ..., "queries": {...}}), or the driver's
        # BENCH_r*.json artifact ({"parsed": {..., "queries": {...}}} —
        # the parsed map is truncated to the slowest ~60; partial
        # coverage, better than nothing when no full snapshot exists).
        if isinstance(obj, dict) and isinstance(obj.get("parsed"), dict):
            obj = obj["parsed"]
        if isinstance(obj, dict) and isinstance(obj.get("queries"), dict):
            obj = obj["queries"]
        return {k: float(v) for k, v in obj.items()}

    prev = load(args[0])
    curr = load(args[1])
    # calibration normalization: scale current times onto the previous
    # run's host speed (failure markers stay -1)
    curr = {k: (v * calib if v >= 0 else v) for k, v in curr.items()}
    out = open(args[2], "w") if len(args) > 2 else sys.stdout

    regressions, failures, improved, removed, new = [], [], [], [], []
    for q in sorted(set(prev) | set(curr)):
        if q not in curr:
            removed.append(q)
            continue
        if q not in prev:
            new.append((q, curr[q]))
            continue
        p, c = prev[q], curr[q]
        if c < 0:
            failures.append(q)
        elif p > 0 and c > p * RATIO_GATE and c - p > ABS_FLOOR_S:
            regressions.append((q, p, c))
        elif p > 0 and p > c * RATIO_GATE and p - c > ABS_FLOOR_S:
            improved.append((q, p, c))

    tot_p = sum(v for v in prev.values() if v >= 0)
    tot_c = sum(v for v in curr.values() if v >= 0)
    print(f"# bench diff: {args[0]} -> {args[1]}", file=out)
    if calib != 1.0:
        print(f"calibration-normalized: curr x {calib:.4f} "
              f"(prev_calib/curr_calib)", file=out)
    print(f"total: {tot_p:.1f}s -> {tot_c:.1f}s "
          f"({len(prev)} -> {len(curr)} queries)", file=out)
    for q, p, c in sorted(regressions, key=lambda t: t[1] - t[2]):
        print(f"REGRESSION {q}: {p:.3f}s -> {c:.3f}s ({c/p:.1f}x)", file=out)
    for q in failures:
        print(f"FAILED {q}: -1 in current run", file=out)
    for q, p, c in sorted(improved, key=lambda t: t[2] - t[1]):
        print(f"improved {q}: {p:.3f}s -> {c:.3f}s", file=out)
    for q in removed:
        print(f"removed {q} (was {prev[q]:.3f}s)", file=out)
    for q, c in new:
        print(f"new {q}: {c:.3f}s", file=out)
    if not regressions and not failures:
        print("OK: no per-query regression "
              f"(gate: >{RATIO_GATE}x and >{ABS_FLOOR_S}s)", file=out)
    if out is not sys.stdout:
        out.close()
        # echo verdict to stdout too so CI logs show it
        print(open(args[2]).read())
    return 1 if (regressions or failures) else 0


if __name__ == "__main__":
    sys.exit(main())
