#!/usr/bin/env python3
"""Generate the calibration-normalized cross-round per-query table.

Round 15 (VERDICT r14 item 2): the round-14 table normalized on the
serial probe alone, which the builder's own three-bench evidence shows
is insufficient — totals swing +/-15% while serial calibration is flat,
because the host loses ALL-CORE throughput the single-thread probe
cannot see. This generator takes per-round (snapshot, serial, allcore)
triples and scales every round onto the NEWEST round's host speed on
BOTH axes:

    t_serial_norm  = t * (serial_newest  / serial_round)
    t_allcore_norm = t * (allcore_newest / allcore_round)

The point estimate is the geometric mean of the two normalizations;
the bracket half-width |serial_norm - allcore_norm| is the stated
residual — a cross-round ratio is only actionable when it exceeds the
bracket. Rounds with no all-core probe (r13 and earlier) fall back to
serial-only and are labeled; treat their brackets as unknown.

Usage:
    python3 tools/bench_norm.py out.md \
        r13:bench_history/bench_full_r13.json:1.212 \
        r14:bench_history/bench_full_r14.json:1.273:0.892 \
        r15:bench_history/bench_full_r15.json:1.047:1.485
(last triple = newest = normalization target; rows sorted by newest
normalized time, cut at 0.9s like the r14 table)
"""
import sys, json


def load(path):
    obj = json.load(open(path))
    if isinstance(obj, dict) and isinstance(obj.get("queries"), dict):
        obj = obj["queries"]
    return {k: float(v) for k, v in obj.items() if float(v) >= 0}


def main():
    out_path = sys.argv[1]
    rounds = []
    for spec in sys.argv[2:]:
        parts = spec.split(":")
        name, path, serial = parts[0], parts[1], float(parts[2])
        allc = float(parts[3]) if len(parts) > 3 else None
        rounds.append((name, load(path), serial, allc))
    newest = rounds[-1]
    ns, na = newest[2], newest[3]

    def norm(t, serial, allc):
        s = t * ns / serial
        if allc is None or na is None:
            return s, s, False
        a = t * na / allc
        return (s * a) ** 0.5, abs(s - a), True

    qs = sorted(newest[1], key=lambda q: -newest[1][q])
    lines = []
    lines.append("# Two-axis calibration-normalized cross-round table "
                 "(round 15, VERDICT r14 item 2)")
    lines.append("# Times scaled onto the %s host (serial %.3f / all-core %s)"
                 % (newest[0], ns, "%.3f" % na if na else "n/a"))
    lines.append("# Point = geomean(serial-norm, allcore-norm); +/- = the "
                 "two-axis bracket half-width.")
    lines.append("# A cross-round ratio is actionable only when it exceeds "
                 "the bracket. serial-only rounds labeled *.")
    lines.append("")
    hdr = "| query |"
    for name, _, s, a in rounds:
        hdr += " %s (%.3f%s) |" % (name, s,
            "/%.3f" % a if a is not None else "*")
    prev_name, new_name = rounds[-2][0], rounds[-1][0]
    hdr += " %s->%s ratio |" % (prev_name, new_name)
    lines.append(hdr)
    lines.append("|" + "---|" * (len(rounds) + 2))
    tot = {name: 0.0 for name, _, _, _ in rounds}
    for q in qs:
        if newest[1][q] < 0.9:
            continue
        row = "| %s |" % q
        vals = {}
        for name, m, s, a in rounds:
            if q in m:
                p, brk, two = norm(m[q], s, a)
                vals[name] = p
                row += " %.2f±%.2f |" % (p, brk / 2) if two else " %.2f* |" % p
            else:
                row += " - |"
        if prev_name in vals and new_name in vals and vals[prev_name] > 0:
            row += " %.2f |" % (vals[new_name] / vals[prev_name])
        else:
            row += " - |"
        lines.append(row)
    totline = "Normalized totals (all queries, geomean point): "
    for name, m, s, a in rounds:
        t = sum(norm(v, s, a)[0] for v in m.values())
        totline += "%s=%.1fs " % (name, t)
    lines.append("")
    lines.append(totline)
    open(out_path, "w").write("\n".join(lines) + "\n")
    print("\n".join(lines[:8]))
    print("... (%d rows) -> %s" % (len(lines), out_path))


if __name__ == "__main__":
    main()
