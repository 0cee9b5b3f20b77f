#!/usr/bin/env python3
"""Compare two full-surface headroom sweeps (headroom_full JSON maps of
query -> {src_s, scaled_s, ratio}).

Reports: median/p90/max ratio per file, the largest scaled_s movers in
both directions, growth factors (new scaled_s / old scaled_s — at equal
replica size this is the sweep-conditions delta, e.g. the r11
between-query eviction), and rows present in only one file.

Usage: python3 tools/headroom_compare.py <old.json> <new.json> [topN]
"""
import sys, json


def main():
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 15

    def stats(m):
        rs = sorted(v["ratio"] for v in m.values())
        n = len(rs)
        return n, rs[n // 2], rs[(n - 1) * 9 // 10], rs[-1]

    for name, m in (("old", old), ("new", new)):
        n, med, p90, mx = stats(m)
        print(f"{name}: n={n} median={med:.2f}x p90={p90:.2f}x max={mx:.2f}x")

    both = sorted(set(old) & set(new))
    moved = sorted(
        ((new[q]["scaled_s"] - old[q]["scaled_s"], q) for q in both))
    print("\nbiggest improvements (scaled_s):")
    for d, q in moved[:top]:
        print(f"  {q}: {old[q]['scaled_s']:.1f} -> {new[q]['scaled_s']:.1f} "
              f"({d:+.1f} s, ratio {old[q]['ratio']:.1f}x -> {new[q]['ratio']:.1f}x)")
    print("\nbiggest regressions (scaled_s):")
    for d, q in reversed(moved[-top:]):
        print(f"  {q}: {old[q]['scaled_s']:.1f} -> {new[q]['scaled_s']:.1f} "
              f"({d:+.1f} s, ratio {old[q]['ratio']:.1f}x -> {new[q]['ratio']:.1f}x)")
    worst = sorted(both, key=lambda q: -new[q]["ratio"])[:top]
    print("\nworst ratios in new sweep:")
    for q in worst:
        print(f"  {q}: ratio {new[q]['ratio']:.1f}x "
              f"(src {new[q]['src_s']:.2f} s, scaled {new[q]['scaled_s']:.1f} s)")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"\nremoved: {only_old}")
    if only_new:
        print(f"new rows: {only_new}")


if __name__ == "__main__":
    main()
