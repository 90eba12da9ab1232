#!/usr/bin/env python3
"""Per-query scaling-factor table between two bench runs (e.g. sf0.1 vs
a gen_scale.py-produced sf1), robust to the bursty background load this
box exhibits: pass MULTIPLE bench_out JSON files per scale and the
per-query MIN across runs is used (minimum-of-N discards additive
contention; medians need a quiet machine, see BENCH_NOTES.md).

Usage:
  python3 tools/scaling.py --base a.json b.json --scaled c.json d.json \
      [--factor 10]

Prints a table sorted by scaling ratio (scaled_min / base_min), flagging
queries whose ratio exceeds the data factor (super-linear).
"""
import argparse, json


def min_per_query(paths):
    out = {}
    for p in paths:
        qs = json.load(open(p))["queries"]
        for q, v in qs.items():
            if v >= 0:
                out[q] = min(out.get(q, float("inf")), v)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", nargs="+", required=True)
    ap.add_argument("--scaled", nargs="+", required=True)
    ap.add_argument("--factor", type=float, default=10.0)
    a = ap.parse_args()
    base = min_per_query(a.base)
    scaled = min_per_query(a.scaled)
    rows = []
    for q in sorted(base):
        if q in scaled and base[q] > 0.02:
            rows.append((scaled[q] / base[q], q, base[q], scaled[q]))
    rows.sort(reverse=True)
    print(f"{'query':28s} {'base_s':>8s} {'scaled_s':>9s} {'ratio':>7s}  flag")
    for r, q, b, s in rows:
        flag = "SUPER-LINEAR" if r > a.factor * 1.3 else (
            "~linear" if r > a.factor * 0.5 else "sub-linear")
        print(f"{q:28s} {b:8.2f} {s:9.2f} {r:7.1f}  {flag}")
    total_b = sum(base[q] for _, q, *_ in [(0, q) for q in base])
    print(f"\nbase total(min) {sum(base.values()):.1f}s   "
          f"scaled total(min) {sum(scaled.values()):.1f}s   "
          f"overall x{sum(scaled.values())/max(sum(base.values()),1e-9):.1f} "
          f"(data x{a.factor:g})")


if __name__ == "__main__":
    main()
