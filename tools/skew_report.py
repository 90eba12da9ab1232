#!/usr/bin/env python3
"""Build the round-9 STRESS.md scale/skew table from scale_campaign.sh
output: per query, min-of-N seconds at each (scale, variant), the
sf1→sf10 scaling ratio (uniform), and the Zipfian/uniform delta at each
scale. Markdown to stdout.

Usage: python3 tools/skew_report.py [/tmp/scalebench] [--base sf0.1 jsons...]
"""
import glob
import json
import sys

d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scalebench"
base_files = []
if "--base" in sys.argv:
    base_files = sys.argv[sys.argv.index("--base") + 1:]


def min_per_query(paths):
    out = {}
    for p in paths:
        try:
            d = json.load(open(p))
        except Exception:
            continue
        failed = set(d.get("failed", []))
        for q, v in d["queries"].items():
            # a FAILED query's recorded duration is its abort time, not
            # a measurement — never let it win the min
            if v >= 0 and q not in failed:
                out[q] = min(out.get(q, float("inf")), v)
    return out


tags = ["sf1", "sf1skew", "sf10", "sf10skew"]
data = {t: min_per_query(glob.glob(f"{d}/{t}_run*.json")) for t in tags}
base = min_per_query(base_files) if base_files else {}

queries = sorted(set().union(*[set(v) for v in data.values() if v]))

hdr = "| query |"
if base:
    hdr += " sf0.1 |"
hdr += " sf1 | sf10 | 1→10 ratio | sf1 skew Δ | sf10 skew Δ |"
print(hdr)
print("|" + "---|" * (hdr.count("|") - 1))
for q in queries:
    s1 = data["sf1"].get(q)
    s1k = data["sf1skew"].get(q)
    s10 = data["sf10"].get(q)
    s10k = data["sf10skew"].get(q)

    def f(x, suf="s"):
        return f"{x:.1f}{suf}" if x is not None else "—"

    ratio = f"{s10 / s1:.1f}×" if s1 and s10 else "—"
    d1 = f"{s1k / s1:.2f}×" if s1 and s1k else "—"
    d10 = f"{s10k / s10:.2f}×" if s10 and s10k else "—"
    row = f"| {q} |"
    if base:
        row += f" {f(base.get(q))} |"
    row += f" {f(s1)} | {f(s10)} | {ratio} | {d1} | {d10} |"
    print(row)

for t in tags:
    if data[t]:
        print(f"\n{t}: total(min-of-N) {sum(data[t].values()):.1f}s "
              f"over {len(data[t])} queries "
              f"({len(glob.glob(f'{d}/{t}_run*.json'))} runs)")
