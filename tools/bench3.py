#!/usr/bin/env python3
"""Median-of-3 bench runs (see BENCH_NOTES.md): runs `graft.Bench` three
times in fresh JVMs, prints per-query medians and the median total, and
warns when the machine was not idle at start.

Usage: python3 tools/bench3.py <sfDir> [nRuns]
"""
import json, os, statistics, subprocess, sys

def load_warn():
    try:
        load1 = float(open("/proc/loadavg").read().split()[0])
        cores = os.cpu_count() or 1
        if load1 > 0.25 * cores:
            print(f"WARNING: loadavg {load1:.1f} on {cores} cores — "
                  "numbers may be load-contaminated", file=sys.stderr)
    except OSError:
        pass

def one_run(sf_dir):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        capture_output=True, text=True, env=env, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    for line in out.stdout.splitlines():
        i = line.find('{"metric"')
        if i >= 0:
            return json.loads(line[i:])
    print(out.stdout[-2000:], file=sys.stderr)
    raise SystemExit("no bench JSON line found")

def main():
    sf_dir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    load_warn()
    runs = []
    save_dir = os.environ.get("BENCH3_SAVE_DIR")
    for i in range(n):
        r = one_run(sf_dir)
        print(f"run {i+1}/{n}: total {r['value']:.1f}s", file=sys.stderr)
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            with open(f"{save_dir}/run{i+1}.json", "w") as f:
                json.dump(r, f)
        runs.append(r)
    queries = {q: statistics.median(r["queries"][q] for r in runs)
               for q in runs[0]["queries"]}
    result = {"metric": "total_median", "unit": "sec", "runs": n,
              "value": round(statistics.median(r["value"] for r in runs), 3),
              "queries": {q: round(v, 3) for q, v in sorted(
                  queries.items(), key=lambda kv: -kv[1])}}
    print(json.dumps(result))

if __name__ == "__main__":
    main()
