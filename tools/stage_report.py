#!/usr/bin/env python3
"""Round-17 offline stage report over a Spark event log (no live UI in the
sandbox): per-job and per-stage wall, task-time sum, shuffle bytes, and the
max/median task skew — the guide §1/§2 numbers, read from disk.

Usage: python3 tools/stage_report.py /tmp/spark-events [min_wall_ms]
"""
import json, sys, glob, os
from collections import defaultdict

logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark-events"
min_wall = float(sys.argv[2]) if len(sys.argv) > 2 else 50.0

files = sorted(glob.glob(os.path.join(logdir, "*")), key=os.path.getmtime)
if not files:
    sys.exit(f"no event logs in {logdir}")
path = files[-1]
if os.path.isdir(path):  # Spark 4 rolling event-log dir
    inner = [p for p in glob.glob(os.path.join(path, "events_*"))]
    if not inner:
        inner = [p for p in glob.glob(os.path.join(path, "*"))
                 if not p.endswith("appstatus")]
    path = sorted(inner, key=os.path.getmtime)[-1]

stages = {}                      # sid -> dict
tasks = defaultdict(list)        # sid -> [task dict]
jobs = {}                        # jid -> dict
stage_job = {}                   # sid -> jid

if path.endswith(".zstd"):
    import subprocess
    text = subprocess.run(["zstd", "-dc", path], capture_output=True,
                          check=True).stdout.decode()
    lines = text.splitlines()
else:
    lines = open(path).read().splitlines()

if True:
    for line in lines:
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jid = e["Job ID"]
            jobs[jid] = {
                "desc": e.get("Properties", {}).get(
                    "spark.job.description", "")[:60],
                "t0": e["Submission Time"], "t1": None,
            }
            for s in e.get("Stage Infos", []):
                stage_job[s["Stage ID"]] = jid
        elif ev == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]]["t1"] = e["Completion Time"]
        elif ev == "SparkListenerStageCompleted":
            s = e["Stage Info"]
            stages[s["Stage ID"]] = {
                "name": s["Stage Name"].split("\n")[0][:70],
                "n": s["Number of Tasks"],
                "t0": s.get("Submission Time"),
                "t1": s.get("Completion Time"),
            }
        elif ev == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            # failed/killed attempts would double-count into the stage
            # aggregates (cpu, shuffle, max/med skew) on stages with
            # retries — only successful attempts represent the stage
            if e["Task Info"].get("Failed") or e["Task Info"].get("Killed"):
                continue
            m = e.get("Task Metrics") or {}
            sr = m.get("Shuffle Read Metrics", {})
            sw = m.get("Shuffle Write Metrics", {})
            tasks[sid].append({
                "dur": e["Task Info"]["Finish Time"] - e["Task Info"]["Launch Time"],
                "cpu": m.get("Executor CPU Time", 0) / 1e6,
                "run": m.get("Executor Run Time", 0),
                "srb": sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0),
                "swb": sw.get("Shuffle Bytes Written", 0),
                "fetch": sr.get("Fetch Wait Time", 0),
            })

print(f"log: {path}")
for jid in sorted(jobs):
    j = jobs[jid]
    wall = (j["t1"] - j["t0"]) if j["t1"] else -1
    if wall < min_wall:
        continue
    print(f"\njob {jid}  wall={wall/1000:.2f}s  desc={j['desc']}")
    for sid in sorted(s for s in stage_job if stage_job[s] == jid):
        if sid not in stages:
            continue
        st = stages[sid]
        ts = tasks.get(sid, [])
        if not ts:
            continue
        swall = (st["t1"] - st["t0"]) / 1000 if st["t0"] and st["t1"] else -1
        durs = sorted(t["dur"] for t in ts)
        med = durs[len(durs) // 2]
        mx = durs[-1]
        tsum = sum(durs) / 1000
        cpu = sum(t["cpu"] for t in ts) / 1000
        srb = sum(t["srb"] for t in ts)
        swb = sum(t["swb"] for t in ts)
        fetch = sum(t["fetch"] for t in ts) / 1000
        print(f"  stage {sid:>4} n={st['n']:>4} wall={swall:6.2f}s "
              f"tasksum={tsum:6.2f}s cpu={cpu:6.2f}s fetch={fetch:5.2f}s "
              f"max/med={mx}/{med}ms srd={srb/2**20:7.1f}M swr={swb/2**20:7.1f}M "
              f" {st['name']}")
