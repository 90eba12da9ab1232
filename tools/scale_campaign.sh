#!/bin/bash
# Round-9 skew + sf10 scale campaign: runs the dedup/ANN gate subset on
# uniform and Zipfian-skew variants at sf1 and sf10, capturing the bench
# JSON and the [graft.dispatch] knob lines per run. Output lands in
# /tmp/scalebench/; tools/scaling.py consumes the JSONs.
#
# q80 (forced PPJoin prefix) is excluded: its prefix strategy is
# documented-degenerate on this corpus's bounded gram universe and auto
# never routes there — it exists to oracle-pin the prefix kernel at gate
# scale. It gets a separate bounded probe run instead (see STRESS.md).
set -u
cd /root/repo
OUT=/tmp/scalebench
mkdir -p $OUT
SUBSET="q19,q20,q21,q22,q23,q24,q25,q32,q33,q44,q48,q67,q71,q72,q81,q82,q83,q84,q85,q86,q87"

run_one() { # tag sfdir shuffle ivfdir runidx
  local tag=$1 dir=$2 shuffle=$3 ivf=$4 i=$5
  local log=$OUT/${tag}_run${i}.log
  echo "=== $tag run $i ($(date -u +%H:%M:%S)) loadavg $(cut -d' ' -f1 /proc/loadavg)"
  ( export SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_ONLY=$SUBSET \
      SPARK_GRAFT_SHUFFLE=$shuffle
    # bash resolves prefix assignments BEFORE expansion, so a
    # conditionally-expanded VAR=val word would run as a command
    [ -n "$ivf" ] && export SPARK_GRAFT_IVF_DIR=$ivf
    sbt -batch "runMain graft.Bench" ) >$log 2>&1
  grep -F '{"metric"' $log | sed 's/^\[info\] //' > $OUT/${tag}_run${i}.json
  grep -F '[graft.dispatch]' $log | sort -u > $OUT/${tag}_run${i}.dispatch
  python3 - "$OUT/${tag}_run${i}.json" <<'EOF'
import json, sys
try:
    d = json.load(open(sys.argv[1]))
    print(f"  total {d['value']}s, failed={d.get('failed', [])}")
except Exception as e:
    print(f"  PARSE FAIL: {e}")
EOF
}

for i in 1 2; do run_one sf1      /tmp/sf1      32  ""                $i; done
for i in 1 2; do run_one sf1skew  /tmp/sf1skew  32  ""                $i; done
for i in 1 2; do run_one sf10     /tmp/sf10     128 /tmp/ivf_sf10     $i; done
for i in 1 2; do run_one sf10skew /tmp/sf10skew 128 /tmp/ivf_sf10skew $i; done
echo "=== campaign done $(date -u +%H:%M:%S)"
