#!/usr/bin/env bash
# A/B bench two commits on a query subset (the round-9 judge protocol,
# promoted into the round workflow per VERDICT r9 item 6).
#
# Usage: tools/ab_bench.sh <commitA> <commitB> <subset> [sfDir] [nRuns]
#   subset  comma-separated query-name prefixes (SPARK_GRAFT_ONLY syntax)
#   sfDir   default /root/testdata/sf0.1
#   nRuns   median-of-N per side, default 3
#
# commitB may be "WORKTREE" to bench the current working tree in place
# (uncommitted changes included). Each commit side runs in its own git
# worktree with its own sbt target dir, fresh JVM per run, alternating
# A/B/A/B to average slow load drift. Prints per-query medians and the
# B/A ratio table.
set -euo pipefail
cd "$(dirname "$0")/.."

A="${1:?commitA}"; B="${2:?commitB}"; SUBSET="${3:?subset}"
SF="${4:-/root/testdata/sf0.1}"; N="${5:-3}"

load1=$(cut -d' ' -f1 /proc/loadavg)
echo "loadavg at start: $load1" >&2

WT_ROOT=$(mktemp -d /tmp/ab_bench.XXXX)
cleanup() {
  git worktree remove --force "$WT_ROOT/A" 2>/dev/null || true
  git worktree remove --force "$WT_ROOT/B" 2>/dev/null || true
  rm -rf "$WT_ROOT"
}
trap cleanup EXIT

git worktree add --detach "$WT_ROOT/A" "$A" >&2
DIR_A="$WT_ROOT/A"
if [ "$B" = "WORKTREE" ]; then
  DIR_B="$PWD"
else
  git worktree add --detach "$WT_ROOT/B" "$B" >&2
  DIR_B="$WT_ROOT/B"
fi

run_one() { # dir tag runIdx
  local dir="$1" tag="$2" idx="$3"
  local out="$WT_ROOT/${tag}_${idx}.json"
  (cd "$dir" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_ONLY="$SUBSET" \
    SPARK_GRAFT_BENCH_OUT="$out" \
    sbt -batch "runMain graft.Bench" >/dev/null 2>"$WT_ROOT/${tag}_${idx}.log") \
    || { echo "bench $tag run $idx FAILED — tail of log:" >&2;
         tail -20 "$WT_ROOT/${tag}_${idx}.log" >&2; exit 1; }
  echo "$out"
}

# warm both compile caches before timing anything
(cd "$DIR_A" && sbt -batch compile >/dev/null 2>&1)
(cd "$DIR_B" && sbt -batch compile >/dev/null 2>&1)

for i in $(seq 1 "$N"); do
  echo "run $i/$N side A ($A)..." >&2; run_one "$DIR_A" A "$i" >/dev/null
  echo "run $i/$N side B ($B)..." >&2; run_one "$DIR_B" B "$i" >/dev/null
done

python3 - "$WT_ROOT" "$N" <<'EOF'
import json, statistics, sys
root, n = sys.argv[1], int(sys.argv[2])
def med(tag):
    runs = [json.load(open(f"{root}/{tag}_{i}.json")) for i in range(1, n+1)]
    return {q: statistics.median(r["queries"][q] for r in runs)
            for q in runs[0]["queries"]}
a, b = med("A"), med("B")
print(f"{'query':<22}{'A med':>8}{'B med':>8}{'B/A':>7}")
for q in sorted(set(a) | set(b)):
    av, bv = a.get(q), b.get(q)
    ratio = f"{bv/av:.2f}" if av and bv else "-"
    print(f"{q:<22}{av or 0:>8.3f}{bv or 0:>8.3f}{ratio:>7}")
ta, tb = sum(a.values()), sum(b.values())
print(f"{'TOTAL':<22}{ta:>8.3f}{tb:>8.3f}{tb/ta:>7.2f}")
EOF
