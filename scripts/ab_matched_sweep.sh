#!/bin/bash
# Matched-sweep bench A/B — the round-15 drift-attribution method
# (PERF_NOTES "Round 15: the clean-bench drift ATTRIBUTED").
#
# Cross-round bench totals are not comparable raw: host aging and
# sweep-length inflation (per-iteration JVM-state degradation
# integrated over a longer registry) both move totals on identical
# code. This script produces the two legs that separate those causes
# from real code cost:
#
#   leg OLD : the old boundary commit, its own sweep, in a /tmp
#             worktree seeded with the current target/ tree so zinc
#             recompiles only the delta.
#   leg HEAD: current HEAD restricted (SPARK_GRAFT_ONLY) to exactly
#             the old leg's query list — identical sweep, new code.
#
# Compare: OLD-today vs OLD-committed  -> host effect.
#          HEAD-matched vs OLD-today   -> real code cost.
#          HEAD-full    vs HEAD-matched-> sweep-composition artifact.
#
# Usage: scripts/ab_matched_sweep.sh <old-commit> [sf-dir]
# Writes /tmp/ab_<commit>_bench.json and /tmp/head_matched_bench.json
# (full per-iteration JSON — target/bench_out.json copies, NOT the
# budget-truncated stdout line). Run on a quiet host; each leg records
# its own [start,end] load marker in the JSON.
set -euo pipefail
OLD="${1:?usage: ab_matched_sweep.sh <old-commit> [sf-dir]}"
SF="${2:-/root/testdata/sf0.1}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WT="/tmp/ab_$OLD"

cd "$REPO"
git worktree add "$WT" "$OLD" 2>/dev/null || true
[ -d "$WT/target" ] || cp -r "$REPO/target" "$WT/target"

echo "=== leg OLD ($OLD) start $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg)"
(cd "$WT" && SPARK_GRAFT_SF_DIR="$SF" sbt -batch "runMain graft.Bench" \
  2>&1 | grep -E '^\{"metric"' > /dev/null)
cp "$WT/target/bench_out.json" "/tmp/ab_${OLD}_bench.json"

python3 - "$OLD" <<'EOF' > /tmp/ab_only_list.txt
import json, sys
print(','.join(sorted(json.load(open(f'/tmp/ab_{sys.argv[1]}_bench.json'))['queries'])))
EOF

echo "=== leg HEAD matched start $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg)"
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_ONLY="$(cat /tmp/ab_only_list.txt)" \
  SPARK_GRAFT_BENCH_OUT=/tmp/head_matched_bench.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep -E '^\{"metric"' > /dev/null

python3 - "$OLD" <<'EOF'
import json, statistics, sys
old=json.load(open(f'/tmp/ab_{sys.argv[1]}_bench.json'))['queries']
new=json.load(open('/tmp/head_matched_bench.json'))['queries']
s=sorted(set(old)&set(new))
print(f'shared-{len(s)} sums: OLD-today %.2f  HEAD-matched %.2f'%(
  sum(old[k] for k in s), sum(new[k] for k in s)))
print('median per-query HEAD/OLD: %.3f'%statistics.median(
  new[k]/old[k] for k in s if old[k]>0))
for k in sorted(s, key=lambda k: new[k]-old[k], reverse=True)[:8]:
    print('  %-26s %.2f -> %.2f (%+.2f)'%(k, old[k], new[k], new[k]-old[k]))
EOF
echo "=== done; worktree left at $WT (git worktree remove --force $WT)"
