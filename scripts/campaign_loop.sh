#!/bin/bash
# Continuous quiet-epoch campaign runner: fire a 6M paired campaign
# whenever the 1-min load drops below MAX_LOAD, sleep, repeat.
# Touch BENCH/STOP_CAMPAIGNS to stop the loop (checked between runs).
set -u
cd "$(dirname "$0")/.."
MAX_LOAD=${1:-0.6}
ROWS=${2:-6000000}
MAX_RUNS=${3:-10}
run=0
while [ "$run" -lt "$MAX_RUNS" ]; do
  [ -f BENCH/STOP_CAMPAIGNS ] && { echo "stop file seen"; exit 0; }
  load=$(awk '{print $1}' /proc/loadavg)
  ok=$(awk -v l="$load" -v m="$MAX_LOAD" 'BEGIN{print (l<m)?1:0}')
  if [ "$ok" = 1 ]; then
    echo "$(date +%T) quiet (load $load) — firing ${ROWS}-row campaign" >&2
    if SPARK_GRAFT_BENCH_ROWS=$ROWS python bench.py --paired \
         >> BENCH/campaigns.jsonl 2>>/tmp/campaign_loop_stderr.log; then
      echo "$(date +%T) campaign ok" >&2
    else
      echo "$(date +%T) campaign FAILED (exit $?) — see /tmp/campaign_loop_stderr.log" >&2
    fi
    run=$((run+1))
    sleep 60
  else
    sleep 30
  fi
done
