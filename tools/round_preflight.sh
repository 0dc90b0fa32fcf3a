#!/bin/bash
# Round-boundary preflight (VERDICT r4 "harden the round boundary"): run
# before the driver's end-of-round snapshot/bench. Exits 0 only when the
# repo is snapshot-clean:
#   1. no queue step active (and the runner is idle or done),
#   2. git tree clean (no uncommitted artifacts to be clobbered/lost),
#   3. no stray python experiment processes holding the TPU relay,
#   4. bench.py's stale-fallback inputs exist (BENCH_LAST_GOOD.json).
# Prints one line per check; FAIL lines say what to do.
cd "$(dirname "$0")/.."
rc=0

if [ -e /tmp/queue_step_active ] && kill -0 "$(cat /tmp/queue_step_active 2>/dev/null)" 2>/dev/null; then
  echo "FAIL: queue step running (pid $(cat /tmp/queue_step_active)) — let it finish or do not snapshot yet"
  rc=1
else
  echo "ok: no live queue step"
fi

n=$(cat /tmp/queue_done_count 2>/dev/null || echo 0)
total=$(wc -l < tools/queue_steps.txt)
if [ "$n" -lt "$total" ]; then
  echo "warn: queue at step $n/$total (chain not drained — remaining steps will not run this round)"
fi

if [ -n "$(git status --porcelain)" ]; then
  echo "FAIL: dirty tree — commit or clean before snapshot:"
  git status --porcelain | head -10
  rc=1
else
  echo "ok: git tree clean"
fi

stray=$(ps -eo pid,etime,args | grep -E "python (examples/|tools/|bench)" | grep -v grep | grep -v round_preflight)
if [ -n "$stray" ]; then
  echo "FAIL: stray experiment processes:"
  echo "$stray"
  rc=1
else
  echo "ok: no stray experiment processes"
fi

if [ -s BENCH_LAST_GOOD.json ]; then
  echo "ok: BENCH_LAST_GOOD.json present ($(python -c "import json;print(json.load(open('BENCH_LAST_GOOD.json')).get('measured_at','?'))" 2>/dev/null))"
else
  echo "FAIL: BENCH_LAST_GOOD.json missing — bench's stale fallback would be empty"
  rc=1
fi

exit $rc
