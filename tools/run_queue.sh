#!/bin/bash
# Relay-health-gated runner for the queued TPU experiment chain.
#
# Steps live one-per-line in tools/queue_steps.txt ("<logfile> <cmd...>") so
# new legs can be APPENDED while the runner is live — bash reads scripts
# lazily, so editing this file mid-run would corrupt the running shell
# (replace it via write-new + mv so the live shell keeps its old inode), but
# editing the steps file is always safe. Progress is a counter in
# /tmp/queue_done_count; delete it to replay from the top (each study script
# is itself resumable past completed legs, so replays are cheap).
#
# The axon relay can die for hours (see CLAUDE.md); the gate waits for a
# healthy tiny-op probe before each step. A failed step is retried once ONLY
# when its log tail looks transient (relay outage / timeout / signal death) —
# a deterministic python crash would just re-burn the step to reproduce
# itself, so those fail fast and the chain moves on.
#
# Coordination with bench.py: two processes sharing the relay serialize and
# corrupt each other's timings (CLAUDE.md), and the driver runs bench.py at
# round end. While a step runs, /tmp/queue_step_active holds its pid;
# bench.py waits for it to clear (ignoring stale pids). Conversely the
# runner holds BEFORE each step while /tmp/bench_request exists, so a bench
# never has a fresh step launched under it.
#
# Usage: setsid nohup tools/run_queue.sh </dev/null >/tmp/queue_run.log 2>&1 &
cd "$(dirname "$0")/.."
STEPS=tools/queue_steps.txt
COUNT=/tmp/queue_done_count
ACTIVE=/tmp/queue_step_active
BENCHREQ=/tmp/bench_request

probe() {
  timeout 180 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != "cpu"
assert float(jnp.ones(8).sum()) == 8.0
EOF
}

step() {  # step <logfile> <cmd...> — mark active, run, unmark
  local log=$1; shift
  echo $$ > "$ACTIVE"
  "$@" >> "$log" 2>&1
  local rc=$?
  rm -f "$ACTIVE"
  return $rc
}

bench_hold() {
  # hold while a LIVE bench has requested the relay; a bench killed uncleanly
  # leaves its request file behind — ignore it once its pid is gone (the
  # mirror of bench.py's stale-pid check on QUEUE_ACTIVE)
  while [ -e "$BENCHREQ" ] && kill -0 "$(cat "$BENCHREQ" 2>/dev/null)" 2>/dev/null; do
    sleep 30
  done
}

transient() {  # transient <logfile> <bytes-before> <rc> — is this failure retryable?
  # rc >= 124: timeout(1) kill or signal death (128+n) — environment, retry.
  [ "$3" -ge 124 ] && return 0
  # relay-outage signatures in the region THIS attempt appended
  tail -c +"$(($2 + 1))" "$1" 2>/dev/null | grep -qE \
    "UNAVAILABLE|DEADLINE_EXCEEDED|Socket closed|failed to connect|Connection reset|connection error|timed out|remote_compile|response body closed|JaxRuntimeError: INTERNAL"
}

run() {  # run <logfile> <cmd...> — gate on relay health + bench
  bench_hold
  until probe; do sleep 120; done
  echo "$(date) start: ${*:2}" >> /tmp/queue_chain.log
  local before
  before=$(stat -c%s "$1" 2>/dev/null || echo 0)
  if step "$@"; then
    echo "$(date) done: ${*:2}" >> /tmp/queue_chain.log
  else
    local rc=$?
    if transient "$1" "$before" "$rc"; then
      sleep 60
      bench_hold
      until probe; do sleep 120; done
      step "$@"
      local rc2=$?  # capture BEFORE $(date) in the echo clobbers $?
      echo "$(date) done(retry rc=$rc2): ${*:2}" >> /tmp/queue_chain.log
    else
      echo "$(date) FAIL-FAST (rc=$rc, deterministic crash — no retry): ${*:2}" >> /tmp/queue_chain.log
    fi
  fi
}

n=$(cat "$COUNT" 2>/dev/null || echo 0)
while :; do
  total=$(wc -l < "$STEPS")
  if [ "$n" -ge "$total" ]; then
    echo "$(date) chain complete ($n steps)" >> /tmp/queue_chain.log
    break
  fi
  line=$(sed -n "$((n + 1))p" "$STEPS")
  # shellcheck disable=SC2086
  run $line
  n=$((n + 1))
  echo "$n" > "$COUNT"
done
