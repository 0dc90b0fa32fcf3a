#!/bin/bash
# Relay-health-gated runner for the queued TPU experiment chain.
#
# The axon relay can die for hours (see CLAUDE.md); this gate waits for a
# healthy tiny-op probe before each step and retries each step once. Every
# study script is itself resumable (completed legs are skipped via their
# progress.csv / artifact checks), so rerunning this script after any crash
# is safe and cheap.
#
# Usage: setsid nohup tools/run_queue.sh </dev/null >/tmp/queue_run.log 2>&1 &
cd "$(dirname "$0")/.."

probe() {
  timeout 180 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != "cpu"
assert float(jnp.ones(8).sum()) == 8.0
EOF
}

run() {  # run <logfile> <cmd...> — gate on relay health, one retry
  local log=$1; shift
  until probe; do sleep 120; done
  echo "$(date) start: $*" >> /tmp/queue_chain.log
  if "$@" >> "$log" 2>&1; then
    echo "$(date) done: $*" >> /tmp/queue_chain.log
  else
    sleep 60; until probe; do sleep 120; done
    "$@" >> "$log" 2>&1
    echo "$(date) done(retry rc=$?): $*" >> /tmp/queue_chain.log
  fi
}

# Highest-value first, in case relay time is scarce.
run /tmp/profile_translate.log  python tools/profile_translate.py 256
run /tmp/profile_translate.log  python tools/profile_translate.py 1024
run /tmp/throw_strong.log       python examples/throw_strong_expert.py
run /tmp/push_variants.log      python examples/push_variants_seeds.py
run /tmp/sweep_variants.log     python examples/sweep_variants_seeds.py
run /tmp/push_nvp2.log          python examples/push_nvp2_rl.py
run /tmp/real_full_recipe.log   python examples/real_full_recipe.py
run /tmp/push_4k.log            python examples/push_data4k.py
echo "$(date) chain complete" >> /tmp/queue_chain.log
