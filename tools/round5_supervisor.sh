#!/bin/bash
# Waits for the axon relay to return, lets it stabilize, makes sure no
# CPU-heavy pytest is mid-flight (a starved TPU client wedged the relay in
# round 4 — CLAUDE.md gotcha), then runs the round-5 TPU queue exactly once.
set -u
cd /root/repo
LOG=logs_r5
mkdir -p $LOG
DEADLINE=${DEADLINE:-1787143500}
export DEADLINE   # the queue script must see the SAME deadline (a prior
                  # launch lost the env prefix and the queue defaulted to a
                  # stale, already-past deadline)
echo $$ > /tmp/r5_supervisor.pid

while true; do
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then
    echo "[supervisor] deadline passed, exiting $(date -u +%FT%TZ)" >> $LOG/queue.log
    exit 0
  fi
  if ss -tln | grep -q ':8082 '; then
    sleep 90   # let the tunnel stabilize
    ss -tln | grep -q ':8082 ' || continue
    # wait out any running pytest (pid file written by the builder)
    while [ -f /tmp/pytest.pid ] && kill -0 "$(cat /tmp/pytest.pid)" 2>/dev/null; do
      sleep 20
    done
    echo "[supervisor] relay up, launching queue $(date -u +%FT%TZ)" >> $LOG/queue.log
    bash tools/round5_tpu_queue.sh
    exit 0
  fi
  sleep 15
done
