#!/bin/bash
# Load-gated scaling-pair collector (the r5 ask: schedule it, don't
# hand-poll). Polls /proc/loadavg every 2 minutes and fires
# scripts/scaling_pair_append.py only inside the same dual quiet gate
# the appender itself enforces (load1 < 0.4 AND load5 < 0.9 — stricter
# than the appender's 0.5/1.0 so a race with decaying load cannot make
# the fired run refuse). Collected pairs land in
# BENCH/scaling_pairs_r04.json with load stamps, as always.
#
# Usage: nohup scripts/scaling_watchdog.sh [n_pairs] [--steady-state] &
# Round-6 pairs collected this way: cold 0.683 / 0.697 / 0.641,
# steady 0.734 (see BENCH/BASELINE.md r06).
set -u
cd "$(dirname "$0")/.."
want=${1:-1}
shift 2>/dev/null || true
fired=0
for i in $(seq 1 240); do
  read -r l1 l5 _ < /proc/loadavg
  ok=$(python3 -c "print(1 if float('$l1')<0.4 and float('$l5')<0.9 else 0)")
  if [ "$ok" = "1" ]; then
    echo "$(date +%T) quiet l1=$l1 l5=$l5 — firing pair $((fired+1))/$want"
    if python scripts/scaling_pair_append.py "$@"; then
      fired=$((fired+1))
      [ "$fired" -ge "$want" ] && exit 0
      sleep 300
    fi
  fi
  sleep 120
done
echo "gave up after 240 polls with $fired/$want pairs"
exit 1
