#!/bin/bash
# Watchdog for the 30k production run: the experimental axon TPU tunnel
# can drop mid-run, leaving the client blocked forever on a device
# transfer (observed: all threads futex-waiting, log silent for >1h).
# Restart on a stalled log; the run auto-resumes from its latest
# checkpoint (every 2000 iterations).
set -u
cd "$(dirname "$0")/.."
LOG=docs/runs/production_30k_r5.log
OUT=output/production_30k
# hard wall-clock deadline (epoch seconds): never hold the chip into
# the end-of-round benchmark window
DEADLINE=${RUN_DEADLINE:-$(( $(date +%s) + 16200 ))}

for attempt in 1 2 3 4 5 6 7 8; do
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "[watchdog] deadline reached — stopping" >> "$LOG"
    exit 1
  fi
  echo "[watchdog] attempt $attempt $(date +%H:%M:%S)" >> "$LOG"
  setsid python -u tools/run_production_30k.py "$OUT" >> "$LOG" 2>&1 &
  PID=$!
  while kill -0 "$PID" 2>/dev/null; do
    sleep 120
    age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$age" -gt 900 ] || [ "$(date +%s)" -ge "$DEADLINE" ]; then
      echo "[watchdog] stall ${age}s / deadline — killing pgid $PID" \
        >> "$LOG"
      kill -9 -- "-$PID" 2>/dev/null || kill -9 "$PID" 2>/dev/null
      sleep 60
      break
    fi
  done
  wait "$PID" 2>/dev/null
  if grep -q "\[done\]" "$LOG"; then
    echo "[watchdog] complete" >> "$LOG"
    exit 0
  fi
  echo "[watchdog] attempt $attempt ended without [done] — restarting" >> "$LOG"
  sleep 45
done
echo "[watchdog] giving up after 8 attempts" >> "$LOG"
exit 1
