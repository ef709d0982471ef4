#!/usr/bin/env bash
# Background TPU-relay watcher. Probes device init every POLL_S seconds;
# when the relay answers, touches .relay_up and — unless .cpu_busy exists
# (the builder runs CPU-heavy jobs behind that sentinel; concurrent load
# corrupts TPU timings on this 1-core box) — immediately harvests the
# highest-value on-chip evidence for the round, then keeps watching so a
# later flap is also recorded. All output to docs/relay_poller.log.
set -u
cd "$(dirname "$0")/.."
POLL_S=${POLL_S:-600}
LOG=docs/relay_poller.log
echo "[poller] start $(date -u +%FT%TZ) pid=$$" >> "$LOG"

probe() {
    timeout 90 python -c "import jax; jax.devices()" > /dev/null 2>&1
}

harvested=0
while true; do
    if probe; then
        date -u +%FT%TZ > .relay_up
        echo "[poller] relay UP $(date -u +%FT%TZ)" >> "$LOG"
        if [ ! -e .cpu_busy ] && [ "$harvested" = 0 ] && [ -e .poller_stages ]; then
            stages=$(cat .poller_stages)
            echo "[poller] harvesting: $stages" >> "$LOG"
            bash tools/tpu_evidence.sh $stages >> "$LOG" 2>&1
            harvested=1
            echo "[poller] harvest done $(date -u +%FT%TZ)" >> "$LOG"
        fi
    else
        rm -f .relay_up
        echo "[poller] relay down $(date -u +%FT%TZ)" >> "$LOG"
    fi
    sleep "$POLL_S"
done
