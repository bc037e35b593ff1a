#!/bin/bash
# Healthy-window scaling watcher (BASELINE.md mitigation 2).
#
# Probes host first-touch bandwidth every 10 min; the first time it
# recovers to >= 0.8 GB/s, runs the full `bench.py --scaling` protocol
# at the requested CPU pair and records the artifact, then exits.
# Usage: scripts/healthy_watcher.sh [LO HI OUT_JSON]
cd "$(dirname "$0")/.." || exit 1
LO="${1:-8}"
HI="${2:-32}"
OUT="${3:-/tmp/healthy_scaling_r03_s3.json}"
LOG=/tmp/healthy_watcher_s3.log
while true; do
    P=$(python -c "import sys; sys.path.insert(0,'.'); from bench import host_first_touch_gbps; print(host_first_touch_gbps())")
    echo "$(date -Is) probe=${P}" >> "$LOG"
    OK=$(python -c "print(1 if float('${P}') >= 0.8 else 0)")
    if [ "$OK" = "1" ]; then
        echo "$(date -Is) healthy window — running --scaling (${LO},${HI})" >> "$LOG"
        GRAFT_SCALING_LO="$LO" GRAFT_SCALING_HI="$HI" \
            python bench.py --scaling > "$OUT" 2>>"$LOG"
        echo "$(date -Is) recorded $OUT" >> "$LOG"
        exit 0
    fi
    sleep 600
done
