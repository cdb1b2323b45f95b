#!/bin/sh
# Device run of the FLAGSHIP dynamic city-drive eval (VERDICT r3 #4), chunked
# so a tunnel hang can never lose more than one chunk.  Re-invokes
# eval_citydrive.py with --state/--chunk until the final (non-chunk) report
# prints; each invocation resumes from the checkpoint.
#
# Usage: sh tools/run_flagship_device.sh [outdir] [extra args...]
# e.g.:  CHUNK=20 CHUNK_TIMEOUT=900 sh tools/run_flagship_device.sh \
#            /tmp/flagship_r4_kf --keyframe
set -u
OUT=${1:-/tmp/flagship_r4}
shift 2>/dev/null || true
# Frame-to-frame mode: 40 frames finish in ~3-4 min incl. compile, and a
# tunnel-hung invocation (observed: first device sync never returns, 1.4%
# CPU) must recycle fast — the checkpoint makes the kill lossless.
# Keyframe mode compiles longer and dispatches more per frame: use
# CHUNK=20 CHUNK_TIMEOUT=900 (40-frame chunks never checkpointed in 450 s).
CHUNK=${CHUNK:-40}
CHUNK_TIMEOUT=${CHUNK_TIMEOUT:-450}
mkdir -p "$OUT"
LOG="$OUT/run.log"
i=0
while [ $i -lt 60 ]; do
    i=$((i + 1))
    echo "=== invocation $i $(date -u +%H:%M:%S) ===" >> "$LOG"
    timeout "$CHUNK_TIMEOUT" python examples/eval_citydrive.py \
        --frames 399 --dynamic --chunk "$CHUNK" \
        --state "$OUT/dyn" --out "$OUT" "$@" >> "$LOG" 2>&1
    rc=$?
    echo "rc=$rc" >> "$LOG"
    # Final report prints "ate_odometry_cm" (chunks print chunk_done)
    if grep -q '"ate_odometry_cm"' "$LOG"; then
        echo DONE
        grep '"ate_odometry_cm"' "$LOG" | tail -1
        exit 0
    fi
    # A hang (rc=124) or crash retries in a fresh process from the state.
done
echo "EXHAUSTED 60 invocations without a final report" >> "$LOG"
exit 1
