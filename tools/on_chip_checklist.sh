#!/bin/sh
# First-action checklist for when the TPU tunnel returns (it died for most
# of rounds 2-3; CLAUDE.md "the tunnel LIES" / outage notes).  Runs every
# unmeasured-on-chip item in order, each under its own timeout, logging to
# $OUT.  Safe to re-run; stages that hang are skipped by their timeouts.
#
#   sh tools/on_chip_checklist.sh [outdir]
#
# Items (CLAUDE.md perf backlog + VERDICT r2 #1/#2):
#   1. 60s trivial-op probe (abort early if the tunnel is still dead)
#   2. bench.py          — headline odometry_frame_ms + keyframe_frame_ms
#                          (counts-hint + early-exit + round-3 eigh3 changes
#                          all unmeasured on chip)
#   3. bench_prepare.py  — prepare-stage slopes (eigh3 4-sweep effect)
#   4. bench_odostep.py  — odometry-step stage slopes (the ~0.2 ms glue)
#   5. trace_solve.py    — xplane trace for the glue breakdown
set -x
OUT=${1:-/tmp/on_chip_$(date +%s)}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

# 150s: slow-mode tunnel days take ~60s just for backend init.  3 tries in
# fresh processes: the first device sync can hang per-process (CLAUDE.md);
# a hang is not "dead", the next process usually connects.
ok=0
for try in 1 2 3; do
  timeout 150 python -c "
import jax, jax.numpy as jnp
x = (jnp.ones((8,8))@jnp.ones((8,8))).sum()
x.block_until_ready()
print('PROBE_OK', float(x), jax.devices()[0].platform)
" > "$OUT/probe.log" 2>&1 && { ok=1; break; }
  echo "probe try $try failed/hung; retrying in fresh process"
done
[ "$ok" = 1 ] || { echo "tunnel dead after 3 probes; see $OUT/probe.log"; exit 1; }

# bench.py's own orchestrator worst case is 2 probes x 60s + 2 workers x
# 2400s; the outer timeout must exceed that or it kills the retry mid-way
# and bench.json loses its guaranteed one-line JSON.
timeout 5100 python bench.py                > "$OUT/bench.json"        2> "$OUT/bench.err"
timeout 1800 python tools/bench_prepare.py  > "$OUT/bench_prepare.log" 2>&1
timeout 1800 python tools/bench_odostep.py  > "$OUT/bench_odostep.log" 2>&1
timeout 1800 python tools/trace_solve.py    > "$OUT/trace_solve.log"   2>&1

echo "done; results in $OUT — update RESULTS.md/CLAUDE.md and commit"
