#!/bin/sh
# First-action checklist for when the TPU tunnel returns (it died for most
# of rounds 2-3; CLAUDE.md "the tunnel LIES" / outage notes).  Runs every
# unmeasured-on-chip item in order, each under its own timeout, logging to
# $OUT.  Safe to re-run; stages that hang are skipped by their timeouts.
#
#   sh tools/on_chip_checklist.sh [outdir]
#
# Items (CLAUDE.md perf backlog; refreshed for round 4):
#   1. trivial-op probe x3 (abort early if the tunnel is still dead)
#   2. bench.py            — headline + keyframe + dnn (the orchestrator
#                            re-measures the headline in a 2nd process and
#                            takes the min; whole-process tunnel modes)
#   3. bench_prepare.py    — prepare-stage slopes
#   4. bench_odostep.py    — odometry-step stage slopes
#   5. trace_solve.py      — xplane trace (add --keyframe/--headline for
#                            those regimes)
#   6. bench_keyframe.py   — keyframe stage ladder (insert/glue/spawn)
#   7. bench_dnn_stages.py — DNN filter ladder (sampling/forward/mask)
#   8. bench_sampling.py   — per-voxel sampling ladder (gather/scatter)
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
timeout 5100 python bench.py                  > "$OUT/bench.json"        2> "$OUT/bench.err"
timeout 1800 python tools/bench_prepare.py    > "$OUT/bench_prepare.log" 2>&1
timeout 1800 python tools/bench_odostep.py    > "$OUT/bench_odostep.log" 2>&1
timeout 1800 python tools/trace_solve.py      > "$OUT/trace_solve.log"   2>&1
timeout 1800 python tools/bench_keyframe.py   > "$OUT/bench_keyframe.log" 2>&1
timeout 1800 python tools/bench_dnn_stages.py > "$OUT/bench_dnn_stages.log" 2>&1
timeout 1800 python tools/bench_sampling.py   > "$OUT/bench_sampling.log" 2>&1

echo "done; results in $OUT — update RESULTS.md/CLAUDE.md and commit"
