#!/bin/sh
# Round-5 chip measurement runbook — run when the tunnel recovers from the
# D2H-hang mode (probe must FETCH a value; see CLAUDE.md).  Logs to
# /tmp/r5_chip.  Order: probe -> bench.py (all headline metrics incl. the
# restructured DNN step and auto-spawn keyframe) -> DNN stage table ->
# keyframe spawn-cadence perf sweep.
set -x
OUT=${1:-/tmp/r5_chip}
mkdir -p "$OUT"
ok=0
for try in 1 2 3; do
  timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
v = float(np.asarray((jnp.ones((8,8))@jnp.ones((8,8))).sum()))
print('PROBE_OK', v, jax.devices()[0].platform)
" > "$OUT/probe.log" 2>&1 && { ok=1; break; }
  echo "probe $try failed/hung (D2H mode?); fresh process retry"
done
[ "$ok" = 1 ] || { echo "tunnel still dead; see $OUT/probe.log"; exit 1; }
timeout 3000 python bench.py > "$OUT/bench.json" 2> "$OUT/bench.err"
tail -1 "$OUT/bench.json"
timeout 1500 python tools/bench_dnn_stages.py > "$OUT/dnn_stages.log" 2>&1
tail -8 "$OUT/dnn_stages.log"
timeout 1500 python tools/bench_kf_spawnperf.py > "$OUT/kf_spawnperf.log" 2>&1
tail -8 "$OUT/kf_spawnperf.log"
