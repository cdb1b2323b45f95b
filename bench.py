"""Headline benchmark: scan-registration latency at the reference's canonical
configuration (75 azimuth x 24 elevation voxels, 7 iterations, 64-channel
scans — reference README.md:57-59 reports 35 ms on a Ryzen 5800x CPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the speedup factor over the reference's 35 ms.

Methodology: the whole solve is a single XLA program, so per-registration
device time is measured by pipelining many dispatches and dividing (the
per-call sync latency through this dev harness's TPU tunnel is dominated by
tunnel RTT, not device time).  Several independent trial blocks are taken and
the median reported to ride out tunnel flakiness.
"""

import json
import sys
import time

import numpy as np

REFERENCE_MS = 35.0  # reference README.md:57-59


def main() -> None:
    import jax
    import jax.numpy as jnp

    from icet_tpu import ICETConfig, register_pair

    scan1 = np.load("/root/reference/src/sample_data/frame_804.npy").astype(np.float32)
    scan2 = np.load("/root/reference/src/sample_data/frame_805.npy").astype(np.float32)
    c1 = jax.device_put(scan1)
    c2 = jax.device_put(scan2)
    x0 = jax.device_put(np.zeros(6, np.float32))
    jax.block_until_ready((c1, c2, x0))

    cfg = ICETConfig(n_iters=7)

    # Compile + warm up.
    res = register_pair(c1, c2, x0, cfg)
    jax.block_until_ready(res)

    trials = []
    for _ in range(7):
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            res = register_pair(c1, c2, x0, cfg)
        jax.block_until_ready(res)
        trials.append((time.perf_counter() - t0) / n * 1000.0)

    ms = float(np.median(trials))
    out = {
        "metric": "scan_registration_ms",
        "value": round(ms, 4),
        "unit": "ms/scan (75x24 voxels, 7 iters, 65536-pt scans, 1 chip)",
        "vs_baseline": round(REFERENCE_MS / ms, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
