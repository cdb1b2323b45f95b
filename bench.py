"""Headline benchmark: scan-registration device time at the reference's
canonical configuration (75 azimuth x 24 elevation voxels, 7 iterations,
64-channel scans — reference README.md:57-59 reports 35 ms on a Ryzen 5800x).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the speedup factor over the reference's 35 ms.

Methodology (hard-won; see CLAUDE.md):
- This dev harness reaches the chip through a tunnel whose runtime ELIDES
  unconsumed dispatches (naive pipelined loops measure impossible numbers)
  and adds 30-150 ms fixed cost per dispatch.  Solves are therefore CHAINED
  inside jitted lax.scans (solve k's X warm-starts solve k+1 — every solve a
  true data dependency of the fetched result), and the reported value is the
  SLOPE between two chain lengths, which cancels the fixed dispatch cost.
- Scans are normalised to beam-major order at load (datasets.loaders.
  to_beam_major; the bundled Ouster frames are azimuth-major), matching how
  a production pipeline would ingest once per sequence.
"""

import json
import sys
import time

import numpy as np

REFERENCE_MS = 35.0  # reference README.md:57-59
CHAINS = (10, 50)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from icet_tpu import ICETConfig
    from icet_tpu.datasets.loaders import detect_beam_count, to_beam_major
    from icet_tpu.solver import prepare_reference, register

    scan1 = np.load("/root/reference/src/sample_data/frame_804.npy").astype(np.float32)
    scan2 = np.load("/root/reference/src/sample_data/frame_805.npy").astype(np.float32)
    nb = detect_beam_count(scan1) or 64
    c1 = jax.device_put(to_beam_major(scan1, nb))
    c2 = jax.device_put(to_beam_major(scan2, nb))
    x0 = jax.device_put(np.zeros(6, np.float32))
    jax.block_until_ready((c1, c2, x0))

    cfg = ICETConfig(n_iters=7)

    def make(chain):
        @jax.jit
        def g(s1, s2, x):
            model = prepare_reference(s1, cfg)

            def body(xc, _):
                return register(model, s2, xc, cfg).X, None

            xf, _ = jax.lax.scan(body, x, None, length=chain)
            return xf

        return g

    totals = {}
    for chain in CHAINS:
        fn = make(chain)
        x_host = np.asarray(fn(c1, c2, x0))  # compile + warm
        assert np.isfinite(x_host).all()
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(fn(c1, c2, x0))
            best = min(best, time.perf_counter() - t0)
        totals[chain] = best

    ms = (totals[CHAINS[1]] - totals[CHAINS[0]]) / (CHAINS[1] - CHAINS[0]) * 1e3
    out = {
        "metric": "scan_registration_ms",
        "value": round(ms, 4),
        "unit": "ms/scan device time (75x24 voxels, 7 iters, 65536-pt scans, 1 chip)",
        "vs_baseline": round(REFERENCE_MS / ms, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
