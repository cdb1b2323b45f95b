"""Headline benchmark: odometry per-frame device time at the reference's
canonical configuration (75 azimuth x 24 elevation voxels, 7 iterations,
64-channel scans — reference README.md:57-59 reports 35 ms on a Ryzen 5800x).

The headline is the FUSED ODOMETRY STEP (register the new scan against the
previous frame's voxel model + fit the new scan's own model for the next
frame) because that is what the reference's 35 ms pays per frame: its ICET
ctor runs fitScan1 + prepScan2 + runlen x fitScan2 every scan
(src/icet.cpp:29-63, odometry.cpp:73-82).  A register-only number (voxel
model amortised across solves) is reported as a secondary metric.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} where
vs_baseline is the speedup factor over the reference's 35 ms.

Methodology (hard-won; see CLAUDE.md):
- This dev harness reaches the chip through a tunnel whose runtime ELIDES
  unconsumed dispatches (naive pipelined loops measure impossible numbers)
  and adds 30-150 ms fixed cost per dispatch.  Steps are therefore CHAINED
  inside jitted lax.scans (step k's pose AND voxel model feed step k+1 —
  every step a true data dependency of the fetched result), and the
  reported value is the SLOPE between two chain lengths, which cancels the
  fixed dispatch cost.
- The odometry chain alternates the two bundled frames (804 -> 805 -> 804
  ...), so every step registers a genuinely different cloud against the
  model the previous step fitted — exactly the frame-to-frame odometry
  loop, with no reusable work between steps.
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


def _slope_ms(fn_for_chain, args, consume):
    """Best-of-4 slope between the two chain lengths, in ms per step."""
    totals = {}
    for chain in CHAINS:
        fn = fn_for_chain(chain)
        out = consume(fn(*args))  # compile + warm
        assert np.isfinite(out).all()
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            consume(fn(*args))
            best = min(best, time.perf_counter() - t0)
        totals[chain] = best
    return (totals[CHAINS[1]] - totals[CHAINS[0]]) / (CHAINS[1] - CHAINS[0]) * 1e3


def main() -> None:
    import jax
    import jax.numpy as jnp

    from icet_tpu import ICETConfig
    from icet_tpu.datasets.loaders import detect_beam_count, to_beam_major
    from icet_tpu.solver import odometry_step_jit, prepare_reference, register

    scan1 = np.load("/root/reference/src/sample_data/frame_804.npy").astype(np.float32)
    scan2 = np.load("/root/reference/src/sample_data/frame_805.npy").astype(np.float32)
    nb = detect_beam_count(scan1) or 64
    c1 = jax.device_put(to_beam_major(scan1, nb))
    c2 = jax.device_put(to_beam_major(scan2, nb))
    x0 = jax.device_put(np.zeros(6, np.float32))
    jax.block_until_ready((c1, c2, x0))

    cfg = ICETConfig(n_iters=7)

    # --- headline: fused odometry step (register + next-frame prepare) ---
    def make_odo(chain):
        @jax.jit
        def g(s1, s2, x):
            model0 = prepare_reference(s1, cfg)
            parity = jnp.arange(chain) % 2

            def body(carry, p):
                model, xc = carry
                scan = jnp.where(p == 0, s2, s1)
                res, next_model = odometry_step_jit(model, scan, xc, cfg)
                return (next_model, res.X), None

            (_, xf), _ = jax.lax.scan(body, (model0, x), parity)
            return xf

        return g

    odo_ms = _slope_ms(make_odo, (c1, c2, x0), np.asarray)

    # --- secondary: register-only (voxel model amortised) ---
    def make_reg(chain):
        @jax.jit
        def g(s1, s2, x):
            model = prepare_reference(s1, cfg)

            def body(xc, _):
                return register(model, s2, xc, cfg).X, None

            xf, _ = jax.lax.scan(body, x, None, length=chain)
            return xf

        return g

    reg_ms = _slope_ms(make_reg, (c1, c2, x0), np.asarray)

    out = {
        "metric": "odometry_frame_ms",
        "value": round(odo_ms, 4),
        "unit": "ms/frame device time (75x24 voxels, 7 iters, 65536-pt scans,"
        " register + next-frame prepare, 1 chip)",
        "vs_baseline": round(REFERENCE_MS / odo_ms, 1),
        "register_only_ms": round(reg_ms, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
