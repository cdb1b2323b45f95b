"""Scaling benchmark: batched registration throughput vs mesh size.

Measures frames/sec of the sharded batched registration at several (dp, sp)
mesh shapes on whatever devices exist (the single real chip here; a CPU
virtual mesh demonstrates the collective path).  Prints one JSON line per
shape plus a summary scaling efficiency (BASELINE.md target: >= 0.8 at 2+
workers).

Run with a virtual mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python bench_scaling.py --cpu
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--beams", type=int, default=32)
    ap.add_argument("--azimuth", type=int, default=512)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from icet_tpu.config import ICETConfig
    from icet_tpu.datasets.synthetic import scan_pair_with_ground_truth
    from icet_tpu.parallel.sharding import (
        make_sharded_register,
        registration_mesh,
        shard_scan_batch,
    )

    n_dev = len(jax.devices())
    cfg = ICETConfig(
        n_theta=48, n_phi=16, phi_min=np.pi / 3, phi_max=2 * np.pi / 3,
        n_iters=6, min_pts=20, min_range=1.0,
    )
    X = np.array([0.3, 0.1, 0.0, 0.0, 0.0, 0.01], np.float32)
    pairs = [
        scan_pair_with_ground_truth(
            X, seed=i, n_beams=args.beams, n_azimuth=args.azimuth
        )
        for i in range(args.batch)
    ]
    scans1 = np.stack([p[0] for p in pairs])
    scans2 = np.stack([p[1] for p in pairs])
    x0 = np.zeros((args.batch, 6), np.float32)

    shapes = []
    s = 1
    while s <= n_dev:
        shapes.append((1, s))
        s *= 2
    base_fps = None
    for dp, sp in shapes:
        mesh = registration_mesh(dp=dp, sp=sp, devices=jax.devices()[: dp * sp])
        step = make_sharded_register(cfg, mesh)
        n = scans1.shape[1]
        pad = (-n) % sp
        if pad:
            z = np.zeros((args.batch, pad, 3), np.float32)
            a1 = np.concatenate([scans1, z], 1)
            a2 = np.concatenate([scans2, z], 1)
        else:
            a1, a2 = scans1, scans2
        sargs = shard_scan_batch(a1, a2, x0, mesh)
        res = step(*sargs)
        jax.block_until_ready(res)
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            res = step(*sargs)
        jax.block_until_ready(res)
        dt = (time.perf_counter() - t0) / reps
        fps = args.batch / dt
        if base_fps is None:
            base_fps = fps
        eff = fps / (base_fps * sp)
        rec = {
            "metric": "sharded_registration_fps",
            "mesh": f"{dp}dp x {sp}sp",
            "value": round(fps, 1),
            "unit": "frames/s",
            "scaling_efficiency_vs_1dev": round(eff, 3),
        }
        if jax.default_backend() == "cpu":
            # Virtual CPU devices share the same physical cores: sharding
            # adds collective overhead with no extra compute, so efficiency
            # here validates CORRECTNESS of the collective path only, not
            # ICI scaling (needs a real multi-chip slice).
            rec["note"] = "virtual-device mesh; efficiency not meaningful"
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
