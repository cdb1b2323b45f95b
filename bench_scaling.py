"""Scaling benchmark: batched registration throughput vs mesh size.

Measures frames/sec of the sharded batched registration at several (dp, sp)
mesh shapes on whatever devices exist (the single real chip here; a CPU
virtual mesh demonstrates the collective path).  Prints one JSON line per
shape plus a summary scaling efficiency (BASELINE.md target: >= 0.8 at 2+
workers).

Run with a virtual mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python bench_scaling.py --cpu

Multi-host (multi-controller) mode — spawns N processes x 4 virtual CPU
devices wired via jax.distributed, measures the host-sharded batch:
  python bench_scaling.py --distributed 2
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np


def _distributed_main(n_proc: int, args) -> None:
    """Parent: spawn one worker per simulated host and relay their output."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {**os.environ, "PYTHONPATH": os.path.dirname(os.path.abspath(__file__))}
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--cpu",
             "--batch", str(args.batch), "--beams", str(args.beams),
             "--azimuth", str(args.azimuth),
             "--_worker", f"{i}:{n_proc}:{port}"],
            env=env,
        )
        for i in range(n_proc)
    ]
    rcs = [p.wait(timeout=600) for p in procs]
    if any(rcs):
        raise SystemExit(f"distributed workers failed: {rcs}")


def _worker_main(spec: str, args) -> None:
    pid, n_proc, port = (int(x) for x in spec.split(":"))
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from icet_tpu.config import ICETConfig
    from icet_tpu.datasets.synthetic import scan_pair_with_ground_truth
    from icet_tpu.parallel.distributed import (
        global_registration_mesh,
        init_distributed,
        local_numpy,
        run_distributed_registration,
    )

    init_distributed(f"localhost:{port}", num_processes=n_proc, process_id=pid)
    cfg = ICETConfig(
        n_theta=48, n_phi=16, phi_min=np.pi / 3, phi_max=2 * np.pi / 3,
        n_iters=6, min_pts=20, min_range=1.0,
    )
    X = np.array([0.3, 0.1, 0.0, 0.0, 0.0, 0.01], np.float32)
    pairs = [
        scan_pair_with_ground_truth(
            X, seed=100 * pid + i, n_beams=args.beams, n_azimuth=args.azimuth
        )
        for i in range(args.batch)
    ]
    s1 = np.stack([p[0] for p in pairs])
    s2 = np.stack([p[1] for p in pairs])
    n = s1.shape[1]
    mesh = global_registration_mesh()
    sp = mesh.shape["sp"]
    pad = (-n) % sp
    if pad:
        z = np.zeros((args.batch, pad, 3), np.float32)
        s1 = np.concatenate([s1, z], 1)
        s2 = np.concatenate([s2, z], 1)
    x0 = np.zeros((args.batch, 6), np.float32)

    res, _ = run_distributed_registration(s1, s2, x0, cfg, mesh)
    jax.block_until_ready(res.X)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        res, _ = run_distributed_registration(s1, s2, x0, cfg, mesh)
        jax.block_until_ready(res.X)
    dt = (time.perf_counter() - t0) / reps
    err = float(np.abs(local_numpy(res.X) - X).max())
    if pid == 0:
        print(json.dumps({
            "metric": "distributed_registration_fps",
            "mesh": f"{mesh.shape['dp']}hosts x {sp}sp",
            "value": round(args.batch * n_proc / dt, 1),
            "unit": "frames/s (global batch, multi-controller)",
            "max_abs_err": round(err, 4),
            "note": "virtual-device CPU cluster; validates the DCN path",
        }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--beams", type=int, default=48)
    ap.add_argument("--azimuth", type=int, default=512)
    ap.add_argument("--distributed", type=int, default=0, metavar="N_PROC",
                    help="run as an N-process multi-controller cluster")
    ap.add_argument("--_worker", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args._worker is not None:
        _worker_main(args._worker, args)
        return
    if args.distributed:
        _distributed_main(args.distributed, args)
        return

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
