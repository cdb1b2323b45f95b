"""Warm-start mode A/B: "previous" (reference odometry.cpp:82) vs
"extrapolate" (constant-acceleration prediction from the last two deltas).

Runs the bench city drive through the fused odometry step at the
production odometry profile (statistical early exit) in both modes and
reports mean executed GN iterations + trajectory ATE.  Executed
iterations are counted from the solver diagnostics: past the early exit
the while_loop repeats the last executed row, so count distinct
consecutive dx_norm values.

Usage: timeout 1800 python tools/eval_warmstart.py [--chip]
  (default runs on CPU — identical iteration counts, slower wall clock)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def executed_iters(dx_norm: np.ndarray) -> int:
    """#distinct consecutive rows (the early-exit repeats the last one)."""
    n = 1
    for i in range(1, len(dx_norm)):
        if dx_norm[i] != dx_norm[i - 1]:
            n += 1
    return n


def main():
    if "--chip" not in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from bench import _drive_frames
    from icet_tpu import ICETConfig
    from icet_tpu.datasets.replay import CityDriveSource
    from icet_tpu.odometry import warm_start_seed
    from icet_tpu.ops.geometry import compose_pose
    from icet_tpu.solver import odometry_step_jit, prepare_reference_jit
    from icet_tpu.utils.metrics import ate_rmse

    scans = _drive_frames()
    src = CityDriveSource(n_frames=scans.shape[0], speed=1.0, n_beams=64,
                          n_azimuth=1024)
    gt = np.stack([np.asarray(T) for _, T in src])

    cfg = ICETConfig(n_iters=7, convergence_tol=1e-4,
                     convergence_stat_scale=1.0)

    def run_modes(scans, gt, label):
        run_modes_impl(scans, gt, label, cfg)

    run_modes(scans, gt, "constant-v drive")

    # --- accelerating drive: speed ramps 0.2 -> 2.0 m/frame ----------------
    # pose()/simulate_scan accept fractional frame indices, so an
    # acceleration profile is just a cumulative virtual-index walk.
    from icet_tpu.datasets.synthetic import simulate_scan

    speeds = np.linspace(0.2, 2.0, scans.shape[0])
    j = np.concatenate([[0.0], np.cumsum(speeds[:-1])])  # virtual indices
    acc_scans, acc_gt = [], []
    for k, jk in enumerate(j):
        R, t = src.pose(float(jk))
        scan = simulate_scan(pose_t=t, pose_R=R, scene=src.scene,
                             seed=src.seed + k, n_beams=src.n_beams,
                             n_azimuth=src.n_azimuth,
                             range_noise=src.range_noise)
        T = np.eye(4)
        T[:3, :3], T[:3, 3] = R, t
        acc_scans.append(scan)
        acc_gt.append(T)
    run_modes(np.stack(acc_scans), np.stack(acc_gt), "accelerating drive")


def run_modes_impl(scans, gt, label, cfg):
    import jax.numpy as jnp

    from icet_tpu.odometry import warm_start_seed
    from icet_tpu.ops.geometry import compose_pose
    from icet_tpu.solver import odometry_step_jit, prepare_reference_jit
    from icet_tpu.utils.metrics import ate_rmse

    print(f"--- {label}")
    for mode in ("previous", "extrapolate"):
        model = prepare_reference_jit(jnp.asarray(scans[0]), cfg)
        xprev = jnp.zeros(6, jnp.float32)
        xprev2 = jnp.zeros(6, jnp.float32)
        T = jnp.eye(4, dtype=jnp.float32)
        iters, poses = [], []
        for s in scans[1:]:
            seed = warm_start_seed(xprev, xprev2, mode)
            res, model = odometry_step_jit(model, jnp.asarray(s), seed, cfg)
            iters.append(executed_iters(np.asarray(res.diagnostics.dx_norm)))
            T = compose_pose(T, res.X)
            poses.append(np.asarray(T))
            xprev2, xprev = xprev, res.X
        ate = ate_rmse(poses, list(gt[1:len(poses) + 1]))
        print(f"{mode:12s} mean iters {np.mean(iters):.3f}  "
              f"per-frame {iters}  ATE {ate * 100:.3f} cm", flush=True)


if __name__ == "__main__":
    main()
