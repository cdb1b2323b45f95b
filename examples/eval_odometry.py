"""Trajectory evaluation harness: KITTI-style sequences or synthetic.

With a directory of KITTI velodyne .bin (or .npy) scans and an optional
ground-truth poses file (KITTI odometry format: 12 numbers per line, the
3x4 world<-cam matrix — or TUM format), runs the odometry pipeline and
reports ATE/RPE.  Without data it falls back to the synthetic simulator so
the harness is always runnable.

Usage:
  python examples/eval_odometry.py --scans /path/to/velodyne --poses poses.txt
  python examples/eval_odometry.py --synthetic 25
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_kitti_poses(path):
    rows = np.loadtxt(path)
    out = []
    for r in rows:
        T = np.eye(4)
        T[:3, :4] = r.reshape(3, 4)
        out.append(T)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", default=None, help="dir of .bin/.npy scans")
    ap.add_argument("--poses", default=None, help="ground-truth poses file")
    ap.add_argument("--synthetic", type=int, default=0, help="n synthetic frames")
    ap.add_argument("--max-frames", type=int, default=200)
    ap.add_argument("--profile", default="odometry", choices=["odometry", "mapping"])
    ap.add_argument("--out", default=None, help="write TUM trajectory here")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--clamp", type=float, default=2.5,
        help="divergence clamp (m) on the per-frame solution; must admit "
             "the sequence's real per-frame motion (KITTI at 10 Hz moves "
             "1-3 m/frame — the reference's 0.3 default rejects it and "
             "zeroes every solve)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from icet_tpu.config import PROFILES, ICETConfig
    from icet_tpu.odometry import OdometryPipeline
    from icet_tpu.utils.metrics import ate_rmse, rpe, save_tum

    if args.scans:
        from icet_tpu.datasets.replay import ReplaySource

        src = ReplaySource(args.scans)
        scans = iter(src)
        gt = load_kitti_poses(args.poses) if args.poses else None
        cfg = PROFILES[args.profile]
        n_frames = min(len(src), args.max_frames)
    else:
        from icet_tpu.datasets.replay import SyntheticTrajectorySource

        n_frames = args.synthetic or 15
        pairs = list(
            SyntheticTrajectorySource(
                n_frames=n_frames, speed=0.25, yaw_rate=0.01,
                n_beams=48, n_azimuth=512,
            )
        )
        scans = (s for s, _ in pairs)
        gt = [T for _, T in pairs]
        cfg = ICETConfig(
            n_theta=48, n_phi=16, phi_min=np.pi / 3, phi_max=2 * np.pi / 3,
            n_iters=6, min_pts=20, min_range=1.0,
        )

    from icet_tpu.config import OdometryConfig

    pipe = OdometryPipeline(cfg, OdometryConfig(divergence_clamp=args.clamp))
    frames = []
    for i, scan in enumerate(scans):
        if i >= n_frames:
            break
        f = pipe.step(scan)
        if f is not None:
            frames.append(f)
            if f.index % 10 == 0:
                print(
                    f"frame {f.index}: |t|={np.linalg.norm(f.X[:3]):.3f} m "
                    f"solve={f.solve_ms:.1f} ms diverged={f.diverged}"
                )

    est = [np.eye(4)] + [f.T_world for f in frames]
    print(f"\nprocessed {len(frames)} registrations; "
          f"mean solve {np.mean([f.solve_ms for f in frames]):.1f} ms")

    if gt is not None:
        ref = [np.linalg.inv(gt[0]) @ T for T in gt[: len(est)]]
        print(f"ATE RMSE: {ate_rmse(est, ref) * 100:.2f} cm")
        t_err, r_err = rpe(est, ref)
        print(f"RPE: {t_err.mean() * 100:.2f} cm / "
              f"{np.degrees(r_err.mean()):.3f} deg per frame")

    if args.out:
        save_tum(args.out, est)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
