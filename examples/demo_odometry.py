"""Odometry + pose-graph demo on a synthetic trajectory with ground truth.

Runs the streaming odometry pipeline over a simulated drive, refines the
trajectory with loop-closure pose-graph optimization, and reports ATE before
and after.

Usage: python examples/demo_odometry.py [--frames 15] [--viz out_dir]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--viz", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from icet_tpu.config import ICETConfig
    from icet_tpu.datasets.replay import SyntheticTrajectorySource
    from icet_tpu.odometry import OdometryPipeline
    from icet_tpu.pose_graph import graph_from_odometry, optimize_poses, states_to_poses
    from icet_tpu.utils.metrics import ate_rmse

    cfg = ICETConfig(
        n_theta=48, n_phi=16, phi_min=np.pi / 3, phi_max=2 * np.pi / 3,
        n_iters=6, min_pts=20, min_range=1.0,
    )
    src = SyntheticTrajectorySource(
        n_frames=args.frames, speed=0.25, yaw_rate=0.01, n_beams=48, n_azimuth=512
    )
    frames_gt = list(src)
    pipe = OdometryPipeline(cfg)
    frames = list(pipe.run(s for s, _ in frames_gt))

    est = [np.eye(4)] + [f.T_world for f in frames]
    ref = [np.linalg.inv(frames_gt[0][1]) @ T for _, T in frames_gt]
    print(f"frames: {len(frames)};  mean solve {np.mean([f.solve_ms for f in frames]):.1f} ms")
    print(f"odometry ATE RMSE: {ate_rmse(est, ref) * 100:.2f} cm")

    states0, graph = graph_from_odometry(frames)
    states = optimize_poses(jnp.asarray(states0), graph, 8)
    refined = list(states_to_poses(states))
    print(f"pose-graph ATE RMSE: {ate_rmse(refined, ref) * 100:.2f} cm")

    if args.viz:
        from icet_tpu import viz

        os.makedirs(args.viz, exist_ok=True)
        viz.plot_trajectory(
            os.path.join(args.viz, "trajectory.png"), est, ref
        )
        print(f"wrote {args.viz}/trajectory.png")


if __name__ == "__main__":
    main()
