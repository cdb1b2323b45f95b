"""HD-map accumulation demo (the reference's map_maker_node, headless).

Builds a device-resident ring map from a simulated drive and exports PNG +
PLY artifacts.

Usage: python examples/demo_mapping.py [--frames 10] [--out out_dir]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--out", default="/tmp/icet_map_demo")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from icet_tpu.config import ICETConfig, MapConfig
    from icet_tpu.datasets.replay import SyntheticTrajectorySource
    from icet_tpu.mapping import MapMaker
    from icet_tpu import viz

    cfg = ICETConfig(
        n_theta=48, n_phi=16, phi_min=np.pi / 3, phi_max=2 * np.pi / 3,
        n_iters=8, min_pts=20, min_range=1.0,
    )
    mm = MapMaker(cfg, MapConfig(capacity=100_000, points_per_scan=4_000))
    src = SyntheticTrajectorySource(
        n_frames=args.frames, speed=0.25, yaw_rate=0.015, n_beams=48,
        n_azimuth=512,
    )
    for scan, _ in src:
        f = mm.step(scan)
        if f:
            print(
                f"frame {f.index}: X={np.round(f.X, 3).tolist()} "
                f"map={f.n_map_points} pts diverged={f.diverged}"
            )

    os.makedirs(args.out, exist_ok=True)
    pts = mm.map_points()
    viz.plot_map(os.path.join(args.out, "hd_map.png"), pts, mm.snail_trail())
    viz.save_ply(os.path.join(args.out, "hd_map.ply"), pts)
    print(f"wrote {args.out}/hd_map.png and hd_map.ply ({len(pts)} pts)")


if __name__ == "__main__":
    main()
