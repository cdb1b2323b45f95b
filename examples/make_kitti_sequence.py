"""Write a synthetic KITTI-odometry-format sequence to disk.

Generates the raycast city drive (exact ground truth, optional moving
cars / dropout / range bias) and writes it in the real benchmark layout —
``<out>/velodyne/%06d.bin`` (float32 x,y,z,reflectance records) +
``<out>/poses.txt`` — so the full cold-storage pipeline can be exercised
without real KITTI data (which the reference evaluates on,
/root/reference/README.md:67-110, but does not ship either):

    python examples/make_kitti_sequence.py --out /tmp/kitti_seq --frames 50
    python examples/eval_kitti.py --sequence /tmp/kitti_seq \
        --poses /tmp/kitti_seq/poses.txt --cpu --out /tmp/kitti_seq/traj

The second command streams the .bin files through the native C prefetch
loader, runs odometry, and writes TUM trajectories + an ATE/RPE table.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="sequence directory to write")
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--speed", type=float, default=1.0, help="metres/frame")
    ap.add_argument("--beams", type=int, default=64)
    ap.add_argument("--azimuth", type=int, default=1024)
    ap.add_argument("--moving-cars", type=int, default=0)
    ap.add_argument("--dropout", type=float, default=0.0)
    ap.add_argument("--range-bias-std", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from icet_tpu.datasets.kitti import write_kitti_sequence
    from icet_tpu.datasets.replay import CityDriveSource

    src = CityDriveSource(
        n_frames=args.frames, speed=args.speed, n_beams=args.beams,
        n_azimuth=args.azimuth, seed=args.seed,
        moving_cars=args.moving_cars, dropout_frac=args.dropout,
        range_bias_std=args.range_bias_std,
    )
    scans, poses = [], []
    for scan, T in src:
        scans.append(np.asarray(scan, np.float32))
        poses.append(np.asarray(T))
    d = write_kitti_sequence(args.out, scans, poses)
    n_bytes = sum(
        os.path.getsize(os.path.join(d, "velodyne", f))
        for f in os.listdir(os.path.join(d, "velodyne"))
    )
    print(f"wrote {len(scans)} frames ({n_bytes / 1e6:.1f} MB) to {d}")
    print(f"score it:\n  python examples/eval_kitti.py --sequence {d} "
          f"--poses {os.path.join(d, 'poses.txt')} --cpu "
          f"--out {os.path.join(d, 'traj')}")


if __name__ == "__main__":
    main()
