"""Deterministic scan replay source (reference src/fake_lidar.py).

The reference's fake_lidar node republishes dataset frames at wall-clock
10 Hz over ROS, indexing frames by elapsed time and looping at the sequence
end (fake_lidar.py:85-196).  This host-side source reproduces that contract
without ROS: an iterator of fixed-shape clouds, optionally rate-limited and
looping, from files or a synthetic trajectory.
"""

from __future__ import annotations

import glob
import os
import time
from typing import Iterator

import numpy as np

from icet_tpu.datasets.loaders import DEFAULT_MAX_POINTS, load_cloud
from icet_tpu.datasets.synthetic import Scene, simulate_scan


class ReplaySource:
    """Replay a directory/glob of cloud files in sorted order.

    Args:
      pattern: glob for cloud files (npy/bin/csv/ply).
      rate_hz: if set, sleep to pace frames at this rate (the reference's
        10 Hz publisher, fake_lidar.py:80); None = as fast as possible.
      loop: restart at the sequence end (fake_lidar.py:191-196).
    """

    def __init__(
        self,
        pattern: str,
        rate_hz: float | None = None,
        loop: bool = False,
        max_points: int = DEFAULT_MAX_POINTS,
    ):
        if os.path.isdir(pattern):
            pattern = os.path.join(pattern, "*")
        self.paths = sorted(p for p in glob.glob(pattern) if os.path.isfile(p))
        if not self.paths:
            raise FileNotFoundError(f"no cloud files match {pattern}")
        self.rate_hz = rate_hz
        self.loop = loop
        self.max_points = max_points

    def __len__(self) -> int:
        return len(self.paths)

    def __iter__(self) -> Iterator[np.ndarray]:
        period = 1.0 / self.rate_hz if self.rate_hz else 0.0
        while True:
            for p in self.paths:
                t0 = time.perf_counter()
                yield load_cloud(p, self.max_points)
                if period:
                    dt = time.perf_counter() - t0
                    if dt < period:
                        time.sleep(period - dt)
            if not self.loop:
                return


class SyntheticTrajectorySource:
    """Raycast scans along a parametric trajectory with exact ground truth.

    Yields (scan, T_world) pairs where T_world is the sensor-to-world pose at
    that frame — the automated form of the reference's dormant
    ``true_transform`` plumbing (msg/Num.msg:5).
    """

    def __init__(
        self,
        n_frames: int = 20,
        speed: float = 0.8,
        yaw_rate: float = 0.01,
        scene: Scene | None = None,
        seed: int = 0,
        n_beams: int = 64,
        n_azimuth: int = 1024,
    ):
        self.n_frames = n_frames
        self.speed = speed
        self.yaw_rate = yaw_rate
        self.scene = scene or Scene()
        self.seed = seed
        self.n_beams = n_beams
        self.n_azimuth = n_azimuth

    def pose(self, i: int):
        yaw = self.yaw_rate * i
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        t = np.array(
            [self.speed * i * np.cos(yaw / 2), self.speed * i * np.sin(yaw / 2), 0.0]
        )
        return R, t

    def __iter__(self):
        for i in range(self.n_frames):
            R, t = self.pose(i)
            scan = simulate_scan(
                pose_t=t,
                pose_R=R,
                scene=self.scene,
                seed=self.seed + i,
                n_beams=self.n_beams,
                n_azimuth=self.n_azimuth,
            )
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = t
            yield scan, T
