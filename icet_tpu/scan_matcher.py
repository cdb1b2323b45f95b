"""Frame-to-frame scan matcher (reference src/scanMatcher.cpp:14-147).

The reference's ScanRegistrationNode (never wired into its build,
CMakeLists.txt:68-91) aligns each incoming scan to the previous one and
republishes the ALIGNED cloud plus a snail trail, wrapping the solver in
try/catch and warning on empty clouds.  This is that capability as a
host-side streaming class: per scan it returns the aligned points, the
relative transform, and a status instead of silently swallowing failures
(scanMatcher.cpp:98-104).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from icet_tpu.config import ICETConfig
from icet_tpu.ops.geometry import transform_points
from icet_tpu.solver import prepare_reference_jit, register_jit


@dataclasses.dataclass
class MatchResult:
    index: int
    #: "ok" | "first_frame" | "empty_cloud" | "diverged"
    status: str
    X: np.ndarray
    pred_stds: np.ndarray
    aligned: np.ndarray | None
    #: sensor positions of all past frames in the current frame
    trail: np.ndarray


class ScanMatcher:
    def __init__(
        self,
        cfg: ICETConfig | None = None,
        min_points: int = 500,
        divergence_clamp: float = 1.0,
    ):
        self.cfg = cfg or ICETConfig()
        self.min_points = min_points
        self.divergence_clamp = divergence_clamp
        self._model = None
        self._index = 0
        self._trail = [np.zeros(3, np.float32)]

    def _result(self, status, X=None, stds=None, aligned=None):
        r = MatchResult(
            index=self._index,
            status=status,
            X=np.zeros(6, np.float32) if X is None else np.asarray(X),
            pred_stds=np.zeros(6, np.float32) if stds is None else np.asarray(stds),
            aligned=aligned,
            trail=np.stack(self._trail),
        )
        self._index += 1
        return r

    def step(self, scan: np.ndarray) -> MatchResult:
        scan = np.asarray(scan, np.float32)
        n_valid = int((np.linalg.norm(scan, axis=1) > self.cfg.min_range).sum())
        if n_valid < self.min_points:
            # Empty/degenerate input (reference ROS_WARN, scanMatcher.cpp:40-50).
            return self._result("empty_cloud")

        scan_dev = jnp.asarray(scan)
        if self._model is None:
            self._model = prepare_reference_jit(scan_dev, self.cfg)
            return self._result("first_frame", aligned=scan)

        res = register_jit(self._model, scan_dev, jnp.zeros(6, jnp.float32), self.cfg)
        X = np.asarray(res.X)
        if not np.isfinite(X).all() or np.abs(X).max() > self.divergence_clamp:
            # The reference catches solver exceptions and republishes the raw
            # cloud (scanMatcher.cpp:98-104); we also surface the status.
            self._model = prepare_reference_jit(scan_dev, self.cfg)
            return self._result("diverged", aligned=scan)

        aligned = np.asarray(transform_points(scan_dev, res.X))
        # Move the trail into the current frame: previous positions p become
        # the relative offset accumulated through X.
        from icet_tpu.ops.geometry import euler_R

        rot = np.asarray(euler_R(-res.X[3:6]))
        self._trail = [(p - X[:3]) @ rot for p in self._trail]
        self._trail.append(np.zeros(3, np.float32))
        self._model = prepare_reference_jit(scan_dev, self.cfg)
        return self._result("ok", X, res.pred_stds, aligned)
