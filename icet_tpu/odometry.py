"""Frame-to-frame odometry driver (reference src/odometry.cpp:22-212).

Host-side loop around the jitted solver: per incoming scan it registers
against the previous scan with a warm-started initial guess, guards against
divergence, accumulates the world pose, and emits a structured per-frame
record (the reference publishes a ROS ``nav_msgs/Odometry`` with
``pred_stds`` on the covariance diagonal; we return/stream the same content
as plain data).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from icet_tpu.config import ICETConfig, OdometryConfig
from icet_tpu.ops.geometry import (
    compose_pose,
    compose_states,
    pose_to_state,
    relative_state,
)
from icet_tpu.solver import odometry_step_jit, prepare_reference_jit


def warm_start_seed(
    x_prev: jax.Array, x_prev2: jax.Array, mode: str
) -> jax.Array:
    """Initial-guess construction for the next frame's solve.

    ``"previous"``: the previous solution verbatim (reference
    odometry.cpp:82).  ``"extrapolate"``: constant-acceleration prediction
    ``D_k ∘ (D_{k-1}⁻¹ ∘ D_k)`` from the last two frame deltas — exact
    composition, not the small-angle ``2·D_k − D_{k-1}`` linearisation.
    """
    if mode == "previous":
        return x_prev
    if mode == "extrapolate":
        return compose_states(x_prev, relative_state(x_prev2, x_prev))
    raise ValueError(f"unknown warm_start_mode {mode!r}")


@dataclasses.dataclass
class OdometryFrame:
    """Per-frame odometry output (analog of the reference's /odom message +
    console prints, odometry.cpp:102-165)."""

    index: int
    #: frame-to-frame solution [t, angs]
    X: np.ndarray
    #: predicted per-component solution std (pose covariance diagonal in the
    #: reference's odometry message, odometry.cpp:122-131)
    pred_stds: np.ndarray
    #: accumulated 4x4 world pose (map -> sensor)
    T_world: np.ndarray
    #: world pose as a 6-DOF state
    pose: np.ndarray
    #: twist estimate assuming cfg.sensor_hz (odometry.cpp:134-140)
    twist: np.ndarray
    #: True if the divergence guard zeroed this frame's solution
    diverged: bool
    #: solver iterations' correspondence counts
    n_corr: np.ndarray
    #: wall-clock solve time (ms)
    solve_ms: float


class OdometryPipeline:
    """Streaming odometry over an iterable of scans.

    Usage::

        pipe = OdometryPipeline(cfg, odo_cfg)
        for frame in pipe.run(scans):
            ...

    Scans must share one static (N, 3) shape (pad with zero points; the range
    gate masks them).  The previous scan's voxel model is reused as the next
    registration's reference, so each frame costs one prepare + one register.
    """

    def __init__(
        self,
        cfg: ICETConfig | None = None,
        odo_cfg: OdometryConfig | None = None,
    ):
        self.cfg = cfg or ICETConfig()
        self.odo_cfg = odo_cfg or OdometryConfig()
        # cfg.dnn_filter engages the perspective-shift rejection inside
        # every registration (reference DNN_filter ctor flag); the bundled
        # pretrained bias net loads once here.
        self._dnn = None
        if self.cfg.dnn_filter:
            from icet_tpu.filters import pretrained_dnn

            self._dnn = pretrained_dnn(self.cfg)
        self.reset()

    def reset(self) -> None:
        self._model = None
        self._scan_prev = None
        self._samples_prev = None
        self._X_prev = jnp.zeros(6, jnp.float32)
        self._X_prev2 = jnp.zeros(6, jnp.float32)
        self._T_world = jnp.eye(4, dtype=jnp.float32)
        self._index = 0
        # Host-side mirrors for device-loss recovery: the tiny pose state
        # plus a reference to the last ingested scan (the voxel model is a
        # pure function of it, so recovery refits instead of mirroring the
        # whole model).
        self._last_scan: np.ndarray | None = None
        self._X_host = np.zeros(6, np.float32)
        self._T_host = np.eye(4, dtype=np.float32)
        self.recoveries = 0

    def step(self, scan: np.ndarray) -> OdometryFrame | None:
        """Feed one scan; returns None for the very first frame.

        Survives device loss mid-stream: on a failed dispatch the pipeline
        probes for healthy devices, re-uploads the (host-mirrored) pose
        state, refits the voxel model from the retained previous scan —
        bit-identical to the lost one — and retries the frame once.
        """
        scan = np.asarray(scan, np.float32)
        try:
            frame = self._step_device(scan)
        except (TypeError, ValueError):
            # Deterministic tracing/shape/user errors: a retry raises the
            # same thing after a pointless (up to 60 s) device probe —
            # surface the original exception immediately.
            raise
        except Exception:
            self._recover()
            frame = self._step_device(scan)
        # Recovery mirrors update only AFTER the frame fully completed (all
        # host transfers included) — updating them inside _step_device would
        # let a failure during the result transfers refit the reference
        # model from the scan being retried (registering it against itself).
        self._last_scan = scan
        if frame is not None:
            self._X_host = frame.X
            self._T_host = frame.T_world
        return frame

    def _recover(self) -> None:
        from icet_tpu.parallel.elastic import probe_devices

        healthy = probe_devices()
        if not healthy:
            raise RuntimeError("no healthy devices remain")
        dev = healthy[0]
        self.recoveries += 1
        self._X_prev = jax.device_put(self._X_host, dev)
        self._X_prev2 = self._X_prev  # re-lock: no velocity history
        self._T_world = jax.device_put(self._T_host, dev)
        if self._last_scan is not None:
            scan_dev = jax.device_put(self._last_scan, dev)
            self._model = prepare_reference_jit(scan_dev, self.cfg)
            if self._dnn is not None:
                from icet_tpu.filters import model_voxel_samples_jit

                self._scan_prev = scan_dev
                self._samples_prev = model_voxel_samples_jit(
                    self._model, scan_dev, self.cfg
                )
        else:
            self._model = None
            self._scan_prev = None
            self._samples_prev = None

    def _step_device(self, scan: np.ndarray) -> OdometryFrame | None:
        t0 = time.perf_counter()
        scan_dev = jnp.asarray(scan, jnp.float32)
        if self._model is None:
            self._model = prepare_reference_jit(scan_dev, self.cfg)
            if self._dnn is not None:
                from icet_tpu.filters import model_voxel_samples_jit

                self._scan_prev = scan_dev
                self._samples_prev = model_voxel_samples_jit(
                    self._model, scan_dev, self.cfg
                )
            self._index += 1
            return None

        x0 = (
            warm_start_seed(
                self._X_prev, self._X_prev2, self.odo_cfg.warm_start_mode
            )
            if self.odo_cfg.warm_start
            else jnp.zeros(6, jnp.float32)
        )
        # Fused register + next-frame prepare: one dispatch per frame.
        if self._dnn is not None:
            from icet_tpu.filters import odometry_step_dnn_jit

            net, params = self._dnn
            res, next_model, next_samples = odometry_step_dnn_jit(
                self._model, self._scan_prev, self._samples_prev, scan_dev,
                x0, self.cfg, net, params,
            )
            self._scan_prev = scan_dev
            self._samples_prev = next_samples
        else:
            res, next_model = odometry_step_jit(
                self._model, scan_dev, x0, self.cfg
            )
        X = res.X

        # Divergence guard (reference simpleMapMaker.cpp:129-137): a solution
        # component beyond the clamp means the solve ran away; fall back to
        # the identity (skip) transform for this frame.
        diverged = bool(jnp.any(jnp.abs(X) > self.odo_cfg.divergence_clamp))
        if diverged:
            X = jnp.zeros(6, jnp.float32)

        self._T_world = compose_pose(self._T_world, X)
        # After a diverged (zeroed) frame, collapse the velocity history so
        # an "extrapolate" warm start re-locks from the zero seed instead of
        # predicting a deceleration from the discarded solution.
        self._X_prev2 = self._X_prev if not diverged else X
        self._X_prev = X
        # Next frame registers against this scan's (already fitted) model.
        self._model = next_model

        frame = OdometryFrame(
            index=self._index,
            X=np.asarray(X),
            pred_stds=np.asarray(res.pred_stds),
            T_world=np.asarray(self._T_world),
            pose=np.asarray(pose_to_state(self._T_world)),
            twist=np.asarray(X) * self.odo_cfg.sensor_hz,
            diverged=diverged,
            n_corr=np.asarray(res.diagnostics.n_corr),
            solve_ms=(time.perf_counter() - t0) * 1000.0,
        )
        self._index += 1
        return frame

    def run(self, scans: Iterable[np.ndarray]) -> Iterator[OdometryFrame]:
        for scan in scans:
            frame = self.step(scan)
            if frame is not None:
                yield frame

    @property
    def trajectory_pose(self) -> np.ndarray:
        return np.asarray(self._T_world)


def run_odometry(
    scans: Iterable[np.ndarray],
    cfg: ICETConfig | None = None,
    odo_cfg: OdometryConfig | None = None,
) -> list[OdometryFrame]:
    """Convenience wrapper: run the whole sequence, return all frames."""
    return list(OdometryPipeline(cfg, odo_cfg).run(scans))


# ---------------------------------------------------------------------------
# Device-chained sequence runner
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(4, 6, 7), donate_argnums=())
def odometry_sequence_jit(
    frames: jax.Array,
    model0,
    x0: jax.Array,
    T0: jax.Array,
    cfg: ICETConfig,
    divergence_clamp: float | jax.Array = 0.3,
    warm_start: bool = True,
    warm_start_mode: str = "previous",
):
    """Whole odometry SUB-SEQUENCE as one device program.

    ``OdometryPipeline.step`` pays one dispatch per frame — right for a
    live sensor, but on recorded sequences each dispatch costs host-link
    latency dwarfing the ~0.7 ms solve (this dev harness's tunnel: 30-150
    ms/dispatch; production PCIe: ~100 us).  This runner lax.scans the
    fused register+prepare step over a stacked ``(F, N, 3)`` frame block
    in ONE dispatch, with the pipeline's exact semantics: warm start from
    the previous (post-guard) solution, divergence guard zeroing the
    frame (reference simpleMapMaker.cpp:129-137), world-pose
    accumulation.

    Returns ``(carry, outs)`` where ``carry = (model, X_last, T_last)``
    feeds the next block (stream in bounded chunks; 65k-pt frames cost
    ~0.8 MB HBM each) and ``outs`` stacks per-frame
    ``(X, pred_stds, diverged, T_world)``.

    ``warm_start=False`` seeds every frame's solve from zeros instead of
    the carried previous solution (OdometryConfig.warm_start semantics);
    ``warm_start_mode="extrapolate"`` predicts from the last two deltas
    (the velocity history resets at each block boundary — the first frame
    of a block seeds from the previous solution verbatim).  The DNN
    perspective-shift filter is NOT supported by this runner (see
    :func:`run_odometry_device`).
    """
    clamp = jnp.asarray(divergence_clamp, jnp.float32)

    def body(carry, scan):
        model, xprev, xprev2, T = carry
        if warm_start:
            seed = warm_start_seed(xprev, xprev2, warm_start_mode)
        else:
            seed = jnp.zeros_like(xprev)
        res, next_model = odometry_step_jit(model, scan, seed, cfg)
        diverged = jnp.any(jnp.abs(res.X) > clamp)
        X = jnp.where(diverged, jnp.zeros_like(res.X), res.X)
        T2 = compose_pose(T, X)
        # Post-divergence: collapse velocity history (see OdometryPipeline).
        xp2 = jnp.where(diverged, X, xprev)
        return (next_model, X, xp2, T2), (X, res.pred_stds, diverged, T2)

    (model, X, _xp2, T), outs = jax.lax.scan(
        body, (model0, x0, x0, T0), frames
    )
    return (model, X, T), outs


def run_odometry_device(
    scans: np.ndarray,
    cfg: ICETConfig | None = None,
    odo_cfg: OdometryConfig | None = None,
    block: int = 64,
) -> list[OdometryFrame]:
    """Run a recorded ``(F, N, 3)`` sequence through the device-chained
    runner in ``block``-frame dispatches; returns the same
    ``OdometryFrame`` records as ``OdometryPipeline`` (equivalence pinned
    by tests/test_odometry.py).

    Limits vs the host pipeline: ``cfg.dnn_filter`` is NOT supported here
    (raises — use :class:`OdometryPipeline`, whose DNN step carries the
    per-frame voxel-sample state this chained body does not);
    ``odo_cfg.warm_start=False`` is honored (zero seed every frame)."""
    cfg = cfg or ICETConfig()
    odo_cfg = odo_cfg or OdometryConfig()
    if cfg.dnn_filter:
        raise NotImplementedError(
            "run_odometry_device does not support cfg.dnn_filter; use "
            "OdometryPipeline (per-frame dispatches) for the DNN-filtered "
            "mode"
        )
    scans = np.asarray(scans, np.float32)
    model = prepare_reference_jit(jnp.asarray(scans[0]), cfg)
    x = jnp.zeros(6, jnp.float32)
    T = jnp.eye(4, dtype=jnp.float32)
    frames: list[OdometryFrame] = []
    for s in range(1, scans.shape[0], block):
        blk = jnp.asarray(scans[s : s + block])
        (model, x, T), (X, stds, div, Tw) = odometry_sequence_jit(
            blk, model, x, T, cfg, odo_cfg.divergence_clamp,
            odo_cfg.warm_start, odo_cfg.warm_start_mode,
        )
        X, stds, div, Tw = (np.asarray(v) for v in (X, stds, div, Tw))
        for j in range(X.shape[0]):
            frames.append(
                OdometryFrame(
                    index=s + j,
                    X=X[j],
                    pred_stds=stds[j],
                    T_world=Tw[j],
                    pose=np.asarray(pose_to_state(jnp.asarray(Tw[j]))),
                    twist=X[j] * odo_cfg.sensor_hz,
                    diverged=bool(div[j]),
                    n_corr=np.zeros(0, np.int32),
                    solve_ms=0.0,
                )
            )
    return frames
