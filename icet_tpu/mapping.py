"""HD-map accumulation engine (reference src/simpleMapMaker.cpp).

The reference keeps a fixed 600k-point FIFO ring (``EigenQueue``,
simpleMapMaker.cpp:18-58) on the host, re-expressing the whole map in the
newest sensor frame after every scan and inserting a random 2000-point
downsample of the scan.  Here the map lives in DEVICE memory as a
fixed-capacity ring with a validity mask; the re-expression, downsample and
ring insert are one jitted program per frame (static shapes, one dispatch).

The reference's downsampler indexes ``downsampleSize`` rows even when the
scan has fewer (out-of-bounds read, simpleMapMaker.cpp:156-159); here the
sampler draws only valid points and marks short-fall slots invalid.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from icet_tpu.config import ICETConfig, MapConfig, OdometryConfig
from icet_tpu.ops.geometry import euler_R
from icet_tpu.solver import prepare_reference_jit

_HI = jax.lax.Precision.HIGHEST


class MapState(NamedTuple):
    points: jax.Array  # (capacity, 3), expressed in the NEWEST sensor frame
    valid: jax.Array  # (capacity,) bool
    write_ptr: jax.Array  # () int32 ring cursor
    trail: jax.Array  # (trail_capacity, 3) past sensor origins, newest frame
    trail_len: jax.Array  # () int32


def init_map(map_cfg: MapConfig, trail_capacity: int = 4096) -> MapState:
    return MapState(
        points=jnp.zeros((map_cfg.capacity, 3), jnp.float32),
        valid=jnp.zeros((map_cfg.capacity,), bool),
        write_ptr=jnp.zeros((), jnp.int32),
        trail=jnp.zeros((trail_capacity, 3), jnp.float32),
        trail_len=jnp.zeros((), jnp.int32),
    )


def _map_update_impl(
    state: MapState,
    scan: jax.Array,
    X: jax.Array,
    key: jax.Array,
    map_cfg: MapConfig,
    min_range: float = 0.2,
) -> MapState:
    """Advance the map by one registered scan.

    ``X`` is the frame-to-frame solution mapping the new scan's frame to the
    previous frame (``p_prev = R(-angs) p_new + t``).  The stored map (held in
    the previous frame) is re-expressed in the new frame via the inverse
    transform, matching reference EigenQueue::add_new_scan
    (simpleMapMaker.cpp:34-41): ``p_new = R^T (p_prev - t)``.
    """
    rot = euler_R(-X[3:6])  # p_prev = rot @ p_new + t
    # Re-express stored points and trail in the new frame.
    pts = jnp.matmul(state.points - X[:3], rot, precision=_HI)
    trail = jnp.matmul(state.trail - X[:3], rot, precision=_HI)

    # Random downsample of the (already new-frame) scan to points_per_scan.
    r2 = jnp.sum(scan * scan, axis=-1)
    ok = r2 > (min_range * min_range)
    # Random keys; invalid points pushed past every valid one.
    order = jnp.argsort(
        jax.random.uniform(key, (scan.shape[0],)) + (~ok) * 2.0
    )
    take = order[: map_cfg.points_per_scan]
    new_pts = scan[take]
    new_ok = ok[take]

    # Ring insert with wraparound.
    idx = (
        state.write_ptr + jnp.arange(map_cfg.points_per_scan, dtype=jnp.int32)
    ) % map_cfg.capacity
    pts = pts.at[idx].set(new_pts)
    valid = state.valid.at[idx].set(new_ok)
    write_ptr = (state.write_ptr + map_cfg.points_per_scan) % map_cfg.capacity

    # Snail trail (reference /snail_trail_topic, simpleMapMaker.cpp:212-230):
    # append the new sensor origin (0 in its own frame), dropping the oldest
    # when full.
    cap = state.trail.shape[0]
    shift = jnp.where(state.trail_len >= cap, 1, 0)
    trail = jnp.roll(trail, -shift, axis=0)
    slot = jnp.minimum(state.trail_len, cap - 1)
    trail = trail.at[slot].set(jnp.zeros(3, jnp.float32))
    trail_len = jnp.minimum(state.trail_len + 1, cap)

    return MapState(
        points=pts, valid=valid, write_ptr=write_ptr, trail=trail,
        trail_len=trail_len,
    )


@functools.partial(jax.jit, static_argnums=(4, 5), donate_argnums=(0,))
def map_update(
    state: MapState,
    scan: jax.Array,
    X: jax.Array,
    key: jax.Array,
    map_cfg: MapConfig,
    min_range: float = 0.2,
) -> MapState:
    """Jitted standalone map advance.  ``state`` is DONATED: its device
    buffers are reused in place (the 600k x 3 ring would otherwise be copied
    every frame).  Do not read the old state after calling; rebind as
    ``state = map_update(state, ...)``."""
    return _map_update_impl(state, scan, X, key, map_cfg, min_range)


@functools.partial(jax.jit, static_argnums=(5, 6), donate_argnums=(1,))
def map_step_jit(
    model,
    state: MapState,
    scan: jax.Array,
    key: jax.Array,
    divergence_clamp: jax.Array,
    cfg: ICETConfig,
    map_cfg: MapConfig,
):
    """Fused mapping step: ONE device dispatch per mapped frame.

    Registers the scan against the previous frame's voxel model, applies the
    divergence guard (any ``|X_i| > clamp`` zeroes the solution,
    simpleMapMaker.cpp:129-137) as a masked select inside jit, folds the scan
    into the donated ring map, and fits the scan's own voxel model for the
    next frame — replacing the register + map_update + prepare trio (three
    dispatches; at 30-150 ms tunnel latency per dispatch that dominated wall
    time).  Mirrors ``solver.odometry_step_jit``.

    Returns ``(res, X_guarded, diverged, new_state, new_model)``.
    """
    from icet_tpu.solver import prepare_reference, register

    res = register(
        model, scan, jnp.zeros(6, jnp.float32), cfg, want_static_mask=False
    )
    diverged = jnp.any(jnp.abs(res.X) > divergence_clamp)
    X = jnp.where(diverged, jnp.zeros(6, jnp.float32), res.X)
    new_state = _map_update_impl(state, scan, X, key, map_cfg, cfg.min_range)
    new_model = prepare_reference(scan, cfg)
    return res, X, diverged, new_state, new_model


@dataclasses.dataclass
class MapFrame:
    index: int
    X: np.ndarray
    pred_stds: np.ndarray
    diverged: bool
    n_map_points: int


class MapMaker:
    """Streaming map accumulator (reference MapMakerNode,
    simpleMapMaker.cpp:60-289): register each scan against the previous one,
    guard divergence, and fold the scan into the device-resident ring map."""

    def __init__(
        self,
        cfg: ICETConfig | None = None,
        map_cfg: MapConfig | None = None,
        odo_cfg: OdometryConfig | None = None,
        seed: int = 0,
        snapshot_every: int = 25,
    ):
        from icet_tpu.config import PROFILES

        self.cfg = cfg or PROFILES["mapping"]
        self.map_cfg = map_cfg or MapConfig()
        self.odo_cfg = odo_cfg or OdometryConfig()
        self._key = jax.random.PRNGKey(seed)
        self._model = None
        self._index = 0
        self.state = init_map(self.map_cfg)
        # Device-loss recovery: the ring map is snapshotted to the host every
        # ``snapshot_every`` frames (~8 MB at the default 600k capacity —
        # ~0.3 MB/frame amortised); the last scan and PRNG key mirror every
        # frame (the voxel model is refit from the scan).  Recovery restores
        # the newest snapshot, so at most ``snapshot_every`` frames of map
        # points are lost — trajectory continuity is preserved because the
        # next registration re-locks against the refit model.
        self.snapshot_every = max(int(snapshot_every), 1)
        self._last_scan: np.ndarray | None = None
        self._key_host = np.asarray(self._key)
        self._snapshot = None
        self.recoveries = 0

    def step(self, scan: np.ndarray) -> MapFrame | None:
        """Feed one scan; survives device loss (see __init__)."""
        scan = np.asarray(scan, np.float32)
        try:
            frame = self._step_device(scan)
        except (TypeError, ValueError):
            # Deterministic tracing/shape/user errors: recovery cannot help
            # and costs a 60 s probe — surface the original exception.
            raise
        except Exception:
            self._recover()
            frame = self._step_device(scan)
        self._last_scan = scan
        self._key_host = np.asarray(self._key)
        if self._index % self.snapshot_every == 0:
            self._snapshot = jax.tree_util.tree_map(np.asarray, self.state)
        return frame

    def _recover(self) -> None:
        from icet_tpu.parallel.elastic import probe_devices

        healthy = probe_devices()
        if not healthy:
            raise RuntimeError("no healthy devices remain")
        dev = healthy[0]
        self.recoveries += 1
        self._key = jax.device_put(self._key_host, dev)
        self.state = (
            jax.tree_util.tree_map(
                lambda a: jax.device_put(a, dev), self._snapshot
            )
            if self._snapshot is not None
            else init_map(self.map_cfg)
        )
        self._model = (
            prepare_reference_jit(
                jax.device_put(self._last_scan, dev), self.cfg
            )
            if self._last_scan is not None
            else None
        )

    def _step_device(self, scan: np.ndarray) -> MapFrame | None:
        scan_dev = jnp.asarray(scan, jnp.float32)
        if self._model is None:
            # First scan seeds the map directly with X = 0.
            self._model = prepare_reference_jit(scan_dev, self.cfg)
            self._key, sub = jax.random.split(self._key)
            self.state = map_update(
                self.state, scan_dev, jnp.zeros(6, jnp.float32), sub,
                self.map_cfg, self.cfg.min_range,
            )
            self._index += 1
            return None

        # The mapping node cold-starts every solve from X0 = 0
        # (simpleMapMaker.cpp:113-119).  One fused dispatch: register +
        # divergence guard + ring insert + next-frame prepare.
        self._key, sub = jax.random.split(self._key)
        res, X, diverged, self.state, self._model = map_step_jit(
            self._model, self.state, scan_dev, sub,
            jnp.float32(self.odo_cfg.divergence_clamp),
            self.cfg, self.map_cfg,
        )

        frame = MapFrame(
            index=self._index,
            X=np.asarray(X),
            pred_stds=np.asarray(res.pred_stds),
            diverged=bool(diverged),
            n_map_points=int(np.asarray(self.state.valid).sum()),
        )
        self._index += 1
        return frame

    def map_points(self) -> np.ndarray:
        """Export the current map (newest sensor frame) as (M, 3) numpy."""
        pts = np.asarray(self.state.points)
        return pts[np.asarray(self.state.valid)]

    def snail_trail(self) -> np.ndarray:
        n = int(self.state.trail_len)
        return np.asarray(self.state.trail)[:n]
