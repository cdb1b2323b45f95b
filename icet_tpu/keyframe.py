"""Keyframe odometry + city-scale keyframe block map.

Two TPU-first redesigns of capabilities the reference caps at toy scale:

**Keyframe odometry.**  The reference registers every scan against the
immediately previous one (src/odometry.cpp:73-82), so (a) per-frame drift
compounds at the sensor rate and (b) every frame pays a full scan-1 fit.
Here each scan registers against a held KEYFRAME scan until the sensor moves
too far from it; within a keyframe window there is no drift compounding, and
the prepare stage is paid once per keyframe instead of once per frame.  The
per-frame DELTA (consecutive-frame step) is still derived and reported, so
downstream consumers (pose graph, twist) see the same contract as
:class:`~icet_tpu.odometry.OdometryPipeline`.

**Keyframe block map.**  The reference's map is a single 600k-point FIFO
ring re-expressed in the newest sensor frame after EVERY scan — O(map)
matmul per frame, one host, no growth path (simpleMapMaker.cpp:18-62).
Here the map is a ring of keyframe BLOCKS: each block's points are stored
once, in their keyframe's own frame, and only the 6-DOF block poses move
when the trajectory is refined (pose-graph feedback is a (B, 6) write, not a
point-cloud rewrite).  Map upkeep is O(points-per-scan) per frame, and the
block axis shards across a device mesh (`jax.sharding` NamedSharding) —
per-frame inserts touch one block, world-frame export is per-block
independent math, so a pod holds B x P points with no cross-device traffic
except at export.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from icet_tpu.config import BlockMapConfig, ICETConfig, KeyframeConfig
from icet_tpu.ops.geometry import (
    compose_states,
    relative_state,
    transform_points,
)
from icet_tpu.solver import RegistrationResult, VoxelModel, prepare_reference, register

_HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Host-side pose math (numpy mirrors of ops/geometry.py — the odometry loop
# must not issue tiny device dispatches for 4x4 bookkeeping: each dispatch
# costs 30-150 ms through the TPU tunnel).
# ---------------------------------------------------------------------------


def _np_euler_R(angs: np.ndarray) -> np.ndarray:
    """numpy twin of ops/geometry.euler_R (reference src/utils.cpp:144-152)."""
    phi, theta, psi = angs
    cf, sf = np.cos(phi), np.sin(phi)
    ct, st = np.cos(theta), np.sin(theta)
    cp, sp = np.cos(psi), np.sin(psi)
    return np.array(
        [
            [ct * cp, sp * cf + sf * st * cp, sf * sp - st * cf * cp],
            [-sp * ct, cf * cp - sf * st * sp, sf * cp + st * sp * cf],
            [st, -sf * ct, cf * ct],
        ]
    )


def np_pose_matrix(X: np.ndarray) -> np.ndarray:
    """numpy twin of ops/geometry.pose_matrix."""
    T = np.eye(4, dtype=np.float64)
    T[:3, :3] = _np_euler_R(-np.asarray(X[3:6], np.float64))
    T[:3, 3] = X[:3]
    return T


def np_pose_to_state(T: np.ndarray) -> np.ndarray:
    """numpy twin of ops/geometry.pose_to_state (same euler_from_R math)."""
    rot = T[:3, :3]
    r_sum = np.sqrt(
        (rot[0, 0] ** 2 + rot[1, 0] ** 2 + rot[2, 1] ** 2 + rot[2, 2] ** 2) / 2.0
    )
    phi = np.arctan2(-rot[2, 1], rot[2, 2])
    theta = np.arctan2(rot[2, 0], r_sum)
    psi = np.arctan2(-rot[1, 0], rot[0, 0])
    return np.concatenate([T[:3, 3], [-phi, -theta, -psi]])


# ---------------------------------------------------------------------------
# Keyframe block map
# ---------------------------------------------------------------------------


class BlockMap(NamedTuple):
    #: (B, P, 3) per-block points, in each block's OWN keyframe frame
    points: jax.Array
    #: (B, P) slot validity
    valid: jax.Array
    #: (B, 6) world pose state of each block's keyframe
    #: (``p_world = transform_points(p_local, poses[b])``)
    poses: jax.Array
    #: () int32, total keyframes spawned ever (slot = (n-1) % B; blocks older
    #: than B keyframes have been evicted ring-wise)
    n_blocks: jax.Array
    #: () int32, next free row in the active block
    cursor: jax.Array


def blockmap_init(bm_cfg: BlockMapConfig) -> BlockMap:
    B, P = bm_cfg.n_blocks, bm_cfg.block_capacity
    return BlockMap(
        points=jnp.zeros((B, P, 3), jnp.float32),
        valid=jnp.zeros((B, P), bool),
        poses=jnp.zeros((B, 6), jnp.float32),
        n_blocks=jnp.zeros((), jnp.int32),
        cursor=jnp.zeros((), jnp.int32),
    )


def _blockmap_spawn(bm: BlockMap, pose_state: jax.Array) -> BlockMap:
    """Open a new (empty) active block anchored at ``pose_state``."""
    B = bm.points.shape[0]
    nb = bm.n_blocks + 1
    slot = (nb - 1) % B
    return BlockMap(
        points=bm.points,
        valid=bm.valid.at[slot].set(False),
        poses=bm.poses.at[slot].set(pose_state.astype(bm.poses.dtype)),
        n_blocks=nb,
        cursor=jnp.zeros((), jnp.int32),
    )


def _blockmap_insert(
    bm: BlockMap,
    scan: jax.Array,
    X_rel: jax.Array,
    key: jax.Array,
    bm_cfg: BlockMapConfig,
    min_range: float,
    enabled=True,
) -> BlockMap:
    """Fold a range-gated random downsample of ``scan`` into the active block.

    ``X_rel`` maps the scan's sensor frame into the active keyframe's frame
    (the block-local frame).  Overflow past the block capacity is dropped
    (out-of-bounds scatter rows), mirroring the fixed-capacity semantics of
    the reference ring at block granularity.

    The downsample is STRATIFIED with per-stratum jitter (sample k of K
    comes from scan rows [kN/K, (k+1)N/K)) rather than the reference's
    uniform shuffle (simpleMapMaker.cpp:150-160): on a 65k scan the
    shuffle's full argsort costs ~0.26 ms/frame on the v5e — a third of
    the whole keyframe step — while the stratified draw is O(K).  On
    beam-major scans strata stripe across beams, so spatial coverage is
    at least as uniform; range-gated rows are write-masked (the map gets
    marginally fewer than K points on frames with dropouts instead of
    back-filling with extra valid rows).
    """
    B, P = bm.valid.shape
    n = scan.shape[0]
    K = bm_cfg.points_per_scan
    local = transform_points(scan, X_rel)

    r2 = jnp.sum(scan * scan, axis=-1)
    ok = r2 > (min_range * min_range)
    u = jax.random.uniform(key, (K,))
    take = jnp.floor(
        (jnp.arange(K, dtype=jnp.float32) + u) * (n / K)
    ).astype(jnp.int32)
    take = jnp.minimum(take, n - 1)
    new_pts = local[take]
    new_ok = ok[take]

    rows = bm.cursor + jnp.arange(bm_cfg.points_per_scan, dtype=jnp.int32)
    # No active block yet (n_blocks == 0) -> drop everything; ``enabled``
    # False (a traced bool is fine) drops the whole insert — used by
    # keyframe_step_jit on spawn frames, whose scan seeds the NEW block via
    # keyframe_spawn_jit instead of being inserted twice.
    writable = new_ok & (rows < P) & (bm.n_blocks > 0) & enabled
    rows_w = jnp.where(writable, rows, P)  # P is out of bounds -> dropped
    slot = jnp.maximum(bm.n_blocks - 1, 0) % B
    return BlockMap(
        points=bm.points.at[slot, rows_w].set(new_pts),
        valid=bm.valid.at[slot, rows_w].set(True),
        poses=bm.poses,
        n_blocks=bm.n_blocks,
        cursor=jnp.where(
            enabled, jnp.minimum(bm.cursor + bm_cfg.points_per_scan, P),
            bm.cursor,
        ),
    )


def blockmap_world_points(bm: BlockMap) -> tuple[jax.Array, jax.Array]:
    """All map points in the world frame: ((B*P, 3), (B*P,) validity).

    Pure per-block math (batched rotate + translate) — embarrassingly
    parallel over a sharded block axis.
    """
    from icet_tpu.ops.geometry import euler_R

    rot = euler_R(-bm.poses[:, 3:6])  # (B, 3, 3)
    world = (
        jnp.einsum("bpi,bji->bpj", bm.points, rot, precision=_HI)
        + bm.poses[:, None, :3]
    )
    return world.reshape(-1, 3), bm.valid.reshape(-1)


def blockmap_refresh_poses(
    bm: BlockMap, keyframe_states: np.ndarray
) -> BlockMap:
    """Write refined keyframe poses back into the map (pose-graph feedback).

    ``keyframe_states`` is the FULL (n_spawned, 6) history of keyframe world
    states in spawn order (e.g. ``KeyframeOdometry.keyframe_states`` refined
    by :func:`icet_tpu.pose_graph.optimize_poses_sparse`); only the latest B
    (the blocks still resident) are written.  This is the O(B) alternative to
    the reference's O(map) re-expression after trajectory updates.
    """
    B = bm.poses.shape[0]
    n = int(bm.n_blocks)
    states = np.asarray(keyframe_states, np.float32)
    if states.shape[0] < n:
        raise ValueError(
            f"keyframe_states must cover all {n} spawned keyframes "
            f"(got {states.shape[0]}); resident blocks are indexed by their "
            "spawn order, so a trailing window is ambiguous"
        )
    poses = np.asarray(bm.poses).copy()
    for spawn_idx in range(max(0, n - B), n):
        poses[spawn_idx % B] = states[spawn_idx]
    return bm._replace(poses=jnp.asarray(poses))


def shard_blockmap(bm: BlockMap, mesh, axis: str = "dp") -> BlockMap:
    """Place the map's block axis over ``axis`` of a device mesh.

    Inserts touch one block and export is per-block independent, so the only
    cross-device traffic under jit is the scatter routing to the owning
    device.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    return BlockMap(
        points=jax.device_put(bm.points, NamedSharding(mesh, P(axis, None, None))),
        valid=jax.device_put(bm.valid, NamedSharding(mesh, P(axis, None))),
        poses=jax.device_put(bm.poses, NamedSharding(mesh, P(axis, None))),
        n_blocks=jax.device_put(bm.n_blocks, rep),
        cursor=jax.device_put(bm.cursor, rep),
    )


# ---------------------------------------------------------------------------
# Fused device steps
# ---------------------------------------------------------------------------


def update_health0(health0: jax.Array, health: jax.Array) -> jax.Array:
    """Fold one frame's solve ``health = [n_corr, rms]`` into the carried
    keyframe baseline ``health0`` (all-zero right after a spawn): both
    components latch from the keyframe's FIRST solve.  (A running-minimum
    rms baseline was tried and measured WORSE on both eval scales — it
    tightens the stds-growth denominator over time, over-eager spawning;
    RESULTS.md spawn-policy table.)"""
    return jnp.where(health0 == 0.0, health, health0)


def _keyframe_step_impl(
    model: VoxelModel,
    bm: BlockMap,
    scan: jax.Array,
    x_prev_rel: jax.Array,
    delta_prev: jax.Array,
    key: jax.Array,
    health0: jax.Array,
    cfg: ICETConfig,
    kf_cfg: KeyframeConfig,
    bm_cfg: BlockMapConfig,
    solve_fn=None,
):
    """One keyframe-odometry frame (shared body of the plain and
    DNN-filtered fused steps).

    Predicts the warm start (constant velocity: previous keyframe-relative
    pose composed with the previous frame delta), registers against the
    keyframe model, derives the frame delta, applies the divergence guard to
    the DELTA (falling back to the prediction), folds the scan into the
    active map block, and decides whether a new keyframe must be spawned.

    ``health0`` is the (2,) f32 ``[n_corr, rms pred_std]`` of the FIRST
    solve against the current keyframe (all-zero right after a spawn —
    the caller latches it from the returned ``health``); the spawn policy
    compares the current solve's health against it (KeyframeConfig.spawn).

    ``solve_fn(model, scan0)`` overrides the residual-frame registration
    (the DNN step substitutes the filtered solve).

    Returns ``(res, X_rel, delta, diverged, spawn, health, new_bm)`` with
    ``health = [n_corr, rms]`` of this solve.
    """
    x0 = compose_states(x_prev_rel, delta_prev)
    # Solve in the PREDICTION frame: pre-transform the scan by the constant
    # -velocity warm start and register only the cm-scale residual.  At
    # keyframe baselines (1-4 m) the raw transform's parallax pushes near
    # points past the windowed-moments span budget, silently demoting every
    # iteration to the 2x-cost scatter fallback; the residual solve keeps
    # the fast path.  Raw-invalid points (r < min_range) are zeroed BEFORE
    # the pre-transform so sensor dropouts cannot resurrect at |t0| — the
    # only semantic deviation is that points within min_range of the
    # KEYFRAME origin (ground under the trajectory a few frames back, which
    # the min-range gate exists to kill) are also dropped.
    r_raw = jnp.linalg.norm(scan, axis=-1)
    scan0 = jnp.where(
        (r_raw >= cfg.min_range)[:, None],
        transform_points(scan, x0),
        0.0,
    )
    if solve_fn is None:
        res = register(
            model, scan0, jnp.zeros(6, scan.dtype), cfg,
            want_static_mask=False,
        )
    else:
        res = solve_fn(model, scan0)
    # Solve health BEFORE covariance composition: rms of the raw
    # keyframe-relative pred_stds (includes the dropped-axis inflation, so
    # a degenerating geometry shows up as a jump — exactly when to spawn).
    rms = jnp.sqrt(jnp.sum(res.pred_stds**2))
    X_total = compose_states(res.X, x0)
    # Exact covariance propagation to the composed state.
    J = jax.jacfwd(lambda d: compose_states(d, x0))(res.X)
    Q = jnp.matmul(jnp.matmul(J, res.Q, precision=_HI), J.T, precision=_HI)
    res = res._replace(
        X=X_total,
        Q=Q,
        pred_stds=jnp.sqrt(jnp.abs(jnp.diag(Q))),
    )

    delta = relative_state(x_prev_rel, res.X)
    diverged = jnp.any(jnp.abs(delta) > kf_cfg.delta_clamp)
    X = jnp.where(diverged, x0, res.X)
    delta = jnp.where(diverged, delta_prev, delta)

    n_corr = res.diagnostics.n_corr[-1]
    health = jnp.stack([n_corr.astype(jnp.float32), rms])
    n_corr0, rms0 = health0[0], health0[1]
    spawn = (
        (jnp.linalg.norm(X[:3]) > kf_cfg.spawn_distance)
        | (jnp.max(jnp.abs(X[3:6])) > kf_cfg.spawn_angle)
        | (n_corr.astype(jnp.float32) < kf_cfg.min_corr_fraction * n_corr0)
        | diverged
    )
    if kf_cfg.spawn == "auto":
        # Health triggers (fire only EARLIER than the distance/angle
        # backstops): predicted-error growth vs the BEST solve this
        # keyframe has seen (a running minimum — the first-frame latch was
        # measured too noisy a denominator: ratio of two noisy values
        # triggers erratically), and windowed overflow approaching the
        # spill capacity (past it every GN iteration pays the 2x segsum
        # fallback).
        ovf = res.diagnostics.windowed_overflow[-1]
        spawn = spawn | ((rms0 > 0.0) & (rms > kf_cfg.stds_growth * rms0))
        spawn = spawn | (ovf > kf_cfg.ovf_spawn)
    # Spawn frames skip this insert — keyframe_spawn_jit seeds the NEW block
    # with the same scan, and inserting here too would duplicate its points
    # in the old block (double-weighted geometry, wasted capacity).
    new_bm = _blockmap_insert(
        bm, scan, X, key, bm_cfg, cfg.min_range, enabled=~spawn
    )
    return res, X, delta, diverged, spawn, health, new_bm


@functools.partial(jax.jit, static_argnums=(7, 8, 9), donate_argnums=(1,))
def keyframe_step_jit(
    model: VoxelModel,
    bm: BlockMap,
    scan: jax.Array,
    x_prev_rel: jax.Array,
    delta_prev: jax.Array,
    key: jax.Array,
    health0: jax.Array,
    cfg: ICETConfig,
    kf_cfg: KeyframeConfig,
    bm_cfg: BlockMapConfig,
):
    """One keyframe-odometry frame in ONE device dispatch (see
    :func:`_keyframe_step_impl`; ``health0`` is the latched (2,) f32
    ``[n_corr, rms]`` of the keyframe's first solve, zeros right after a
    spawn)."""
    return _keyframe_step_impl(
        model, bm, scan, x_prev_rel, delta_prev, key, health0,
        cfg, kf_cfg, bm_cfg,
    )


@functools.partial(jax.jit, static_argnums=(9, 10, 11, 12), donate_argnums=(1,))
def keyframe_step_dnn_jit(
    model: VoxelModel,
    bm: BlockMap,
    scan: jax.Array,
    key_scan: jax.Array,
    key_samples,
    x_prev_rel: jax.Array,
    delta_prev: jax.Array,
    key: jax.Array,
    health0: jax.Array,
    cfg: ICETConfig,
    kf_cfg: KeyframeConfig,
    bm_cfg: BlockMapConfig,
    bias_net=None,
    params=None,
):
    """DNN-filtered fused keyframe step: the residual-frame registration
    runs with the perspective-shift rejection engaged, sampling the
    KEYFRAME's raw points (``key_scan``) per voxel — the keyframe regime is
    where perspective shift is largest (baselines of metres vs the
    frame-to-frame centimetres).  ``key_samples`` is the keyframe cloud's
    precomputed model_voxel_samples (a pure function of the keyframe, paid
    once at spawn instead of a 65k-point sort+gather every frame)."""
    from icet_tpu.filters import register_with_dnn

    def solve_fn(m, scan0):
        res, _filt = register_with_dnn(
            m, key_scan, scan0, jnp.zeros(6, scan.dtype), cfg,
            bias_net, params, want_static_mask=False, samples1=key_samples,
        )
        return res

    return _keyframe_step_impl(
        model, bm, scan, x_prev_rel, delta_prev, key, health0,
        cfg, kf_cfg, bm_cfg, solve_fn=solve_fn,
    )


@functools.partial(jax.jit, static_argnums=(5, 6), donate_argnums=(0,))
def keyframe_spawn_jit(
    bm: BlockMap,
    scan: jax.Array,
    world_state: jax.Array,
    key: jax.Array,
    seed_insert: jax.Array,
    cfg: ICETConfig,
    bm_cfg: BlockMapConfig,
):
    """Spawn a keyframe: fit the scan's voxel model and open its map block
    (seeded with the scan itself when ``seed_insert`` — a checkpoint
    resume that REPLAYS the checkpointed frame passes False, since that
    frame's points are already in the restored map and seeding again would
    double-weight its geometry).  One extra dispatch per keyframe — the
    prepare stage is paid here instead of every frame.

    ``key`` decorrelates the seed-insert downsample across keyframes: a
    constant key would pick the identical point indices for every block,
    which on beam-major scans means fixed (beam, azimuth) positions —
    spatially correlated sampling across the whole map.
    """
    model = prepare_reference(scan, cfg)
    new_bm = _blockmap_spawn(bm, world_state)
    new_bm = _blockmap_insert(
        new_bm,
        scan,
        jnp.zeros(6, jnp.float32),
        key,
        bm_cfg,
        cfg.min_range,
        enabled=seed_insert,
    )
    return model, new_bm


@functools.partial(jax.jit, static_argnums=(4, 5, 6), donate_argnums=(2,))
def keyframe_sequence_jit(
    frames: jax.Array,
    model0: VoxelModel,
    bm0: BlockMap,
    carry0: tuple,
    cfg: ICETConfig,
    kf_cfg: KeyframeConfig,
    bm_cfg: BlockMapConfig,
):
    """Whole keyframe-odometry SUB-SEQUENCE as one device program.

    Device twin of :class:`KeyframeOdometry`'s per-frame host loop (same
    step, delta-stds bookkeeping, health0 latch, spawn handling — the
    spawn's prepare runs inside a ``lax.cond`` branch), amortising the
    per-dispatch host-link latency over ``frames.shape[0]`` frames, the
    same motivation as :func:`icet_tpu.odometry.odometry_sequence_jit`.
    Equivalence with the host pipeline is pinned by tests/test_keyframe.py
    (trajectories match; map CONTENTS differ by RNG stream — the insert
    downsample draws from a different key sequence, which never feeds back
    into the solve).

    ``carry0 = (x_rel, delta, world_key6, key, health0, prev_stds)``
    (``health0``: (2,) f32, see :func:`keyframe_step_jit`); returns
    ``(model, bm, carry), outs`` with per-frame outs
    ``(delta, delta_stds, world6, diverged, x_rel, is_keyframe, n_corr)``.
    """

    def body(carry, scan):
        model, bm, x_rel, delta, world_key, key, h0, prev_stds = carry
        key, sub, sub2 = jax.random.split(key, 3)
        res, x2, d2, div, spawn, health, bm2 = _keyframe_step_impl(
            model, bm, scan, x_rel, delta, sub, h0, cfg, kf_cfg, bm_cfg
        )
        h0 = update_health0(h0, health)
        world2 = compose_states(world_key, x2)
        # Reported stds describe the frame-to-frame DELTA: conservative
        # independent-sum bound (see KeyframeOdometry._step_device).
        delta_stds = jnp.sqrt(res.pred_stds**2 + prev_stds**2)

        def do_spawn(_):
            m2, bm3 = keyframe_spawn_jit(
                bm2, scan, world2, sub2, jnp.asarray(True), cfg, bm_cfg
            )
            return (m2, bm3, jnp.zeros(6, jnp.float32),
                    jnp.zeros(2, jnp.float32), world2,
                    jnp.zeros(6, jnp.float32))

        def keep(_):
            return model, bm2, x2, h0, world_key, res.pred_stds

        model, bm, x_rel, h0, world_key, prev_stds = jax.lax.cond(
            spawn, do_spawn, keep, None
        )
        outs = (d2, delta_stds, world2, div, x2, spawn,
                health[0].astype(jnp.int32))
        return (model, bm, x_rel, d2, world_key, key, h0, prev_stds), outs

    (model, bm, *carry), outs = jax.lax.scan(
        body, (model0, bm0, *carry0), frames
    )
    return (model, bm, tuple(carry)), outs


def run_keyframe_device(
    scans: np.ndarray,
    cfg: ICETConfig | None = None,
    kf_cfg: KeyframeConfig | None = None,
    bm_cfg: BlockMapConfig | None = None,
    block: int = 64,
    seed: int = 0,
) -> tuple[list["KeyframeFrame"], BlockMap]:
    """Run a recorded ``(F, N, 3)`` sequence through the device-chained
    keyframe runner in ``block``-frame dispatches; returns the same
    ``KeyframeFrame`` records as :class:`KeyframeOdometry` plus the final
    block map.

    ``cfg.dnn_filter`` is NOT supported here (raises — use
    :class:`KeyframeOdometry`, whose DNN step carries the keyframe's
    per-voxel sample state this chained body does not)."""
    cfg = cfg or ICETConfig()
    if cfg.dnn_filter:
        raise NotImplementedError(
            "run_keyframe_device does not support cfg.dnn_filter; use "
            "KeyframeOdometry (per-frame dispatches) for the DNN-filtered "
            "mode"
        )
    kf_cfg = kf_cfg or KeyframeConfig()
    bm_cfg = bm_cfg or BlockMapConfig()
    scans = np.asarray(scans, np.float32)
    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    bm = blockmap_init(bm_cfg)
    model, bm = keyframe_spawn_jit(
        bm, jnp.asarray(scans[0]), jnp.zeros(6, jnp.float32), sub,
        jnp.asarray(True), cfg, bm_cfg,
    )
    carry = (
        jnp.zeros(6, jnp.float32), jnp.zeros(6, jnp.float32),
        jnp.zeros(6, jnp.float32), key, jnp.zeros(2, jnp.float32),
        jnp.zeros(6, jnp.float32),
    )
    frames: list[KeyframeFrame] = []
    for s in range(1, scans.shape[0], block):
        blk = jnp.asarray(scans[s : s + block])
        (model, bm, carry), outs = keyframe_sequence_jit(
            blk, model, bm, carry, cfg, kf_cfg, bm_cfg
        )
        d2, stds, world6, div, x2, is_kf, n_corr = (
            np.asarray(v) for v in outs
        )
        for j in range(d2.shape[0]):
            frames.append(
                KeyframeFrame(
                    index=s + j,
                    X=d2[j],
                    pred_stds=stds[j],
                    T_world=np_pose_matrix(world6[j]),
                    diverged=bool(div[j]),
                    X_rel=x2[j],
                    is_keyframe=bool(is_kf[j]),
                    n_corr=np.asarray(n_corr[j]),
                )
            )
    return frames, bm


# ---------------------------------------------------------------------------
# Host loop
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class KeyframeFrame:
    """Per-frame output; duck-type compatible with odometry.OdometryFrame
    (same ``X`` = consecutive-frame delta contract, so
    ``pose_graph.graph_from_odometry`` consumes either)."""

    index: int
    #: consecutive frame-to-frame step (what the pose graph consumes)
    X: np.ndarray
    pred_stds: np.ndarray
    T_world: np.ndarray
    diverged: bool
    #: pose relative to the current keyframe (the actual solve output)
    X_rel: np.ndarray
    #: True when this frame became a new keyframe
    is_keyframe: bool
    n_corr: np.ndarray


class KeyframeOdometry:
    """Streaming keyframe odometry with an attached keyframe block map.

    Steady-state cost: ONE fused dispatch per frame (register + delta guard
    + map insert); keyframe frames add one prepare+spawn dispatch.  Contrast
    with :class:`~icet_tpu.odometry.OdometryPipeline`, which pays register +
    prepare every frame (the reference's own regime, odometry.cpp:73-82).
    """

    def __init__(
        self,
        cfg: ICETConfig | None = None,
        kf_cfg: KeyframeConfig | None = None,
        bm_cfg: BlockMapConfig | None = None,
        seed: int = 0,
        snapshot_every: int = 10,
    ):
        self.cfg = cfg or ICETConfig()
        self.kf_cfg = kf_cfg or KeyframeConfig()
        self.bm_cfg = bm_cfg or BlockMapConfig()
        self._key = jax.random.PRNGKey(seed)
        #: host-snapshot cadence for device-loss recovery: the fused step
        #: DONATES the block map, so a failed dispatch invalidates it — the
        #: newest snapshot (a numpy keyframe_state) is what recovery
        #: restores.  Frames since the snapshot lose their map inserts and
        #: the trajectory resumes at the snapshot pose.
        self.snapshot_every = snapshot_every
        # cfg.dnn_filter engages the perspective-shift rejection in every
        # solve, sampling the keyframe scan's points per voxel.
        self._dnn = None
        if self.cfg.dnn_filter:
            from icet_tpu.filters import pretrained_dnn

            self._dnn = pretrained_dnn(self.cfg)
        self.reset()

    def reset(self) -> None:
        self._model = None
        self._key_scan = None
        self._key_samples = None
        #: world pose at which the NEXT seed spawn opens (identity for a
        #: fresh run; checkpoint restore sets the resumed pose)
        self._resume_T = np.eye(4)
        self.blockmap = blockmap_init(self.bm_cfg)
        self._T_key = np.eye(4)
        self._x_rel = jnp.zeros(6, jnp.float32)
        self._delta = jnp.zeros(6, jnp.float32)
        self._stds_rel = np.zeros(6, np.float32)
        self._health0: jax.Array | None = None
        self._index = 0
        self.keyframe_states: list[np.ndarray] = []
        self.keyframe_indices: list[int] = []
        self._snapshot: dict | None = None
        #: host mirror of the newest completed world pose — recovery spawns
        #: there even when the blockmap snapshot lags (4x4 numpy, refreshed
        #: every frame; negligible next to the frame's own transfers)
        self._T_world_host = np.eye(4)
        self.recoveries = 0

    def _spawn(self, scan_dev: jax.Array, T_world: np.ndarray) -> None:
        state = np_pose_to_state(T_world).astype(np.float32)
        self._key, sub = jax.random.split(self._key)
        seed = jnp.asarray(getattr(self, "_resume_seed_insert", True))
        self._model, self.blockmap = keyframe_spawn_jit(
            self.blockmap, scan_dev, jnp.asarray(state), sub, seed,
            self.cfg, self.bm_cfg,
        )
        self._resume_seed_insert = True  # one-shot (checkpoint replay only)
        self._T_key = T_world
        if self._dnn is not None:
            from icet_tpu.filters import model_voxel_samples_jit

            self._key_scan = scan_dev
            self._key_samples = model_voxel_samples_jit(
                self._model, scan_dev, self.cfg
            )
        else:
            self._key_scan = None
            self._key_samples = None
        self._x_rel = jnp.zeros(6, jnp.float32)
        # Invariant (see the delta-stds note in step()): right after a spawn
        # x_prev_rel is exactly zero, so the previous solve's stds must be
        # zero too — including for the checkpoint-resume spawn, which does
        # not pass through step()'s keyframe branch.
        self._stds_rel = np.zeros(6, np.float32)
        self._health0 = None  # set by the first solve against this keyframe
        self.keyframe_states.append(state)
        self.keyframe_indices.append(self._index)

    def step(self, scan: np.ndarray) -> KeyframeFrame | None:
        """Feed one scan.  Survives device loss mid-stream: the fused step
        DONATES the block map (a failed dispatch invalidates it), so on any
        device error the pipeline probes for healthy devices, restores the
        newest host snapshot (taken every ``snapshot_every`` frames), and
        retries — the retried frame re-seeds a keyframe at the snapshot
        pose; inserts since the snapshot are lost, odometry continues."""
        try:
            frame = self._step_device(scan)
        except (TypeError, ValueError):
            # Deterministic tracing/shape/user errors: recovery cannot help.
            raise
        except Exception:
            self._recover()
            frame = self._step_device(scan)
        if self._index % self.snapshot_every == 0:
            from icet_tpu.utils.checkpoint import keyframe_state

            self._snapshot = keyframe_state(self)
        return frame

    def _recover(self) -> None:
        from icet_tpu.parallel.elastic import probe_devices

        if not probe_devices():
            raise RuntimeError("no healthy devices remain")
        self.recoveries += 1
        idx, rec, T_last = self._index, self.recoveries, self._T_world_host
        if self._snapshot is None:
            self.reset()  # zeroes the counters; restore them below
        else:
            from icet_tpu.utils.checkpoint import restore_keyframe

            restore_keyframe(self, self._snapshot)
        self._index, self.recoveries = idx, rec
        self._T_world_host = T_last
        # Spawn at the newest COMPLETED pose, not the (possibly stale)
        # snapshot pose — block poses are self-describing, so a newer
        # keyframe pose is consistent with an older restored map.
        self._resume_T = T_last

    def _step_device(self, scan: np.ndarray) -> KeyframeFrame | None:
        scan_dev = jnp.asarray(scan, jnp.float32)
        if self._model is None:
            self._spawn(scan_dev, self._resume_T)
            self._index += 1
            return None

        self._key, sub = jax.random.split(self._key)
        health0 = (
            self._health0
            if self._health0 is not None
            else jnp.zeros(2, jnp.float32)  # fresh keyframe: health tests off
        )
        if self._dnn is not None:
            net, params = self._dnn
            res, x_rel, delta, diverged, spawn, health, self.blockmap = (
                keyframe_step_dnn_jit(
                    self._model,
                    self.blockmap,
                    scan_dev,
                    self._key_scan,
                    self._key_samples,
                    self._x_rel,
                    self._delta,
                    sub,
                    health0,
                    self.cfg,
                    self.kf_cfg,
                    self.bm_cfg,
                    net,
                    params,
                )
            )
        else:
            res, x_rel, delta, diverged, spawn, health, self.blockmap = (
                keyframe_step_jit(
                    self._model,
                    self.blockmap,
                    scan_dev,
                    self._x_rel,
                    self._delta,
                    sub,
                    health0,
                    self.cfg,
                    self.kf_cfg,
                    self.bm_cfg,
                )
            )
        self._health0 = update_health0(health0, health)
        X_rel = np.asarray(x_rel)
        T_world = self._T_key @ np_pose_matrix(X_rel)
        self._x_rel = x_rel
        self._delta = delta
        self._T_world_host = T_world  # recovery resumes here

        # The reported X is the consecutive-frame DELTA (difference of two
        # keyframe-relative solves), so its stds must describe the delta:
        # conservative independent-sum bound sqrt(cur^2 + prev^2) — the two
        # solves actually share x_prev error (anti-correlated), so the true
        # delta error is smaller; over-reporting just down-weights keyframe
        # edges safely in the pose graph.  At a frame right after a spawn
        # x_prev_rel is exactly 0, so prev stds are zero and the bound is
        # exact.
        cur_stds = np.asarray(res.pred_stds)
        delta_stds = np.sqrt(cur_stds**2 + self._stds_rel**2)

        is_kf = bool(spawn)
        if is_kf:
            self._spawn(scan_dev, T_world)  # zeroes _stds_rel
        else:
            self._stds_rel = cur_stds

        frame = KeyframeFrame(
            index=self._index,
            X=np.asarray(delta),
            pred_stds=delta_stds,
            T_world=T_world,
            diverged=bool(diverged),
            X_rel=X_rel,
            is_keyframe=is_kf,
            n_corr=np.asarray(health)[0].astype(np.int32),
        )
        self._index += 1
        return frame

    def run(self, scans) -> list[KeyframeFrame]:
        out = []
        for scan in scans:
            f = self.step(scan)
            if f is not None:
                out.append(f)
        return out

    def map_points(self) -> np.ndarray:
        """Current map in the world frame as (M, 3) numpy."""
        pts, ok = blockmap_world_points(self.blockmap)
        return np.asarray(pts)[np.asarray(ok)]
