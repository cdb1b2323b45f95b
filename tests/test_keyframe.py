"""Keyframe odometry + keyframe block map (icet_tpu/keyframe.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icet_tpu import BlockMapConfig, ICETConfig, KeyframeConfig, KeyframeOdometry
from icet_tpu.keyframe import (
    _blockmap_insert,
    _blockmap_spawn,
    blockmap_init,
    blockmap_refresh_poses,
    blockmap_world_points,
    np_pose_matrix,
    np_pose_to_state,
    shard_blockmap,
)

CFG = ICETConfig(
    n_theta=48,
    n_phi=16,
    phi_min=np.pi / 3,
    phi_max=2 * np.pi / 3,
    n_iters=6,
    min_pts=20,
    min_range=1.0,
)


@pytest.fixture(scope="module")
def trajectory():
    from icet_tpu.datasets.replay import SyntheticTrajectorySource

    src = SyntheticTrajectorySource(
        n_frames=12, speed=0.4, yaw_rate=0.02, n_beams=48, n_azimuth=512
    )
    return list(src)


@pytest.mark.slow
def test_keyframe_odometry_tracks_and_spawns(trajectory):
    kf = KeyframeOdometry(
        CFG,
        KeyframeConfig(spawn_distance=1.2, spawn_angle=0.15, delta_clamp=2.0),
        BlockMapConfig(n_blocks=8, block_capacity=4096, points_per_scan=500),
    )
    frames = kf.run(s for s, _ in trajectory)
    assert len(frames) == len(trajectory) - 1
    assert not any(f.diverged for f in frames)

    # Spawn cadence: speed 0.4 m/frame, threshold 1.2 m -> a keyframe every
    # 3-4 frames, and never back-to-back.
    n_kf = sum(f.is_keyframe for f in frames)
    assert 2 <= n_kf <= 5, n_kf
    kf_idx = kf.keyframe_indices
    assert kf_idx[0] == 0 and all(np.diff(kf_idx) >= 2), kf_idx

    # World-pose accuracy against the exact simulated trajectory.
    T0 = trajectory[0][1]
    for f, (_, T_true) in zip(frames, trajectory[1:]):
        rel = np.linalg.inv(T0) @ T_true
        assert np.linalg.norm(f.T_world[:3, 3] - rel[:3, 3]) < 0.05, f.index

    # The per-frame delta contract (duck-typed OdometryFrame.X): composing
    # the deltas reproduces the final world pose.
    T = np.eye(4)
    for f in frames:
        T = T @ np_pose_matrix(f.X)
    np.testing.assert_allclose(T, frames[-1].T_world, atol=5e-3)

    # The block map, exported to world frame, must hug the scene bounding
    # box (walls at +-30 x +-25, ground at -2).
    mp = kf.map_points()
    assert mp.shape[0] > 3000
    assert mp[:, 2].min() > -2.3 and mp[:, 2].max() < 7.0
    assert np.abs(mp[:, 0]).max() < 31.0 and np.abs(mp[:, 1]).max() < 26.0


@pytest.mark.slow
def test_auto_spawn_health_triggers_wired(trajectory):
    """spawn="auto"'s health triggers are plumbed end to end: an
    impossible stds-growth threshold (any rms above ~0x the first solve's)
    forces a spawn on EVERY frame after each keyframe's first, while
    spawn="fixed" with the same loose distance backstop spawns on none.
    (Policy-level evaluation is in RESULTS.md's spawn table — on both
    eval drives the triggers are inert at sane thresholds and the policy
    equals fixed; this pins the wiring, not the thresholds.)"""
    loose = dict(spawn_distance=100.0, spawn_angle=3.0, delta_clamp=2.0)
    bm = BlockMapConfig(n_blocks=4, block_capacity=1024, points_per_scan=128)
    scans = [s for s, _ in trajectory[:5]]

    hair = KeyframeOdometry(
        CFG, KeyframeConfig(spawn="auto", stds_growth=1e-6, **loose), bm
    )
    frames = hair.run(scans)
    # Frame 1 latches health0 (no trigger), every later frame trips it.
    assert [f.is_keyframe for f in frames] == [False, True, False, True]

    fixed = KeyframeOdometry(
        CFG, KeyframeConfig(spawn="fixed", **loose), bm
    )
    frames = fixed.run(scans)
    assert not any(f.is_keyframe for f in frames)


@pytest.mark.slow
def test_keyframe_delta_guard(trajectory):
    # An impossible clamp forces every frame into the diverged fallback:
    # the prediction is used and the pipeline keeps running.
    kf = KeyframeOdometry(
        CFG,
        KeyframeConfig(delta_clamp=1e-4),
        BlockMapConfig(n_blocks=4, block_capacity=1024, points_per_scan=128),
    )
    frames = kf.run(s for s, _ in trajectory[:4])
    assert all(f.diverged for f in frames)
    for f in frames:
        assert np.isfinite(f.T_world).all()


def test_blockmap_insert_spawn_evict():
    bm_cfg = BlockMapConfig(n_blocks=2, block_capacity=256, points_per_scan=100)
    bm = blockmap_init(bm_cfg)
    key = jax.random.PRNGKey(0)
    scan = jnp.asarray(np.random.default_rng(0).normal(size=(500, 3)) * 5 + 10.0,
                       jnp.float32)

    # Insert before any spawn: dropped entirely.
    bm1 = _blockmap_insert(bm, scan, jnp.zeros(6), key, bm_cfg, 0.2)
    assert int(bm1.valid.sum()) == 0

    # Spawn block 0 and fill it past capacity: valid count caps at 256.
    bm2 = _blockmap_spawn(bm1, jnp.zeros(6, jnp.float32))
    for i in range(4):
        bm2 = _blockmap_insert(
            bm2, scan, jnp.zeros(6), jax.random.PRNGKey(i), bm_cfg, 0.2
        )
    assert int(bm2.n_blocks) == 1
    assert int(bm2.valid[0].sum()) == 256  # 4 x 100 clipped to capacity
    assert int(bm2.cursor) == 256

    # Spawn blocks 1 and 2: block index wraps, evicting block 0's content.
    bm3 = _blockmap_spawn(bm2, jnp.ones(6, jnp.float32))
    assert int(bm3.n_blocks) == 2 and int(bm3.cursor) == 0
    bm4 = _blockmap_spawn(bm3, 2 * jnp.ones(6, jnp.float32))
    assert int(bm4.n_blocks) == 3
    assert int(bm4.valid[0].sum()) == 0  # evicted
    np.testing.assert_allclose(np.asarray(bm4.poses[0]), 2.0)


def test_blockmap_world_roundtrip():
    """Points inserted through a keyframe pose export back to world frame."""
    bm_cfg = BlockMapConfig(n_blocks=4, block_capacity=512, points_per_scan=200)
    bm = blockmap_init(bm_cfg)
    rng = np.random.default_rng(1)
    world_pts = rng.normal(size=(200, 3)).astype(np.float32) * 3 + 5.0

    # Keyframe at a nontrivial pose; the scan is the world points expressed
    # in the keyframe's sensor frame.
    kf_state = np.array([1.0, -2.0, 0.5, 0.1, -0.05, 0.8], np.float32)
    T = np_pose_matrix(kf_state)
    sensor_pts = (np.linalg.inv(T) @ np.c_[world_pts, np.ones(200)].T).T[:, :3]

    bm = _blockmap_spawn(bm, jnp.asarray(kf_state))
    bm = _blockmap_insert(
        bm, jnp.asarray(sensor_pts, jnp.float32), jnp.zeros(6),
        jax.random.PRNGKey(0), bm_cfg, 0.2,
    )
    out, ok = blockmap_world_points(bm)
    got = np.asarray(out)[np.asarray(ok)]
    assert got.shape == (200, 3)
    # Insert order is a random permutation; compare as sets via sorting.
    np.testing.assert_allclose(
        np.sort(got, axis=0), np.sort(world_pts, axis=0), atol=2e-4
    )

    # Pose refresh: shifting the keyframe state shifts the world export.
    bm_shift = blockmap_refresh_poses(
        bm, (kf_state + np.array([10, 0, 0, 0, 0, 0], np.float32))[None]
    )
    out2, ok2 = blockmap_world_points(bm_shift)
    got2 = np.asarray(out2)[np.asarray(ok2)]
    np.testing.assert_allclose(
        np.sort(got2, axis=0) - np.sort(got, axis=0),
        np.tile([10.0, 0.0, 0.0], (200, 1)),
        atol=2e-4,
    )


@pytest.mark.slow
def test_blockmap_sharded_matches_single_device():
    """Same insert/spawn/export results with the block axis sharded over 8
    devices (the city-scale map sharding path, SURVEY.md section 5.7)."""
    from jax.sharding import Mesh

    bm_cfg = BlockMapConfig(n_blocks=8, block_capacity=512, points_per_scan=100)
    mesh = Mesh(np.array(jax.devices()), ("dp",))

    def drive(bm):
        scan = jnp.asarray(
            np.random.default_rng(7).normal(size=(400, 3)) * 4 + 8.0, jnp.float32
        )
        for k in range(5):
            bm = _blockmap_spawn(
                bm, jnp.full((6,), float(k), jnp.float32)
            )
            bm = _blockmap_insert(
                bm, scan, jnp.zeros(6), jax.random.PRNGKey(k), bm_cfg, 0.2
            )
        return blockmap_world_points(bm)

    ref_pts, ref_ok = drive(blockmap_init(bm_cfg))
    bm_sharded = shard_blockmap(blockmap_init(bm_cfg), mesh, "dp")
    assert len(set(bm_sharded.points.sharding.device_set)) == 8
    got_pts, got_ok = drive(bm_sharded)

    np.testing.assert_array_equal(np.asarray(ref_ok), np.asarray(got_ok))
    np.testing.assert_allclose(
        np.asarray(ref_pts), np.asarray(got_pts), atol=1e-6
    )


def test_np_pose_helpers_match_jnp():
    from icet_tpu.ops.geometry import pose_matrix, pose_to_state

    rng = np.random.default_rng(3)
    for _ in range(5):
        X = rng.uniform(-1, 1, 6).astype(np.float32)
        np.testing.assert_allclose(
            np_pose_matrix(X), np.asarray(pose_matrix(jnp.asarray(X))), atol=1e-6
        )
        T = np_pose_matrix(X)
        np.testing.assert_allclose(
            np_pose_to_state(T), np.asarray(pose_to_state(jnp.asarray(T))),
            atol=1e-6,
        )
        np.testing.assert_allclose(np_pose_to_state(T), X, atol=1e-6)


@pytest.mark.slow
def test_device_chained_keyframe_matches_pipeline(trajectory):
    """run_keyframe_device (whole sub-sequence, spawn prepare inside a
    lax.cond) must reproduce the host pipeline's trajectory: same deltas,
    spawn decisions, and world poses.  Map CONTENTS may differ (the insert
    downsample draws from a different RNG stream, which never feeds the
    solve) — compare the map only structurally."""
    from icet_tpu.keyframe import run_keyframe_device

    cfg = CFG
    kf_cfg = KeyframeConfig(spawn_distance=1.2, spawn_angle=0.15,
                            delta_clamp=2.0)
    bm_cfg = BlockMapConfig(n_blocks=8, block_capacity=4096,
                            points_per_scan=500)
    scans = np.stack([s for s, _ in trajectory])
    ref = KeyframeOdometry(cfg, kf_cfg, bm_cfg)
    ref_frames = ref.run(iter(scans))
    got_frames, bm = run_keyframe_device(
        scans, cfg, kf_cfg, bm_cfg, block=5  # non-divisor block size
    )
    assert len(got_frames) == len(ref_frames)
    for r, g in zip(ref_frames, got_frames):
        assert (r.index, r.is_keyframe, r.diverged) == (
            g.index, g.is_keyframe, g.diverged
        ), (r.index, r.is_keyframe, g.is_keyframe)
        np.testing.assert_allclose(g.X_rel, r.X_rel, atol=1e-4)
        np.testing.assert_allclose(g.X, r.X, atol=1e-4)
        np.testing.assert_allclose(g.T_world, r.T_world, atol=1e-3)
        np.testing.assert_allclose(g.pred_stds, r.pred_stds, rtol=1e-2)
    # Map structure: same number of resident blocks, similar fill.
    assert int(bm.n_blocks) == int(ref.blockmap.n_blocks)
    ref_fill = int(np.asarray(ref.blockmap.valid).sum())
    got_fill = int(np.asarray(bm.valid).sum())
    assert abs(got_fill - ref_fill) <= 0.1 * max(ref_fill, 1), (
        got_fill, ref_fill
    )
