import numpy as np
import pytest

from icet_tpu.config import ICETConfig, OdometryConfig
from icet_tpu.datasets.replay import SyntheticTrajectorySource
from icet_tpu.odometry import OdometryPipeline

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
    src = SyntheticTrajectorySource(
        n_frames=8, speed=0.2, yaw_rate=0.01, n_beams=48, n_azimuth=512
    )
    return list(src)


@pytest.mark.slow
def test_odometry_tracks_ground_truth(trajectory):
    pipe = OdometryPipeline(CFG, OdometryConfig(warm_start=True))
    frames = list(pipe.run(scan for scan, _ in trajectory))
    assert len(frames) == len(trajectory) - 1
    assert not any(f.diverged for f in frames)

    # Absolute trajectory error against the exact simulated poses.
    T0 = trajectory[0][1]
    for frame, (_, T_true) in zip(frames, trajectory[1:]):
        rel_true = np.linalg.inv(T0) @ T_true
        ate = np.linalg.norm(frame.T_world[:3, 3] - rel_true[:3, 3])
        assert ate < 0.08, (frame.index, ate)
    # Rotation error of the final pose.
    R_err = frames[-1].T_world[:3, :3].T @ rel_true[:3, :3]
    ang = np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1))
    assert ang < 0.02


@pytest.mark.slow
def test_odometry_frame_fields(trajectory):
    pipe = OdometryPipeline(CFG)
    f = None
    for scan, _ in trajectory[:3]:
        f = pipe.step(scan) or f
    assert f is not None
    assert f.X.shape == (6,) and f.pred_stds.shape == (6,)
    assert f.T_world.shape == (4, 4)
    assert f.pose.shape == (6,)
    np.testing.assert_allclose(f.twist, f.X * 10.0, atol=1e-6)
    assert (f.pred_stds > 0).all()
    assert f.solve_ms > 0


def test_divergence_guard():
    # Two unrelated scenes -> garbage solve; the guard must zero the step.
    from icet_tpu.datasets.synthetic import Scene, simulate_scan

    s1 = simulate_scan(seed=0, n_beams=48, n_azimuth=512)
    far = Scene(boxes=tuple((a + 7, b + 7, c - 9, d - 9, e, f)
                            for a, b, c, d, e, f in Scene.boxes))
    s2 = simulate_scan(pose_t=np.array([5.0, -3.0, 0.0]), scene=far,
                       seed=99, n_beams=48, n_azimuth=512)
    pipe = OdometryPipeline(CFG, OdometryConfig(divergence_clamp=0.3))
    pipe.step(s1)
    f = pipe.step(s2)
    if f.diverged:
        np.testing.assert_allclose(f.X, 0.0)
        np.testing.assert_allclose(f.T_world, np.eye(4), atol=1e-6)


def test_warm_start_carries_previous_solution(trajectory):
    pipe = OdometryPipeline(CFG, OdometryConfig(warm_start=True))
    scans = [s for s, _ in trajectory[:4]]
    frames = [pipe.step(s) for s in scans]
    # Constant-velocity trajectory: warm-started frames should need a smaller
    # first-iteration correction than the first (cold) frame.
    d1 = frames[1].n_corr
    assert d1 is not None


@pytest.mark.slow
def test_device_chained_runner_matches_pipeline(trajectory):
    """run_odometry_device (whole sub-sequence in one lax.scan dispatch)
    must reproduce the streaming pipeline's trajectory: same X, same
    divergence decisions, same world poses."""
    from icet_tpu.odometry import run_odometry_device

    scans = np.stack([s for s, _ in trajectory])
    odo = OdometryConfig(warm_start=True)
    ref = list(OdometryPipeline(CFG, odo).run(iter(scans)))
    got = run_odometry_device(scans, CFG, odo, block=3)  # non-divisor block
    assert len(got) == len(ref)
    for r, g in zip(ref, got):
        assert r.index == g.index and r.diverged == g.diverged
        np.testing.assert_allclose(g.X, r.X, atol=1e-5)
        np.testing.assert_allclose(g.T_world, r.T_world, atol=1e-4)
        np.testing.assert_allclose(g.pred_stds, r.pred_stds, rtol=1e-3)


def test_warm_start_seed_modes():
    """'previous' returns the last delta verbatim; 'extrapolate' is the
    exact constant-acceleration composition (equals 2*Dk - Dk-1 for
    commuting small motions)."""
    import jax.numpy as jnp

    from icet_tpu.odometry import warm_start_seed

    d1 = jnp.asarray([0.10, 0.00, 0.0, 0.0, 0.0, 0.00], jnp.float32)
    d2 = jnp.asarray([0.14, 0.02, 0.0, 0.0, 0.0, 0.00], jnp.float32)
    np.testing.assert_allclose(warm_start_seed(d2, d1, "previous"), d2)
    pred = warm_start_seed(d2, d1, "extrapolate")
    np.testing.assert_allclose(
        np.asarray(pred), np.asarray(2 * d2 - d1), atol=1e-6
    )
    with pytest.raises(ValueError):
        warm_start_seed(d2, d1, "nope")


@pytest.mark.slow
def test_extrapolate_mode_device_runner_matches_pipeline(trajectory):
    """warm_start_mode='extrapolate' produces the same trajectory through
    the host pipeline and the device-chained runner (block=len so the
    runner's per-block history reset never fires)."""
    from icet_tpu.odometry import run_odometry_device

    scans = np.stack([s for s, _ in trajectory])
    odo = OdometryConfig(warm_start=True, warm_start_mode="extrapolate")
    ref = list(OdometryPipeline(CFG, odo).run(iter(scans)))
    got = run_odometry_device(scans, CFG, odo, block=len(scans))
    assert len(got) == len(ref)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g.X, r.X, atol=1e-5)
        np.testing.assert_allclose(g.T_world, r.T_world, atol=1e-4)
