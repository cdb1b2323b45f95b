import numpy as np
import jax
import pytest

from icet_tpu.config import ICETConfig
from icet_tpu.datasets.synthetic import scan_pair_with_ground_truth
from icet_tpu.parallel.elastic import (
    ElasticRegistrationRunner,
    best_mesh_shape,
    probe_devices,
)

CFG = ICETConfig(
    n_theta=24, n_phi=8, phi_min=np.pi / 3, phi_max=2 * np.pi / 3,
    n_iters=3, min_pts=10, min_range=1.0,
)


@pytest.fixture(scope="module")
def batch():
    X = np.array([0.2, 0.1, 0.0, 0.0, 0.0, 0.01], np.float32)
    s1, s2 = scan_pair_with_ground_truth(X, seed=0, n_beams=16, n_azimuth=128)
    return (
        np.stack([s1, s1]),
        np.stack([s2, s2]),
        np.zeros((2, 6), np.float32),
        X,
    )


def test_best_mesh_shape():
    assert best_mesh_shape(8, 2) == (2, 4)
    assert best_mesh_shape(8, 1) == (1, 8)
    assert best_mesh_shape(7, 2) == (1, 7)
    assert best_mesh_shape(6, 4) == (3, 2)
    assert best_mesh_shape(1, 4) == (1, 1)


def test_probe_devices_all_healthy():
    assert len(probe_devices()) == len(jax.devices())


def test_probe_devices_hang_is_time_bounded():
    """A device whose probe dispatch never returns (the tunnel's observed
    hang-forever-on-first-sync mode) must be reported unhealthy within the
    deadline instead of freezing the recovery path."""
    import threading
    import time

    hang_forever = threading.Event()  # never set

    def hanging_op(d):
        hang_forever.wait()  # blocks until process exit
        return True

    t0 = time.monotonic()
    healthy = probe_devices(jax.devices(), timeout_s=0.5, _op=hanging_op)
    elapsed = time.monotonic() - t0
    assert healthy == []
    assert elapsed < 5.0  # bounded: all devices probed concurrently


def test_probe_devices_mixed_hang_and_healthy():
    devs = jax.devices()

    def op(d):
        if d.id % 2 == 0:
            import threading

            threading.Event().wait()  # hang
        return True

    healthy = probe_devices(devs, timeout_s=0.5, _op=op)
    assert healthy == [d for d in devs if d.id % 2 == 1]


@pytest.mark.slow
def test_elastic_run(batch):
    s1, s2, x0, X_true = batch
    runner = ElasticRegistrationRunner(CFG, prefer_dp=2)
    assert runner.shape == (2, 4)
    res = runner.run(s1, s2, x0)
    assert res.X.shape == (2, 6)
    np.testing.assert_allclose(res.X[0][:2], X_true[:2], atol=0.05)


@pytest.mark.slow
def test_elastic_pads_odd_batch(batch):
    s1, s2, x0, X_true = batch
    runner = ElasticRegistrationRunner(CFG, prefer_dp=2)
    # Batch of 3 does not divide dp=2: runner pads internally, returns 3.
    res = runner.run(
        np.concatenate([s1, s1[:1]]),
        np.concatenate([s2, s2[:1]]),
        np.concatenate([x0, x0[:1]]),
    )
    assert res.X.shape == (3, 6)
    np.testing.assert_allclose(res.X[2], res.X[0], atol=1e-5)


@pytest.mark.slow
def test_elastic_recovers_from_device_loss(batch, monkeypatch):
    s1, s2, x0, X_true = batch
    runner = ElasticRegistrationRunner(CFG, prefer_dp=2)
    baseline = runner.run(s1, s2, x0)

    # Simulate losing 3 devices: the next dispatch raises, and the health
    # probe only sees 5 devices.
    fail_once = {"armed": True}
    real_step = runner._step

    def exploding_step(*args):
        if fail_once["armed"]:
            fail_once["armed"] = False
            raise RuntimeError("DEVICE_LOST: simulated ICI failure")
        return real_step(*args)

    runner._step = exploding_step
    import icet_tpu.parallel.elastic as elastic_mod

    monkeypatch.setattr(
        elastic_mod, "probe_devices", lambda devs=None: jax.devices()[:5]
    )

    res = runner.run(s1, s2, x0)
    assert runner.rebuilds == 1
    assert runner.shape == (1, 5)  # 5 devices -> dp=1, sp=5
    np.testing.assert_allclose(res.X, baseline.X, atol=1e-3)


def test_elastic_raises_on_non_device_error(batch):
    s1, s2, x0, _ = batch
    runner = ElasticRegistrationRunner(CFG, prefer_dp=2)

    def bad_step(*args):
        raise ValueError("a real bug, not a device failure")

    runner._step = bad_step
    with pytest.raises(ValueError):
        runner.run(s1, s2, x0)
    assert runner.rebuilds == 0


def _drive_scans(n=6):
    from icet_tpu.datasets.synthetic import simulate_scan

    scans = []
    for k in range(n):
        t = np.array([0.25 * k, 0.05 * k, 0.0], np.float32)
        scans.append(
            np.asarray(
                simulate_scan(pose_t=t, n_beams=16, n_azimuth=128, seed=7),
                np.float32,
            )
        )
    return scans


@pytest.mark.slow
def test_odometry_pipeline_recovers_from_device_loss(monkeypatch):
    """A failed dispatch mid-stream must not kill streaming odometry: the
    pipeline refits the model from the retained scan + host pose mirrors and
    the recovered trajectory is BIT-IDENTICAL to an unfailed run."""
    import icet_tpu.odometry as odo
    from icet_tpu.odometry import OdometryPipeline

    scans = _drive_scans()
    clean = OdometryPipeline(CFG)
    frames_clean = [f for f in (clean.step(s) for s in scans) if f is not None]

    real_step = odo.odometry_step_jit
    calls = {"n": 0}

    def flaky(*args, **kw):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("simulated device loss")
        return real_step(*args, **kw)

    monkeypatch.setattr(odo, "odometry_step_jit", flaky)
    pipe = OdometryPipeline(CFG)
    frames = [f for f in (pipe.step(s) for s in scans) if f is not None]

    assert pipe.recoveries == 1
    assert len(frames) == len(frames_clean)
    for a, b in zip(frames, frames_clean):
        np.testing.assert_array_equal(a.X, b.X)
        np.testing.assert_array_equal(a.T_world, b.T_world)
        assert a.diverged == b.diverged


@pytest.mark.slow
def test_odometry_dnn_recovers_from_device_loss(monkeypatch):
    """The DNN-filtered pipeline's recovery must also restore the previous
    scan (the filter samples it per voxel) — the recovered run is
    bit-identical to an unfailed one."""
    import icet_tpu.filters as filt_mod
    from icet_tpu.odometry import OdometryPipeline

    # sample_pts stays 100: that's the only bundled weight set
    cfg = CFG.replace(dnn_filter=True, dnn_start_iter=2)
    scans = _drive_scans()
    clean = OdometryPipeline(cfg)
    frames_clean = [f for f in (clean.step(s) for s in scans) if f is not None]

    real_step = filt_mod.odometry_step_dnn_jit
    calls = {"n": 0}

    def flaky(*args, **kw):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("simulated device loss")
        return real_step(*args, **kw)

    monkeypatch.setattr(filt_mod, "odometry_step_dnn_jit", flaky)
    pipe = OdometryPipeline(cfg)
    frames = [f for f in (pipe.step(s) for s in scans) if f is not None]

    assert pipe.recoveries == 1
    assert pipe._scan_prev is not None
    assert len(frames) == len(frames_clean)
    for a, b in zip(frames, frames_clean):
        np.testing.assert_array_equal(a.X, b.X)
        np.testing.assert_array_equal(a.T_world, b.T_world)


@pytest.mark.slow
def test_keyframe_recovers_from_device_loss(monkeypatch):
    """The fused keyframe step DONATES the block map, so a failed dispatch
    invalidates it — recovery must restore the newest host snapshot and
    keep the stream going (trajectory resumes at the last completed pose,
    not the origin)."""
    import icet_tpu.keyframe as kf_mod
    from icet_tpu.config import KeyframeConfig
    from icet_tpu.keyframe import KeyframeOdometry

    from icet_tpu.datasets.synthetic import simulate_scan

    # 32x256 rays: enough per-voxel support on this grid to track motion
    # (16x128 leaves most voxels under min_pts).
    scans = [
        np.asarray(
            simulate_scan(pose_t=np.array([0.3 * k, 0, 0]), seed=7,
                          n_beams=32, n_azimuth=256),
            np.float32,
        )
        for k in range(8)
    ]
    kf_cfg = KeyframeConfig(spawn_distance=1.0, delta_clamp=2.0)
    pipe = KeyframeOdometry(CFG, kf_cfg, snapshot_every=2)

    real_step = kf_mod.keyframe_step_jit
    calls = {"n": 0}

    def flaky(*args, **kw):
        calls["n"] += 1
        if calls["n"] == 4:
            raise RuntimeError("simulated device loss")
        return real_step(*args, **kw)

    monkeypatch.setattr(kf_mod, "keyframe_step_jit", flaky)
    frames = [f for f in (pipe.step(s) for s in scans) if f is not None]

    assert pipe.recoveries == 1
    # The retried frame re-seeds (returns None), so one fewer frame.
    assert len(frames) == len(scans) - 2
    # Stream stays healthy and the trajectory did NOT snap to the origin:
    # poses keep advancing past the failure point.
    assert all(np.isfinite(f.T_world).all() for f in frames)
    xs = [f.T_world[0, 3] for f in frames]
    assert xs[-1] > xs[0], xs
    # The block map is usable (not a donated/deleted buffer).
    assert np.isfinite(np.asarray(pipe.blockmap.points)).all()


@pytest.mark.slow
def test_mapmaker_recovers_from_device_loss(monkeypatch):
    """The mapping pipeline restores the newest host snapshot of the ring
    map (+ PRNG key + model refit) and retries; with snapshot_every=1 the
    recovered run is bit-identical to an unfailed one."""
    import icet_tpu.mapping as mp
    from icet_tpu.config import MapConfig
    from icet_tpu.mapping import MapMaker

    scans = _drive_scans()
    mcfg = MapConfig(capacity=20_000, points_per_scan=500)
    clean = MapMaker(CFG, mcfg, snapshot_every=1)
    for s in scans:
        clean.step(s)

    real_step = mp.map_step_jit
    calls = {"n": 0}

    def flaky(*args, **kw):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("simulated device loss")
        return real_step(*args, **kw)

    monkeypatch.setattr(mp, "map_step_jit", flaky)
    maker = MapMaker(CFG, mcfg, snapshot_every=1)
    for s in scans:
        maker.step(s)

    assert maker.recoveries == 1
    np.testing.assert_array_equal(maker.map_points(), clean.map_points())
    np.testing.assert_array_equal(maker.snail_trail(), clean.snail_trail())
