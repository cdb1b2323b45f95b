import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icet_tpu.config import ICETConfig, MapConfig
from icet_tpu.datasets.replay import SyntheticTrajectorySource
from icet_tpu.mapping import MapMaker, init_map, map_update

CFG = ICETConfig(
    n_theta=48,
    n_phi=16,
    phi_min=np.pi / 3,
    phi_max=2 * np.pi / 3,
    n_iters=6,
    min_pts=20,
    min_range=1.0,
)
MCFG = MapConfig(capacity=10_000, points_per_scan=1_000)


def test_map_update_reexpression():
    """Inserted points are re-expressed exactly when the frame moves."""
    state = init_map(MCFG)
    key = jax.random.PRNGKey(0)
    scan0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(2000, 3)).astype(np.float32) * 10
    )
    state = map_update(state, scan0, jnp.zeros(6), key, MCFG, 0.2)
    # map_update donates its state buffers: snapshot before the next call.
    old = np.asarray(state.points[: MCFG.points_per_scan])
    X = jnp.asarray(np.array([0.5, -0.2, 0.1, 0.02, -0.01, 0.03], np.float32))
    # Insert an empty scan but move the frame by X.
    state2 = map_update(
        state, jnp.zeros((2000, 3)), X, key, MCFG, 0.2
    )
    from icet_tpu.ops.geometry import euler_R

    rot = np.asarray(euler_R(-X[3:6]))
    expected = (old - np.asarray(X[:3])) @ rot
    np.testing.assert_allclose(
        np.asarray(state2.points[:MCFG.points_per_scan]), expected, atol=1e-5
    )


def test_map_update_ring_wraps():
    state = init_map(MCFG)
    key = jax.random.PRNGKey(1)
    scan = jnp.asarray(
        np.random.default_rng(1).normal(size=(3000, 3)).astype(np.float32) * 5 + 10
    )
    for i in range(12):  # 12 * 1000 > capacity 10k
        key, sub = jax.random.split(key)
        state = map_update(state, scan, jnp.zeros(6), sub, MCFG, 0.2)
    assert int(np.asarray(state.valid).sum()) == MCFG.capacity
    assert int(state.write_ptr) == (12 * 1000) % MCFG.capacity


def test_map_update_short_scan_marks_invalid():
    """Fewer valid points than points_per_scan must not fabricate points
    (the reference's out-of-bounds downsample bug, simpleMapMaker.cpp:156)."""
    state = init_map(MCFG)
    pts = np.zeros((2000, 3), np.float32)
    pts[:300] = np.random.default_rng(2).normal(size=(300, 3)) * 5 + 20
    state = map_update(
        state, jnp.asarray(pts), jnp.zeros(6), jax.random.PRNGKey(2), MCFG, 0.2
    )
    assert int(np.asarray(state.valid).sum()) == 300


@pytest.mark.slow
def test_map_step_jit_matches_unfused_trio():
    """The fused single-dispatch mapping step must reproduce the unfused
    register -> guard -> map_update -> prepare sequence bit-for-bit."""
    from icet_tpu.mapping import map_step_jit
    from icet_tpu.solver import prepare_reference_jit, register_jit

    src = SyntheticTrajectorySource(
        n_frames=2, speed=0.3, yaw_rate=0.01, n_beams=48, n_azimuth=512
    )
    (scan0, _), (scan1, _) = list(src)
    scan0 = jnp.asarray(scan0, jnp.float32)
    scan1 = jnp.asarray(scan1, jnp.float32)
    key = jax.random.PRNGKey(7)
    clamp = jnp.float32(0.9)

    model = prepare_reference_jit(scan0, CFG)
    state = init_map(MCFG)
    state = map_update(state, scan0, jnp.zeros(6), key, MCFG, CFG.min_range)

    # Unfused path (state buffers are donated, so build a fresh copy).
    res_u = register_jit(model, scan1, jnp.zeros(6, jnp.float32), CFG)
    X_u = np.asarray(res_u.X)
    assert np.all(np.abs(X_u) <= 0.9), "fixture should not trip the guard"
    state_u = map_update(
        jax.tree.map(jnp.copy, state), scan1, res_u.X, key, MCFG,
        CFG.min_range,
    )

    res_f, X_f, diverged, state_f, model_f = map_step_jit(
        model, jax.tree.map(jnp.copy, state), scan1, key, clamp, CFG, MCFG
    )
    assert not bool(diverged)
    np.testing.assert_array_equal(np.asarray(X_f), X_u)
    np.testing.assert_array_equal(
        np.asarray(state_f.points), np.asarray(state_u.points)
    )
    np.testing.assert_array_equal(
        np.asarray(state_f.valid), np.asarray(state_u.valid)
    )
    model_direct = prepare_reference_jit(scan1, CFG)
    np.testing.assert_array_equal(
        np.asarray(model_f.mean), np.asarray(model_direct.mean)
    )

    # Divergence guard: a tiny clamp zeroes X and inserts with identity.
    res_g, X_g, diverged_g, _, _ = map_step_jit(
        model, jax.tree.map(jnp.copy, state), scan1, key,
        jnp.float32(1e-6), CFG, MCFG,
    )
    assert bool(diverged_g)
    np.testing.assert_array_equal(np.asarray(X_g), np.zeros(6, np.float32))


@pytest.mark.slow
def test_mapmaker_accumulates_consistent_map():
    src = SyntheticTrajectorySource(
        n_frames=5, speed=0.2, yaw_rate=0.0, n_beams=48, n_azimuth=512
    )
    frames = list(src)
    mm = MapMaker(CFG, MCFG)
    out = [mm.step(scan) for scan, _ in frames]
    assert out[0] is None
    assert all(f is not None and not f.diverged for f in out[1:])
    pts = mm.map_points()
    assert len(pts) == pytest.approx(5 * MCFG.points_per_scan, abs=MCFG.points_per_scan)
    # Map is expressed in the NEWEST frame: re-projecting the final frame's
    # own scan points should overlap the map's bounding box.
    assert np.abs(pts).max() < 150

    trail = mm.snail_trail()
    assert trail.shape[0] == 5
    # The trail's consecutive displacement should be ~ the 0.2 m/frame speed
    # in the sensor frame.
    steps = np.linalg.norm(np.diff(trail, axis=0), axis=1)
    np.testing.assert_allclose(steps, 0.2, atol=0.05)
