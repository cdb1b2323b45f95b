import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icet_tpu.ops import geometry as geo


def test_c2s_s2c_roundtrip(rng):
    pts = rng.normal(size=(5000, 3)).astype(np.float32) * 30
    rtp = geo.cart_to_spherical(jnp.asarray(pts))
    back = geo.spherical_to_cart(rtp)
    # f32 trig roundtrip: error scales with radius.
    r = np.linalg.norm(pts, axis=1, keepdims=True)
    bound = np.broadcast_to(1e-5 * r + 1e-4, pts.shape)
    np.testing.assert_array_less(np.abs(np.asarray(back) - pts), bound)


def test_c2s_conventions():
    # theta wrapped to [0, 2pi), phi from +z (reference utils.cpp:100-109)
    pts = jnp.array([[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, 2.0]])
    rtp = np.asarray(geo.cart_to_spherical(pts))
    np.testing.assert_allclose(rtp[0], [1.0, 0.0, np.pi / 2], atol=1e-6)
    np.testing.assert_allclose(rtp[1], [1.0, 1.5 * np.pi, np.pi / 2], atol=1e-6)
    np.testing.assert_allclose(rtp[2], [2.0, 0.0, 0.0], atol=1e-6)


def test_c2s_degenerate():
    pts = jnp.array([[0.0, 0.0, 0.0], [np.nan, 1.0, 1.0]])
    rtp = np.asarray(geo.cart_to_spherical(pts))
    assert np.isfinite(rtp).all()
    np.testing.assert_allclose(rtp[0], 0.0)


def test_euler_R_orthonormal(rng):
    angs = jnp.asarray(rng.uniform(-np.pi, np.pi, size=(100, 3)).astype(np.float32))
    R = np.asarray(geo.euler_R(angs))
    eye = np.broadcast_to(np.eye(3), R.shape)
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_euler_R_axis_conventions():
    # Pure yaw (psi about z): reference utils.cpp:144-152 row layout.
    R = np.asarray(geo.euler_R(jnp.array([0.0, 0.0, 0.1])))
    c, s = np.cos(0.1), np.sin(0.1)
    np.testing.assert_allclose(
        R, [[c, s, 0], [-s, c, 0], [0, 0, 1]], atol=1e-6
    )
    # Pure roll (phi about x).
    R = np.asarray(geo.euler_R(jnp.array([0.1, 0.0, 0.0])))
    np.testing.assert_allclose(
        R, [[1, 0, 0], [0, c, s], [0, -s, c]], atol=1e-6
    )


def test_rotation_jacobian_matches_finite_difference():
    angs = jnp.array([0.3, -0.2, 0.5])
    J = np.asarray(geo.rotation_jacobian(angs))
    eps = 1e-4
    for k in range(3):
        d = np.zeros(3)
        d[k] = eps
        num = (
            np.asarray(geo.euler_R(angs + d)) - np.asarray(geo.euler_R(angs - d))
        ) / (2 * eps)
        np.testing.assert_allclose(J[..., k], num, atol=1e-3)


def test_transform_points_roundtrip(rng):
    pts = jnp.asarray(rng.normal(size=(200, 3)).astype(np.float32) * 10)
    X = jnp.array([1.0, -2.0, 0.5, 0.1, -0.05, 0.2])
    moved = geo.transform_points(pts, X)
    # Invert: p = R(-a)^T (p' - t)
    rot = geo.euler_R(-X[3:6])
    back = (moved - X[:3]) @ rot
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_pose_matrix_matches_transform(rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    X = jnp.array([0.5, 0.1, -0.2, 0.02, 0.05, -0.1])
    T = np.asarray(geo.pose_matrix(X))
    homo = np.concatenate([pts, np.ones((50, 1), np.float32)], axis=1)
    via_T = (homo @ T.T)[:, :3]
    via_fn = np.asarray(geo.transform_points(jnp.asarray(pts), X))
    np.testing.assert_allclose(via_T, via_fn, atol=1e-5)


def test_compose_pose_chains():
    X1 = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.3])
    X2 = jnp.array([0.0, 2.0, 0.0, 0.1, 0.0, 0.0])
    T = geo.compose_pose(geo.compose_pose(jnp.eye(4), X1), X2)
    p = jnp.array([[3.0, -1.0, 2.0]])
    # Applying T should equal applying X2 then X1 (frame-to-frame chaining).
    step = geo.transform_points(geo.transform_points(p, X2), X1)
    homo = jnp.concatenate([p, jnp.ones((1, 1))], axis=1)
    np.testing.assert_allclose(
        np.asarray((homo @ T.T)[:, :3]), np.asarray(step), atol=1e-5
    )


def test_euler_from_R_inverts(rng):
    angs = rng.uniform(-0.8, 0.8, size=(20, 3)).astype(np.float32)
    R = geo.euler_R(jnp.asarray(angs))
    rec = np.asarray(geo.euler_from_R(R))
    np.testing.assert_allclose(rec, angs, atol=1e-4)


def test_rotmat_to_euler_reference_contract(rng):
    # R2Euler inverts the TRANSPOSE of euler_R (python/utils.py:273-286).
    angs = rng.uniform(-0.8, 0.8, size=(20, 3)).astype(np.float32)
    R = geo.euler_R(jnp.asarray(angs))
    rec = np.asarray(geo.rotmat_to_euler(jnp.swapaxes(R, -1, -2)))
    np.testing.assert_allclose(rec, angs, atol=1e-4)


def test_pose_to_state_roundtrip(rng):
    X = np.array([1.0, -2.0, 0.5, 0.3, -0.2, 0.4], np.float32)
    rec = np.asarray(geo.pose_to_state(geo.pose_matrix(jnp.asarray(X))))
    np.testing.assert_allclose(rec, X, atol=1e-5)


def test_measurement_jacobian_shape_and_identity_block():
    mu = jnp.asarray(np.random.default_rng(0).normal(size=(7, 3)).astype(np.float32))
    H = np.asarray(geo.measurement_jacobian(mu, jnp.zeros(3)))
    assert H.shape == (7, 3, 6)
    np.testing.assert_allclose(
        H[:, :, :3], np.broadcast_to(-np.eye(3), (7, 3, 3)), atol=1e-6
    )
    # At zero angles, dR/dpsi @ mu has the classic skew structure about z.
    np.testing.assert_allclose(H[:, 0, 5], mu[:, 1], atol=1e-5)
    np.testing.assert_allclose(H[:, 1, 5], -mu[:, 0], atol=1e-5)


def test_compose_and_relative_state(rng):
    xa = jnp.asarray(rng.uniform(-1, 1, 6).astype(np.float32))
    xb = jnp.asarray(rng.uniform(-1, 1, 6).astype(np.float32))
    # compose_states matches 4x4 composition.
    Tc = np.asarray(geo.pose_matrix(xa)) @ np.asarray(geo.pose_matrix(xb))
    np.testing.assert_allclose(
        np.asarray(geo.pose_matrix(geo.compose_states(xa, xb))), Tc, atol=1e-5
    )
    # relative_state is the exact inverse: compose(xa, relative(xa, xb)) == xb.
    rec = np.asarray(geo.compose_states(xa, geo.relative_state(xa, xb)))
    np.testing.assert_allclose(rec, np.asarray(xb), atol=1e-5)
    # relative of a pose with itself is the identity step.
    np.testing.assert_allclose(
        np.asarray(geo.relative_state(xa, xa)), np.zeros(6), atol=1e-6
    )
