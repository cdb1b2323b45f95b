"""Fixed radial-shell (NDT-style) voxel mode tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from icet_tpu.config import ICETConfig
from icet_tpu.datasets.synthetic import scan_pair_with_ground_truth
from icet_tpu.ops.geometry import cart_to_spherical
from icet_tpu.ops.grid import fixed_shell_bounds, shell_edges, voxel_ids
from icet_tpu.solver import prepare_reference_jit, register_pair

FIXED = ICETConfig(
    n_theta=48,
    n_phi=16,
    phi_min=np.pi / 3,
    phi_max=2 * np.pi / 3,
    n_iters=8,
    min_pts=20,
    min_range=1.0,
    radial_mode="fixed",
    n_shells=40,
)


def test_shell_edges_geometric():
    e = np.asarray(shell_edges(FIXED))
    assert e.shape == (41,)
    assert e[0] == pytest.approx(FIXED.min_range)
    ratios = e[1:] / e[:-1]
    np.testing.assert_allclose(ratios, FIXED.shell_growth, rtol=1e-5)


def test_voxel_ids_shell_layout():
    # A point's id recovers its shell; membership in its own shell bounds.
    pts = jnp.asarray(
        np.array([[2.0, 0.0, 0.0], [20.0, 0.0, 0.0], [0.5, 0.0, 0.0]], np.float32)
    )
    rtp = cart_to_spherical(pts)
    vid = np.asarray(voxel_ids(rtp, FIXED))
    assert vid[2] == FIXED.n_voxels  # below min_range
    bounds = np.asarray(fixed_shell_bounds(FIXED))
    for k in range(2):
        b = bounds[vid[k]]
        r = float(rtp[k, 0])
        assert b[0] <= r <= b[1], (k, b, r)


def test_voxel_count():
    assert FIXED.n_voxels == 40 * 48 * 16


@pytest.mark.slow
def test_fixed_mode_recovers_transform():
    X_true = np.array([0.4, 0.2, 0.0, 0.0, 0.0, 0.02], np.float32)
    scan1, scan2 = scan_pair_with_ground_truth(X_true, seed=3)
    res = register_pair(
        jnp.asarray(scan1), jnp.asarray(scan2), jnp.zeros(6), FIXED
    )
    X = np.asarray(res.X)
    np.testing.assert_allclose(X[:3], X_true[:3], atol=0.05)
    np.testing.assert_allclose(X[3:], X_true[3:], atol=0.01)


def test_fixed_model_tables():
    scan1, _ = scan_pair_with_ground_truth(np.zeros(6), seed=4)
    model = prepare_reference_jit(jnp.asarray(scan1), FIXED)
    valid = np.asarray(model.valid)
    assert valid.sum() > 100
    b = np.asarray(model.bounds)
    # Every valid voxel's mean lies inside its shell.
    r = np.linalg.norm(np.asarray(model.mean)[valid], axis=1)
    assert (r >= b[valid, 0] - 1e-3).all() and (r <= b[valid, 1] + 1e-3).all()
