"""Degenerate-input robustness: the solver must stay finite (no NaNs, no
crashes) on pathological clouds — planar scenes, tiny clouds, all-padding,
duplicated points.  The reference handles these only with try/catch
swallowing (scanMatcher.cpp:98-104)."""

import numpy as np
import jax.numpy as jnp
import pytest

from icet_tpu.config import ICETConfig
from icet_tpu.solver import prepare_reference_jit, register_pair

CFG = ICETConfig(
    n_theta=24, n_phi=8, phi_min=np.pi / 3, phi_max=2 * np.pi / 3,
    n_iters=4, min_pts=10, min_range=1.0,
)


def _solve(c1, c2):
    return register_pair(
        jnp.asarray(c1, jnp.float32), jnp.asarray(c2, jnp.float32),
        jnp.zeros(6), CFG,
    )


def _finite(res):
    assert np.isfinite(np.asarray(res.X)).all()
    assert np.isfinite(np.asarray(res.pred_stds)).all()
    assert np.isfinite(np.asarray(res.Q)).all()


@pytest.mark.slow
def test_all_padding():
    res = _solve(np.zeros((4096, 3)), np.zeros((4096, 3)))
    _finite(res)
    np.testing.assert_allclose(np.asarray(res.X), 0.0)


@pytest.mark.slow
def test_single_plane_scene(rng):
    """A lone ground plane: translation in-plane and yaw are unobservable;
    the condition pruning must suppress them without NaNs."""
    xy = rng.uniform(-20, 20, size=(8192, 2))
    pts = np.concatenate(
        [xy, np.full((8192, 1), -2.0) + rng.normal(0, 0.02, (8192, 1))], axis=1
    )
    # A pure plane still carries weak in-plane information through noise;
    # use a tight cutoff so the pruning path is exercised.
    res = register_pair(
        jnp.asarray(pts, jnp.float32), jnp.asarray(pts, jnp.float32),
        jnp.zeros(6), CFG.replace(condition_cutoff=1e3),
    )
    _finite(res)
    d = np.asarray(res.diagnostics.n_dropped_axes)
    assert d[-1] >= 1  # ambiguous axes were pruned
    # And the pruned axes inflate the predicted stds.
    assert np.asarray(res.pred_stds).max() > 0.1


@pytest.mark.slow
def test_tiny_cloud(rng):
    pts = rng.normal(size=(64, 3)).astype(np.float32) * 10
    res = _solve(pts, pts)
    _finite(res)


@pytest.mark.slow
def test_duplicated_points(rng):
    p = rng.normal(size=(1, 3)).astype(np.float32) * 10 + 20
    pts = np.repeat(p, 4096, axis=0)  # zero covariance everywhere
    res = _solve(pts, pts)
    _finite(res)


def test_nan_inputs(rng):
    pts = rng.normal(size=(4096, 3)).astype(np.float32) * 10
    pts[::7] = np.nan
    res = _solve(pts, pts.copy())
    _finite(res)


def test_huge_ranges(rng):
    pts = rng.normal(size=(4096, 3)).astype(np.float32) * 1e4
    res = _solve(pts, pts)
    _finite(res)


def test_prepare_reference_finite_on_degenerate(rng):
    pts = np.zeros((1024, 3), np.float32)
    pts[:512] = rng.normal(size=(512, 3)) * 5 + 10
    model = prepare_reference_jit(jnp.asarray(pts), CFG)
    for leaf in model:
        assert np.isfinite(np.asarray(leaf, dtype=np.float64)).all()


def test_shuffled_cloud_matches_ordered(rng):
    """A shuffled (non-beam-major) cloud must produce the same voxel model
    as the ordered one through the fused path: the windowed count/moment
    kernels overflow and fall back (lax.cond) to the order-independent
    paths — clustering bounds exactly, moments to f32 summation order."""
    import jax.numpy as jnp

    from icet_tpu import ICETConfig
    from icet_tpu.datasets.synthetic import simulate_scan
    from icet_tpu.solver import prepare_reference_jit

    cfg = ICETConfig(
        n_theta=24, n_phi=8, phi_min=np.pi / 3, phi_max=2 * np.pi / 3,
        min_pts=10, min_range=1.0, moment_method="fused",
    )
    scan = np.asarray(simulate_scan(n_beams=16, n_azimuth=256, seed=9),
                      np.float32)
    shuffled = scan[rng.permutation(scan.shape[0])]
    m_ord = prepare_reference_jit(jnp.asarray(scan), cfg)
    m_shuf = prepare_reference_jit(jnp.asarray(shuffled), cfg)
    np.testing.assert_array_equal(
        np.asarray(m_ord.bounds), np.asarray(m_shuf.bounds)
    )
    np.testing.assert_array_equal(
        np.asarray(m_ord.valid), np.asarray(m_shuf.valid)
    )
    np.testing.assert_array_equal(
        np.asarray(m_ord.count), np.asarray(m_shuf.count)
    )
    np.testing.assert_allclose(
        np.asarray(m_ord.mean), np.asarray(m_shuf.mean), atol=1e-4
    )
