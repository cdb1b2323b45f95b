import numpy as np
import jax.numpy as jnp
import pytest

from icet_tpu.ops.moments import voxel_moments
from tests.oracle import moments_oracle

V = 12


def _run(points, vid, member, anchors=None, method="segsum"):
    if anchors is None:
        anchors = np.zeros((V + 1, 3), np.float32)
    return voxel_moments(
        jnp.asarray(points, jnp.float32),
        jnp.asarray(vid, jnp.int32),
        jnp.asarray(member),
        jnp.asarray(anchors, jnp.float32),
        V,
        method=method,
    )


@pytest.mark.parametrize("method", ["segsum", "onehot", "pallas"])
def test_against_oracle(rng, method):
    n = 3000
    points = rng.normal(size=(n, 3)).astype(np.float32) * 5
    vid = rng.integers(0, V + 1, n).astype(np.int32)
    member = rng.random(n) > 0.2
    m = _run(points, vid, member, method=method)
    count, mean, cov = moments_oracle(points, vid, member, V)
    # Sentinel voxel collects non-members; only compare real voxels.
    np.testing.assert_allclose(np.asarray(m.count)[:V], count[:V], atol=1e-3)
    sel = count[:V] > 0
    np.testing.assert_allclose(np.asarray(m.mean)[:V][sel], mean[:V][sel], atol=1e-4)
    sel2 = count[:V] > 1
    np.testing.assert_allclose(np.asarray(m.cov)[:V][sel2], cov[:V][sel2], atol=1e-4)


@pytest.mark.parametrize("method", ["segsum", "onehot", "pallas"])
def test_precision_far_from_origin(rng, method):
    """The reason for anchored accumulation: a tight (1 cm) cluster 100 m out
    must yield an accurate covariance in f32 — naive E[xx]-E[x]^2 math loses
    all digits to cancellation there."""
    n = 500
    center = np.array([80.0, -60.0, 10.0], np.float32)
    pts = (center + rng.normal(size=(n, 3)) * 0.01).astype(np.float32)
    anchors = np.zeros((V + 1, 3), np.float32)
    anchors[4] = center  # anchor near the cluster, as voxel_anchors provides
    vid = np.full(n, 4, np.int32)
    m = _run(pts, vid, np.ones(n, bool), anchors, method=method)
    _, mean, cov = moments_oracle(pts, vid, np.ones(n, bool), V)
    np.testing.assert_allclose(np.asarray(m.mean)[4], mean[4], atol=1e-4)
    np.testing.assert_allclose(np.asarray(m.cov)[4], cov[4], rtol=2e-3, atol=1e-9)


def test_methods_agree(rng):
    n = 2048
    points = rng.normal(size=(n, 3)).astype(np.float32) * 20
    vid = rng.integers(0, V, n).astype(np.int32)
    member = np.ones(n, bool)
    a = _run(points, vid, member, method="segsum")
    b = _run(points, vid, member, method="onehot")
    np.testing.assert_allclose(np.asarray(a.count), np.asarray(b.count), atol=1e-3)
    np.testing.assert_allclose(np.asarray(a.mean), np.asarray(b.mean), atol=1e-3)
    np.testing.assert_allclose(np.asarray(a.cov), np.asarray(b.cov), atol=1e-3)


def test_empty_and_singleton_voxels():
    pts = np.array([[1.0, 2.0, 3.0]], np.float32)
    m = _run(pts, np.array([0]), np.array([True]))
    assert np.asarray(m.count)[0] == 1
    np.testing.assert_allclose(np.asarray(m.mean)[0], pts[0], atol=1e-6)
    assert np.isfinite(np.asarray(m.cov)).all()
    assert np.asarray(m.count)[1:].sum() == 0
