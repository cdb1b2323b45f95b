import numpy as np
import jax.numpy as jnp

from icet_tpu.config import ICETConfig
from icet_tpu.ops.geometry import cart_to_spherical, spherical_to_cart
from icet_tpu.ops.grid import voxel_anchors, voxel_angle_centers, voxel_ids


CFG = ICETConfig(n_theta=8, n_phi=4)


def test_voxel_ids_layout():
    # Point on +x axis, equator: theta bin 0, phi bin at pi/2 -> iphi=2 of 4.
    rtp = cart_to_spherical(jnp.array([[10.0, 0.0, 0.0]]))
    vid = int(np.asarray(voxel_ids(rtp, CFG))[0])
    assert vid == 2 * 8 + 0  # iphi * n_theta + itheta (reference icet.cpp:149)


def test_voxel_ids_sentinel_for_close_points():
    rtp = cart_to_spherical(jnp.array([[0.05, 0.0, 0.0], [0.0, 0.0, 0.0]]))
    vid = np.asarray(voxel_ids(rtp, CFG))
    assert (vid == CFG.n_voxels).all()


def test_voxel_ids_band_restriction():
    cfg = ICETConfig(n_theta=8, n_phi=4, phi_min=np.pi / 3, phi_max=2 * np.pi / 3)
    # Point near +z pole is outside the band.
    rtp = cart_to_spherical(jnp.array([[0.1, 0.0, 10.0], [10.0, 0.0, 0.0]]))
    vid = np.asarray(voxel_ids(rtp, cfg))
    assert vid[0] == cfg.n_voxels
    assert vid[1] < cfg.n_voxels


def test_voxel_ids_theta_wrap(rng):
    # All azimuths fall in a bin; ids cover the full table.
    pts = rng.normal(size=(20000, 3)).astype(np.float32) * 20
    rtp = cart_to_spherical(jnp.asarray(pts))
    vid = np.asarray(voxel_ids(rtp, CFG))
    ok = vid[vid < CFG.n_voxels]
    assert ok.min() >= 0 and ok.max() < CFG.n_voxels
    assert len(np.unique(ok)) == CFG.n_voxels  # every voxel hit


def test_bin_center_consistency():
    theta_c, phi_c = voxel_angle_centers(CFG)
    rtp = jnp.stack(
        [jnp.full((CFG.n_voxels,), 10.0), theta_c, phi_c], axis=-1
    )
    vid = np.asarray(voxel_ids(rtp, CFG))
    np.testing.assert_array_equal(vid, np.arange(CFG.n_voxels))


def test_voxel_anchors_inside_bounds():
    bounds = np.zeros((CFG.n_voxels + 1, 2), np.float32)
    bounds[:, 0] = 5.0
    bounds[:, 1] = 7.0
    anchors = np.asarray(voxel_anchors(jnp.asarray(bounds), CFG))
    r = np.linalg.norm(anchors[:-1], axis=1)
    # Anchors are bf16-rounded (fused-kernel consistency): ~0.4% tolerance.
    np.testing.assert_allclose(r, 6.0, atol=0.05)
    np.testing.assert_allclose(anchors[-1], 0.0)
    # Anchor maps back to its own voxel.
    rtp = cart_to_spherical(jnp.asarray(anchors[:-1]))
    vid = np.asarray(voxel_ids(rtp, CFG))
    np.testing.assert_array_equal(vid, np.arange(CFG.n_voxels))
