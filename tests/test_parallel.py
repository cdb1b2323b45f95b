"""Multi-device SPMD tests on the 8-virtual-CPU-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icet_tpu.config import ICETConfig
from icet_tpu.datasets.synthetic import scan_pair_with_ground_truth
from icet_tpu.parallel.sharding import (
    make_sharded_register,
    registration_mesh,
    shard_scan_batch,
)
from icet_tpu.solver import register_pair

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
def batch():
    xs = [
        np.array([0.4, 0.1, 0.0, 0.0, 0.0, 0.01], np.float32),
        np.array([-0.2, 0.3, 0.05, 0.0, 0.0, -0.02], np.float32),
    ]
    pairs = [scan_pair_with_ground_truth(x, seed=10 + i) for i, x in enumerate(xs)]
    scans1 = np.stack([p[0] for p in pairs])
    scans2 = np.stack([p[1] for p in pairs])
    return scans1, scans2, np.stack(xs)


def test_device_count():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("dp,sp", [(1, 8), (2, 4), (2, 1)])
@pytest.mark.slow
def test_sharded_matches_single_device(batch, dp, sp):
    scans1, scans2, xs_true = batch
    mesh = registration_mesh(dp=dp, sp=sp, devices=jax.devices()[: dp * sp])
    step = make_sharded_register(CFG, mesh)
    x0 = np.zeros((2, 6), np.float32)
    s1, s2, s0 = shard_scan_batch(scans1, scans2, x0, mesh)
    res = step(s1, s2, s0)
    X = np.asarray(res.X)

    # Reference: plain single-device solves.
    for b in range(2):
        single = register_pair(
            jnp.asarray(scans1[b]), jnp.asarray(scans2[b]), jnp.zeros(6), CFG
        )
        np.testing.assert_allclose(X[b], np.asarray(single.X), atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(res.pred_stds)[b],
            np.asarray(single.pred_stds),
            rtol=0.05,
            atol=1e-5,
        )
        # f32 reduction-order differences can flip a handful of points sitting
        # exactly on a voxel bound; require near-identical masks.
        flips = (
            np.asarray(res.static_mask)[b] != np.asarray(single.static_mask)
        ).sum()
        assert flips <= 5, flips

    # And both recover the ground truth.
    np.testing.assert_allclose(X[:, :3], xs_true[:, :3], atol=0.03)
    np.testing.assert_allclose(X[:, 3:], xs_true[:, 3:], atol=0.01)


@pytest.mark.slow
def test_diagnostics_replicated(batch):
    scans1, scans2, _ = batch
    mesh = registration_mesh(dp=2, sp=4)
    step = make_sharded_register(CFG, mesh)
    s1, s2, s0 = shard_scan_batch(scans1, scans2, np.zeros((2, 6), np.float32), mesh)
    res = step(s1, s2, s0)
    assert np.asarray(res.diagnostics.n_corr).shape == (2, CFG.n_iters)
    assert (np.asarray(res.diagnostics.n_corr) > 50).all()


def _cluster_inputs(scan, cfg):
    from icet_tpu.ops.geometry import cart_to_spherical
    from icet_tpu.ops.grid import voxel_ids

    rtp = cart_to_spherical(jnp.asarray(scan))
    r = rtp[..., 0]
    return voxel_ids(rtp, cfg), r, r >= cfg.min_range


@pytest.mark.parametrize("capacity_factor", [2.0, 0.02])
def test_distributed_clustering_bitmatches_replicated(batch, capacity_factor):
    """The all_to_all-sharded radial clustering must produce bit-identical
    bounds to the replicated sort — both in the normal regime and when tiny
    bucket capacity forces the overflow fallback (capacity_factor=0.02)."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from icet_tpu.ops.clustering import (
        distributed_radial_cluster_bounds,
        radial_cluster_bounds,
    )

    scans1, _, _ = batch
    scan = scans1[0]
    vid, r, ok = _cluster_inputs(scan, CFG)
    golden = radial_cluster_bounds(
        jnp.where(ok, vid, CFG.n_voxels), r, ok, CFG.n_voxels, CFG.min_pts,
        CFG.cluster_gap, CFG.cluster_buffer,
    )

    mesh = Mesh(np.array(jax.devices()), ("sp",))

    def local_fn(vid_l, r_l, ok_l):
        return distributed_radial_cluster_bounds(
            vid_l, r_l, ok_l, CFG.n_voxels, CFG.min_pts, CFG.cluster_gap,
            CFG.cluster_buffer, "sp", capacity_factor=capacity_factor,
        )

    dist = jax.jit(
        shard_map(
            local_fn, mesh=mesh,
            in_specs=(P("sp"), P("sp"), P("sp")),
            out_specs=P(),
            check_vma=False,
        )
    )(vid, r, ok)

    np.testing.assert_array_equal(
        np.asarray(dist.bounds), np.asarray(golden.bounds)
    )
    np.testing.assert_array_equal(
        np.asarray(dist.found), np.asarray(golden.found)
    )


@pytest.mark.slow
def test_sharded_register_uses_distributed_clustering(batch):
    """End-to-end: the sp-sharded registration (which now clusters via
    all_to_all instead of gathering the cloud) still matches single-device."""
    scans1, scans2, xs_true = batch
    mesh = registration_mesh(dp=1, sp=8)
    step = make_sharded_register(CFG, mesh)
    x0 = np.zeros((2, 6), np.float32)
    s1, s2, s0 = shard_scan_batch(scans1, scans2, x0, mesh)
    res = step(s1, s2, s0)
    single = register_pair(
        jnp.asarray(scans1[0]), jnp.asarray(scans2[0]), jnp.zeros(6), CFG
    )
    np.testing.assert_allclose(
        np.asarray(res.X)[0], np.asarray(single.X), atol=5e-4
    )
