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


def test_diagnostics_replicated(batch):
    scans1, scans2, _ = batch
    mesh = registration_mesh(dp=2, sp=4)
    step = make_sharded_register(CFG, mesh)
    s1, s2, s0 = shard_scan_batch(scans1, scans2, np.zeros((2, 6), np.float32), mesh)
    res = step(s1, s2, s0)
    assert np.asarray(res.diagnostics.n_corr).shape == (2, CFG.n_iters)
    assert (np.asarray(res.diagnostics.n_corr) > 50).all()
