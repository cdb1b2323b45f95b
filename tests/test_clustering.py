import numpy as np
import pytest
import jax.numpy as jnp

from icet_tpu.ops.clustering import membership, radial_cluster_bounds
from tests.oracle import cluster_oracle

V = 16
MIN_PTS = 5
GAP = 0.3
BUFF = 0.1


def _run(vid, r, valid=None):
    vid = np.asarray(vid, np.int32)
    r = np.asarray(r, np.float32)
    if valid is None:
        valid = np.ones_like(r, bool)
    res = radial_cluster_bounds(
        jnp.asarray(vid), jnp.asarray(r), jnp.asarray(valid), V, MIN_PTS, GAP, BUFF
    )
    return np.asarray(res.bounds), np.asarray(res.found)


def test_single_cluster():
    r = np.linspace(5.0, 5.0 + 0.2 * 9, 10)  # gaps 0.2 <= GAP
    bounds, found = _run(np.zeros(10), r)
    assert found[0]
    np.testing.assert_allclose(bounds[0], [r[0] - BUFF, r[-1] + BUFF], atol=1e-5)
    assert not found[1:].any()


def test_too_few_points():
    r = np.linspace(5.0, 5.6, 4)  # only 4 points < MIN_PTS
    bounds, found = _run(np.zeros(4), r)
    assert not found.any()
    np.testing.assert_allclose(bounds, 0.0)


def test_first_qualifying_run_wins():
    # Near noise blob of 3 pts, then a 6-pt cluster, then a far 8-pt cluster.
    r = np.concatenate(
        [
            [1.0, 1.1, 1.2],
            np.linspace(4.0, 4.5, 6),
            np.linspace(20.0, 20.7, 8),
        ]
    )
    bounds, found = _run(np.zeros(len(r)), r)
    assert found[0]
    np.testing.assert_allclose(bounds[0], [4.0 - BUFF, 4.5 + BUFF], atol=1e-5)


def test_gap_splits_runs():
    # 9 points but a > GAP jump in the middle: two 4/5-pt runs -> only the
    # 5-pt one qualifies.
    r = np.concatenate([np.linspace(2.0, 2.3, 4), np.linspace(3.5, 3.9, 5)])
    bounds, found = _run(np.zeros(9), r)
    assert found[0]
    np.testing.assert_allclose(bounds[0], [3.5 - BUFF, 3.9 + BUFF], atol=1e-5)


def test_cluster_at_end_of_spike():
    r = np.concatenate([[0.5, 0.9], np.linspace(10.0, 10.5, 6)])
    bounds, found = _run(np.zeros(8), r)
    assert found[0]
    np.testing.assert_allclose(bounds[0], [10.0 - BUFF, 10.5 + BUFF], atol=1e-5)


def test_multiple_spikes_independent():
    vid = np.array([0] * 6 + [3] * 6 + [7] * 3)
    r = np.concatenate(
        [np.linspace(5, 5.5, 6), np.linspace(8, 8.5, 6), [1, 2, 3]]
    )
    bounds, found = _run(vid, r)
    assert found[0] and found[3] and not found[7]
    np.testing.assert_allclose(bounds[0], [5 - BUFF, 5.5 + BUFF], atol=1e-5)
    np.testing.assert_allclose(bounds[3], [8 - BUFF, 8.5 + BUFF], atol=1e-5)


def test_invalid_points_excluded():
    r = np.linspace(5.0, 5.9, 10)
    valid = np.ones(10, bool)
    valid[5:] = False  # only 5 valid points -> 5 >= MIN_PTS qualifies
    bounds, found = _run(np.zeros(10), r, valid)
    assert found[0]
    np.testing.assert_allclose(bounds[0], [r[0] - BUFF, r[4] + BUFF], atol=1e-5)


def test_unsorted_input_order():
    rng = np.random.default_rng(3)
    r = np.linspace(5.0, 5.5, 8)
    perm = rng.permutation(8)
    bounds, found = _run(np.zeros(8), r[perm])
    assert found[0]
    np.testing.assert_allclose(bounds[0], [5.0 - BUFF, 5.5 + BUFF], atol=1e-5)


def test_against_oracle_random(rng):
    n = 4000
    vid = rng.integers(0, V, n)
    r = rng.uniform(0.5, 60.0, n).astype(np.float32)
    bounds, found = _run(vid, r)
    by_spike = {s: r[vid == s] for s in range(V)}
    expected = cluster_oracle(by_spike, MIN_PTS, GAP, BUFF)
    for s in range(V):
        if expected[s] is None:
            assert not found[s], f"spike {s}"
        else:
            assert found[s], f"spike {s}"
            np.testing.assert_allclose(bounds[s], expected[s], atol=1e-5)


def test_membership():
    bounds = np.zeros((V + 1, 2), np.float32)
    bounds[2] = [4.0, 6.0]
    vid = np.array([2, 2, 2, 5, 2], np.int32)
    r = np.array([3.9, 4.0, 6.0, 5.0, 6.1], np.float32)
    valid = np.ones(5, bool)
    m = np.asarray(
        membership(jnp.asarray(vid), jnp.asarray(r), jnp.asarray(valid),
                   jnp.asarray(bounds), V)
    )
    np.testing.assert_array_equal(m, [False, True, True, False, False])


@pytest.mark.parametrize("grid", [(48, 16), (75, 24)])
def test_counts_hinted_path_bit_identical(grid):
    """The counts-hinted readback (windowed_vid_counts feeding
    radial_cluster_bounds) must match the probe-row path bit-for-bit on
    beam-major scans, and the counts themselves must be exact."""
    import jax.numpy as jnp

    from icet_tpu import ICETConfig
    from icet_tpu.datasets.synthetic import simulate_scan
    from icet_tpu.ops.clustering import radial_cluster_bounds
    from icet_tpu.ops.geometry import cart_to_spherical
    from icet_tpu.ops.grid import voxel_ids
    from icet_tpu.ops.windowed_moments import windowed_vid_counts

    cfg = ICETConfig(n_theta=grid[0], n_phi=grid[1], min_pts=10,
                     min_range=1.0)
    scan = jnp.asarray(
        np.asarray(simulate_scan(n_beams=32, n_azimuth=512, seed=5), np.float32)
    )
    rtp = cart_to_spherical(scan)
    r = rtp[..., 0]
    vid = voxel_ids(rtp, cfg)
    valid = r >= cfg.min_range
    counts, ovf = windowed_vid_counts(vid, valid, cfg)
    assert int(ovf) == 0
    ref_counts = np.bincount(
        np.where(np.asarray(valid), np.asarray(vid), cfg.n_voxels),
        minlength=cfg.n_voxels + 1,
    )
    np.testing.assert_array_equal(np.asarray(counts), ref_counts)

    probe = radial_cluster_bounds(
        vid, r, valid, cfg.n_voxels, cfg.min_pts, cfg.cluster_gap,
        cfg.cluster_buffer,
    )
    hinted = radial_cluster_bounds(
        vid, r, valid, cfg.n_voxels, cfg.min_pts, cfg.cluster_gap,
        cfg.cluster_buffer, counts=counts,
    )
    np.testing.assert_array_equal(
        np.asarray(probe.bounds), np.asarray(hinted.bounds)
    )
    np.testing.assert_array_equal(
        np.asarray(probe.found), np.asarray(hinted.found)
    )
