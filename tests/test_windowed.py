"""Windowed moment accumulation: CPU-hermetic correctness tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from icet_tpu.config import ICETConfig
from icet_tpu.datasets.loaders import detect_beam_count, to_beam_major
from icet_tpu.datasets.synthetic import scan_pair_with_ground_truth, simulate_scan
from icet_tpu.ops.clustering import membership
from icet_tpu.ops.geometry import cart_to_spherical
from icet_tpu.ops.grid import voxel_ids
from icet_tpu.ops.moments import voxel_moment_sums
from icet_tpu.ops.windowed_moments import (
    windowed_moment_sums,
    windowed_spill_sums,
)
from icet_tpu.solver import prepare_reference_jit, register_pair

CFG = ICETConfig(
    n_theta=48, n_phi=16, phi_min=np.pi / 3, phi_max=2 * np.pi / 3,
    n_iters=5, min_pts=20, min_range=1.0,
)


def _segsum_truth(pts, model, cfg):
    rtp = cart_to_spherical(pts)
    vid = voxel_ids(rtp, cfg)
    mem = membership(
        vid, rtp[..., 0], rtp[..., 0] >= cfg.min_range, model.bounds,
        cfg.n_voxels,
    )
    return voxel_moment_sums(pts, vid, mem, model.anchors, cfg.n_voxels)


@pytest.fixture(scope="module")
def scene():
    scan = simulate_scan(seed=3, n_beams=32, n_azimuth=509)
    model = prepare_reference_jit(
        jnp.asarray(scan), CFG.replace(moment_method="segsum")
    )
    return scan, model


def test_windowed_matches_segsum_on_ordered(scene):
    scan, model = scene
    sums, ovf = windowed_moment_sums(
        jnp.asarray(scan), jnp.zeros(6), model.bounds, model.anchors, CFG
    )
    assert int(ovf) == 0  # beam-major synthetic scan fits the window
    truth = _segsum_truth(jnp.asarray(scan), model, CFG)
    np.testing.assert_allclose(
        np.asarray(sums)[:, :10], np.asarray(truth)[:, :10],
        atol=2e-3,
    )


def test_windowed_detects_shuffled(scene, rng):
    scan, model = scene
    shuffled = scan[rng.permutation(len(scan))]
    _, ovf = windowed_moment_sums(
        jnp.asarray(shuffled), jnp.zeros(6), model.bounds, model.anchors, CFG
    )
    assert int(ovf) > 0  # must flag, so the solver falls back


def test_windowed_spill_path_exact(scene, rng):
    """A bounded number of out-of-window points (the keyframe-baseline
    parallax case) must be absorbed EXACTLY by the spill top-up:
    windowed + spill == segsum truth."""
    scan, model = scene
    corrupted = np.array(scan, np.float32)
    # Teleport a sprinkling of points to random other scan positions:
    # same point set, but some rows sit far outside their block's window
    # (out-of-order), exactly like parallax-displaced rows.
    idx = np.arange(0, len(scan), 97)
    corrupted[idx] = scan[rng.permutation(len(scan))[: len(idx)]]
    sums, ovf = windowed_moment_sums(
        jnp.asarray(corrupted), jnp.zeros(6), model.bounds, model.anchors,
        CFG,
    )
    # A stray low-phi point can drag its whole block's phi-anchor election
    # off the bulk, so overflow counts whole blocks, not just the
    # teleported rows — all that matters: nonzero, bounded, exactly
    # absorbed by the spill pass.
    assert 0 < int(ovf) <= 8192
    extra = windowed_spill_sums(
        jnp.asarray(corrupted), jnp.zeros(6), model.bounds, model.anchors,
        CFG,
    )
    truth = _segsum_truth(jnp.asarray(corrupted), model, CFG)
    np.testing.assert_allclose(
        np.asarray(sums + extra)[:, :10], np.asarray(truth)[:, :10],
        atol=2e-3,
    )

    # End to end: the solver's fused path must absorb the spill without
    # falling back — register on the corrupted cloud stays equal to the
    # segsum solve (the nested-cond routing in solver._fused_sums).
    res_f = register_pair(
        jnp.asarray(scan), jnp.asarray(corrupted), jnp.zeros(6),
        CFG.replace(moment_method="fused", n_iters=2),
    )
    res_s = register_pair(
        jnp.asarray(scan), jnp.asarray(corrupted), jnp.zeros(6),
        CFG.replace(moment_method="segsum", n_iters=2),
    )
    np.testing.assert_allclose(
        np.asarray(res_f.X), np.asarray(res_s.X), atol=1e-4
    )
    assert int(np.asarray(res_f.diagnostics.windowed_overflow).max()) > 0


@pytest.mark.slow
def test_fused_solver_path_matches_segsum():
    X_true = np.array([0.3, 0.1, 0.0, 0.0, 0.0, 0.01], np.float32)
    # Prime azimuth count: no ray lands exactly on a theta-bin edge, so
    # differently-fused programs cannot legitimately disagree on bin flips.
    scan1, scan2 = scan_pair_with_ground_truth(
        X_true, seed=6, n_beams=32, n_azimuth=509
    )
    res_f = register_pair(
        jnp.asarray(scan1), jnp.asarray(scan2), jnp.zeros(6),
        CFG.replace(moment_method="fused"),
    )
    res_s = register_pair(
        jnp.asarray(scan1), jnp.asarray(scan2), jnp.zeros(6),
        CFG.replace(moment_method="segsum"),
    )
    np.testing.assert_allclose(
        np.asarray(res_f.X), np.asarray(res_s.X), atol=1e-4
    )
    # z is weakly observed with this 32-beam band; assert the well-observed
    # components only (the point of this test is fused == segsum above).
    np.testing.assert_allclose(np.asarray(res_f.X)[:2], X_true[:2], atol=0.05)

    # Observability: a beam-major scan takes the fast path in (nearly)
    # every iteration — a handful of edge points can transiently overflow
    # at a particular X (observed: one iteration with overflow=3 on this
    # fixture; that is precisely what the hook surfaces) — while a
    # SHUFFLED scan reports massive overflow (silent 2x segsum fallback).
    ovf = np.asarray(res_f.diagnostics.windowed_overflow)
    assert ovf[0] == 0 and (ovf == 0).sum() >= ovf.size - 2, ovf
    rng = np.random.default_rng(0)
    res_shuf = register_pair(
        jnp.asarray(scan1), jnp.asarray(rng.permutation(scan2)), jnp.zeros(6),
        CFG.replace(moment_method="fused"),
    )
    assert int(np.asarray(res_shuf.diagnostics.windowed_overflow).max()) > 0
    # The segsum path reports 0 (field only meaningful on the fused path).
    assert int(np.asarray(res_s.diagnostics.windowed_overflow).max()) == 0


def test_windowed_nan_inputs(scene):
    """NaN points must be excluded exactly (where-guard), never poison the
    sums via NaN * 0 while overflow stays 0 (ADVICE r1, medium)."""
    scan, model = scene
    corrupted = np.array(scan, np.float32)
    corrupted[::97] = np.nan  # NaNs sprinkled through every block
    sums, ovf = windowed_moment_sums(
        jnp.asarray(corrupted), jnp.zeros(6), model.bounds, model.anchors, CFG
    )
    sums = np.asarray(sums)
    assert np.isfinite(sums).all()
    # And the result equals the segsum truth on the same corrupted cloud.
    truth = _segsum_truth(jnp.asarray(corrupted), model, CFG)
    np.testing.assert_allclose(sums[:, :10], np.asarray(truth)[:, :10], atol=2e-3)


def test_beam_major_restride_and_detection():
    scan = simulate_scan(seed=4, n_beams=32, n_azimuth=256)  # beam-major
    # Convert to azimuth-major (as Ouster exports) then detect + restore.
    az_major = np.ascontiguousarray(
        scan.reshape(32, 256, 3).transpose(1, 0, 2).reshape(-1, 3)
    )
    nb = detect_beam_count(az_major, candidates=(16, 32, 64))
    assert nb == 32
    restored = to_beam_major(az_major, nb)
    np.testing.assert_allclose(restored, scan)
