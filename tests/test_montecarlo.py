"""Monte-Carlo validation of the predicted error covariance — the papers'
headline claim (SURVEY.md section 4: "pred_stds matches empirical error
spread").  The reference never automated this.

256 independent noise realizations are solved in one compiled program
(lax.scan over vmapped chunks of 32 — ~11 s on CPU), and consistency is
asserted NEES-style: per-component normalized errors z = (err - bias)/pred
must satisfy a chi-square-like band on mean(z^2) plus a 3-sigma coverage
bound.  Measured values on this fixture: mean z^2 per component 0.45-0.71
(pred_stds mildly conservative), coverage 100%, ratio emp/pred 0.67-0.84 —
far inside the asserted bands, which are in turn ~40x tighter in variance
than the previous 16-run 10x-ratio test.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icet_tpu.config import ICETConfig
from icet_tpu.datasets.synthetic import Scene, simulate_scan
from icet_tpu.ops.geometry import euler_R
from icet_tpu.solver import prepare_reference, register

CFG = ICETConfig(
    n_theta=48,
    n_phi=16,
    phi_min=np.pi / 3,
    phi_max=2 * np.pi / 3,
    n_iters=6,
    min_pts=20,
    min_range=1.0,
)


def _solve_mc(scan1, scans2, cfg, x0s=None):
    """All trials in one compiled program (lax.scan over vmapped chunks)."""
    K = scans2.shape[0]
    B = 32
    assert K % B == 0
    if x0s is None:
        x0s = np.zeros((K, 6), np.float32)

    @jax.jit
    def run(s1, s2chunks, x0chunks):
        model = prepare_reference(s1, cfg)

        def chunk(_, args):
            s2b, x0b = args
            r = jax.vmap(lambda s2, x0: register(model, s2, x0, cfg))(
                s2b, x0b
            )
            return None, (r.X, r.pred_stds)

        _, (Xs, stds) = jax.lax.scan(chunk, None, (s2chunks, x0chunks))
        return Xs.reshape(-1, 6), stds.reshape(-1, 6)

    Xs, stds = run(
        jnp.asarray(scan1),
        jnp.asarray(scans2.reshape(K // B, B, -1, 3)),
        jnp.asarray(np.asarray(x0s, np.float32).reshape(K // B, B, 6)),
    )
    return np.asarray(Xs), np.asarray(stds)


def _stats(X, S, X_true):
    err = X - np.asarray(X_true)[None, :]
    bias = err.mean(axis=0)
    z = (err - bias) / S
    return dict(
        bias=bias,
        nees=(z**2).mean(axis=0),
        cover=(np.abs(z) < 3.0).mean(),
        ratio=err.std(axis=0) / S.mean(axis=0),
        pred=S.mean(axis=0),
    )


@pytest.mark.integration
def test_pred_stds_track_empirical_error():
    X_true = np.array([0.3, -0.1, 0.02, 0.0, 0.0, 0.01], np.float64)
    R_c = np.asarray(euler_R(jnp.asarray(-X_true[3:6])))
    kw = dict(n_beams=48, n_azimuth=512)
    scan1 = simulate_scan(seed=7, **kw)

    K, B = 256, 32
    scans2 = np.stack(
        [
            simulate_scan(pose_t=X_true[:3], pose_R=R_c, seed=100 + i, **kw)
            for i in range(K)
        ]
    )

    @jax.jit
    def solve_chunks(s1, s2chunks):
        model = prepare_reference(s1, CFG)

        def chunk(_, s2b):
            f = lambda s2: register(model, s2, jnp.zeros(6, jnp.float32), CFG)
            r = jax.vmap(f)(s2b)
            return None, (r.X, r.pred_stds)

        _, (Xs, stds) = jax.lax.scan(chunk, None, s2chunks)
        return Xs.reshape(-1, 6), stds.reshape(-1, 6)

    Xs, stds = solve_chunks(
        jnp.asarray(scan1), jnp.asarray(scans2.reshape(K // B, B, -1, 3))
    )
    X = np.asarray(Xs)
    S = np.asarray(stds)

    err = X - X_true[None, :]
    bias = err.mean(axis=0)
    z = (err - bias) / S

    # NEES-style band: if pred_stds were exact, mean(z^2) -> 1 with sampling
    # std sqrt(2/K) ~ 0.09.  The band [0.2, 2.5] allows the model's mild
    # conservatism (measured ~0.45-0.71) while rejecting any >~1.6x
    # understatement or >2x overstatement of the std.
    nees = (z**2).mean(axis=0)
    assert (nees > 0.2).all() and (nees < 2.5).all(), nees

    # 3-sigma coverage: at least 97% of normalized errors inside +-3.
    assert (np.abs(z) < 3.0).mean() >= 0.97, (np.abs(z) < 3.0).mean(0)

    # Systematic voxelization bias stays bounded by the predicted scale
    # (pred covariance models the RANDOM error; bias is the known residual
    # imperfection — measured <= ~1x pred std on this fixture).
    assert (np.abs(bias) < 2.0 * S.mean(axis=0) + 2e-4).all(), (
        bias, S.mean(axis=0),
    )

    # And the raw spread agreement that the old 16-run test asserted at 10x,
    # now at 2x on every component.
    ratio = err.std(axis=0) / S.mean(axis=0)
    assert (ratio < 2.0).all() and (ratio > 0.3).all(), ratio


# ---------------------------------------------------------------------------
# Consistency under CONTAMINATION — the regime the flagship drive actually
# faces and where pose_graph.py weights factors by psd_pinv(Q) (VERDICT r4
# #3).  All bounds are set from measured values (tools/mc_contaminated.py;
# table in RESULTS.md), with sampling margin at K=128 (NEES sampling std
# sqrt(2/K) ~ 0.125).
# ---------------------------------------------------------------------------

K_C = 128


def _corrupt(scan, rng, dropout_frac=0.12, range_bias_std=0.02):
    """The CityDriveSource --dynamic corruptions (replay.py:270-283):
    per-trial azimuth dropout sector + common-mode range bias."""
    scan = scan.copy()
    r = np.linalg.norm(scan, axis=1, keepdims=True)
    bias = rng.normal(0.0, range_bias_std)
    scale = (r + bias) / np.maximum(r, 1e-6)
    scan = np.where(r > 1e-6, scan * scale, scan).astype(np.float32)
    az = np.arctan2(scan[:, 1], scan[:, 0])
    a0 = rng.uniform(-np.pi, np.pi)
    half = dropout_frac * np.pi
    d = np.abs((az - a0 + np.pi) % (2 * np.pi) - np.pi)
    scan[(d < half) & (r[:, 0] > 1e-6)] = 0.0
    return scan


def _dynamic_fixture():
    """Moving car (displaces 1.5 m between the scans) + per-trial dropout
    sector + per-trial common-mode range bias — the flagship drive's
    contamination at pair level, RM on."""
    X_true = np.array([0.9, -0.1, 0.0, 0.0, 0.0, 0.02])
    R_c = np.asarray(euler_R(jnp.asarray(-X_true[3:6])))
    base = Scene()
    car1 = (7.0, 9.4, -3.2, -0.8, -2.0, -0.4)
    car2 = (8.5, 10.9, -3.2, -0.8, -2.0, -0.4)
    sc1 = dataclasses.replace(base, boxes=base.boxes + (car1,))
    sc2 = dataclasses.replace(base, boxes=base.boxes + (car2,))
    kw = dict(n_beams=48, n_azimuth=512)
    scan1 = simulate_scan(seed=7, scene=sc1, **kw)
    rng = np.random.default_rng(4242)
    scans2 = np.stack([
        _corrupt(simulate_scan(pose_t=X_true[:3], pose_R=R_c, scene=sc2,
                               seed=100 + i, **kw), rng)
        for i in range(K_C)
    ])
    return X_true, scan1, scans2


@pytest.mark.integration
def test_pred_stds_consistent_under_contamination_with_range_sigma():
    """With the calibration-aware covariance term (cfg.range_sigma set to
    the fixture's actual 2 cm common-mode jitter), pred_stds are consistent
    under the flagship contamination: measured NEES 0.58-2.02, coverage
    0.995 (tools/mc_contaminated.py 2026-08-20)."""
    X_true, scan1, scans2 = _dynamic_fixture()
    cfg = CFG.replace(remove_moving=True, rm_start_iter=3, n_iters=8,
                      range_sigma=0.02)
    X, S = _solve_mc(scan1, scans2, cfg)
    st = _stats(X, S, X_true)
    assert (st["nees"] > 0.15).all() and (st["nees"] < 4.0).all(), st
    assert st["cover"] >= 0.96, st
    assert (st["ratio"] < 2.0).all(), st


@pytest.mark.integration
def test_pred_stds_understate_without_range_sigma():
    """Documented boundary (reference-inherited): common-mode range error
    is absorbed as pose error residual statistics cannot see — without
    range_sigma the empirical spread exceeds pred_stds 6-12x on the
    affected axes (measured ratio [6.1, 10.6, 11.7, 1.8, 1.9, 8.4]).
    This test pins WHY the knob exists; if the plain solver ever becomes
    consistent here, the knob and this test should both be revisited."""
    X_true, scan1, scans2 = _dynamic_fixture()
    cfg = CFG.replace(remove_moving=True, rm_start_iter=3, n_iters=8)
    X, S = _solve_mc(scan1, scans2, cfg)
    st = _stats(X, S, X_true)
    assert st["ratio"].max() > 3.0, st
    # The understatement is bounded (nothing diverges) — errors stay cm.
    assert np.abs(X - X_true[None]).max() < 0.05, st


# ---------------------------------------------------------------------------
# Degenerate geometry: corridor (the papers' tunnel scenario).
# Warm-started trials (truth +- 5 cm / 0.5 deg): corridors are an odometry
# regime, and thin crossing faces only correspond within their radial run
# bounds.
# ---------------------------------------------------------------------------

_GUARD = dict(clip_fill=0.6, condition_cutoff=1e4)


def _corridor_fixture(textured):
    boxes = ()
    if textured:
        boxes = ((14.0, 14.5, 0.5, 3.0, -2.0, 10.0),
                 (-11.0, -10.5, -3.0, -0.5, -2.0, 10.0))
    sc = Scene(ground_z=-2.0, walls=((1, 3.0, -1), (1, -3.0, 1)),
               boxes=boxes, max_range=120.0)
    X_true = np.array([0.4, 0.0, 0.0, 0.0, 0.0, 0.0])
    kw = dict(n_beams=48, n_azimuth=512)
    scan1 = simulate_scan(seed=7, scene=sc, **kw)
    scans2 = np.stack([
        simulate_scan(pose_t=X_true[:3], pose_R=np.eye(3), scene=sc,
                      seed=100 + i, **kw)
        for i in range(K_C)
    ])
    rng = np.random.default_rng(777)
    x0s = X_true[None] + np.concatenate([
        rng.uniform(-0.05, 0.05, (K_C, 3)),
        rng.uniform(-0.01, 0.01, (K_C, 3)),
    ], axis=1)
    return X_true, scan1, scans2, x0s


@pytest.mark.integration
def test_corridor_blind_guarded_flags_unobservable():
    """Featureless corridor with the degeneracy guard (clip_fill +
    tightened condition cutoff): the along-track axis is globally pruned
    and its pred_std INFLATES to ~1 (honest "unobservable" flag), the
    estimate stays at the warm start instead of being pulled by grid
    artifacts, and the observable axes stay consistent.  Measured: pred_x
    1.008, coverage 1.0 (tools/mc_contaminated.py 2026-08-20)."""
    X_true, scan1, scans2, x0s = _corridor_fixture(textured=False)
    X, S = _solve_mc(scan1, scans2, CFG.replace(**_GUARD), x0s=x0s)
    st = _stats(X, S, X_true)
    assert st["pred"][0] > 0.5, st  # dropped-axis inflation fired
    assert abs(st["bias"][0]) < 0.02, st  # stays at the warm start
    assert st["cover"] >= 0.97, st
    assert (st["nees"][1:] < 4.0).all(), st


@pytest.mark.integration
def test_corridor_blind_parity_boundary():
    """Reference-parity config on the same corridor: grid-artifact
    constraints (grazing near-radial axes the endpoint test cannot catch,
    wall-ground seam voxels) pull the unobservable axis while claiming
    mm-scale precision — bias_x/pred_x measured 60x.  Both references
    share this failure (same endpoint test, cutoffs 1e6/1e7); the pinned
    boundary documents what the guard exists to fix."""
    X_true, scan1, scans2, x0s = _corridor_fixture(textured=False)
    X, S = _solve_mc(scan1, scans2, CFG, x0s=x0s)
    st = _stats(X, S, X_true)
    assert abs(st["bias"][0]) / st["pred"][0] > 10.0, st


@pytest.mark.integration
def test_corridor_textured_guarded_solves_along_track():
    """Corridor with two door jambs (true along-track information): the
    guard must NOT prune x — the solve recovers it honestly (measured
    bias_x -1.3 mm, NEES_x 0.51, pred_x 1.1 mm) while still suppressing
    the grid artifacts."""
    X_true, scan1, scans2, x0s = _corridor_fixture(textured=True)
    X, S = _solve_mc(scan1, scans2, CFG.replace(**_GUARD), x0s=x0s)
    st = _stats(X, S, X_true)
    assert st["pred"][0] < 0.01, st  # x observed, not pruned
    assert abs(st["bias"][0]) < 0.005, st
    assert st["nees"][0] < 3.0, st
    assert st["cover"] >= 0.97, st


@pytest.mark.integration
def test_clean_fixture_unaffected_by_guard():
    """The guard must be a no-op where information is rich: on the clean
    fixture it leaves X and consistency unchanged (measured NEES shift
    < 0.06 per component)."""
    X_true = np.array([0.3, -0.1, 0.02, 0.0, 0.0, 0.01])
    R_c = np.asarray(euler_R(jnp.asarray(-X_true[3:6])))
    kw = dict(n_beams=48, n_azimuth=512)
    scan1 = simulate_scan(seed=7, **kw)
    scans2 = np.stack([
        simulate_scan(pose_t=X_true[:3], pose_R=R_c, seed=100 + i, **kw)
        for i in range(K_C)
    ])
    X, S = _solve_mc(scan1, scans2, CFG.replace(**_GUARD))
    st = _stats(X, S, X_true)
    assert (st["nees"] > 0.2).all() and (st["nees"] < 2.5).all(), st
    assert st["cover"] >= 0.97, st
