import numpy as np
import jax.numpy as jnp
import pytest

from icet_tpu.config import ICETConfig, PROFILES
from icet_tpu.datasets.synthetic import scan_pair_with_ground_truth
from icet_tpu.solver import prepare_reference_jit, register_pair


SYN_CFG = ICETConfig(
    n_theta=48,
    n_phi=16,
    phi_min=np.pi / 3,
    phi_max=2 * np.pi / 3,
    n_iters=8,
    min_pts=20,
    min_range=1.0,
)


def _register_synthetic(X_true, seed=0, cfg=SYN_CFG, x0=None, **kw):
    scan1, scan2 = scan_pair_with_ground_truth(np.asarray(X_true), seed=seed, **kw)
    x0 = jnp.zeros(6) if x0 is None else jnp.asarray(x0)
    return register_pair(jnp.asarray(scan1), jnp.asarray(scan2), x0, cfg)


class TestKnownTransformRecovery:
    """The dormant `true_transform` idea from reference msg/Num.msg:5 /
    fake_lidar.py:177-178, automated: register scans with exact synthetic
    ground truth and require recovery."""

    @pytest.mark.slow
    def test_identity(self):
        res = _register_synthetic(np.zeros(6))
        np.testing.assert_allclose(np.asarray(res.X)[:3], 0.0, atol=5e-3)
        np.testing.assert_allclose(np.asarray(res.X)[3:], 0.0, atol=2e-3)

    @pytest.mark.parametrize(
        "X_true",
        [
            [0.5, 0.0, 0.0, 0.0, 0.0, 0.0],
            [0.3, -0.4, 0.05, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 0.0, 0.0, 0.03],
            [0.4, 0.2, -0.05, 0.01, -0.01, 0.02],
        ],
    )
    @pytest.mark.slow
    def test_recovers_transform(self, X_true):
        res = _register_synthetic(X_true)
        X = np.asarray(res.X)
        np.testing.assert_allclose(X[:3], X_true[:3], atol=0.03)
        np.testing.assert_allclose(X[3:], X_true[3:], atol=0.01)

    def test_warm_start_converges_faster(self):
        X_true = np.array([0.6, 0.3, 0.0, 0.0, 0.0, 0.02])
        cold = _register_synthetic(X_true)
        warm = _register_synthetic(X_true, x0=X_true.astype(np.float32))
        assert np.asarray(warm.diagnostics.dx_norm)[0] < np.asarray(
            cold.diagnostics.dx_norm
        )[0]
        np.testing.assert_allclose(np.asarray(warm.X)[:3], X_true[:3], atol=0.03)

    def test_error_within_predicted_bounds(self):
        """The paper's headline claim: pred_stds characterises actual error.
        Require |error| < 6 * pred_stds + small floor per component."""
        X_true = np.array([0.4, -0.2, 0.03, 0.0, 0.0, 0.01])
        res = _register_synthetic(X_true)
        err = np.abs(np.asarray(res.X) - X_true)
        bound = 6.0 * np.asarray(res.pred_stds) + 5e-3
        assert (err < bound).all(), (err, np.asarray(res.pred_stds))


class TestDiagnostics:
    def test_iteration_diagnostics_shapes(self):
        res = _register_synthetic([0.2, 0.0, 0.0, 0.0, 0.0, 0.0])
        d = res.diagnostics
        assert np.asarray(d.n_corr).shape == (SYN_CFG.n_iters,)
        assert (np.asarray(d.n_corr) > 50).all()
        assert np.isfinite(np.asarray(d.condition)).all()
        # dx should shrink as the solve converges.
        dx = np.asarray(d.dx_norm)
        assert dx[-1] < dx[0]

    def test_q_matches_pred_stds(self):
        res = _register_synthetic([0.2, 0.1, 0.0, 0.0, 0.0, 0.0])
        q_diag = np.sqrt(np.abs(np.diag(np.asarray(res.Q))))
        # pred_stds = sqrt(|diag Q|) (+ inflation only when axes are dropped)
        dropped = np.asarray(res.diagnostics.n_dropped_axes)[-1]
        if dropped == 0:
            np.testing.assert_allclose(
                np.asarray(res.pred_stds), q_diag, rtol=1e-4
            )


class TestVoxelModel:
    def test_prepare_reference_tables(self):
        scan1, _ = scan_pair_with_ground_truth(np.zeros(6), seed=1)
        model = prepare_reference_jit(jnp.asarray(scan1), SYN_CFG)
        V1 = SYN_CFG.n_voxels + 1
        assert np.asarray(model.valid).shape == (V1,)
        valid = np.asarray(model.valid)
        assert valid.sum() > 50
        assert not valid[-1]  # sentinel row never valid
        b = np.asarray(model.bounds)
        assert (b[valid, 1] > b[valid, 0]).all()
        # Means of valid voxels are inside their radial bounds.
        r = np.linalg.norm(np.asarray(model.mean)[valid], axis=1)
        assert (r > b[valid, 0] - 0.5).all() and (r < b[valid, 1] + 0.5).all()
        # Covariances are symmetric PSD-ish.
        cov = np.asarray(model.cov)[valid]
        np.testing.assert_allclose(cov, np.swapaxes(cov, -1, -2), atol=1e-5)
        assert (np.linalg.eigvalsh(cov) > -1e-4).all()
        # lmask zero on invalid voxels
        assert np.asarray(model.lmask)[~valid].sum() == 0

    def test_extended_surface_suppression_on_wall(self):
        """A voxel on a large flat wall must have its in-plane (extended)
        directions suppressed but keep the normal direction."""
        scan1, _ = scan_pair_with_ground_truth(np.zeros(6), seed=2)
        model = prepare_reference_jit(jnp.asarray(scan1), SYN_CFG)
        valid = np.asarray(model.valid)
        lmask = np.asarray(model.lmask)[valid]
        # Plenty of voxels should have at least one suppressed axis (walls and
        # ground dominate the synthetic scene) but not all axes suppressed.
        frac_suppressed = (lmask.sum(axis=1) < 3).mean()
        assert frac_suppressed > 0.3
        assert (lmask.sum(axis=1) > 0).mean() > 0.5


class TestMovingObjectRejection:
    @pytest.mark.slow
    def test_moving_cluster_rejected(self):
        X_true = np.zeros(6)
        scan1, scan2 = scan_pair_with_ground_truth(X_true, seed=3)
        # Inject a "moving object": displace a blob of points 1 m sideways in
        # scan 2 only.
        blob_center = np.array([12.0, 3.0, -1.0], np.float32)
        d1 = np.linalg.norm(scan1 - blob_center, axis=1)
        rng = np.random.default_rng(0)
        blob = (blob_center + rng.normal(size=(800, 3)) * 0.3).astype(np.float32)
        scan1 = np.concatenate([scan1, blob])
        scan2 = np.concatenate([scan2, blob + np.array([1.0, 0.0, 0.0], np.float32)])
        cfg = SYN_CFG.replace(remove_moving=True, rm_start_iter=3)
        res = register_pair(jnp.asarray(scan1), jnp.asarray(scan2), jnp.zeros(6), cfg)
        rejected = np.asarray(res.diagnostics.n_rejected_moving)
        assert rejected[: cfg.rm_start_iter].sum() == 0
        assert rejected[-1] >= 1
        np.testing.assert_allclose(np.asarray(res.X)[:3], 0.0, atol=0.05)

    def test_static_mask_shape(self):
        res = _register_synthetic([0.1, 0.0, 0.0, 0.0, 0.0, 0.0])
        mask = np.asarray(res.static_mask)
        assert mask.dtype == bool
        assert 0 < mask.sum() < mask.size


@pytest.mark.integration
class TestReferenceGolden:
    """Corridor test against the reference notebook's recorded output on the
    bundled sample clouds (python/ICET_demo.ipynb cell 2-3: X converges to
    ~[0.665, 0.009, 0.015, 0.0019, -5e-4, -4e-4] with ~5 mm run-to-run
    variance from its own RNG)."""

    def test_sample_pair_matches_reference(self, sample_clouds):
        c1, c2 = sample_clouds
        res = register_pair(
            jnp.asarray(c1), jnp.asarray(c2), jnp.zeros(6), PROFILES["notebook"]
        )
        X = np.asarray(res.X)
        golden = np.array([0.665, 0.009, 0.0155, 0.0019, -5.0e-4, -4.0e-4])
        np.testing.assert_allclose(X[:3], golden[:3], atol=0.02)
        np.testing.assert_allclose(X[3:], golden[3:], atol=0.002)
        stds = np.asarray(res.pred_stds)
        golden_stds = np.array(
            [1.18e-3, 5.5e-4, 7.7e-5, 1.70e-5, 1.06e-5, 8.3e-5]
        )
        assert (stds / golden_stds < 3.0).all()
        assert (stds / golden_stds > 1 / 3.0).all()

    def test_frame_804_805_matches_reference_python(self, frame_clouds):
        """Second corridor: the bundled Ouster pair at the reference
        python's fid=75 configuration (75 theta x 24 phi over
        [3pi/8, 7pi/8] — ICET_spherical.py:1210-1211,99-105 — the same bin
        counts as the C++ mapping node, simpleMapMaker.cpp:113-119).

        Golden value measured by running the UNMODIFIED reference python
        through tools/oracle/run_refpy.py (6 seeds, spread ~1e-3/component):
          X = [-0.0259, -0.1014, 0.0321, -0.0126, -0.0098, -0.0282]
        The reference C++ at the same grid gives y = -0.006 — the outlier
        (its math deviates from the python's; we follow the python, see
        tools/oracle/README.md for the three-way comparison and the
        synthetic-ground-truth head-to-head where the C++ errs 5.7 mm vs
        our 0.6 mm).  Corridor width covers the remaining legitimate
        estimator difference: our full-point voxel moments vs the
        reference's fixed 25-point subsample reweight voxels differently
        (~1 cm scene-dependent shift on real data, zero on synthetics).
        """
        c1, c2 = frame_clouds
        cfg = ICETConfig(
            n_theta=75,
            n_phi=24,
            phi_min=3 * np.pi / 8,
            phi_max=7 * np.pi / 8,
            n_iters=12,
            min_range=0.2,
            cluster_gap=0.5,
            cluster_buffer=0.1,
            sigma_scale=3.0,
            condition_cutoff=1e7,
            remove_moving=True,
        )
        res = register_pair(jnp.asarray(c1), jnp.asarray(c2), jnp.zeros(6), cfg)
        X = np.asarray(res.X)
        golden = np.array([-0.0259, -0.1014, 0.0321, -0.0126, -0.0098, -0.0282])
        np.testing.assert_allclose(X[:3], golden[:3], atol=0.02)
        np.testing.assert_allclose(X[3:], golden[3:], atol=0.005)
        stds = np.asarray(res.pred_stds)
        golden_stds = np.array([3.2e-4, 4.2e-4, 1.6e-4, 2.8e-5, 2.1e-5, 3.7e-5])
        assert (stds / golden_stds < 3.0).all()
        assert (stds / golden_stds > 1 / 3.0).all()


class TestConvergenceEarlyExit:
    """The lax.while_loop early-exit path (convergence_tol > 0) — the
    default odometry profile and the headline benchmark configuration."""

    @pytest.mark.slow
    def test_matches_fixed_runlen(self):
        X_true = np.array([0.25, 0.1, 0.02, 0.01, -0.005, 0.02], np.float32)
        scan1, scan2 = scan_pair_with_ground_truth(X_true, seed=4)
        fixed = register_pair(
            jnp.asarray(scan1), jnp.asarray(scan2), jnp.zeros(6), SYN_CFG
        )
        early = register_pair(
            jnp.asarray(scan1), jnp.asarray(scan2), jnp.zeros(6),
            SYN_CFG.replace(convergence_tol=1e-4),
        )
        np.testing.assert_allclose(
            np.asarray(early.X), np.asarray(fixed.X), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(early.pred_stds), np.asarray(fixed.pred_stds),
            rtol=0.05, atol=1e-5,
        )
        assert np.isfinite(np.asarray(early.Q)).all()

    @pytest.mark.slow
    def test_converged_branch_diagnostics(self):
        """Warm-started at the solution the loop must actually exit early,
        and skipped diagnostic slots must repeat the LAST EXECUTED values
        (dx_norm[-1] is close_loops' convergence gate — zeros would fake
        convergence)."""
        X_true = np.array([0.2, 0.05, 0.0, 0.0, 0.0, 0.01], np.float32)
        scan1, scan2 = scan_pair_with_ground_truth(X_true, seed=5)
        cfg = SYN_CFG.replace(convergence_tol=1e-4)
        res = register_pair(
            jnp.asarray(scan1), jnp.asarray(scan2), jnp.asarray(X_true), cfg
        )
        dx = np.asarray(res.diagnostics.dx_norm)
        n_exec = 1 + int(np.sum(dx[1:] != dx[:-1]))
        assert n_exec < cfg.n_iters, dx  # it really exited early
        # Tail repeats the final executed value.
        assert dx[-1] == dx[n_exec - 1]
        assert np.all(np.asarray(res.diagnostics.n_corr) > 0)
        # Same solution as the full fixed-runlen solve from the same start
        # (truth-accuracy itself is fixture-limited on this coarse grid).
        full = register_pair(
            jnp.asarray(scan1), jnp.asarray(scan2), jnp.asarray(X_true),
            SYN_CFG,
        )
        np.testing.assert_allclose(
            np.asarray(res.X), np.asarray(full.X), atol=2e-4
        )

    @pytest.mark.slow
    def test_early_exit_cannot_skip_moving_object_rejection(self):
        """A converged warm start must not exit before rm_start_iter when
        remove_moving is on — the rejection would silently never run."""
        X_true = np.zeros(6)
        scan1, scan2 = scan_pair_with_ground_truth(X_true, seed=3)
        blob_center = np.array([12.0, 3.0, -1.0], np.float32)
        rng = np.random.default_rng(0)
        blob = (blob_center + rng.normal(size=(800, 3)) * 0.3).astype(np.float32)
        scan1 = np.concatenate([scan1, blob])
        scan2 = np.concatenate(
            [scan2, blob + np.array([1.0, 0.0, 0.0], np.float32)]
        )
        cfg = SYN_CFG.replace(
            remove_moving=True, rm_start_iter=3, convergence_tol=1e-4
        )
        # Warm start AT the solution: without the rm_start_iter floor the
        # loop would exit after one iteration and never reject anything.
        res = register_pair(
            jnp.asarray(scan1), jnp.asarray(scan2), jnp.zeros(6), cfg
        )
        rejected = np.asarray(res.diagnostics.n_rejected_moving)
        assert rejected[-1] >= 1, rejected


class TestNdtSuppression:
    """Legacy NDT-threshold axis suppression (cfg.suppression="ndt"),
    reference get_U_and_L(method=0) "NDT override"
    (ICET_spherical.py:682-716)."""

    def test_formula_matches_reference_math(self):
        # Independent numpy re-derivation of the TF reference:
        #   rotated = |U @ diag(lambda)|; keep axis k iff
        #   all_i rotated[i, k] <= width(shell)**2.
        from icet_tpu.solver import _ndt_axis_mask

        rng = np.random.default_rng(11)
        V = 17
        A = rng.normal(size=(V, 3, 3))
        cov = A @ np.transpose(A, (0, 2, 1))
        eigvals, basis = np.linalg.eigh(cov)
        bounds = np.stack(
            [rng.uniform(1, 5, V), rng.uniform(5, 9, V)], axis=-1
        )
        valid = rng.uniform(size=V) > 0.2
        cfg = SYN_CFG
        got = np.asarray(_ndt_axis_mask(
            jnp.asarray(eigvals), jnp.asarray(basis), jnp.asarray(bounds),
            jnp.asarray(valid), cfg,
        ))
        thr = (bounds[:, 1] - bounds[:, 0]) ** 2
        rotated = np.abs(basis * eigvals[:, None, :])  # U @ diag(lam)
        want = (~np.any(rotated > thr[:, None, None], axis=1)) & valid[:, None]
        np.testing.assert_array_equal(got, want.astype(got.dtype))

    def test_pancake_vs_blob(self):
        # A huge flat surface keeps only its normal axis; a compact blob
        # keeps all three.
        from icet_tpu.solver import _ndt_axis_mask

        eigvals = jnp.asarray([[25.0, 25.0, 1e-4], [1e-3, 1e-3, 1e-3]])
        basis = jnp.tile(jnp.eye(3)[None], (2, 1, 1))
        bounds = jnp.asarray([[2.0, 3.0], [2.0, 3.0]])  # width 1 -> thr 1
        valid = jnp.asarray([True, True])
        m = np.asarray(_ndt_axis_mask(eigvals, basis, bounds, valid, SYN_CFG))
        np.testing.assert_array_equal(m[0], [0.0, 0.0, 1.0])
        np.testing.assert_array_equal(m[1], [1.0, 1.0, 1.0])

    @pytest.mark.slow
    def test_registration_still_converges(self):
        X_true = np.array([0.1, -0.05, 0.02, 0.01, -0.005, 0.004])
        res = _register_synthetic(
            X_true, seed=6, cfg=SYN_CFG.replace(suppression="ndt")
        )
        np.testing.assert_allclose(
            np.asarray(res.X), X_true, atol=5e-2
        )


class TestStatisticalExit:
    """convergence_stat_scale: stop once the GN step falls below a multiple
    of the solve's own predicted standard error (no reference equivalent —
    the production-iteration-count lever, VERDICT r3 #5)."""

    def _n_exec(self, res):
        dx = np.asarray(res.diagnostics.dx_norm)
        return 1 + int(np.sum(dx[1:] != dx[:-1]))

    @pytest.mark.slow
    def test_fewer_iterations_solution_within_noise(self):
        X_true = np.array([0.2, 0.08, 0.01, 0.008, -0.004, 0.01], np.float32)
        scan1, scan2 = scan_pair_with_ground_truth(X_true, seed=8)
        # warm start near the solution: the regime the exit targets
        x0 = jnp.asarray(X_true + 1e-3)
        tol_only = register_pair(
            jnp.asarray(scan1), jnp.asarray(scan2), x0,
            SYN_CFG.replace(convergence_tol=1e-4),
        )
        stat = register_pair(
            jnp.asarray(scan1), jnp.asarray(scan2), x0,
            SYN_CFG.replace(convergence_tol=1e-4,
                            convergence_stat_scale=1.0),
        )
        assert self._n_exec(stat) <= self._n_exec(tol_only)
        # The skipped refinement is bounded by the predicted solution std.
        diff = np.abs(np.asarray(stat.X) - np.asarray(tol_only.X))
        assert (diff <= np.asarray(tol_only.pred_stds) + 1e-4).all(), (
            diff, np.asarray(tol_only.pred_stds))

    @pytest.mark.slow
    def test_stat_exit_respects_rm_floor(self):
        """The statistical exit must not bypass the moving-object-rejection
        activation floor (min_it = rm_start_iter + 1)."""
        X_true = np.zeros(6)
        scan1, scan2 = scan_pair_with_ground_truth(X_true, seed=3)
        cfg = SYN_CFG.replace(
            convergence_tol=1e-4, convergence_stat_scale=4.0,
            remove_moving=True, rm_start_iter=3,
        )
        res = register_pair(
            jnp.asarray(scan1), jnp.asarray(scan2), jnp.zeros(6), cfg
        )
        # diagnostics rows 0..rm_start_iter must be genuinely executed
        # (n_corr recorded for each; the fill only repeats AFTER exit).
        assert self._n_exec(res) >= cfg.rm_start_iter + 1

    def test_stat_scale_alone_enables_while_loop(self):
        """stat_scale > 0 with tol=0 must still engage the early-exit path
        (not silently run fixed-runlen)."""
        X_true = np.array([0.15, 0.0, 0.0, 0.0, 0.0, 0.005], np.float32)
        scan1, scan2 = scan_pair_with_ground_truth(X_true, seed=9)
        # Large scale: on this coarse fixture the raycast model error keeps
        # steps above ~2 sigma, so a production-size scale never fires; the
        # point here is the tol=0 plumbing, not the threshold calibration
        # (that is pinned on the city drive in the class test above).
        res = register_pair(
            jnp.asarray(scan1), jnp.asarray(scan2), jnp.asarray(X_true),
            SYN_CFG.replace(convergence_stat_scale=40.0),
        )
        assert self._n_exec(res) < SYN_CFG.n_iters
        # An absurd threshold exits mid-transient — solution quality is NOT
        # asserted here (the calibrated-scale behavior is covered above);
        # the outputs must still be finite and well-formed.
        assert np.isfinite(np.asarray(res.X)).all()
        assert np.isfinite(np.asarray(res.pred_stds)).all()


class TestCovarianceExtensions:
    """range_sigma / clip_fill solver knobs (round 5; full Monte-Carlo
    validation in tests/test_montecarlo.py — these are the fast-tier
    structural checks)."""

    KW = dict(n_beams=48, n_azimuth=512)

    def test_range_sigma_adds_psd_rank1_without_moving_x(self):
        X_true = np.array([0.3, -0.1, 0.02, 0.0, 0.0, 0.01])
        r0 = _register_synthetic(X_true, seed=11, **self.KW)
        cfg_rs = SYN_CFG.replace(range_sigma=0.02)
        r1 = _register_synthetic(X_true, seed=11, cfg=cfg_rs, **self.KW)
        np.testing.assert_allclose(
            np.asarray(r1.X), np.asarray(r0.X), atol=1e-6
        )
        dQ = np.asarray(r1.Q, np.float64) - np.asarray(r0.Q, np.float64)
        w = np.linalg.eigvalsh(dQ)
        # PSD rank-1 to f32 tolerance: one positive eigenvalue, the rest
        # negligible against it.
        assert w[-1] > 0.0, w
        assert np.abs(w[:-1]).max() < 1e-4 * w[-1] + 1e-12, w
        assert (
            np.asarray(r1.pred_stds) >= np.asarray(r0.pred_stds) - 1e-7
        ).all()

    def test_clip_fill_only_prunes(self):
        scan1, _ = scan_pair_with_ground_truth(np.zeros(6), seed=12, **self.KW)
        m0 = prepare_reference_jit(jnp.asarray(scan1), SYN_CFG)
        mg = prepare_reference_jit(
            jnp.asarray(scan1), SYN_CFG.replace(clip_fill=0.6)
        )
        l0 = np.asarray(m0.lmask).astype(bool)
        lg = np.asarray(mg.lmask).astype(bool)
        assert (~lg | l0).all()  # guard can only REMOVE axes
        assert lg.sum() < l0.sum()  # and does remove some on raycast scenes

    def test_guarded_profile_registers(self):
        X_true = np.array([0.2, 0.05, 0.0, 0.0, 0.0, 0.01])
        cfg = PROFILES["odometry_guarded"].replace(
            n_theta=48, n_phi=16, phi_min=np.pi / 3, phi_max=2 * np.pi / 3,
            min_pts=20, min_range=1.0,
        )
        res = _register_synthetic(X_true, seed=13, cfg=cfg, **self.KW)
        assert np.abs(np.asarray(res.X) - X_true).max() < 5e-3
