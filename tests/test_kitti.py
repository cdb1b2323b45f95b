"""KITTI odometry-format IO + evaluation-harness tests (VERDICT r2 #3).

No real KITTI data ships in this environment; the harness is CI-tested on
a synthetic KITTI-formatted fixture written from the raycast city drive
(exact ground truth), exercising the same code path a real sequence takes:
velodyne/*.bin + poses.txt + calib.txt -> KittiOdometrySource ->
OdometryPipeline -> ATE/RPE.
"""

import numpy as np
import pytest

from icet_tpu.datasets.kitti import (
    KittiOdometrySource,
    load_calib_tr,
    load_poses,
    save_poses,
    write_kitti_sequence,
)


def _pose(rng):
    ang = rng.normal(0, 0.2, 3)
    ca, sa = np.cos(ang), np.sin(ang)
    Rz = np.array([[ca[2], -sa[2], 0], [sa[2], ca[2], 0], [0, 0, 1]])
    T = np.eye(4)
    T[:3, :3] = Rz
    T[:3, 3] = rng.normal(0, 5.0, 3)
    return T


class TestKittiIO:
    def test_poses_roundtrip(self, rng, tmp_path):
        poses = [_pose(rng) for _ in range(7)]
        p = str(tmp_path / "poses.txt")
        save_poses(p, poses)
        back = load_poses(p)
        np.testing.assert_allclose(back, np.stack(poses), atol=1e-7)

    def test_sequence_roundtrip_with_calib(self, rng, tmp_path):
        """Scans + velodyne-frame ground truth round-trip through the
        cam0-frame poses.txt + Tr calib convention the benchmark uses."""
        scans = [
            rng.normal(0, 10, (50 + 10 * i, 3)).astype(np.float32)
            for i in range(4)
        ]
        T_w_velo = [_pose(rng) for _ in range(4)]
        tr = _pose(rng)  # arbitrary invertible T_cam0<-velo
        poses_cam = [T @ np.linalg.inv(tr) for T in T_w_velo]

        d = write_kitti_sequence(
            str(tmp_path / "seq"), scans, poses_cam, calib_tr=tr
        )
        assert load_calib_tr(str(tmp_path / "seq" / "calib.txt")) is not None
        src = KittiOdometrySource(
            d, poses_file=str(tmp_path / "seq" / "poses.txt"),
            max_points=256, beam_major=False,
        )
        assert len(src) == 4
        for (scan, T), orig, T_orig in zip(src, scans, T_w_velo):
            nz = scan[np.any(scan != 0.0, axis=1)]
            np.testing.assert_allclose(nz, orig, atol=1e-6)
            np.testing.assert_allclose(T, T_orig, atol=1e-6)

    def test_no_poses_gives_none(self, rng, tmp_path):
        d = write_kitti_sequence(
            str(tmp_path / "seq"),
            [rng.normal(0, 10, (40, 3)).astype(np.float32)],
            [np.eye(4)],
        )
        src = KittiOdometrySource(d, max_points=64, beam_major=False)
        scan, T = next(iter(src))
        assert T is None


class TestStrictReal:
    """--strict-real fails fast on format surprises instead of silently
    padding (VERDICT r4 #10); default mode keeps the lenient behavior."""

    def _seq(self, rng, tmp_path, n=3, pts=40):
        scans = [
            rng.normal(0, 10, (pts, 3)).astype(np.float32) for _ in range(n)
        ]
        return write_kitti_sequence(
            str(tmp_path / "seq"), scans, [np.eye(4)] * n
        )

    def test_clean_sequence_passes(self, rng, tmp_path):
        d = self._seq(rng, tmp_path)
        src = KittiOdometrySource(
            d, poses_file=str(tmp_path / "seq" / "poses.txt"),
            max_points=64, beam_major=False, strict=True,
        )
        assert sum(1 for _ in src) == 3

    def test_truncated_bin_rejected(self, rng, tmp_path):
        d = self._seq(rng, tmp_path)
        path = str(tmp_path / "seq" / "velodyne" / "000001.bin")
        raw = open(path, "rb").read()
        open(path, "wb").write(raw[:-7])  # not a whole 16-byte record
        with pytest.raises(ValueError, match="16-byte"):
            KittiOdometrySource(d, max_points=64, beam_major=False,
                                strict=True)
        # default mode also cannot parse a torn record — the loader itself
        # raises at read time (reshape), strict just moves it to construction
        src = KittiOdometrySource(d, max_points=64, beam_major=False,
                                  prefetch=False)
        with pytest.raises(ValueError):
            list(src)

    def test_oversize_scan_rejected_only_in_strict(self, rng, tmp_path):
        d = self._seq(rng, tmp_path, pts=100)
        with pytest.raises(ValueError, match="max_points"):
            KittiOdometrySource(d, max_points=64, beam_major=False,
                                strict=True)
        src = KittiOdometrySource(d, max_points=64, beam_major=False)
        scan, _ = next(iter(src))  # lenient: stride subsample
        assert scan.shape == (64, 3)

    def test_nonfinite_rejected_only_in_strict(self, rng, tmp_path):
        scans = [rng.normal(0, 10, (40, 3)).astype(np.float32)
                 for _ in range(2)]
        scans[1][7, 1] = np.nan
        d = write_kitti_sequence(str(tmp_path / "seq"), scans,
                                 [np.eye(4)] * 2)
        src = KittiOdometrySource(d, max_points=64, beam_major=False,
                                  strict=True)
        with pytest.raises(ValueError, match="non-finite"):
            list(src)
        lenient = KittiOdometrySource(d, max_points=64, beam_major=False)
        assert sum(1 for _ in lenient) == 2

    def test_short_poses_rejected_only_in_strict(self, rng, tmp_path):
        d = self._seq(rng, tmp_path, n=3)
        poses = str(tmp_path / "seq" / "poses.txt")
        save_poses(poses, [np.eye(4)] * 2)  # one short
        with pytest.raises(ValueError, match="poses"):
            KittiOdometrySource(d, poses_file=poses, max_points=64,
                                beam_major=False, strict=True)
        KittiOdometrySource(d, poses_file=poses, max_points=64,
                            beam_major=False)


@pytest.mark.integration
class TestEvalHarness:
    def test_city_fixture_end_to_end(self, tmp_path):
        """Write a KITTI-formatted fixture from the raycast city drive and
        score it through the full harness; odometry must track ground truth."""
        from icet_tpu.datasets.replay import CityDriveSource

        import examples.eval_kitti as ek

        src = CityDriveSource(n_frames=10, speed=1.0, n_beams=48,
                              n_azimuth=512)
        scans, poses = [], []
        for scan, T in src:
            scans.append(scan)
            poses.append(T)
        d = write_kitti_sequence(str(tmp_path / "seq"), scans, poses)

        args = ek.build_parser().parse_args([
            "--sequence", d,
            "--poses", str(tmp_path / "seq" / "poses.txt"),
            "--max-points", "32768",
            "--clamp", "2.5",
            # scale the grid to the 48x512-ray fixture (the canonical 75x24
            # grid leaves most voxels under min_pts at this resolution)
            "--n-theta", "48", "--n-phi", "16", "--min-pts", "20",
            "--min-range", "1.0", "--n-iters", "6", "--phi-band", "0.524",
        ])
        summary = ek.run(args)
        assert summary["frames"] == 9
        assert summary["divergences"] == 0
        assert summary["ate_odometry_cm"] < 15.0, summary

    def test_oracle_head_to_head(self, tmp_path):
        """--oracle runs the reference C++ per pair on identical scans and
        scores both trajectories; ours must be at least comparable (<=2x
        the reference ATE + 1 cm slack) on the fixture.  Skipped when the
        oracle can't be built (no g++)."""
        import shutil
        import subprocess

        if shutil.which("g++") is None:
            pytest.skip("no g++")
        build = subprocess.run(
            ["sh", "tools/oracle/build_oracle.sh", str(tmp_path / "bin")],
            capture_output=True, text=True, cwd="/root/repo", timeout=600,
        )
        if build.returncode != 0:
            pytest.skip(f"oracle build failed: {build.stderr[-200:]}")

        from icet_tpu.datasets.replay import CityDriveSource

        import examples.eval_kitti as ek

        src = CityDriveSource(n_frames=5, speed=1.0, n_beams=48,
                              n_azimuth=512)
        scans, poses = [], []
        for scan, T in src:
            scans.append(scan)
            poses.append(T)
        d = write_kitti_sequence(str(tmp_path / "seq"), scans, poses)
        args = ek.build_parser().parse_args([
            "--sequence", d,
            "--poses", str(tmp_path / "seq" / "poses.txt"),
            "--max-points", "32768", "--clamp", "2.5",
            "--n-theta", "48", "--n-phi", "16", "--min-pts", "20",
            "--min-range", "1.0", "--n-iters", "6", "--phi-band", "0.524",
            "--oracle", str(tmp_path / "bin" / "oracle"),
            # the reference's 0.1 indoor cluster threshold lands in a wrong
            # minimum on this noisy fixture; its own comments say 0.3-0.5
            # outdoor (icet.h:32-34)
            "--oracle-thresh", "0.5", "--oracle-buff", "0.5",
        ])
        summary = ek.run(args)
        assert "oracle" in summary and "ate_cm" in summary["oracle"]
        assert summary["ate_odometry_cm"] <= (
            2.0 * summary["oracle"]["ate_cm"] + 1.0
        ), summary


def test_native_prefetch_matches_python_loader(rng, tmp_path):
    """prefetch="auto"/True streams .bin files through the native C queue;
    scans must be bit-identical to the in-process numpy reads."""
    pytest.importorskip("ctypes")
    from icet_tpu.native import ensure_built

    if ensure_built() is None:
        pytest.skip("native extension unavailable")
    scans = [
        rng.normal(0, 10, (40 + 8 * i, 3)).astype(np.float32)
        for i in range(5)
    ]
    poses = [np.eye(4)] * 5
    d = write_kitti_sequence(str(tmp_path / "seq"), scans, poses)
    a = KittiOdometrySource(d, max_points=128, beam_major=False,
                            prefetch=True)
    b = KittiOdometrySource(d, max_points=128, beam_major=False,
                            prefetch=False)
    n = 0
    for (sa, _), (sb, _) in zip(a, b):
        np.testing.assert_array_equal(sa, sb)
        n += 1
    assert n == 5
