"""Native host-runtime tests (C extension: loaders + prefetch queue)."""

import numpy as np
import pytest

from icet_tpu.native import NativeReplaySource, ensure_built

native = ensure_built(quiet=True)
pytestmark = pytest.mark.skipif(
    native is None, reason="no C toolchain to build the native extension"
)


def test_load_npy_f8(tmp_path, rng):
    pts = rng.normal(size=(120, 3))
    p = tmp_path / "a.npy"
    np.save(p, pts)
    arr, n = native.load_cloud(str(p), 256)
    assert arr.shape == (256, 3) and arr.dtype == np.float32
    assert n == 120
    np.testing.assert_allclose(arr[:120], pts.astype(np.float32), atol=1e-6)
    np.testing.assert_allclose(arr[120:], 0.0)


def test_load_npy_f4_truncates(tmp_path, rng):
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    p = tmp_path / "b.npy"
    np.save(p, pts)
    arr, n = native.load_cloud(str(p), 100)
    assert n == 100
    np.testing.assert_allclose(arr, pts[:100])


def test_load_bin(tmp_path, rng):
    raw = rng.normal(size=(77, 4)).astype(np.float32)
    p = tmp_path / "c.bin"
    raw.tofile(p)
    arr, n = native.load_cloud(str(p), 128)
    assert n == 77
    np.testing.assert_allclose(arr[:77], raw[:, :3])


def test_load_reference_sample_matches_python():
    from icet_tpu.datasets.loaders import load_npy

    path = "/root/reference/src/sample_data/frame_804.npy"
    arr, n = native.load_cloud(path, 65536)
    ref = load_npy(path, 65536)
    assert n == 65536
    np.testing.assert_allclose(arr, ref)


def test_load_errors(tmp_path):
    p = tmp_path / "bad.npy"
    p.write_bytes(b"not numpy at all")
    with pytest.raises(IOError):
        native.load_cloud(str(p), 10)
    with pytest.raises(IOError):
        native.load_cloud(str(tmp_path / "missing.npy"), 10)


def test_prefetcher_ordered(tmp_path, rng):
    n_frames = 9
    clouds = []
    for i in range(n_frames):
        c = rng.normal(size=(50 + i, 3)).astype(np.float32)
        np.save(tmp_path / f"{i:03d}.npy", c)
        clouds.append(c)
    src = NativeReplaySource(str(tmp_path), max_points=64, n_threads=3, depth=3)
    got = list(src)
    assert len(got) == n_frames
    for i, arr in enumerate(got):
        np.testing.assert_allclose(arr[: 50 + i], clouds[i])


def test_prefetcher_loop_repeat(tmp_path, rng):
    for i in range(2):
        np.save(tmp_path / f"{i}.npy", rng.normal(size=(10, 3)))
    src = NativeReplaySource(
        str(tmp_path), max_points=16, loop=True, repeat=3
    )
    assert len(list(src)) == 6


@pytest.mark.slow
def test_prefetcher_feeds_solver(tmp_path):
    """End-to-end: native ingest queue -> odometry pipeline."""
    from icet_tpu.config import ICETConfig
    from icet_tpu.datasets.synthetic import simulate_scan
    from icet_tpu.odometry import OdometryPipeline

    for i in range(3):
        scan = simulate_scan(
            pose_t=np.array([0.2 * i, 0.0, 0.0]), seed=i, n_beams=16,
            n_azimuth=128,
        )
        np.save(tmp_path / f"{i:03d}.npy", scan)
    cfg = ICETConfig(
        n_theta=24, n_phi=8, phi_min=np.pi / 3, phi_max=2 * np.pi / 3,
        n_iters=3, min_pts=10, min_range=1.0,
    )
    src = NativeReplaySource(str(tmp_path), max_points=16 * 128)
    frames = list(OdometryPipeline(cfg).run(src))
    assert len(frames) == 2
    assert all(np.isfinite(f.X).all() for f in frames)


def test_load_csv_ouster_matches_python(tmp_path, rng):
    """Native CSV loader: Ouster studio export sniffing (>=11 numeric
    columns -> XYZ mm in columns 8-10), headers skipped, matches the
    python loader byte-for-byte."""
    from icet_tpu.datasets.loaders import load_csv

    n = 50
    data = rng.normal(0, 1000.0, (n, 12))
    p = tmp_path / "ouster.csv"
    with open(p, "w") as f:
        f.write("Timestamp,a,b,c,d,e,f,g,X(mm),Y(mm),Z(mm),Signal\n")
        f.write("units,,,,,,,,mm,mm,mm,\n")
        for row in data:
            f.write(",".join(f"{v:.4f}" for v in row) + "\n")
    arr, got = native.load_cloud(str(p), 64)
    assert got == n
    ref = load_csv(str(p), 64)
    np.testing.assert_allclose(arr, ref, atol=1e-6)
    np.testing.assert_allclose(
        arr[:n], (data[:, 8:11] / 1000.0).astype(np.float32), atol=1e-6
    )


def test_load_txt_xyz_matches_python(tmp_path, rng):
    from icet_tpu.datasets.loaders import load_csv

    pts = rng.normal(size=(33, 3))
    p = tmp_path / "cloud.txt"
    with open(p, "w") as f:
        for row in pts:
            f.write("\t".join(f"{v:.6f}" for v in row) + "\n")
    arr, got = native.load_cloud(str(p), 64)
    assert got == 33
    np.testing.assert_allclose(arr, load_csv(str(p), 64), atol=1e-6)


def test_csv_prefetcher_roundtrip(tmp_path, rng):
    seqs = []
    for i in range(4):
        pts = rng.normal(size=(20 + i, 3))
        p = tmp_path / f"{i:03d}.txt"
        with open(p, "w") as f:
            for row in pts:
                f.write(" ".join(str(v) for v in row) + "\n")
        seqs.append(pts.astype(np.float32))
    src = NativeReplaySource(str(tmp_path), max_points=32)
    for scan, ref in zip(src, seqs):
        np.testing.assert_allclose(scan[: ref.shape[0]], ref, atol=1e-6)


def test_load_csv_skips_nonfinite_rows(tmp_path):
    """strtod parses 'nan'/'inf'; such no-return rows must be dropped like
    the python loader does (a NaN point would poison the registration)."""
    from icet_tpu.datasets.loaders import load_csv

    p = tmp_path / "holes.txt"
    with open(p, "w") as f:
        f.write("1.0 2.0 3.0\n")
        f.write("nan nan nan\n")
        f.write("4.0 inf 6.0\n")
        f.write("7.0 8.0 9.0\n")
    arr, n = native.load_cloud(str(p), 8)
    assert n == 2
    np.testing.assert_allclose(arr[:2], [[1, 2, 3], [7, 8, 9]])
    np.testing.assert_allclose(arr, load_csv(str(p), 8), atol=1e-6)
