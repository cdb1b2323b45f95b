import os

import numpy as np
import pytest

from icet_tpu.datasets.loaders import (
    load_cloud,
    load_csv,
    load_kitti_bin,
    load_npy,
    load_ply,
    pad_cloud,
)
from icet_tpu.datasets.replay import ReplaySource, SyntheticTrajectorySource


def test_pad_cloud_pads_and_truncates(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    out = pad_cloud(pts, 256)
    assert out.shape == (256, 3)
    np.testing.assert_allclose(out[:100], pts)
    np.testing.assert_allclose(out[100:], 0.0)
    out2 = pad_cloud(pts, 50)
    assert out2.shape == (50, 3)


def test_load_npy_reference_sample():
    out = load_npy("/root/reference/src/sample_data/frame_804.npy", 65536)
    assert out.shape == (65536, 3)
    assert np.isfinite(out).all()


def test_load_kitti_bin(tmp_path, rng):
    raw = rng.normal(size=(500, 4)).astype(np.float32)
    p = tmp_path / "scan.bin"
    raw.tofile(p)
    out = load_kitti_bin(str(p), 1024)
    np.testing.assert_allclose(out[:500], raw[:, :3])


def test_load_csv_xyz(tmp_path, rng):
    pts = rng.normal(size=(50, 3))
    p = tmp_path / "scan.txt"
    np.savetxt(p, pts)
    out = load_csv(str(p), 128)
    np.testing.assert_allclose(out[:50], pts, atol=1e-5)


def test_load_csv_ouster(tmp_path, rng):
    pts_mm = rng.normal(size=(40, 3)) * 5000
    rows = np.zeros((40, 12))
    rows[:, 8:11] = pts_mm
    p = tmp_path / "ouster.csv"
    with open(p, "w") as f:
        f.write("header1\nheader2\n")
        for r in rows:
            f.write(",".join(str(v) for v in r) + "\n")
    out = load_csv(str(p), 128, fmt="ouster")
    np.testing.assert_allclose(out[:40], pts_mm / 1000.0, atol=1e-5)


def test_load_ply_ascii(tmp_path, rng):
    pts = rng.normal(size=(30, 3)).astype(np.float32)
    p = tmp_path / "scan.ply"
    with open(p, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\nelement vertex 30\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n"
        )
        for r in pts:
            f.write(f"{r[0]} {r[1]} {r[2]}\n")
    out = load_ply(str(p), 64)
    np.testing.assert_allclose(out[:30], pts, atol=1e-5)


def test_load_ply_binary(tmp_path, rng):
    pts = rng.normal(size=(30, 3)).astype(np.float32)
    p = tmp_path / "scan.ply"
    with open(p, "wb") as f:
        f.write(
            b"ply\nformat binary_little_endian 1.0\nelement vertex 30\n"
            b"property float x\nproperty float y\nproperty float z\n"
            b"end_header\n"
        )
        f.write(pts.tobytes())
    out = load_ply(str(p), 64)
    np.testing.assert_allclose(out[:30], pts, atol=1e-5)


def test_load_cloud_rejects_unknown(tmp_path):
    p = tmp_path / "x.xyz123"
    p.write_text("")
    with pytest.raises(ValueError):
        load_cloud(str(p))


def test_load_codd_hdf5(tmp_path, rng):
    import h5py

    from icet_tpu.datasets.loaders import load_codd_hdf5

    pts = rng.normal(size=(2, 1, 40, 4)).astype(np.float32)
    p = tmp_path / "codd.hdf5"
    with h5py.File(p, "w") as hf:
        hf.create_dataset("point_cloud", data=pts)
    out = load_codd_hdf5(str(p), frame=1, max_points=64)
    np.testing.assert_allclose(out[:40], pts[1, 0, :, :3])


def test_load_pixset_pkl(tmp_path, rng):
    import pickle

    from icet_tpu.datasets.loaders import load_pixset_pkl

    rec = np.core.records.fromarrays(
        rng.normal(size=(5, 30)), names="x,y,z,i,t"
    )
    p = tmp_path / "scan.pkl"
    with open(p, "wb") as f:
        pickle.dump(rec, f)
    out = load_pixset_pkl(str(p), 64)
    np.testing.assert_allclose(
        out[:30, 0], rec.x.astype(np.float32), atol=1e-6
    )


def test_load_ford_mat(tmp_path, rng):
    from scipy.io import savemat

    from icet_tpu.datasets.loaders import load_ford_mat

    xyz = rng.normal(size=(3, 25))
    p = tmp_path / "Scan0001.mat"
    savemat(p, {"SCAN": {"XYZ": xyz}})
    out = load_ford_mat(str(p), 64)
    np.testing.assert_allclose(out[:25], xyz.T.astype(np.float32), atol=1e-6)


def test_replay_source(tmp_path, rng):
    for i in range(3):
        np.save(tmp_path / f"{i:04d}.npy", rng.normal(size=(10, 3)))
    src = ReplaySource(str(tmp_path), max_points=32)
    frames = list(src)
    assert len(frames) == 3
    assert all(f.shape == (32, 3) for f in frames)
    looped = ReplaySource(str(tmp_path), loop=True, max_points=32)
    it = iter(looped)
    for _ in range(7):
        next(it)  # loops past the end without StopIteration


def test_synthetic_trajectory_poses():
    src = SyntheticTrajectorySource(n_frames=3, speed=0.5, n_beams=8, n_azimuth=64)
    frames = list(src)
    assert len(frames) == 3
    scan, T = frames[1]
    assert scan.shape == (8 * 64, 3)
    assert T.shape == (4, 4)
    np.testing.assert_allclose(np.linalg.det(T[:3, :3]), 1.0, atol=1e-6)


def test_kitti_format_sequence_ingestion(tmp_path):
    """End-to-end KITTI-format ingestion: velodyne .bin scans + poses.txt
    through ReplaySource + the KITTI pose parser (the harness's primary
    real-data entry, never exercisable with bundled data)."""
    import jax.numpy as jnp

    from icet_tpu.datasets.replay import ReplaySource
    from icet_tpu.datasets.synthetic import simulate_scan

    vel = tmp_path / "velodyne"
    vel.mkdir()
    poses = []
    for i in range(3):
        t = np.array([0.3 * i, 0.0, 0.0], np.float32)
        pts = np.asarray(
            simulate_scan(pose_t=t, n_beams=16, n_azimuth=128, seed=11),
            np.float32,
        )
        arr = np.concatenate(
            [pts, np.zeros((pts.shape[0], 1), np.float32)], axis=1
        )
        arr.tofile(vel / f"{i:06d}.bin")
        T = np.eye(4)
        T[:3, 3] = t
        poses.append(T[:3, :4].reshape(-1))
    np.savetxt(tmp_path / "poses.txt", np.stack(poses))

    src = ReplaySource(str(vel))
    scans = [s for s in src]
    assert len(scans) == 3
    for s in scans:
        assert s.shape[1] == 3 and np.isfinite(s).all()
    # Intensity column stripped, coordinates preserved bit-exact.
    ref = np.asarray(
        simulate_scan(pose_t=np.zeros(3, np.float32), n_beams=16,
                      n_azimuth=128, seed=11),
        np.float32,
    )
    np.testing.assert_array_equal(np.asarray(scans[0])[: ref.shape[0]], ref)

    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "examples")
    )
    from eval_odometry import load_kitti_poses

    gt = load_kitti_poses(str(tmp_path / "poses.txt"))
    assert len(gt) == 3
    np.testing.assert_allclose(gt[2][:3, 3], [0.6, 0.0, 0.0], atol=1e-6)
