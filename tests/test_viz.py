import os

import numpy as np
import jax.numpy as jnp

from icet_tpu import viz
from icet_tpu.config import ICETConfig
from icet_tpu.datasets.synthetic import scan_pair_with_ground_truth
from icet_tpu.solver import prepare_reference_jit


CFG = ICETConfig(
    n_theta=24, n_phi=8, phi_min=np.pi / 3, phi_max=2 * np.pi / 3,
    n_iters=3, min_pts=10, min_range=1.0,
)


def test_plot_artifacts(tmp_path):
    scan1, scan2 = scan_pair_with_ground_truth(
        np.array([0.2, 0, 0, 0, 0, 0.0]), seed=0, n_beams=16, n_azimuth=128
    )
    p1 = viz.plot_clouds(str(tmp_path / "clouds.png"), [scan1, scan2],
                         labels=["scan1", "scan2"])
    p2 = viz.plot_registration(
        str(tmp_path / "reg.png"), scan1, scan2,
        np.array([0.2, 0, 0, 0, 0, 0], np.float32),
    )
    model = prepare_reference_jit(jnp.asarray(scan1), CFG)
    p3 = viz.plot_voxel_model(str(tmp_path / "voxels.png"), model,
                              max_ellipsoids=40)
    poses = [np.eye(4) for _ in range(3)]
    p4 = viz.plot_trajectory(str(tmp_path / "traj.png"), poses, poses)
    p5 = viz.plot_map(str(tmp_path / "map.png"), scan1,
                      trail=np.zeros((4, 3)))
    for p in (p1, p2, p3, p4, p5):
        assert os.path.getsize(p) > 5000


def test_save_ply_roundtrip(tmp_path, rng):
    from icet_tpu.datasets.loaders import load_ply

    pts = rng.normal(size=(50, 3)).astype(np.float32)
    p = str(tmp_path / "out.ply")
    viz.save_ply(p, pts)
    back = load_ply(p, 64)
    np.testing.assert_allclose(back[:50], pts, atol=1e-6)


def test_save_ply_with_color(tmp_path, rng):
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    cols = (rng.random((20, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "col.ply")
    viz.save_ply(p, pts, cols)
    assert os.path.getsize(p) > 20 * 15
