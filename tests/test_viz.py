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


def _scene_json(path):
    """Extract the embedded SCENE object from a saved viewer file."""
    import json

    text = open(path).read()
    start = text.index("const SCENE = ") + len("const SCENE = ")
    end = text.index(";\n", start)
    return json.loads(text[start:end])


def test_save_html_viewer(tmp_path, rng):
    import base64

    from icet_tpu import viz_html

    pts1 = rng.normal(size=(500, 3)).astype(np.float32) + 5.0
    pts2 = rng.normal(size=(300, 3)).astype(np.float32)
    trail = np.cumsum(rng.normal(size=(20, 3)), axis=0)
    p = viz_html.save_html(
        str(tmp_path / "v.html"), [pts1, pts2], labels=["a", "b"],
        lines=[trail], line_labels=["trail"], max_pts=200,
    )
    scene = _scene_json(p)
    assert [L["label"] for L in scene["layers"]] == ["a", "b", "trail"]
    # max_pts subsampling applied; buffers decode to n xyz triples
    assert scene["layers"][0]["n"] == 200
    for L in scene["layers"]:
        buf = np.frombuffer(base64.b64decode(L["data"]), "<f4")
        assert buf.shape == (L["n"] * 3,)
        assert np.isfinite(buf).all()
    tr = np.frombuffer(
        base64.b64decode(scene["layers"][2]["data"]), "<f4").reshape(-1, 3)
    np.testing.assert_allclose(tr, trail.astype(np.float32), rtol=1e-6)
    assert scene["radius"] > 0


def test_save_html_drops_nonfinite_and_origin(tmp_path):
    from icet_tpu import viz_html

    pts = np.array([[1, 2, 3], [0, 0, 0], [np.nan, 1, 1], [4, 5, 6]], np.float32)
    p = viz_html.save_html(str(tmp_path / "v.html"), [pts])
    assert _scene_json(p)["layers"][0]["n"] == 2


def test_registration_and_map_html(tmp_path):
    from icet_tpu import viz_html

    scan1, scan2 = scan_pair_with_ground_truth(
        np.array([0.2, 0, 0, 0, 0, 0.0]), seed=0, n_beams=16, n_azimuth=128
    )
    p = viz_html.save_registration_html(
        str(tmp_path / "reg.html"), scan1, scan2, jnp.zeros(6))
    scene = _scene_json(p)
    assert len(scene["layers"]) == 3
    trail = np.cumsum(np.ones((10, 3)), axis=0)
    p2 = viz_html.save_map_html(str(tmp_path / "map.html"), scan1, trail)
    scene2 = _scene_json(p2)
    assert scene2["layers"][1]["kind"] == "line"


def test_ellipsoid_wireframe_on_surface():
    from icet_tpu import viz_html

    rng2 = np.random.default_rng(3)
    A = rng2.normal(size=(3, 3))
    cov = A @ A.T + 0.1 * np.eye(3)
    mean = np.array([1.0, -2.0, 3.0])
    circles = viz_html.ellipsoid_wireframe(mean, cov, scale=2.0)
    assert len(circles) == 3
    inv = np.linalg.inv(cov)
    for ring in circles:
        d = ring - mean
        # every vertex lies on the 2-sigma surface: d^T cov^-1 d == scale^2
        q = np.einsum("ni,ij,nj->n", d, inv, d)
        np.testing.assert_allclose(q, 4.0, rtol=1e-5)
