import pytest
import numpy as np

from icet_tpu.config import ICETConfig
from icet_tpu.datasets.synthetic import simulate_scan
from icet_tpu.scan_matcher import ScanMatcher

CFG = ICETConfig(
    n_theta=24, n_phi=8, phi_min=np.pi / 3, phi_max=2 * np.pi / 3,
    n_iters=4, min_pts=10, min_range=1.0,
)


@pytest.mark.slow
def test_scan_matcher_aligns_frames():
    sm = ScanMatcher(CFG, min_points=100)
    s0 = simulate_scan(seed=0, n_beams=32, n_azimuth=256)
    s1 = simulate_scan(pose_t=np.array([0.3, 0.0, 0.0]), seed=1,
                       n_beams=32, n_azimuth=256)
    r0 = sm.step(s0)
    assert r0.status == "first_frame"
    r1 = sm.step(s1)
    assert r1.status == "ok"
    np.testing.assert_allclose(r1.X[0], 0.3, atol=0.05)
    assert r1.aligned.shape == s1.shape
    assert r1.trail.shape == (2, 3)
    # The previous sensor origin, expressed in the current frame, sits -0.3 m
    # along x.
    np.testing.assert_allclose(r1.trail[0][0], -0.3, atol=0.05)
    np.testing.assert_allclose(r1.trail[1], 0.0)


def test_scan_matcher_empty_cloud():
    sm = ScanMatcher(CFG, min_points=100)
    r = sm.step(np.zeros((2048, 3), np.float32))
    assert r.status == "empty_cloud"
    # Recovers on the next real frame.
    r2 = sm.step(simulate_scan(seed=0, n_beams=16, n_azimuth=128))
    assert r2.status == "first_frame"
