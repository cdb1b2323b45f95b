import numpy as np
import jax
import pytest

from icet_tpu.config import ICETConfig
from icet_tpu.datasets.synthetic import scan_pair_with_ground_truth
from icet_tpu.parallel.elastic import (
    ElasticRegistrationRunner,
    best_mesh_shape,
    probe_devices,
)

CFG = ICETConfig(
    n_theta=24, n_phi=8, phi_min=np.pi / 3, phi_max=2 * np.pi / 3,
    n_iters=3, min_pts=10, min_range=1.0,
)


@pytest.fixture(scope="module")
def batch():
    X = np.array([0.2, 0.1, 0.0, 0.0, 0.0, 0.01], np.float32)
    s1, s2 = scan_pair_with_ground_truth(X, seed=0, n_beams=16, n_azimuth=128)
    return (
        np.stack([s1, s1]),
        np.stack([s2, s2]),
        np.zeros((2, 6), np.float32),
        X,
    )


def test_best_mesh_shape():
    assert best_mesh_shape(8, 2) == (2, 4)
    assert best_mesh_shape(8, 1) == (1, 8)
    assert best_mesh_shape(7, 2) == (1, 7)
    assert best_mesh_shape(6, 4) == (3, 2)
    assert best_mesh_shape(1, 4) == (1, 1)


def test_probe_devices_all_healthy():
    assert len(probe_devices()) == len(jax.devices())


def test_elastic_run(batch):
    s1, s2, x0, X_true = batch
    runner = ElasticRegistrationRunner(CFG, prefer_dp=2)
    assert runner.shape == (2, 4)
    res = runner.run(s1, s2, x0)
    assert res.X.shape == (2, 6)
    np.testing.assert_allclose(res.X[0][:2], X_true[:2], atol=0.05)


def test_elastic_pads_odd_batch(batch):
    s1, s2, x0, X_true = batch
    runner = ElasticRegistrationRunner(CFG, prefer_dp=2)
    # Batch of 3 does not divide dp=2: runner pads internally, returns 3.
    res = runner.run(
        np.concatenate([s1, s1[:1]]),
        np.concatenate([s2, s2[:1]]),
        np.concatenate([x0, x0[:1]]),
    )
    assert res.X.shape == (3, 6)
    np.testing.assert_allclose(res.X[2], res.X[0], atol=1e-5)


def test_elastic_recovers_from_device_loss(batch, monkeypatch):
    s1, s2, x0, X_true = batch
    runner = ElasticRegistrationRunner(CFG, prefer_dp=2)
    baseline = runner.run(s1, s2, x0)

    # Simulate losing 3 devices: the next dispatch raises, and the health
    # probe only sees 5 devices.
    fail_once = {"armed": True}
    real_step = runner._step

    def exploding_step(*args):
        if fail_once["armed"]:
            fail_once["armed"] = False
            raise RuntimeError("DEVICE_LOST: simulated ICI failure")
        return real_step(*args)

    runner._step = exploding_step
    import icet_tpu.parallel.elastic as elastic_mod

    monkeypatch.setattr(
        elastic_mod, "probe_devices", lambda devs=None: jax.devices()[:5]
    )

    res = runner.run(s1, s2, x0)
    assert runner.rebuilds == 1
    assert runner.shape == (1, 5)  # 5 devices -> dp=1, sp=5
    np.testing.assert_allclose(res.X, baseline.X, atol=1e-3)


def test_elastic_raises_on_non_device_error(batch):
    s1, s2, x0, _ = batch
    runner = ElasticRegistrationRunner(CFG, prefer_dp=2)

    def bad_step(*args):
        raise ValueError("a real bug, not a device failure")

    runner._step = bad_step
    with pytest.raises(ValueError):
        runner.run(s1, s2, x0)
    assert runner.rebuilds == 0
