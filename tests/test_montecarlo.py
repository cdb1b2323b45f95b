"""Monte-Carlo validation of the predicted error covariance — the papers'
headline claim (SURVEY.md section 4: "pred_stds matches empirical error
spread").  The reference never automated this."""

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


@pytest.mark.integration
def test_pred_stds_track_empirical_error():
    X_true = np.array([0.3, -0.1, 0.02, 0.0, 0.0, 0.01], np.float64)
    R_c = np.asarray(euler_R(jnp.asarray(-X_true[3:6])))
    scan1 = simulate_scan(seed=7)

    K = 16
    scans2 = np.stack(
        [
            simulate_scan(pose_t=X_true[:3], pose_R=R_c, seed=100 + i)
            for i in range(K)
        ]
    )

    @jax.jit
    def solve_batch(s1, s2batch):
        model = prepare_reference(s1, CFG)
        f = lambda s2: register(model, s2, jnp.zeros(6, jnp.float32), CFG)
        return jax.vmap(f)(s2batch)

    res = solve_batch(jnp.asarray(scan1), jnp.asarray(scans2))
    X = np.asarray(res.X)
    stds = np.asarray(res.pred_stds)

    err = X - X_true[None, :]
    emp_std = err.std(axis=0)
    mean_pred = stds.mean(axis=0)

    # Each run's error should be within a generous multiple of its predicted
    # std (plus a floor for the systematic voxelization bias the covariance
    # model does not capture).
    bias = np.abs(err.mean(axis=0))
    spread_ok = np.abs(err - err.mean(axis=0)) < 8.0 * stds + 2e-3
    assert spread_ok.mean() > 0.9, (emp_std, mean_pred)

    # Predicted and empirical RANDOM spread should agree within an order of
    # magnitude on the well-observed translation components.
    ratio = emp_std[:2] / mean_pred[:2]
    assert (ratio < 10).all() and (ratio > 0.1).all(), (emp_std, mean_pred, bias)
