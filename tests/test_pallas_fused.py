"""Interpret-mode equivalence tests for the fused Pallas kernel.

`ops/pallas_fused.py` is kept unwired from the solver (three reproduced
Mosaic dynamic-offset miscompiles block the windowed variant on real TPU —
see its docstrings), but the kernels themselves are correct: in interpret
mode (automatic off-TPU) they must reproduce the solver's XLA moment sums
bit-for-bit in structure and to accumulation-order tolerance in value.
This pins the module against rot until Mosaic fixes land (VERDICT r3 #7).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from icet_tpu.config import ICETConfig
from icet_tpu.datasets.synthetic import simulate_scan
from icet_tpu.ops.pallas_fused import (
    fused_moment_sums,
    fused_moment_sums_windowed,
)
from icet_tpu.solver import _jnp_sums, prepare_reference_jit

# Tiny grid + cloud: interpret mode executes the kernel in Python per grid
# step, so keep the work small (v_pad = 128, 8 grid steps).
CFG = ICETConfig(
    n_theta=12, n_phi=4, phi_min=np.pi / 3, phi_max=2 * np.pi / 3,
    n_iters=3, min_pts=10, min_range=1.0,
)
X = jnp.asarray([0.12, -0.05, 0.02, 0.01, -0.004, 0.006])


@pytest.fixture(scope="module")
def scene():
    scan = jnp.asarray(simulate_scan(seed=7, n_beams=16, n_azimuth=128))
    model = prepare_reference_jit(scan, CFG.replace(moment_method="segsum"))
    return scan, model


def test_fused_dense_matches_xla(scene):
    scan, model = scene
    truth = _jnp_sums(scan, X, model.bounds, model.anchors, CFG)
    got = fused_moment_sums(scan, X, model.bounds, model.anchors, CFG,
                            block=256)
    np.testing.assert_allclose(
        np.asarray(got)[:, :10], np.asarray(truth)[:, :10],
        rtol=0, atol=2e-3,
    )
    # Count column is exact (integer sums of a 0/1 one-hot).
    np.testing.assert_array_equal(
        np.asarray(got)[:, 0], np.asarray(truth)[:, 0]
    )


def test_fused_windowed_matches_xla_when_no_overflow(scene):
    scan, model = scene
    sums, ovf = fused_moment_sums_windowed(
        scan, X, model.bounds, model.anchors, CFG, block=256, window=64
    )
    assert int(ovf) == 0  # beam-major synthetic scan fits the window
    truth = _jnp_sums(scan, X, model.bounds, model.anchors, CFG)
    np.testing.assert_allclose(
        np.asarray(sums)[:, :10], np.asarray(truth)[:, :10],
        rtol=0, atol=2e-3,
    )


def test_fused_windowed_reports_overflow_on_shuffled(scene, rng):
    scan, model = scene
    shuffled = jnp.asarray(np.asarray(scan)[rng.permutation(scan.shape[0])])
    _, ovf = fused_moment_sums_windowed(
        shuffled, X, model.bounds, model.anchors, CFG, block=256, window=8
    )
    assert int(ovf) > 0  # narrow window + shuffled order must overflow
