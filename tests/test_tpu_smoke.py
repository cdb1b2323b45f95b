"""Real-hardware smoke tests (run manually: pytest -m tpu --no-header).

The regular suite forces CPU (conftest).  These tests spawn a SUBPROCESS
with the default (TPU) platform so hardware behaviour — bf16-precision
pinning, scatter paths, donation — is exercised against the CPU-verified
golden values.  Skipped automatically when no TPU is reachable.
"""

import json
import subprocess
import sys

import pytest

pytestmark = pytest.mark.tpu

_PROBE = """
import jax
ok = any(d.platform == 'tpu' for d in jax.devices())
print('TPU_OK' if ok else 'NO_TPU')
"""

_SOLVE = """
import json
import numpy as np, jax, jax.numpy as jnp
from icet_tpu import ICETConfig, PROFILES, register_pair
c1 = jax.device_put(np.load('/root/reference/python/point_clouds/sample_pc_1.npy').astype(np.float32))
c2 = jax.device_put(np.load('/root/reference/python/point_clouds/sample_pc_2.npy').astype(np.float32))
res = register_pair(c1, c2, jnp.zeros(6), PROFILES['notebook'])
print('RESULT ' + json.dumps({'X': np.asarray(res.X).tolist(),
                              'stds': np.asarray(res.pred_stds).tolist()}))
"""


def _run(code, timeout=240):
    return subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=timeout, cwd="/root/repo",
    )


def _tpu_available():
    try:
        r = _run(_PROBE, timeout=90)
        return "TPU_OK" in r.stdout
    except Exception:
        return False


@pytest.mark.skipif(not _tpu_available(), reason="no TPU reachable")
def test_tpu_matches_cpu_golden():
    try:
        r = _run(_SOLVE)
    except subprocess.TimeoutExpired:
        pytest.skip("TPU tunnel stalled (known flake; see CLAUDE.md)")
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("RESULT ")][0]
    out = json.loads(line[len("RESULT "):])
    X = out["X"]
    # CPU-verified corridor (tests/test_solver.py TestReferenceGolden).
    import numpy as np

    golden = np.array([0.665, 0.009, 0.0155, 0.0019, -5.0e-4, -4.0e-4])
    np.testing.assert_allclose(X[:3], golden[:3], atol=0.02)
    np.testing.assert_allclose(X[3:], golden[3:], atol=0.002)
