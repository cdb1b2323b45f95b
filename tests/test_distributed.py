"""Multi-host execution path: 2 CPU processes x 4 virtual devices each.

Spawns real separate processes wired together with jax.distributed (Gloo
collectives over localhost — the CI stand-in for a TPU pod's DCN), runs the
sharded registration on the global (dp=2, sp=4) mesh, and checks every
process recovers the ground-truth transforms of ITS OWN frames.  This is
the multi-controller analog of test_parallel.py's single-process mesh tests
(reference fabric being replaced: ROS pub/sub, simpleMapMaker.cpp:64-68).
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    pid = int(sys.argv[1])
    port = sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from icet_tpu.parallel.distributed import (
        global_registration_mesh,
        init_distributed,
        local_numpy,
        run_distributed_registration,
    )
    init_distributed(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    from icet_tpu.config import ICETConfig
    from icet_tpu.datasets.synthetic import scan_pair_with_ground_truth

    cfg = ICETConfig(
        n_theta=48, n_phi=16, phi_min=np.pi / 3, phi_max=2 * np.pi / 3,
        n_iters=6, min_pts=20, min_range=1.0,
    )
    # Each process contributes TWO frames of its own (global batch = 4).
    x_true = np.array(
        [[0.3, 0.1, 0.0, 0.0, 0.0, 0.01],
         [-0.2, 0.15, 0.05, 0.0, 0.01, -0.02]], np.float32
    )
    pairs = [
        scan_pair_with_ground_truth(
            x_true[k], seed=100 * pid + k, n_beams=48, n_azimuth=512
        )
        for k in range(2)
    ]
    s1 = np.stack([p[0] for p in pairs])
    s2 = np.stack([p[1] for p in pairs])
    x0 = np.zeros((2, 6), np.float32)

    mesh = global_registration_mesh()
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "dp": 2, "sp": 4}
    res, _ = run_distributed_registration(s1, s2, x0, cfg, mesh)
    X_local = local_numpy(res.X)
    assert X_local.shape == (2, 6), X_local.shape
    err = np.abs(X_local - x_true)
    assert (err[:, :3] < 0.02).all(), (pid, X_local, x_true)
    assert (err[:, 3:] < 0.01).all(), (pid, X_local, x_true)
    # Pose-graph refinement with factors sharded ACROSS HOSTS: the per-GN
    # psum of the normal equations crosses the process boundary (Gloo here,
    # DCN on a pod) and must match the replicated single-process solve.
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from icet_tpu.pose_graph import PoseGraph, optimize_poses, optimize_poses_sharded
    from icet_tpu.ops.geometry import pose_matrix, pose_to_state

    K = 9
    rng = np.random.default_rng(0)  # same graph on every process
    states_true = np.zeros((K, 6), np.float32)
    states_true[:, 0] = np.arange(K)
    states_true[:, 5] = 0.05 * np.arange(K)
    idx_i = np.arange(K - 1, dtype=np.int32)
    idx_j = idx_i + 1
    meas = []
    for k in range(K - 1):
        Ti = np.asarray(pose_matrix(jnp.asarray(states_true[k])))
        Tj = np.asarray(pose_matrix(jnp.asarray(states_true[k + 1])))
        m = np.asarray(pose_to_state(jnp.asarray(np.linalg.inv(Ti) @ Tj)))
        meas.append(m + rng.normal(0, 0.01, 6))
    graph = PoseGraph(
        idx_i=jnp.asarray(idx_i), idx_j=jnp.asarray(idx_j),
        meas=jnp.asarray(np.stack(meas).astype(np.float32)),
        info=jnp.asarray(np.tile(np.eye(6, dtype=np.float32) * 1e4, (K - 1, 1, 1))),
    )
    states0 = jnp.asarray(states_true + rng.normal(0, 0.05, (K, 6)).astype(np.float32))
    single = np.asarray(optimize_poses(states0, graph, 5))
    factor_mesh = Mesh(np.array(jax.devices()).reshape(8), ("f",))
    sharded = np.asarray(optimize_poses_sharded(states0, graph, factor_mesh, 5))
    assert np.abs(sharded - single).max() < 1e-3, np.abs(sharded - single).max()

    print(f"DISTOK {pid} {X_local[0][:3].round(4).tolist()}", flush=True)
    """
)


@pytest.mark.integration
def test_two_process_distributed_registration(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {
        **os.environ,
        "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    }
    # The parent test process has its own jax initialized single-process;
    # workers must be fresh processes (separate backends).
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"DISTOK {i}" in out, out[-2000:]
