"""Multi-host (multi-controller) execution over DCN + ICI.

The reference's inter-process fabric is ROS pub/sub over TCPROS
(simpleMapMaker.cpp:64-68, odometry.cpp:26-29, fake_lidar.py:75); scans are
serialized between a sensor-replay process and solver processes on one
machine.  The TPU-native equivalent is JAX's multi-controller runtime: every
host runs this same program, ``jax.distributed.initialize`` wires them into
one cluster, and a global ``Mesh`` spans (host, local-device).  Host-level
scan ingest happens by each process contributing its LOCAL frames to a
global device array (``jax.make_array_from_process_local_data`` — the DCN
analog of the ROS ingest topic); per-iteration solver collectives ride the
``sp`` axis (ICI within a host) while the ``dp``/host axis carries
independent frames and only reduces for pose-graph refinement.

Tested without real multi-host hardware by spawning N CPU processes with
virtual devices (tests/test_distributed.py), exactly how the single-host
mesh is tested on 8 virtual CPU devices.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from icet_tpu.config import ICETConfig
from icet_tpu.parallel.sharding import make_sharded_register


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join this process into a multi-controller JAX cluster.

    On TPU pods all arguments auto-detect from the environment; on CPU/GPU
    clusters (and in the multi-process CI test) pass them explicitly.  Safe
    to call once per process, before any other JAX API touches the backend.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_registration_mesh(sp: int | None = None) -> Mesh:
    """Global (dp, sp) mesh over every device in the cluster.

    ``dp`` spans hosts (one row per process — frames stay host-local, no
    cross-host traffic in the solver), ``sp`` spans each host's local
    devices (point sharding; the per-iteration psum rides ICI).
    """
    n_local = jax.local_device_count()
    if sp is None:
        sp = n_local
    if n_local % sp:
        raise ValueError(f"sp={sp} must divide local device count {n_local}")
    dp = jax.device_count() // sp
    # jax.devices() orders by process index then local id, so reshaping keeps
    # each mesh row's sp axis within one host.
    grid = np.array(jax.devices()).reshape(dp, sp)
    return Mesh(grid, axis_names=("dp", "sp"))


def global_scan_batch(scans1_local, scans2_local, x0s_local, mesh: Mesh):
    """Assemble per-host local frame batches into global sharded arrays.

    Each process passes its OWN (B_local, N, 3) scans; the result is a
    global (B_local * n_processes, N, 3) array laid out so every host's
    frames live on that host's devices (ingest happens host-locally; only
    metadata crosses DCN).
    """
    n_proc = jax.process_count()
    scans1_local = np.asarray(scans1_local, np.float32)
    scans2_local = np.asarray(scans2_local, np.float32)
    x0s_local = np.asarray(x0s_local, np.float32)
    b_local, n_pts = scans1_local.shape[0], scans1_local.shape[1]
    global_pts = (b_local * n_proc, n_pts, 3)
    global_x = (b_local * n_proc, 6)
    s_pts = NamedSharding(mesh, P("dp", "sp"))
    s_x = NamedSharding(mesh, P("dp"))
    return (
        jax.make_array_from_process_local_data(s_pts, scans1_local, global_pts),
        jax.make_array_from_process_local_data(s_pts, scans2_local, global_pts),
        jax.make_array_from_process_local_data(s_x, x0s_local, global_x),
    )


def local_numpy(arr) -> np.ndarray:
    """This process's rows of a dp-sharded global array as one numpy block.

    A multi-controller process can only read its ADDRESSABLE shards; this
    assembles them (deduplicating sp-axis replicas) in row order.
    """
    seen = {}
    for s in arr.addressable_shards:
        key = tuple((sl.start, sl.stop) for sl in s.index)
        if key not in seen:
            seen[key] = np.asarray(s.data)
    rows = [seen[k] for k in sorted(seen)]
    return np.concatenate(rows, axis=0)


def run_distributed_registration(
    scans1_local, scans2_local, x0s_local, cfg: ICETConfig, mesh: Mesh | None = None
):
    """Register each host's local frame batch on the global mesh.

    Returns ``(result, local_slice)`` where ``result`` is the global
    RegistrationResult and ``local_slice`` is ``slice(start, stop)`` of the
    batch rows this process contributed; read them with
    ``local_numpy(result.X)`` (only addressable shards — no DCN fetch).
    """
    if mesh is None:
        mesh = global_registration_mesh()
    g1, g2, gx = global_scan_batch(scans1_local, scans2_local, x0s_local, mesh)
    step = make_sharded_register(cfg, mesh)
    res = step(g1, g2, gx)
    b_local = np.asarray(scans1_local).shape[0]
    pid = jax.process_index()
    return res, slice(pid * b_local, (pid + 1) * b_local)
