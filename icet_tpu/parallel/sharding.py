"""Multi-chip SPMD registration: device meshes, shardings, collectives.

The reference's only "distribution" mechanism is a ROS pub/sub process graph
over TCPROS (SURVEY.md section 2.3/5.8); its in-process parallelism (a
ThreadPool fanning out per-voxel work, src/icet.cpp:346-370) is dormant
because of data races.  The TPU-native design replaces both with a
``jax.sharding.Mesh`` and two named axes:

* ``dp`` (data parallel): independent scan PAIRS — batch registration for
  mapping/replay throughput, Monte-Carlo studies, and multi-sequence
  processing.  No communication between pairs.
* ``sp`` (spatial/point parallel): the POINTS of each scan are sharded.  Each
  device voxelises and accumulates moments for its point shard; one
  ``psum`` of the (V+1, 16) moment sums per Gauss-Newton iteration is the
  only per-iteration collective (rides ICI).  The keyframe cloud is
  all-gathered once (~1 MB) for the replicated radial-clustering sort.

All per-voxel math (eigendecompositions, weighting, the 6x6 solve) is
replicated — it is microseconds of work and replicating it avoids a second
round of collectives.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from icet_tpu.config import ICETConfig
from icet_tpu.solver import RegistrationResult, register_pair_impl


def registration_mesh(dp: int = 1, sp: int | None = None, devices=None) -> Mesh:
    """Build a (dp, sp) mesh.  Defaults: all devices on the sp axis."""
    if devices is None:
        devices = jax.devices()
    if sp is None:
        sp = len(devices) // dp
    grid = mesh_utils.create_device_mesh((dp, sp), devices=np.array(devices))
    return Mesh(grid, axis_names=("dp", "sp"))


def make_sharded_register(cfg: ICETConfig, mesh: Mesh):
    """Compile a batched, sharded registration step over ``mesh``.

    Returns ``step(scans1, scans2, x0s) -> RegistrationResult`` where
    ``scans1/scans2`` are (B, N, 3) with B sharded over ``dp`` and N over
    ``sp``, and ``x0s`` is (B, 6).  B must divide by mesh.shape['dp'] and N
    by mesh.shape['sp'].  All outputs are replicated over ``sp`` except
    ``static_mask``, which stays point-sharded.
    """

    def local_fn(scans1, scans2, x0s):
        # Local shapes: (B/dp, N/sp, 3); vmap over the pair batch, psum/gather
        # over 'sp' inside.
        solve = functools.partial(register_pair_impl, cfg=cfg, axis_name="sp")
        return jax.vmap(solve)(scans1, scans2, x0s)

    # out_specs is a pytree PREFIX of the outputs: the single P('dp') at the
    # diagnostics position covers every leaf of the IterationDiag NamedTuple.
    out_specs = RegistrationResult(
        X=P("dp"),
        pred_stds=P("dp"),
        Q=P("dp"),
        diagnostics=P("dp"),
        static_mask=P("dp", "sp"),
    )

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P("dp", "sp"), P("dp", "sp"), P("dp")),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_scan_batch(scans1, scans2, x0s, mesh: Mesh):
    """Device-put a host batch with the canonical (dp, sp) shardings."""
    s_pts = NamedSharding(mesh, P("dp", "sp"))
    s_x = NamedSharding(mesh, P("dp"))
    return (
        jax.device_put(scans1, s_pts),
        jax.device_put(scans2, s_pts),
        jax.device_put(x0s, s_x),
    )
