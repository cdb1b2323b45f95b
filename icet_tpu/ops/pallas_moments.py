"""Pallas TPU kernel for voxel moment accumulation.

The scatter-reduce at the heart of ICET (points -> per-voxel moment sums) has
two XLA formulations in ops.moments ("segsum" scatter-add and an
lax.scan'd one-hot matmul).  This kernel is the hand-scheduled version of the
latter: the grid walks point blocks, each step builds the (block, Vpad)
one-hot matrix directly in VMEM/registers and contracts it against the
feature block on the MXU, accumulating into a VMEM-resident (Vpad, 16)
output that is written to HBM once.  The one-hot never exists in HBM.

Grid steps on TPU run sequentially on a core, so accumulating into the same
output block across steps is race-free (initialise at step 0).

Measured on v5e at the canonical config (65536 points, V=1800, 16 features)
this LOSES to XLA's native scatter-add ("segsum" in ops.moments): the one-hot
contraction has K=block, N=16 — 16 of 256 MXU lanes busy — while the
hardware scatter path absorbs the ~36 colliding updates per voxel at memory
speed.  Kept as a selectable method ("pallas") because the balance flips when
the feature dimension grows (e.g. future per-voxel feature pyramids) or on
parts with weaker scatter units.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_N_FEATURES = 16


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _moment_kernel(vid_ref, feat_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    vid = vid_ref[:]  # (block,) int32
    feats = feat_ref[:]  # (block, 16) f32
    v_pad = out_ref.shape[0]
    # one-hot: (block, Vpad) — lives only on-chip.
    cols = jax.lax.broadcasted_iota(jnp.int32, (vid.shape[0], v_pad), 1)
    onehot = (vid[:, None] == cols).astype(jnp.float32)
    out_ref[:] += jax.lax.dot_general(
        onehot,
        feats,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnums=(2, 3))
def pallas_moment_sums(
    vid: jax.Array,
    feats: jax.Array,
    n_voxels: int,
    block: int = 512,
) -> jax.Array:
    """Accumulate (V+1, 16) moment sums with the Pallas MXU kernel.

    Args:
      vid: (N,) int32 voxel ids; masked-out points must already carry the
        sentinel id ``n_voxels``.
      feats: (N, 16) f32 per-point features (ops.moments._point_features).
      n_voxels: V.
    """
    n = vid.shape[0]
    v_pad = _round_up(n_voxels + 1, 128)
    pad = (-n) % block
    if pad:
        vid = jnp.concatenate([vid, jnp.full((pad,), n_voxels, vid.dtype)])
        feats = jnp.concatenate(
            [feats, jnp.zeros((pad, _N_FEATURES), feats.dtype)]
        )
    n_blocks = vid.shape[0] // block

    out = pl.pallas_call(
        _moment_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block, _N_FEATURES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (v_pad, _N_FEATURES), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((v_pad, _N_FEATURES), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * vid.shape[0] * v_pad * _N_FEATURES,
            bytes_accessed=vid.shape[0] * (4 + 64) + v_pad * 64,
            transcendentals=0,
        ),
        # Mosaic targets TPU; fall back to the interpreter elsewhere (CPU CI).
        interpret=jax.default_backend() != "tpu",
    )(vid.astype(jnp.int32), feats)
    return out[: n_voxels + 1]
