"""Voxel Gaussian-moment accumulation — the #1 hot kernel.

Replaces reference fitCells1/fitCells2 per-voxel Eigen reductions
(src/icet.cpp:160-162, 303-306) and the TF ragged/batched ``fit_gaussian``
(python/ICET_spherical.py:913-967).  Note the reference's GPU path SUBSAMPLES
each voxel to the first 25 points to get uniform shapes
(ICET_spherical.py:946-953); we do the exact full-point computation instead —
dense masked accumulation has no raggedness to work around.

Two accumulation strategies, selected by config:

* ``segsum``: ``jax.ops.segment_sum`` (XLA scatter-add).
* ``onehot``: a ``lax.scan`` over point blocks; each block builds a one-hot
  (block, V) matrix in registers/VMEM and contracts it against the feature
  block on the MXU.  This is the classic TPU trick of casting a scatter-reduce
  as a sequence of small dense matmuls — XLA keeps the (V, F) accumulator
  on-chip and never materialises the one-hot in HBM.

Precision: points are accumulated relative to a per-voxel cartesian anchor
(see grid.voxel_anchors), so all sums involve values bounded by the voxel
size and single-pass f32 covariance math is exact to ~1e-6 — the naive
``E[xx] - E[x]^2`` on raw coordinates would lose everything to cancellation
at f32.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_N_FEATURES = 16  # 10 used; padded to a lane-friendly 16


class VoxelMoments(NamedTuple):
    count: jax.Array  # (V+1,) points per voxel
    mean: jax.Array  # (V+1, 3) cartesian mean
    cov: jax.Array  # (V+1, 3, 3) sample covariance (N-1 denominator)


def _point_features(g: jax.Array, member: jax.Array) -> jax.Array:
    """Per-point moment features ``(N, 16)`` about the anchor offsets ``g``."""
    gx, gy, gz = g[..., 0], g[..., 1], g[..., 2]
    feats = jnp.stack(
        [
            jnp.ones_like(gx),
            gx,
            gy,
            gz,
            gx * gx,
            gy * gy,
            gz * gz,
            gx * gy,
            gx * gz,
            gy * gz,
        ],
        axis=-1,
    )
    # where(), not multiply-by-mask: NaN coordinates (propagated through the
    # scan-2 transform before the range gate zeroes them) must not poison the
    # sums via NaN * 0.
    feats = jnp.where(member[..., None], feats, 0.0)
    pad = jnp.zeros(g.shape[:-1] + (_N_FEATURES - 10,), g.dtype)
    return jnp.concatenate([feats, pad], axis=-1)


def _accumulate_segsum(feats, vid, n_voxels):
    return jax.ops.segment_sum(feats, vid, num_segments=n_voxels + 1)


def _split3_bf16(x):
    """Exact 3-way bfloat16 mantissa split: x == hi + mid + lo (f32).

    Each part is exactly representable in bf16, so a bf16 MXU matmul against
    an exactly-representable operand (a one-hot matrix) reproduces the f32
    product bit-for-bit per term; three fast bf16 passes replace the 6-pass
    Precision.HIGHEST decomposition at ~2x the speed and full f32 accuracy.
    """
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _accumulate_onehot(feats, vid, n_voxels, block):
    """Blocked one-hot MXU accumulation via lax.scan over point blocks.

    The (block, V+1) one-hot matrix lives only on-chip; its contraction with
    the feature block rides the MXU in bf16 with a 3-way mantissa split of
    the features (exact — see _split3_bf16).
    """
    n = feats.shape[0]
    pad = (-n) % block
    if pad:
        feats = jnp.concatenate([feats, jnp.zeros((pad, _N_FEATURES), feats.dtype)])
        vid = jnp.concatenate([vid, jnp.full((pad,), n_voxels, vid.dtype)])
    feats = feats.reshape(-1, block, _N_FEATURES)
    vid = vid.reshape(-1, block)
    volume = jnp.arange(n_voxels + 1, dtype=vid.dtype)

    def body(acc, xs):
        f, v = xs
        onehot = (v[:, None] == volume[None, :]).astype(jnp.bfloat16)
        for part in _split3_bf16(f):
            prod = jax.lax.dot_general(
                onehot,
                part,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # Barrier: XLA would otherwise reassociate
            # dot(oh, hi) + dot(oh, mid) -> dot(oh, hi + mid), re-rounding
            # the sum to bf16 and destroying the exact split.
            acc = acc + jax.lax.optimization_barrier(prod)
        return acc, None

    init = jnp.zeros((n_voxels + 1, _N_FEATURES), jnp.float32)
    acc, _ = jax.lax.scan(body, init, (feats, vid))
    return acc


def voxel_moment_sums(
    points: jax.Array,
    vid: jax.Array,
    member: jax.Array,
    anchors: jax.Array,
    n_voxels: int,
    method: str = "segsum",
    block: int = 1024,
) -> jax.Array:
    """Raw (V+1, 16) anchored moment sums for a (shard of a) point cloud.

    This is the psum-able quantity for multi-chip point sharding: each device
    accumulates its local shard, then a single ``lax.psum`` over the mesh axis
    yields the global sums (the ICI collective replacing the reference's
    shared-memory accumulation, icet.cpp:383-404).
    """
    vid = jnp.where(member, vid, n_voxels).astype(jnp.int32)
    g = points - anchors[vid]
    feats = _point_features(g, member)
    if method == "onehot":
        return _accumulate_onehot(feats, vid, n_voxels, block)
    if method == "pallas":
        from icet_tpu.ops.pallas_moments import pallas_moment_sums

        return pallas_moment_sums(vid, feats, n_voxels, block)
    return _accumulate_segsum(feats, vid, n_voxels)


def finalize_moments_planes(sums: jax.Array, anchors: jax.Array):
    """Plane-form finalize: (count (V,), mean (V, 3), cov6 (V, 6)).

    ``cov6`` packs the symmetric sample covariance as
    ``[xx, yy, zz, xy, xz, yz]`` — the hot per-iteration path consumes
    covariances entry-wise (ops/wls_planes.py), and the (V, 3, 3) AoS
    round-trip of :func:`finalize_moments` carries 3/128-lane layouts
    through every op.
    """
    count = sums[:, 0]
    safe_n = jnp.maximum(count, 1.0)
    gbar = sums[:, 1:4] / safe_n[:, None]
    mean = anchors + gbar
    denom = jnp.maximum(count - 1.0, 1.0)
    gx, gy, gz = gbar[:, 0], gbar[:, 1], gbar[:, 2]
    pairs = (
        (4, gx * gx), (5, gy * gy), (6, gz * gz),
        (7, gx * gy), (8, gx * gz), (9, gy * gz),
    )
    cov6 = jnp.stack(
        [(sums[:, i] - safe_n * g2) / denom for i, g2 in pairs], axis=-1
    )
    return count, mean, cov6


def cov6_to_matrix(cov6: jax.Array) -> jax.Array:
    """(V, 6) packed symmetric planes -> (V, 3, 3)."""
    xx, yy, zz, xy, xz, yz = (cov6[:, i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], -1),
            jnp.stack([xy, yy, yz], -1),
            jnp.stack([xz, yz, zz], -1),
        ],
        axis=-2,
    )


def finalize_moments(sums: jax.Array, anchors: jax.Array) -> VoxelMoments:
    """Turn (possibly psum'd) raw sums into count / mean / sample covariance."""
    count = sums[:, 0]
    safe_n = jnp.maximum(count, 1.0)
    gbar = sums[:, 1:4] / safe_n[:, None]
    mean = anchors + gbar

    # E[g g^T] * n  assembled from the 6 unique second moments.
    xx, yy, zz, xy, xz, yz = (sums[:, i] for i in range(4, 10))
    sec = jnp.stack(
        [
            jnp.stack([xx, xy, xz], -1),
            jnp.stack([xy, yy, yz], -1),
            jnp.stack([xz, yz, zz], -1),
        ],
        axis=-2,
    )
    centered = sec - safe_n[:, None, None] * (gbar[:, :, None] * gbar[:, None, :])
    denom = jnp.maximum(count - 1.0, 1.0)
    cov = centered / denom[:, None, None]
    return VoxelMoments(count=count, mean=mean, cov=cov)


def voxel_moments(
    points: jax.Array,
    vid: jax.Array,
    member: jax.Array,
    anchors: jax.Array,
    n_voxels: int,
    method: str = "segsum",
    block: int = 1024,
    axis_name: str | None = None,
) -> VoxelMoments:
    """Accumulate per-voxel count / mean / covariance.

    Args:
      points: (N, 3) cartesian points (the LOCAL shard under shard_map).
      vid: (N,) int32 voxel ids (sentinel ``n_voxels`` for out-of-grid).
      member: (N,) bool in-cluster mask.
      anchors: (V+1, 3) per-voxel anchor points (replicated).
      n_voxels: V.
      method: "segsum" or "onehot".
      axis_name: if set, psum the raw sums over this mesh axis (point-sharded
        multi-chip accumulation).
    """
    sums = voxel_moment_sums(points, vid, member, anchors, n_voxels, method, block)
    if axis_name is not None:
        sums = jax.lax.psum(sums, axis_name)
    return finalize_moments(sums, anchors)
