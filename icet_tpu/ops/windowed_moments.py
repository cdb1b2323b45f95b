"""Scan-order-windowed moment accumulation (pure XLA).

The accumulation's irreducible cost is the one-hot contraction; its effective
MXU cost scales with the one-hot WIDTH.  Spinning-lidar scans arrive in
azimuth-sweep order, so a block of consecutive points touches only a narrow
contiguous band of voxel ids — the one-hot can be (block, window) per block
instead of (block, V), ~V/window less work.

A Pallas version of this kernel hit three distinct Mosaic bugs with
dynamically-offset VMEM access (see ops/pallas_fused.py docstrings), so this
implementation stays in XLA:

1. prepass: transform + spherical conversion + voxel ids (one fused
   elementwise chain over the cloud),
2. per-block window starts (a (n_blocks, block) min) + the overflow count of
   valid points whose id falls outside their block's window,
3. batched (block, window) one-hot matmuls against window-gathered
   bounds/anchor tables,
4. one (n_blocks * window, 16) scatter-add assembling the global table —
   ~2x smaller than scattering the raw points, and with far fewer colliding
   indices.

Correct ONLY when overflow == 0; the solver falls back to the dense path via
lax.cond otherwise (shuffled/unordered clouds stay correct, just slower).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from icet_tpu.config import ICETConfig
from icet_tpu.ops.geometry import cart_to_spherical, transform_points
from icet_tpu.ops.grid import voxel_ids

_HI = jax.lax.Precision.HIGHEST
_N_FEATURES = 16


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def windowed_moment_sums(
    pts: jax.Array,
    X: jax.Array,
    bounds: jax.Array,
    anchors: jax.Array,
    cfg: ICETConfig,
    block: int = 2048,
    window: int = 256,
) -> tuple[jax.Array, jax.Array]:
    """Returns ((V+1, 16) sums, overflow count).

    block=2048 keeps the final scatter at n_blocks*window = 8k rows (the
    scatter serialises per row — the trace showed it dominating at smaller
    blocks); a 2048-point beam-major block still spans well under the
    256-id window."""
    n = pts.shape[0]
    v1 = cfg.n_voxels + 1
    window = min(window, v1)
    pad_n = (-n) % block
    if pad_n:
        pts = jnp.concatenate([pts, jnp.zeros((pad_n, 3), pts.dtype)])
    n_blocks = pts.shape[0] // block

    p2 = transform_points(pts, X)
    rtp = cart_to_spherical(p2)
    r = rtp[..., 0]
    ok = r >= cfg.min_range
    vid = voxel_ids(rtp, cfg)
    ok = ok & (vid < cfg.n_voxels)

    vb = vid.reshape(n_blocks, block)
    okb = ok.reshape(n_blocks, block)
    big = jnp.int32(2**30)
    vmin = jnp.min(jnp.where(okb, vb, big), axis=1)
    vmin = jnp.where(vmin == big, 0, vmin)
    starts = jnp.clip(vmin, 0, v1 - window)  # (n_blocks,)

    local = vb - starts[:, None]
    in_win = okb & (local >= 0) & (local < window)
    overflow = jnp.sum((okb & ~in_win).astype(jnp.int32))

    # Per-point anchor + radial membership via ONE combined small-table
    # gather (the trace shows per-point gathers at ~0.7 ms each; merging the
    # bounds and anchor tables halves that).
    vids = jnp.where(ok, vid, cfg.n_voxels)
    table = jnp.concatenate([bounds, anchors], axis=-1)  # (V+1, 5)
    t_pt = table[vids]
    member = ok & (r >= t_pt[:, 0]) & (r <= t_pt[:, 1])
    # where(), not multiply-by-mask: NaN input coordinates (supported per
    # cart_to_spherical) give NaN offsets, and NaN * 0 == NaN would poison
    # the einsum sums while the overflow counter stays 0 (so the lax.cond
    # fallback never fires).  member is False for NaN points (its range
    # comparisons are False), so zeroing here is exact.
    g = jnp.where(member[:, None], p2 - t_pt[:, 2:5], 0.0)
    m = (member.reshape(n_blocks, block) & in_win).astype(jnp.float32)
    gx = g[..., 0].reshape(n_blocks, block) * m
    gy = g[..., 1].reshape(n_blocks, block) * m
    gz = g[..., 2].reshape(n_blocks, block) * m
    feats = jnp.stack(
        [m, gx, gy, gz, gx * gx, gy * gy, gz * gz, gx * gy, gx * gz,
         gy * gz],
        axis=-1,
    )  # (n_blocks, block, 10)

    widx = starts[:, None] + jnp.arange(window, dtype=jnp.int32)[None, :]
    cols = jnp.arange(window, dtype=jnp.int32)
    onehot = (
        jnp.where(in_win, local, window)[:, :, None] == cols[None, None, :]
    ).astype(jnp.float32)  # (n_blocks, block, window)
    partial = jnp.einsum("bpw,bpf->bwf", onehot, feats, precision=_HI)

    flat_ids = widx.reshape(-1)
    sums10 = jax.ops.segment_sum(
        partial.reshape(-1, 10), flat_ids, num_segments=v1
    )
    sums = jnp.concatenate(
        [sums10, jnp.zeros((v1, _N_FEATURES - 10), jnp.float32)], axis=-1
    )
    return sums, overflow
