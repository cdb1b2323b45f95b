"""Scan-order-windowed moment accumulation (pure XLA).

The accumulation's irreducible cost is the one-hot contraction, which XLA
fuses on the VPU (regenerating the one-hot in registers — it never touches
HBM); its cost therefore scales with ``points x window``.  Spinning-lidar
scans arrive in azimuth-sweep order, so a small block of consecutive points
touches only a narrow contiguous band of voxel ids:

* within one beam a ``block``-point run spans ``~block/az_per_beam * n_theta``
  ids (the azimuth sweep),
* the theta wrap (theta hits 0/2pi mid-beam) adds at most ``n_theta`` (iphi
  is unchanged across the wrap since ``vid = iphi*n_theta + itheta``),
* a beam crossing adds ``~n_theta`` only when combined with the sweep tail,
* the iteration transform jitters ids by a few bins (near points by more),

so for the canonical 75x24 grid a 256-point block spans <= ~95 ids
(75 wrap + ~19 sweep) after transform jitter, and a 128-id window with
16-aligned starts (quantisation adds <= 15) covers it with margin.  Window
<= 128 matters: VPU lane tiles are 128 wide, so a 129-wide window costs
like 256.

Three passes, all dense:

1. prepass: transform + spherical conversion + voxel ids + per-block
   32-aligned window starts + the overflow count of valid points whose id
   falls outside their block's window (one fused elementwise chain),
2. two batched one-hot einsums per block — a (block, window) x (window, 5)
   GATHER of the merged bounds+anchors table (replaces the slow per-point
   65k-row table gather) and the (window, block) x (block, 10) moment
   CONTRACTION — both stay VPU fusions.  (Measured alternative: real MXU
   dot_generals over a materialised bf16 one-hot with 3-way-split packed
   operands were ~20% SLOWER end-to-end — the batched tiny matmuls pad N
   to 128 and pay the one-hot HBM round-trip; XLA's compare-regenerating
   VPU fusion wins at window <= 128.),
3. a slot-aligned merge: window starts are multiples of ``slot``, so each
   block's partial sums split into ``window/slot`` aligned slot rows and one
   tiny (n_blocks * window/slot)-row segment-sum assembles the global table
   (replaces the row-serialising 8k-row scatter-add).

Correct ONLY when overflow == 0; the solver falls back to the dense path via
lax.cond otherwise (shuffled/unordered clouds stay correct, just slower).

A Pallas version of this kernel hit three distinct Mosaic bugs with
dynamically-offset VMEM access (see ops/pallas_fused.py docstrings), which is
why this implementation stays in XLA.
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


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def windowed_moment_sums(
    pts: jax.Array,
    X: jax.Array,
    bounds: jax.Array,
    anchors: jax.Array,
    cfg: ICETConfig,
    block: int = 256,
    window: int = 128,
    slot: int = 16,
) -> tuple[jax.Array, jax.Array]:
    """Returns ((V+1, 16) anchored moment sums, overflow count)."""
    assert window % slot == 0
    n = pts.shape[0]
    v1 = cfg.n_voxels + 1
    # Table padding: every slot-aligned window slice must stay in range.
    v_pad = max(-(-v1 // slot) * slot, window)
    ws = window // slot
    pad_n = (-n) % block
    if pad_n:
        pts = jnp.concatenate([pts, jnp.zeros((pad_n, 3), pts.dtype)])
    nb = pts.shape[0] // block

    # Range-gate on the RAW cloud, matching the reference which strips
    # r < min_range points from the cloud once before solving (icet.cpp
    # min-range filter / ICET_spherical.py:47-71) — re-gating on transformed
    # r would resurrect r=0 sensor-dropout points once |t| > min_range.
    raw_ok = jnp.linalg.norm(pts, axis=-1) >= cfg.min_range
    p2 = transform_points(pts, X)
    rtp = cart_to_spherical(p2)
    r = rtp[..., 0]
    vid = voxel_ids(rtp, cfg)
    ok = raw_ok & (vid < cfg.n_voxels)

    vb = vid.reshape(nb, block)
    okb = ok.reshape(nb, block)
    big = jnp.int32(2**30)
    vmin = jnp.min(jnp.where(okb, vb, big), axis=1)
    vmin = jnp.where(vmin == big, 0, vmin)
    starts = jnp.clip((vmin // slot) * slot, 0, v_pad - window)  # (nb,)

    local = vb - starts[:, None]
    in_win = okb & (local >= 0) & (local < window)
    overflow = jnp.sum((okb & ~in_win).astype(jnp.int32))

    # Window-slot gather of the merged bounds+anchors table: nb*ws slot rows
    # instead of one row per point.
    table = jnp.concatenate([bounds, anchors], axis=-1)  # (V+1, 5)
    table = jnp.concatenate(
        [table, jnp.zeros((v_pad - v1, 5), table.dtype)], axis=0
    )
    slots_t = table.reshape(v_pad // slot, slot, 5)
    sub_ids = starts[:, None] // slot + jnp.arange(ws, dtype=jnp.int32)[None, :]
    table_win = slots_t[sub_ids].reshape(nb, window, 5)

    cols = jnp.arange(window, dtype=jnp.int32)
    onehot = (
        jnp.where(in_win, local, window)[:, :, None] == cols[None, None, :]
    ).astype(jnp.float32)  # (nb, block, window)

    # Per-point bounds + anchor via the one-hot (exact: one nonzero per row).
    t_pt = jnp.einsum("bpw,bwf->bpf", onehot, table_win, precision=_HI)
    rb = r.reshape(nb, block)
    member = in_win & (rb >= t_pt[..., 0]) & (rb <= t_pt[..., 1])
    # where(), not multiply-by-mask: NaN input coordinates (supported per
    # cart_to_spherical) give NaN offsets, and NaN * 0 == NaN would poison
    # the einsum sums while the overflow counter stays 0 (so the lax.cond
    # fallback never fires).  member is False for NaN points (its range
    # comparisons are False), so zeroing here is exact.
    g = jnp.where(
        member[..., None], p2.reshape(nb, block, 3) - t_pt[..., 2:5], 0.0
    )
    gx, gy, gz = g[..., 0], g[..., 1], g[..., 2]
    feats = jnp.stack(
        [member.astype(jnp.float32), gx, gy, gz, gx * gx, gy * gy, gz * gz,
         gx * gy, gx * gz, gy * gz],
        axis=-1,
    )  # (nb, block, 10)
    partial = jnp.einsum("bpw,bpf->bwf", onehot, feats, precision=_HI)

    # Slot-aligned merge: each block's window is ws aligned slot rows.
    pr = partial.reshape(nb * ws, slot * 10)
    sums_slots = jax.ops.segment_sum(
        pr, sub_ids.reshape(-1), num_segments=v_pad // slot
    )
    sums10 = sums_slots.reshape(v_pad, 10)[:v1]
    sums = jnp.concatenate(
        [sums10, jnp.zeros((v1, _N_FEATURES - 10), jnp.float32)], axis=-1
    )
    return sums, overflow
