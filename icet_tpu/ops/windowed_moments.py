"""Scan-order-windowed moment accumulation (pure XLA).

The accumulation's irreducible cost is the one-hot contraction, which XLA
fuses on the VPU (regenerating the one-hot in registers — it never touches
HBM); its cost therefore scales with ``points x window``.  Spinning-lidar
scans arrive in azimuth-sweep order, so a small block of consecutive points
touches only a narrow band of voxel ids — but the band is narrow in the 2-D
``(iphi row, theta column)`` grid coordinate, NOT in the flat voxel id
``vid = iphi * n_theta + itheta``:

* within one beam a ``block``-point run sweeps a contiguous azimuth arc
  (~``block/az_per_beam * n_theta`` theta columns),
* the theta wrap (theta crosses 0/2pi mid-beam) is a MODULAR continuation —
  flat ids jump by ``n_theta`` but ``(itheta - t0) mod n_theta`` stays small,
* the iteration transform jitters ``itheta`` by a few bins and ``iphi`` by
  at most ~1 row (beam elevations sitting near a phi-bin edge).

The window is therefore 2-D and theta-modular: ``phi_rows`` consecutive iphi
rows x ``theta_cols`` modular theta columns.  At the canonical 75x24 grid,
2 rows x 48 columns = a 96-wide one-hot that measured ZERO overflow on the
bundled frames in both registration directions, at converged and
1 m-magnitude transforms (measured modular spans are <= 25 theta bins incl.
wrap blocks; budget = 48 - 15 slot quantisation = 33) — whereas a flat-id
window overflows whenever a wrap block also contains an iphi-jittered point
(span ~ n_theta + sweep > 128), silently triggering the 2x-cost fallback
every iteration (+3 ms/frame on the odometry benchmark).  Narrower windows
are faster (one-hot cost ~ points x window: 0.32 ms/call at 2x64, 0.14 at
2x48, 0.12 at 2x32 on v5e) but 2x32's span budget (32-7) sits exactly at
the measured worst span, so 2x48 is the default.

Three passes, all dense:

1. prepass: transform + spherical conversion + (iphi, itheta) + per-block
   window anchors — ``t0`` picked by max point coverage over the
   ``nt_pad/slot`` slot-aligned modular starts, ``p0`` by coverage between
   ``{pmin, pmin+1}`` — + the overflow count of valid points outside their
   block's window (one fused elementwise chain; theta is padded to
   ``nt_pad`` = next multiple of ``slot`` so every window is whole slots),
2. two batched one-hot einsums per block — a (block, window) x (window, 5)
   GATHER of the merged bounds+anchors table (replaces a slow per-point
   65k-row table gather) and the (window, block) x (block, 10) moment
   CONTRACTION — both stay VPU fusions.  (Measured alternative: real MXU
   dot_generals over a materialised bf16 one-hot with 3-way-split packed
   operands were ~20% SLOWER end-to-end — the batched tiny matmuls pad N
   to 128 and pay the one-hot HBM round-trip; XLA's compare-regenerating
   VPU fusion wins at window <= 128.),
3. a slot-aligned merge: each block window is ``phi_rows * theta_cols/slot``
   whole slots of the padded (n_phi, nt_pad) grid, so one tiny
   segment-sum over slot rows assembles the global table (replaces a
   row-serialising scatter-add), then the theta padding is sliced off.

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


class _WindowLayout:
    """Per-block window geometry shared by the moment and count kernels:
    anchors (t0, p0) picked by point coverage, per-point window columns,
    the overflow count, and the slot ids each window covers in the padded
    (n_phi, nt_pad) grid."""

    __slots__ = (
        "nb", "window", "tslots", "nts", "nt_pad", "tcols", "rows",
        "okb", "in_win", "local", "overflow", "sub_ids",
    )

    def __init__(self, ok, vid, cfg, block, phi_rows, theta_cols, slot):
        n_theta, n_phi = cfg.n_theta, cfg.n_phi
        nt_pad = -(-n_theta // slot) * slot
        self.nt_pad = nt_pad
        self.tcols = tcols = min(theta_cols, nt_pad)
        self.rows = rows = min(phi_rows, n_phi)
        self.window = rows * tcols
        self.tslots = tslots = tcols // slot
        self.nts = nts = nt_pad // slot
        nb = ok.shape[0] // block
        self.nb = nb

        okb = ok.reshape(nb, block)
        ip = (vid // n_theta).reshape(nb, block)
        it = (vid % n_theta).reshape(nb, block)
        self.okb = okb

        # Theta anchor: slot-aligned modular start with max point coverage.
        cand_t = jnp.arange(nts, dtype=jnp.int32) * slot  # (nts,)
        cov_t = jnp.sum(
            (okb[None]
             & (((it[None] - cand_t[:, None, None]) % nt_pad) < tcols)),
            axis=2,
            dtype=jnp.int32,
        )  # (nts, nb)
        t0 = cand_t[jnp.argmax(cov_t, axis=0)]  # (nb,)

        # Phi anchor: best of {pmin, pmin+1} by coverage (a single
        # low-jittered point must not drag the rows off the bulk).
        big = jnp.int32(2**30)
        pmin = jnp.min(jnp.where(okb, ip, big), axis=1)
        pmin = jnp.where(pmin == big, 0, pmin)
        p_hi = jnp.minimum(pmin + 1, max(n_phi - rows, 0))
        pmin = jnp.minimum(pmin, max(n_phi - rows, 0))

        def _cov_p(p0):
            return jnp.sum(
                okb & (ip >= p0[:, None]) & (ip < p0[:, None] + rows),
                axis=1,
                dtype=jnp.int32,
            )

        p0 = jnp.where(_cov_p(p_hi) > _cov_p(pmin), p_hi, pmin)  # (nb,)

        j = ip - p0[:, None]
        k = (it - t0[:, None]) % nt_pad
        self.in_win = okb & (j >= 0) & (j < rows) & (k < tcols)
        self.local = j * tcols + k  # window column when in_win
        self.overflow = jnp.sum((okb & ~self.in_win).astype(jnp.int32))

        # Window slot ids in the padded grid: rows x modular theta slots.
        row_ids = (
            p0[:, None, None]
            + jnp.arange(rows, dtype=jnp.int32)[None, :, None]
        )
        col_ids = (
            t0[:, None, None] // slot
            + jnp.arange(tslots, dtype=jnp.int32)[None, None, :]
        ) % nts
        self.sub_ids = (row_ids * nts + col_ids).reshape(nb, rows * tslots)

    def onehot(self):
        cols = jnp.arange(self.window, dtype=jnp.int32)
        return (
            jnp.where(self.in_win, self.local, self.window)[:, :, None]
            == cols[None, None, :]
        ).astype(jnp.float32)  # (nb, block, window)

    def merge_slots(self, partial, n_phi, n_theta, slot, nfeat):
        """Slot-aligned merge of (nb, window, nfeat) partials into the
        (n_phi * n_theta, nfeat) grid (theta padding stripped)."""
        pr = partial.reshape(self.nb * self.rows * self.tslots, slot * nfeat)
        slots = jax.ops.segment_sum(
            pr, self.sub_ids.reshape(-1), num_segments=n_phi * self.nts
        )
        grid = slots.reshape(n_phi, self.nt_pad, nfeat)[:, :n_theta]
        return grid.reshape(n_phi * n_theta, nfeat)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8))
def windowed_moment_sums(
    pts: jax.Array,
    X: jax.Array,
    bounds: jax.Array,
    anchors: jax.Array,
    cfg: ICETConfig,
    block: int = 256,
    phi_rows: int = 2,
    theta_cols: int = 48,
    slot: int = 16,
) -> tuple[jax.Array, jax.Array]:
    """Returns ((V+1, 16) anchored moment sums, overflow count).

    ``overflow`` is the count of valid points outside their block's window
    that the sums do NOT include — when nonzero the caller must top the
    sums up with :func:`windowed_spill_sums` (exact, cheap, bounded
    capacity) or fall back to an order-independent full pass.

    This function is deliberately branch-free: it sits in the GN
    while-loop body, where an extra XLA conditional costs a scheduling
    sync (~0.7 ms/frame measured on the v5e early-exit odometry headline)
    even when the branch never executes.  The caller owns the single
    overflow conditional (solver._fused_sums nests spill/fallback inside
    its dirty branch, so overflow-free frames pay exactly one predicate).
    """
    assert theta_cols % slot == 0
    n = pts.shape[0]
    n_theta, n_phi = cfg.n_theta, cfg.n_phi
    v1 = cfg.n_voxels + 1
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

    lay = _WindowLayout(ok, vid, cfg, block, phi_rows, theta_cols, slot)
    in_win, window, nts = lay.in_win, lay.window, lay.nts
    overflow = lay.overflow

    # Merged bounds+anchors table, theta-padded so windows are whole slots.
    table = jnp.concatenate([bounds, anchors], axis=-1)  # (V+1, 5)
    table_grid = table[: n_phi * n_theta].reshape(n_phi, n_theta, 5)
    table_grid = jnp.pad(
        table_grid, ((0, 0), (0, lay.nt_pad - n_theta), (0, 0))
    )
    slots_t = table_grid.reshape(n_phi * nts, slot, 5)
    table_win = slots_t[lay.sub_ids].reshape(nb, window, 5)

    onehot = lay.onehot()  # (nb, block, window)

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

    # Slot-aligned merge over the padded grid, then strip the theta padding.
    sums10 = jnp.concatenate(
        [lay.merge_slots(partial, n_phi, n_theta, slot, 10),
         jnp.zeros((1, 10), jnp.float32)],
        axis=0,
    )

    sums = jnp.concatenate(
        [sums10, jnp.zeros((v1, _N_FEATURES - 10), jnp.float32)], axis=-1
    )
    return sums, overflow


def windowed_spill_sums(
    pts: jax.Array,
    X: jax.Array,
    bounds: jax.Array,
    anchors: jax.Array,
    cfg: ICETConfig,
    block: int = 256,
    phi_rows: int = 2,
    theta_cols: int = 48,
    slot: int = 16,
    spill_capacity: int = 8192,
) -> jax.Array:
    """Exact (V+1, 16) moment contributions of the points
    :func:`windowed_moment_sums` (same arguments) left out of its windows
    — ``windowed + spill == segsum truth`` whenever the overflow count is
    within ``spill_capacity`` (beyond it the result silently misses the
    excess points: gate on the overflow count, see solver._fused_sums).

    This is the keyframe-odometry regime's hot fix: at 2-4 m keyframe
    baselines, parallax pushes 0.7-4.3k of 65k points out of the 2x48
    window (measured on the bench city drive), and without it EVERY
    iteration of 3 of 4 frames silently paid the 2x full-segsum fallback
    (~0.5 ms per iteration in the trace, the dominant term of
    keyframe_frame_ms).  Meant to run inside an overflow-gated lax.cond
    branch, so it recomputes the cheap elementwise prepass (transform +
    bins + window layout, ~tens of us) instead of forcing the caller to
    keep those intermediates live across the conditional.
    """
    n = pts.shape[0]
    v1 = cfg.n_voxels + 1
    cap = spill_capacity
    pad_n = (-n) % block
    if pad_n:
        pts = jnp.concatenate([pts, jnp.zeros((pad_n, 3), pts.dtype)])

    raw_ok = jnp.linalg.norm(pts, axis=-1) >= cfg.min_range
    p2 = transform_points(pts, X)
    rtp = cart_to_spherical(p2)
    r = rtp[..., 0]
    vid = voxel_ids(rtp, cfg)
    ok = raw_ok & (vid < cfg.n_voxels)
    lay = _WindowLayout(ok, vid, cfg, block, phi_rows, theta_cols, slot)
    table = jnp.concatenate([bounds, anchors], axis=-1)  # (V+1, 5)
    extra10 = _spill_moment_sums(
        p2, r, vid, lay.okb & ~lay.in_win, lay.overflow, table, v1, cap
    )
    return jnp.concatenate(
        [extra10, jnp.zeros((v1, _N_FEATURES - 10), jnp.float32)], axis=-1
    )


def _spill_moment_sums(p2, r, vid, spill_mask, overflow, table, v1, cap):
    """Exact (v1, 10) moment contributions of out-of-window points.

    Compact rank of each spilled point; everything else targets row
    ``cap`` == out of bounds == dropped.  Ranks are distinct and < cap
    when ``overflow <= cap`` (the caller's cond predicate), so the
    scatter is unique-index and accumulation-free.
    """
    spill = spill_mask.reshape(-1)
    pos = jnp.cumsum(spill.astype(jnp.int32)) - 1
    tgt = jnp.where(spill, pos, cap)
    packed = jnp.concatenate(
        [p2.reshape(-1, 3), r.reshape(-1, 1),
         vid.reshape(-1, 1).astype(jnp.float32)],  # vid < 2^24: exact
        axis=-1,
    )
    buf = (
        jnp.zeros((cap, 5), jnp.float32)
        .at[tgt]
        .set(packed, mode="drop", unique_indices=True)
    )
    bvid = jnp.clip(buf[:, 4].astype(jnp.int32), 0, v1 - 1)
    tb = table[bvid]  # (cap, 5) bounds + anchor gather
    bok = jnp.arange(cap, dtype=jnp.int32) < overflow
    mem = bok & (buf[:, 3] >= tb[:, 0]) & (buf[:, 3] <= tb[:, 1])
    # where(), not multiply: NaN coordinates give False comparisons
    # (mem False) and must not poison the sums (same guard as the
    # windowed member).
    gs = jnp.where(mem[:, None], buf[:, :3] - tb[:, 2:5], 0.0)
    fx, fy, fz = gs[..., 0], gs[..., 1], gs[..., 2]
    fs = jnp.stack(
        [mem.astype(jnp.float32), fx, fy, fz, fx * fx, fy * fy,
         fz * fz, fx * fy, fx * fz, fy * fz],
        axis=-1,
    )  # (cap, 10); all-zero rows for non-members
    return jax.ops.segment_sum(fs, bvid, num_segments=v1)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def windowed_vid_counts(
    vid: jax.Array,
    valid: jax.Array,
    cfg: ICETConfig,
    block: int = 256,
    phi_rows: int = 2,
    theta_cols: int = 48,
    slot: int = 16,
) -> tuple[jax.Array, jax.Array]:
    """Exact per-voxel-id point counts via the scan-order window trick:
    ((V+1,) int32 counts, overflow).

    Takes the SAME precomputed (vid, valid) arrays the clustering sort will
    consume — recomputing vid here would let jit-fusion rounding flip
    points that sit exactly on bin boundaries (regular raycast rasters do)
    and silently desynchronize the counts from the sort's segments.
    counts[v] = #{p : vid == v and valid} for v < V, remainder at the
    sentinel row — exactly the sort's segment sizes, so
    ``radial_cluster_bounds(..., counts=...)`` reads per-voxel answers at
    cumsum(counts)-1 rows instead of carrying probe rows through an
    extraction sort.  Correct ONLY when overflow == 0 (gate with lax.cond,
    like the moment sums)."""
    n = vid.shape[0]
    n_theta, n_phi = cfg.n_theta, cfg.n_phi
    pad_n = (-n) % block
    ok = valid & (vid < cfg.n_voxels)
    vid = jnp.where(ok, vid, 0)  # padded/out rows: any in-grid id is fine
    if pad_n:
        vid = jnp.concatenate([vid, jnp.zeros((pad_n,), vid.dtype)])
        ok = jnp.concatenate([ok, jnp.zeros((pad_n,), bool)])

    lay = _WindowLayout(ok, vid, cfg, block, phi_rows, theta_cols, slot)
    partial = jnp.einsum(
        "bpw,bp->bw", lay.onehot(), lay.in_win.astype(jnp.float32),
        precision=_HI,
    )  # (nb, window); exact integers (f32 is exact to 2^24)
    counts = lay.merge_slots(
        partial[..., None], n_phi, n_theta, slot, 1
    )[:, 0].astype(jnp.int32)
    # Sentinel row: everything else (invalid, padded, out-of-grid points).
    sentinel = jnp.int32(n) - jnp.sum(counts)
    return jnp.concatenate([counts, sentinel[None]]), lay.overflow
