"""Per-spike radial clustering — the "shadow mitigation" voxel bounds.

Reference semantics (src/icet.cpp:557-607 ``findCluster``): within each
angular bin ("spike"), walk the points in ascending range; consecutive points
whose radial gaps are all <= ``cluster_gap`` form a run; the FIRST run with at
least ``min_pts`` points becomes the voxel's cluster, and the radial bounds
are ``[r_first - buff, r_last + buff]``.  Spikes with no qualifying run are
flagged empty (zero bounds, icet.cpp:243-251).

The reference does this with a per-spike scalar walk over ragged index lists
(1800 walks per scan).  The TPU-native form below is fully dense: one
lexicographic sort of all points by (voxel id, range), then run detection as
segmented prefix scans (cummax / reversed cummin) — no ragged shapes, no
data-dependent loops, one fused XLA program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ClusterResult(NamedTuple):
    #: (V+1, 2) inner/outer radial bounds per voxel (0 where no cluster;
    #: sentinel row V is always 0)
    bounds: jax.Array
    #: (V+1,) bool, True where a qualifying cluster was found
    found: jax.Array


_BIG = jnp.iinfo(jnp.int32).max


def _qualifying_runs(vid_s, r_s, pt_ok, n_voxels, min_pts, gap):
    """Run detection on the sorted (vid, r) stream.

    Returns (q_start, q_end): boolean marks at the first/last element of
    every run with >= min_pts elements whose start passes ``pt_ok``.  A run
    starts at a spike change or a radial gap; a run of >= min_pts elements
    has no break at i+1 .. i+min_pts-1 after its start (resp. before its
    end) — both windowed ORs come from ONE cumsum of the break marks
    (positions outside the array count as breaks, handled by padding the
    cumsum with its edge growth).
    """
    na = vid_s.shape[0]
    prev_vid = jnp.concatenate([jnp.full((1,), -1, jnp.int32), vid_s[:-1]])
    prev_r = jnp.concatenate([jnp.zeros((1,), r_s.dtype), r_s[:-1]])
    brk = (vid_s != prev_vid) | ((r_s - prev_r) > gap)

    w = min_pts - 1
    if w > 0:
        c = jnp.cumsum(brk.astype(jnp.int32))  # c[i] = # breaks at 0..i
        # breaks in (i, i+w]: pad the tail as all-break.
        c_fwd = jnp.concatenate(
            [c[w:], c[-1] + jnp.arange(1, w + 1, dtype=jnp.int32)]
        )
        fwd_broken = (c_fwd - c) > 0
        # breaks in (i-w, i]: c[i] - c[i-w] counts brk at i-w+1 .. i.
        c_bwd = jnp.concatenate(
            [-jnp.arange(w, 0, -1, dtype=jnp.int32), c[:-w]]
        )
        bwd_broken = (c - c_bwd) > 0
    else:
        fwd_broken = bwd_broken = jnp.zeros((na,), bool)

    is_end = jnp.concatenate([brk[1:], jnp.ones((1,), bool)])
    q_start = brk & pt_ok & ~fwd_broken
    q_end = is_end & pt_ok & ~bwd_broken
    return q_start, q_end


def radial_cluster_bounds(
    vid: jax.Array,
    r: jax.Array,
    valid: jax.Array,
    n_voxels: int,
    min_pts: int,
    gap: float,
    buffer: float,
    counts: jax.Array | None = None,
) -> ClusterResult:
    """Compute per-voxel radial cluster bounds.

    Args:
      vid: (N,) int32 voxel ids; invalid/padded points must carry the sentinel
        id ``n_voxels`` (or have ``valid`` False).
      r: (N,) ranges.
      valid: (N,) bool point validity.
      n_voxels: V.
      min_pts: minimum run length (reference n=25).
      gap: max in-run neighbour gap (reference thresh).
      buffer: radial padding applied to the bounds (reference buff).
      counts: optional (V+1,) int32 EXACT per-id point counts (sentinel row
        last) matching the (vid, valid) masking — e.g. from
        ``ops.windowed_moments.windowed_vid_counts`` gated on overflow == 0.
        When given, per-voxel answers are read at the cumsum(counts)-1 rows
        directly, skipping the probe augmentation and the extraction sort.

    Returns:
      ClusterResult with dense (V+1,) tables.
    """
    n = r.shape[0]
    v1 = n_voxels + 1
    vid = jnp.where(valid, vid, n_voxels).astype(jnp.int32)

    if counts is not None and v1 * (n + 1) < 2**31:
        vid_s, r_s = jax.lax.sort((vid, r), num_keys=2)
        idx = jnp.arange(n, dtype=jnp.int32)
        q_start, q_end = _qualifying_runs(
            vid_s, r_s, vid_s < n_voxels, n_voxels, min_pts, gap
        )
        base = vid_s * (n + 1)
        fwd_s = jax.lax.cummax(base + jnp.where(q_start, n - idx, 0))
        fwd_e = jax.lax.cummax(base + jnp.where(q_end, n - idx, 0))
        seg_end = jnp.cumsum(counts).astype(jnp.int32) - 1  # (V+1,)
        tbl_s = fwd_s[jnp.clip(seg_end, 0, n - 1)]
        tbl_e = fwd_e[jnp.clip(seg_end, 0, n - 1)]
        # Empty segments read an earlier segment's row; the owner check
        # rejects them (every row contributes at least its segment base).
        owner = tbl_s // (n + 1)
        code_s = tbl_s % (n + 1)
        code_e = tbl_e % (n + 1)
        found = (owner == jnp.arange(v1, dtype=jnp.int32)) & (code_s > 0)
        first_start = jnp.where(found, n - code_s, 0)
        first_end = jnp.where(found, n - code_e, 0)
        return _bounds_from_selection(
            r_s, first_start, first_end, found, buffer
        )

    # PROBE rows: one per voxel id (sentinel included) with r = +inf, so
    # after the lexicographic sort each probe sits at the END of its voxel
    # segment.  Per-voxel answers are then read from the probe rows with one
    # small extraction sort — no binary search anywhere (searchsorted's
    # 17 serialized gather rounds cost ~230 us on the chip, more than the
    # whole sort).
    # The probe flag rides the low bit of the sort key (vid*2 + is_probe):
    # probes sort after every real point of their segment and before the
    # next segment, and the sort carries one less operand.
    probe_vid = jnp.arange(v1, dtype=jnp.int32)
    vid2_a = jnp.concatenate([vid * 2, probe_vid * 2 + 1])
    r_a = jnp.concatenate([r, jnp.full((v1,), jnp.inf, r.dtype)])
    vid2_s, r_s = jax.lax.sort((vid2_a, r_a), num_keys=2)
    vid_s = vid2_s >> 1
    probe_s = vid2_s & 1
    na = n + v1

    idx = jnp.arange(na, dtype=jnp.int32)
    # Probe rows always break (inf gap), so runs can never span a probe;
    # inf - inf = NaN > gap is False for adjacent probes of empty segments,
    # but their vid differs.
    real = probe_s == 0
    pt_ok = (vid_s < n_voxels) & real
    q_start, q_end = _qualifying_runs(
        vid_s, r_s, pt_ok, n_voxels, min_pts, gap
    )

    # First qualifying run per voxel = min index of a qualifying start; its
    # end = min index of a qualifying end (runs are disjoint and ordered, so
    # the first qualifying end belongs to the first qualifying run).  Pack
    # (voxel id, na - idx) so a FORWARD cummax read at the probe row yields
    # the per-segment min: every row contributes at least its segment base
    # vid*(na+1), so earlier segments can never win the max, and the probe's
    # own contribution (code 0) guarantees the read is in-segment.
    if v1 * (na + 1) < 2**31:
        base = vid_s * (na + 1)
        fwd_s = jax.lax.cummax(base + jnp.where(q_start, na - idx, 0))
        fwd_e = jax.lax.cummax(base + jnp.where(q_end, na - idx, 0))
        # Extraction sort: probe rows (unique vids) to the front, in order.
        key_x = jnp.where(real, jnp.int32(na), vid_s)
        _, t_s, t_e = jax.lax.sort((key_x, fwd_s, fwd_e), num_keys=1)
        code_s = t_s[:v1] % (na + 1)
        code_e = t_e[:v1] % (na + 1)
        found = code_s > 0
        first_start = jnp.where(found, na - code_s, 0)
        first_end = jnp.where(found, na - code_e, 0)
    else:
        cand_s = jnp.where(q_start, idx, _BIG)
        cand_e = jnp.where(q_end, idx, _BIG)
        first_start = jax.ops.segment_min(
            cand_s, vid_s, num_segments=v1, indices_are_sorted=True
        )
        first_end = jax.ops.segment_min(
            cand_e, vid_s, num_segments=v1, indices_are_sorted=True
        )
        found = first_start < _BIG
        first_start = jnp.where(found, first_start, 0)
        first_end = jnp.where(found, first_end, 0)

    return _bounds_from_selection(r_s, first_start, first_end, found, buffer)


def _bounds_from_selection(r_s, first_start, first_end, found, buffer):
    r_inner = jnp.maximum(r_s[first_start] - buffer, 0.0)
    r_outer = r_s[first_end] + buffer
    bounds = jnp.stack(
        [jnp.where(found, r_inner, 0.0), jnp.where(found, r_outer, 0.0)], axis=-1
    )
    return ClusterResult(bounds=bounds, found=found)


def distributed_radial_cluster_bounds(
    vid: jax.Array,
    r: jax.Array,
    valid: jax.Array,
    n_voxels: int,
    min_pts: int,
    gap: float,
    buffer: float,
    axis_name: str,
    capacity_factor: float = 2.0,
) -> ClusterResult:
    """Exact radial clustering with the points SHARDED over ``axis_name``.

    Replaces the prepare-stage full-cloud all-gather + replicated sort
    (the sp-axis scaling ceiling: the one O(N log N) stage; reference analog
    is the parallel radial sorts, src/icet.cpp:72-83): each device routes its
    local (vid, r) pairs to the device that OWNS that voxel-id range with one
    ``all_to_all``, runs the standard sort + segmented run detection on its
    ~N/S received points, and one small all-gather of the (V, 2) bounds table
    replicates the result — per-device work O(N/S log N/S), traffic O(N/S)
    per device instead of O(N).

    Bucket capacity is ``capacity_factor * N_local / S`` per destination; if
    any bucket overflows (pathologically skewed clouds), a replicated
    fallback path — gathering only (vid, r), not xyz — recomputes exactly,
    selected by ``lax.cond`` on a psum'd overflow count, so results are
    ALWAYS bit-identical to :func:`radial_cluster_bounds` on the gathered
    cloud.
    """
    S = jax.lax.axis_size(axis_name)
    n_local = r.shape[0]
    vps = -(-n_voxels // S)  # voxels per shard (ceil)
    cap = -(-int(capacity_factor * n_local) // S)  # bucket capacity (ceil)

    vid = jnp.where(valid, vid, n_voxels).astype(jnp.int32)

    # Destination shard per point; invalid points go to a virtual bucket S
    # (never sent) so they cannot consume real capacity.
    dst = jnp.minimum(vid // vps, S - 1)
    key = jnp.where(valid & (vid < n_voxels), dst, S).astype(jnp.int32)
    order = jnp.argsort(key)
    key_s = key[order]
    vid_s = vid[order]
    r_s = r[order]

    counts = jax.ops.segment_sum(
        jnp.ones_like(key_s, jnp.int32), key_s, num_segments=S + 1,
        indices_are_sorted=True,
    )
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )[:S]
    within = jnp.arange(cap, dtype=jnp.int32)[None, :]
    take = jnp.clip(offsets[:, None] + within, 0, n_local - 1)
    slot_ok = within < counts[:S, None]
    send_vid = jnp.where(slot_ok, vid_s[take], n_voxels)
    send_r = jnp.where(slot_ok, r_s[take], 0.0)
    overflow = jnp.sum(jnp.maximum(counts[:S] - cap, 0))
    any_overflow = jax.lax.psum(overflow, axis_name) > 0

    def sharded_path(_):
        recv_vid = jax.lax.all_to_all(
            send_vid, axis_name, split_axis=0, concat_axis=0
        ).reshape(-1)
        recv_r = jax.lax.all_to_all(
            send_r, axis_name, split_axis=0, concat_axis=0
        ).reshape(-1)
        lo = jax.lax.axis_index(axis_name) * vps
        in_range = (recv_vid >= lo) & (recv_vid < lo + vps)
        vloc = jnp.where(in_range, recv_vid - lo, vps).astype(jnp.int32)
        cr = radial_cluster_bounds(
            vloc, recv_r, in_range, vps, min_pts, gap, buffer
        )
        bounds_all = jax.lax.all_gather(
            cr.bounds[:vps], axis_name, axis=0, tiled=True
        )
        found_all = jax.lax.all_gather(
            cr.found[:vps], axis_name, axis=0, tiled=True
        )
        zero_row = jnp.zeros((1, 2), bounds_all.dtype)
        return ClusterResult(
            bounds=jnp.concatenate([bounds_all[:n_voxels], zero_row]),
            found=jnp.concatenate(
                [found_all[:n_voxels], jnp.zeros((1,), bool)]
            ),
        )

    def replicated_path(_):
        vid_full = jax.lax.all_gather(vid, axis_name, axis=0, tiled=True)
        r_full = jax.lax.all_gather(r, axis_name, axis=0, tiled=True)
        return radial_cluster_bounds(
            vid_full, r_full, vid_full < n_voxels, n_voxels, min_pts, gap,
            buffer,
        )

    return jax.lax.cond(any_overflow, replicated_path, sharded_path, None)


def membership(
    vid: jax.Array, r: jax.Array, valid: jax.Array, bounds: jax.Array, n_voxels: int
) -> jax.Array:
    """Point-in-cluster mask (reference filterPointsInsideCluster,
    src/icet.cpp:609-652): a point belongs to its angular bin's voxel iff its
    range lies within that voxel's radial bounds.

    ``bounds`` must be the (V+1, 2) table from :func:`radial_cluster_bounds`
    (sentinel row zero, so out-of-band points are never members).
    """
    vid = jnp.where(valid, vid, n_voxels)
    b = bounds[vid]
    return valid & (vid < n_voxels) & (r >= b[..., 0]) & (r <= b[..., 1])
