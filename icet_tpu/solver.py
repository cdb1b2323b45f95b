"""The ICET registration solver — one jitted XLA program per registration.

Pipeline (reference call stack: ICET::ICET -> fitScan1 -> prepScan2 ->
runlen x fitScan2, src/icet.cpp:29-63; Python ICET.main_2,
python/ICET_spherical.py:89-487):

1. :func:`prepare_reference` voxelises scan 1 once: spherical binning,
   per-spike radial clustering, exact full-point Gaussian moments, batched
   3x3 eigendecomposition, and the extended-surface (sigma endpoint) test
   producing the per-voxel eigenbasis ``U`` and axis-suppression mask ``l``.
2. :func:`register` runs ``n_iters`` Gauss-Newton iterations as a
   ``lax.scan``: transform scan 2, rebin (sort-free), accumulate moments,
   assemble the weighted normal equations with per-voxel noise weighting and
   axis suppression, globally prune ill-conditioned solution components, and
   update the 6-DOF state.

Everything is dense ``[V]``-shaped with masks; there is no data-dependent
control flow, so the whole solve compiles to a single device program — this
is the <= 1 ms/scan path.

Semantics notes (documented deviations from the reference):

* Projection basis: we use ``P = diag(l) U^T`` (coordinates in the voxel's
  eigenbasis, then mask extended axes) as the Python reference does
  (ICET_spherical.py:434-441).  The C++ reference applies the transpose
  basis (icet.cpp:317-329: its ``U`` member holds eigenvectors-as-rows and it
  then uses ``U.transpose()``), which rotates INTO the eigenbasis incorrectly;
  the Python form is the mathematically meaningful one.
* Noise weighting divides by the per-voxel CLUSTER point counts
  (ICET_spherical.py:431-432); the C++ divides by the whole angular-bin
  counts (icet.cpp:315), which under-weights voxels whose spike contains
  outliers outside the cluster.
* pred_stds inflation for globally pruned axes adds ``|U2 row|`` rather than
  the raw signed row the C++ adds (icet.cpp:479, acknowledged hack).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from icet_tpu.config import ICETConfig
from icet_tpu.ops.clustering import membership, radial_cluster_bounds
from icet_tpu.ops.geometry import cart_to_spherical, transform_points
from icet_tpu.ops.grid import voxel_anchors, voxel_ids
from icet_tpu.ops.linalg import eigh_small, eigh_small_warm_safe
from icet_tpu.ops.moments import voxel_moments

_HI = jax.lax.Precision.HIGHEST

#: Max out-of-window points the windowed-moments spill path absorbs before
#: an iteration falls back to the full segsum pass (see _fused_sums; the
#: bench keyframe regime's worst frame spills ~4.3k of 65k points).
_SPILL_CAPACITY = 8192


def _mm(a, b):
    """f32-precision matmul (TPU defaults to bf16 MXU passes otherwise)."""
    return jnp.matmul(a, b, precision=_HI)


class VoxelModel(NamedTuple):
    """Dense per-voxel reference model fitted to scan 1 (all tables V+1)."""

    bounds: jax.Array  # (V+1, 2) radial cluster bounds
    anchors: jax.Array  # (V+1, 3) cartesian anchors
    count: jax.Array  # (V+1,)
    mean: jax.Array  # (V+1, 3)
    cov: jax.Array  # (V+1, 3, 3)
    basis: jax.Array  # (V+1, 3, 3) eigenvectors as COLUMNS (ascending eigval)
    lmask: jax.Array  # (V+1, 3) per-eigenaxis keep mask (0 = extended axis)
    valid: jax.Array  # (V+1,) voxel participates in the solve


class IterationDiag(NamedTuple):
    """Per-iteration diagnostics (stacked over iterations by lax.scan)."""

    n_corr: jax.Array
    condition: jax.Array
    dx_norm: jax.Array
    n_dropped_axes: jax.Array
    n_rejected_moving: jax.Array
    #: windowed-moments off-window point count (0 on non-fused paths).
    #: A small nonzero count (<= the kernel's spill capacity, 8192) means
    #: those points were absorbed exactly by the cheap spill path
    #: (keyframe-baseline parallax lives here); a count ABOVE the capacity
    #: means the iteration fell back to the ~2x-cost full segsum pass
    #: (unordered/azimuth-major input) — the production observability
    #: hook for that slowdown.
    windowed_overflow: jax.Array


class RegistrationResult(NamedTuple):
    X: jax.Array  # (6,) solved state [t_xyz, phi, theta, psi]
    pred_stds: jax.Array  # (6,) predicted per-component solution std
    Q: jax.Array  # (6, 6) predicted solution error covariance
    diagnostics: IterationDiag
    static_mask: jax.Array  # (N2,) scan-2 points in non-moving, used voxels


# ---------------------------------------------------------------------------
# Scan-1 preparation
# ---------------------------------------------------------------------------


def _sigma_axis_mask(model_mean, eigvals, basis, bounds, valid, cfg: ICETConfig):
    """Extended-surface suppression via sigma endpoint test.

    Places endpoints ``mu +- s * sqrt(lam_k) u_k`` for each principal axis and
    keeps the axis iff at least one endpoint falls inside the voxel frustum
    (reference icet.cpp:186-233 / ICET_spherical.py:522-585: an axis is pruned
    only when BOTH endpoints leave the cell).  Pure arithmetic on the bounds —
    no point search.
    """
    scale = cfg.sigma_scale
    sq = jnp.sqrt(jnp.maximum(eigvals, 0.0))  # (V+1, 3)
    # offsets[v, :, k] = s * sqrt(lam_k) * u_k
    offsets = scale * sq[:, None, :] * basis  # (V+1, 3, 3)
    endpoints = jnp.stack(
        [model_mean[:, :, None] + offsets, model_mean[:, :, None] - offsets], axis=0
    )  # (2, V+1, 3(coord), 3(axis))
    ep = jnp.moveaxis(endpoints, 2, 3)  # (2, V+1, 3(axis), 3(coord))
    rtp = cart_to_spherical(ep)
    ep_vid = voxel_ids(rtp, cfg)  # (2, V+1, 3)
    own_vid = jnp.arange(model_mean.shape[0], dtype=jnp.int32)[None, :, None]
    b = bounds[None, :, None, :]
    inside = (
        (ep_vid == own_vid)
        & (rtp[..., 0] >= b[..., 0])
        & (rtp[..., 0] <= b[..., 1])
    )
    keep = inside[0] | inside[1]  # (V+1, 3) either endpoint inside
    return jnp.where(valid[:, None], keep.astype(model_mean.dtype), 0.0)


def _clip_fill_mask(model_mean, eigvals, basis, bounds, valid, cfg: ICETConfig):
    """Clip-fill suppression guard (capability beyond the reference; see
    ``ICETConfig.clip_fill``).

    Axis k is pruned when the points' ``+-sigma_scale * sqrt(lam_k)``
    excursion spans more than ``clip_fill x`` the voxel cell's extent along
    that axis — i.e. the distribution is CLIPPED by the cell (a grid
    artifact whose mean pins the solution to the grid) rather than ending
    naturally inside it.  Unlike the endpoint test this is measured against
    the ideal centered cell (L1 box bound in the local spherical frame at
    the mean), so it cannot be defeated by wide radial run bounds or by
    eigenvectors obliquely crossing the frustum: a uniform cell-filling
    distribution scores ``2 * s / (f * sqrt(12)) ~ 1.15/f`` and is pruned at
    any ``f < 1.15``, while a 3D-compact feature scores well under 0.4.

    The failure mode this closes (measured, tests/test_montecarlo.py): at
    grazing incidence the along-surface axis is near-radial and its cluster
    bounds ARE the surface's own extent, so both endpoint variants keep it;
    a corridor scene then solves the unobservable along-track axis to
    "0 +- 4 mm" while truly off by the full motion.
    """
    r = jnp.linalg.norm(model_mean, axis=-1)
    safe_r = jnp.maximum(r, 1e-6)
    rhat = model_mean / safe_r[:, None]
    sin_phi = jnp.sqrt(
        jnp.maximum(model_mean[:, 0] ** 2 + model_mean[:, 1] ** 2, 1e-12)
    ) / safe_r
    # Local spherical frame at the mean: r_hat, theta_hat (azimuth),
    # phi_hat (polar) — cart_to_spherical's (r, theta, phi) convention.
    cos_th = model_mean[:, 0] / jnp.maximum(sin_phi * safe_r, 1e-9)
    sin_th = model_mean[:, 1] / jnp.maximum(sin_phi * safe_r, 1e-9)
    that = jnp.stack([-sin_th, cos_th, jnp.zeros_like(sin_th)], axis=-1)
    phat = jnp.cross(that, rhat)  # unit: both unit + orthogonal

    d_theta = 2.0 * math.pi / cfg.n_theta
    d_phi = (cfg.phi_max - cfg.phi_min) / cfg.n_phi
    w_r = bounds[:, 1] - bounds[:, 0]
    w_t = r * sin_phi * d_theta
    w_p = r * d_phi

    # extent[v, k] = cell extent along eigen axis k (L1 box bound).
    proj = lambda n: jnp.abs(jnp.einsum("vi,vik->vk", n, basis))
    extent = (
        proj(rhat) * w_r[:, None]
        + proj(that) * w_t[:, None]
        + proj(phat) * w_p[:, None]
    )
    span = cfg.sigma_scale * jnp.sqrt(jnp.maximum(eigvals, 0.0))
    keep = span <= 0.5 * cfg.clip_fill * extent
    return jnp.where(valid[:, None], keep.astype(model_mean.dtype), 0.0)


def _ndt_axis_mask(eigvals, basis, bounds, valid, cfg: ICETConfig):
    """Legacy NDT-style suppression: per-axis eigenvalue threshold.

    Reference ``get_U_and_L(method=0)`` with its final "NDT override"
    thresholds (ICET_spherical.py:682-716): axis k of a voxel is pruned when
    ANY Cartesian component of ``|U[:, k]| * lambda_k`` exceeds the voxel's
    radial width squared (there: ``diff(unique(grid_r))[shell]**2``, the
    fixed-shell width; here: ``bounds[:, 1] - bounds[:, 0]``, identical on
    the fixed grid and the per-voxel analog on adaptive cluster bounds).
    Unlike the endpoint test this never looks at the mean's position in the
    frustum — a big surface crossing the voxel center survives if its
    variance is small enough.
    """
    width = bounds[:, 1] - bounds[:, 0]  # (V+1,)
    thr = width * width
    # rotated[v, i, k] = |U[v, i, k]| * lambda_k  (reference |U @ diag(lam)|)
    rotated = jnp.abs(basis) * jnp.maximum(eigvals, 0.0)[:, None, :]
    extended = jnp.any(rotated > thr[:, None, None], axis=1)  # (V+1, 3)
    keep = ~extended
    return jnp.where(valid[:, None], keep.astype(eigvals.dtype), 0.0)


def prepare_reference(
    scan1: jax.Array, cfg: ICETConfig, axis_name: str | None = None
) -> VoxelModel:
    """Fit the dense voxel model to the keyframe scan (reference fitScan1,
    src/icet.cpp:68-252).

    Under shard_map with ``axis_name``, ``scan1`` is the LOCAL point shard:
    radial clustering runs DISTRIBUTED — one all_to_all routes (vid, r)
    pairs to the device owning each voxel-id range, each device sorts and
    run-detects its ~N/S points, and the small (V, 2) bounds table is
    all-gathered (ops/clustering.distributed_radial_cluster_bounds; exact,
    with a replicated fallback on bucket overflow).  Moment accumulation
    stays sharded and is reduced with one psum.
    """
    if cfg.radial_mode == "fixed":
        # NDT-style regular grid: bounds are the geometric shell edges; no
        # data-dependent clustering pass (reference grid_spherical,
        # ICET_spherical.py:1206-1234).
        from icet_tpu.ops.clustering import ClusterResult
        from icet_tpu.ops.grid import fixed_shell_bounds

        clusters = ClusterResult(
            bounds=fixed_shell_bounds(cfg),
            found=jnp.concatenate(
                [jnp.ones((cfg.n_voxels,), bool), jnp.zeros((1,), bool)]
            ),
        )
    elif axis_name is not None:
        from icet_tpu.ops.clustering import distributed_radial_cluster_bounds

        rtp_loc = cart_to_spherical(scan1)
        r_loc = rtp_loc[..., 0]
        clusters = distributed_radial_cluster_bounds(
            voxel_ids(rtp_loc, cfg),
            r_loc,
            r_loc >= cfg.min_range,
            cfg.n_voxels,
            cfg.min_pts,
            cfg.cluster_gap,
            cfg.cluster_buffer,
            axis_name,
        )
    else:
        rtp_full = cart_to_spherical(scan1)
        r_full = rtp_full[..., 0]
        vid_full = voxel_ids(rtp_full, cfg)
        valid_full = r_full >= cfg.min_range

        def _cluster(counts):
            return radial_cluster_bounds(
                vid_full,
                r_full,
                valid_full,
                cfg.n_voxels,
                cfg.min_pts,
                cfg.cluster_gap,
                cfg.cluster_buffer,
                counts=counts,
            )

        if _moment_method(cfg) == "fused":
            # Beam-major scans: exact per-voxel counts from the windowed
            # one-hot (~15 us) replace the probe rows + extraction sort in
            # the clustering readback (~100 us); overflow falls back to the
            # order-independent probe path, bit-identically.
            from icet_tpu.ops.windowed_moments import windowed_vid_counts

            counts, ovf = windowed_vid_counts(vid_full, valid_full, cfg)
            clusters = jax.lax.cond(
                ovf == 0,
                lambda: _cluster(counts),
                lambda: _cluster(None),
            )
        else:
            clusters = _cluster(None)
    anchors = voxel_anchors(clusters.bounds, cfg)

    method = _moment_method(cfg)
    if method == "fused":
        from icet_tpu.ops.moments import (
            VoxelMoments,
            cov6_to_matrix,
            finalize_moments_planes,
        )

        sums, _prep_ovf = _fused_sums(
            scan1, jnp.zeros(6, scan1.dtype), clusters.bounds, anchors, cfg
        )
        if axis_name is not None:
            sums = jax.lax.psum(sums, axis_name)
        count, mean, cov6 = finalize_moments_planes(sums, anchors)
        moments = VoxelMoments(
            count=count, mean=mean, cov=cov6_to_matrix(cov6)
        )
    else:
        cov6 = None
        rtp = cart_to_spherical(scan1)
        r = rtp[..., 0]
        valid_pt = r >= cfg.min_range
        vid = voxel_ids(rtp, cfg)
        member = membership(vid, r, valid_pt, clusters.bounds, cfg.n_voxels)
        moments = voxel_moments(
            scan1,
            vid,
            member,
            anchors,
            cfg.n_voxels,
            method=method,
            block=cfg.moment_block,
            axis_name=axis_name,
        )

    valid = (
        clusters.found
        & (moments.count >= cfg.min_pts)
        & (clusters.bounds[:, 1] > cfg.min_outer_range)
    )

    from icet_tpu.ops.wls_planes import eigh3_planes

    eigvals, basis = eigh3_planes(cov6 if cov6 is not None else moments.cov)
    if cfg.suppression == "ndt":
        lmask = _ndt_axis_mask(eigvals, basis, clusters.bounds, valid, cfg)
    else:
        lmask = _sigma_axis_mask(
            moments.mean, eigvals, basis, clusters.bounds, valid, cfg
        )
    if cfg.clip_fill > 0.0:
        lmask = lmask * _clip_fill_mask(
            moments.mean, eigvals, basis, clusters.bounds, valid, cfg
        )

    return VoxelModel(
        bounds=clusters.bounds,
        anchors=anchors,
        count=moments.count,
        mean=moments.mean,
        cov=moments.cov,
        basis=basis,
        lmask=lmask,
        valid=valid,
    )


def _jnp_sums(pts, X, bounds, anchors, cfg: ICETConfig):
    """Order-independent accumulation (transform + rebin + segsum).

    Range-gates on the RAW cloud (see windowed_moments: the reference strips
    r < min_range points once before solving, so transformed-r re-gating
    would resurrect r=0 dropout points at |t| > min_range)."""
    from icet_tpu.ops.moments import voxel_moment_sums

    raw_ok = jnp.linalg.norm(pts, axis=-1) >= cfg.min_range
    p2 = transform_points(pts, X)
    rtp = cart_to_spherical(p2)
    r = rtp[..., 0]
    vid = voxel_ids(rtp, cfg)
    member = membership(vid, r, raw_ok, bounds, cfg.n_voxels)
    return voxel_moment_sums(
        p2, vid, member, anchors, cfg.n_voxels, method="segsum"
    )


def _fused_sums(pts, X, bounds, anchors, cfg: ICETConfig):
    """Windowed fast path (exploits lidar beam-major scan order — each point
    block hits a narrow contiguous voxel band; ops/windowed_moments.py) with
    a lax.cond fallback to the order-independent segsum path when any
    block's points overflow the window (shuffled/azimuth-major inputs stay
    correct, just slower — see datasets.loaders.to_beam_major).

    Returns ``(sums, off_window_count)`` — the count surfaces in
    IterationDiag.windowed_overflow so work outside the windowed fast
    path is observable in production metrics.  Points that miss the
    window are first absorbed exactly by the kernel's bounded spill path
    (cheap; keyframe-baseline parallax lives here); only a spill-capacity
    overrun triggers the full 2x segsum fallback."""
    from icet_tpu.ops.windowed_moments import (
        windowed_moment_sums,
        windowed_spill_sums,
    )

    if cfg.radial_mode == "fixed":
        # Radial shells scatter a block's ids across the whole table; the
        # windowed trick only pays off for adaptive (angular-only) voxels.
        return _jnp_sums(pts, X, bounds, anchors, cfg), jnp.int32(0)

    sums_w, ovf = windowed_moment_sums(pts, X, bounds, anchors, cfg)

    # NESTED conditional, deliberately: this sits in the GN while-loop
    # body, where each XLA conditional costs a scheduling sync (~0.7 ms/
    # frame on the early-exit headline) even when its branch never runs.
    # Overflow-free frames therefore evaluate exactly ONE predicate; only
    # dirty frames (keyframe-baseline parallax, unordered clouds) descend
    # into the inner spill-vs-fallback choice.
    def _dirty():
        return jax.lax.cond(
            ovf <= _SPILL_CAPACITY,
            lambda: sums_w + windowed_spill_sums(
                pts, X, bounds, anchors, cfg,
                spill_capacity=_SPILL_CAPACITY,
            ),
            lambda: _jnp_sums(pts, X, bounds, anchors, cfg),
        )

    sums = jax.lax.cond(ovf == 0, lambda: sums_w, _dirty)
    return sums, ovf


def _moment_method(cfg: ICETConfig) -> str:
    if cfg.moment_method == "auto":
        # On TPU "fused" is the windowed XLA path (ops/windowed_moments.py):
        # transform + rebin + accumulate with per-block voxel-id windows.
        # (A true Pallas kernel, ops/pallas_fused.py, is kept for when Mosaic
        # fixes its dynamic-offset bugs but is NOT reachable from here.)
        # Elsewhere (CPU CI) the XLA scatter-add path wins.
        return "fused" if jax.default_backend() == "tpu" else "segsum"
    return cfg.moment_method


# ---------------------------------------------------------------------------
# Per-iteration Gauss-Newton update
# ---------------------------------------------------------------------------


def _pack_model_planes(model: VoxelModel) -> jax.Array:
    """Pack every per-voxel table the GN iteration's post-stage reads into
    ONE (24, V+1) f32 buffer (planes on sublanes, V on lanes).

    The round-3 chip trace showed the while-loop body dominated by async
    ``copy-start`` DMAs shuttling ~15 separate (V+1,) model tables between
    memory spaces every iteration — each a latency-bound transfer.  Packed,
    the body's loop-invariant model inputs become a single ~170 KB table
    (24 rows = 3 whole (8, 128) sublane tiles): one DMA whose transfer time
    is negligible next to the per-buffer latency it amortises.  Row slices
    of the buffer are static slices, which XLA fuses into consumers inside
    the loop body rather than hoisting into separate buffers.

    Row layout: 0 valid, 1 count, 2-4 mean, 5-10 cov6 [xx yy zz xy xz yz],
    11-19 basis row-major, 20-22 lmask, 23 model covariance yaw
    (``_covariance_yaw(model.cov)``, loop-invariant — hoisted here so the
    moving-object filter never touches the (V, 3, 3) AoS covariance inside
    the loop)."""
    # Always pack in f32 regardless of the scan dtype: counts above 2048
    # would silently round in f16/bf16 means, corrupting the 1/(n-1) noise
    # weights (ADVICE r3).  f32 holds exact integers to 2^24.
    dt = jnp.promote_types(model.mean.dtype, jnp.float32)
    cov = model.cov
    c6 = [cov[:, 0, 0], cov[:, 1, 1], cov[:, 2, 2],
          cov[:, 0, 1], cov[:, 0, 2], cov[:, 1, 2]]
    rows = (
        [model.valid.astype(dt), model.count.astype(dt)]
        + [model.mean[:, j] for j in range(3)]
        + c6
        + [model.basis[:, i, j] for i in range(3) for j in range(3)]
        + [model.lmask[:, i] for i in range(3)]
        + [jnp.arctan2(-c6[3], c6[0])]
    )
    return jnp.stack(rows, axis=0)


def _unpack_model_planes(packed: jax.Array):
    """Inverse views of :func:`_pack_model_planes` rows (all fused slices):
    (valid bool, count, mean planes, cov 3x3 plane list, basis plane list
    ``B[i][j] = basis[:, i, j]``, lmask planes, model yaw plane)."""
    p = packed
    valid = p[0] > 0.5
    count = p[1]
    mean = [p[2], p[3], p[4]]
    cov = [[p[5], p[8], p[9]], [p[8], p[6], p[10]], [p[9], p[10], p[7]]]
    basis = [[p[11 + 3 * i + j] for j in range(3)] for i in range(3)]
    lmask = [p[20 + i] for i in range(3)]
    return valid, count, mean, cov, basis, lmask, p[23]


def _covariance_yaw(cov: jax.Array) -> jax.Array:
    """Reference moving-object heuristic: treat the covariance's first row as
    a direction and take its yaw, ``atan2(-cov[0,1], cov[0,0])``
    (ICET_spherical.py:254-272 via utils.R2Euler's psi component).

    Accepts (V, 3, 3) matrices or (V, 6) packed [xx, yy, zz, xy, xz, yz]
    planes (moments.finalize_moments_planes)."""
    if cov.ndim == 2:
        return jnp.arctan2(-cov[:, 3], cov[:, 0])
    return jnp.arctan2(-cov[..., 0, 1], cov[..., 0, 0])


def _iteration(
    model: VoxelModel,
    scan2: jax.Array,
    X,
    it,
    cfg: ICETConfig,
    axis_name: str | None = None,
    corr_mask: jax.Array | None = None,
    U2_warm: jax.Array | None = None,
    packed: jax.Array | None = None,
    want_range_sens: bool = False,
):
    method = _moment_method(cfg)
    if method == "fused":
        # Windowed XLA sweep: transform + rebin + anchored accumulation
        # (ops/windowed_moments.py), finalized in plane form — the scan-2
        # covariance stays packed (V+1, 6) and never takes the 3/128-lane
        # (V, 3, 3) AoS layout inside the GN loop.
        from icet_tpu.ops.moments import finalize_moments_planes

        sums, win_ovf = _fused_sums(scan2, X, model.bounds, model.anchors, cfg)
        if axis_name is not None:
            sums = jax.lax.psum(sums, axis_name)
            win_ovf = jax.lax.psum(win_ovf, axis_name)
        count2, mean2, cov2 = finalize_moments_planes(sums, model.anchors)
    else:
        valid_pt2 = jnp.linalg.norm(scan2, axis=-1) >= cfg.min_range
        p2 = transform_points(scan2, X)
        rtp2 = cart_to_spherical(p2)
        r2 = rtp2[..., 0]
        vid2 = voxel_ids(rtp2, cfg)
        member2 = membership(vid2, r2, valid_pt2, model.bounds, cfg.n_voxels)
        m2 = voxel_moments(
            p2,
            vid2,
            member2,
            model.anchors,
            cfg.n_voxels,
            method=method,
            block=cfg.moment_block,
            axis_name=axis_name,
        )
        count2, mean2, cov2 = m2.count, m2.mean, m2.cov
        win_ovf = jnp.int32(0)

    if packed is not None:
        # All post-stage model tables read from ONE packed buffer — a single
        # loop-body DMA instead of ~15 (see _pack_model_planes).
        valid1, count1, mean1, cov1, basis1, lmask1, yaw1 = (
            _unpack_model_planes(packed)
        )
    else:
        valid1, count1, mean1 = model.valid, model.count, model.mean
        cov1, basis1, lmask1 = model.cov, model.basis, model.lmask
        yaw1 = _covariance_yaw(model.cov)

    corr = valid1 & (count2 >= cfg.min_pts)
    if corr_mask is not None:
        # External per-voxel rejection (e.g. the DNN perspective-shift
        # filter, reference ICET_spherical.py:380-383).
        corr = corr & corr_mask

    # P = diag(l) U^T: compact (eigenbasis, extended-axis-masked) projector.
    # Per-voxel math runs in plane (SoA) layout — (V, 3, 3) tensors carry
    # 3/128-lane occupancy on TPU (ops/wls_planes.py).
    from icet_tpu.ops.wls_planes import (
        assemble_normal_equations,
        residual_compact_planes,
    )

    res_compact = residual_compact_planes(basis1, lmask1, mean1, mean2)

    # Moving-object rejection (reference ICET_spherical.py:175-285).
    n_rejected = jnp.zeros((), jnp.int32)
    if cfg.remove_moving:
        bad_res = jnp.any(
            jnp.abs(res_compact) > cfg.rm_residual_thresh, axis=-1
        )
        yaw_delta = jnp.abs(yaw1 - _covariance_yaw(cov2))
        bad_yaw = yaw_delta > cfg.rm_yaw_thresh
        active = it >= cfg.rm_start_iter
        bad = corr & (bad_res | bad_yaw) & active
        n_rejected = jnp.sum(bad.astype(jnp.int32))
        corr = corr & ~bad

    cm = corr.astype(scan2.dtype)

    # Noise weighting + Jacobian products + normal-equation reduction, all
    # in plane form (reference icet.cpp:314-338, ICET_spherical.py:424-457).
    from icet_tpu.ops.geometry import rotation_jacobian

    dR = rotation_jacobian(X[3:6])
    if want_range_sens:
        # Sensitivity RHS for the range-calibration covariance term
        # (ICETConfig.range_sigma): a common-mode range offset delta moves
        # every scan-2 point by delta * r_hat in the SENSOR frame, i.e.
        # the transformed voxel means by delta * (mu2 - t)/|mu2 - t|.
        from icet_tpu.ops.wls_planes import _vec3_planes

        M2p = _vec3_planes(mean2)
        d3 = [M2p[j] - X[j] for j in range(3)]
        gn = jnp.sqrt(jnp.maximum(d3[0] ** 2 + d3[1] ** 2 + d3[2] ** 2, 1e-12))
        HTWH, HTWdz, _, htwg = assemble_normal_equations(
            basis1, lmask1, cov1, count1, cov2, count2,
            mean1, mean2, dR, cm, cfg.pinv_rcond,
            extra_dz=[dj / gn for dj in d3],
        )
    else:
        HTWH, HTWdz, _ = assemble_normal_equations(
            basis1, lmask1, cov1, count1, cov2, count2,
            mean1, mean2, dR, cm, cfg.pinv_rcond,
        )
        htwg = None

    # Global condition pruning (reference checkCondition, icet.cpp:443-492 /
    # ICET_spherical.py:774-824).  With L2 a row-selector of the eigenbasis,
    # dx = pinv(L2 lam U2^T) L2 U2^T (H^T W dz) collapses to the truncated
    # eigen pseudo-inverse below.
    if U2_warm is None:
        w6, U2 = eigh_small(HTWH)  # ascending
    else:
        # Warm-start from the previous iteration's eigenbasis: the normal
        # equations change slowly across GN iterations and the cold 8-sweep
        # sequential Jacobi on this single 6x6 was the top op in the trace.
        # One polishing sweep + an off-diagonal safeguard (ops/linalg.py).
        # (Iteration 0 is unrolled in register() and runs the cold path.)
        w6, U2 = eigh_small_warm_safe(HTWH, U2_warm)
    cond_full = jnp.abs(w6[-1]) / jnp.maximum(jnp.abs(w6[0]), 1e-30)
    # Keep axis k iff lam_max / lam_k stays under the cutoff; an all-zero
    # spectrum (no correspondences) keeps nothing, making the update a no-op
    # instead of 0/0 NaNs.
    keep = (jnp.abs(w6[-1]) <= cfg.condition_cutoff * jnp.abs(w6)) & (
        jnp.abs(w6) > 1e-30
    )
    inv_kept = jnp.where(keep, 1.0 / jnp.where(keep, w6, 1.0), 0.0)
    dx = _mm(U2, inv_kept * _mm(U2.T, HTWdz))

    X_new = X + dx
    diag = IterationDiag(
        n_corr=jnp.sum(corr.astype(jnp.int32)),
        condition=cond_full,
        dx_norm=jnp.linalg.norm(dx),
        n_dropped_axes=jnp.sum((~keep).astype(jnp.int32)),
        n_rejected_moving=n_rejected,
        windowed_overflow=win_ovf,
    )
    if want_range_sens:
        return X_new, w6, keep, corr, U2, diag, htwg
    return X_new, w6, keep, corr, U2, diag


def _diag_pack(d: IterationDiag) -> jax.Array:
    """IterationDiag -> (8,) f32 row (counts are exact in f32: all < 2^24).

    The early-exit while_loop carries ONE (n_iters, 8) diagnostics buffer
    instead of six separate (n_iters,) buffers — the round-3 chip trace
    showed the loop body paying per-iteration async-copy latency on every
    small carried buffer, so fewer carried buffers = fewer serialized DMAs.
    8 columns keeps the row a power-of-two slice; 6 are used."""
    z = jnp.zeros((), jnp.float32)
    return jnp.stack([
        d.n_corr.astype(jnp.float32),
        d.condition.astype(jnp.float32),
        d.dx_norm.astype(jnp.float32),
        d.n_dropped_axes.astype(jnp.float32),
        d.n_rejected_moving.astype(jnp.float32),
        d.windowed_overflow.astype(jnp.float32),
        z, z,
    ])


def _diag_unpack(rows: jax.Array) -> IterationDiag:
    """(n, 8) packed rows (see :func:`_diag_pack`) -> stacked IterationDiag."""
    return IterationDiag(
        n_corr=rows[:, 0].astype(jnp.int32),
        condition=rows[:, 1],
        dx_norm=rows[:, 2],
        n_dropped_axes=rows[:, 3].astype(jnp.int32),
        n_rejected_moving=rows[:, 4].astype(jnp.int32),
        windowed_overflow=rows[:, 5].astype(jnp.int32),
    )


def _predicted_covariance(w6, U2, keep, cfg: ICETConfig, htwg=None):
    """Predicted solution error covariance + per-component stds from the
    FINAL iteration's eigensystem (reference icet.cpp:410-417,
    ICET_spherical.py:462-463) — hoisted out of the GN loop; only the last
    iteration's values are ever consumed.

    ``htwg`` (when ``cfg.range_sigma > 0``): the H^T W r_hat sensitivity
    right-hand side from the final normal equations.  The converged pose's
    response to a common-mode range offset delta is
    ``v = pinv_kept(HTWH) htwg`` (same truncated inverse as the GN step),
    and two independently jittering scans add ``2 sigma_r^2 v v^T`` to the
    solution covariance — error mass residual statistics cannot see
    (Monte-Carlo-validated, tests/test_montecarlo.py)."""
    wmax = jnp.max(jnp.abs(w6))
    invertible = jnp.abs(w6) > cfg.pinv_rcond * wmax
    inv_all = jnp.where(invertible, 1.0 / jnp.where(invertible, w6, 1.0), 0.0)
    Q = _mm(U2 * inv_all[None, :], U2.T)
    if htwg is not None:
        inv_kept = jnp.where(keep, inv_all, 0.0)
        v = _mm(U2, inv_kept * _mm(U2.T, htwg))
        Q = Q + (2.0 * cfg.range_sigma**2) * jnp.outer(v, v)
    pred_stds = jnp.sqrt(jnp.abs(jnp.diag(Q)))
    # Inflate components of globally pruned axes (reference icet.cpp:469-486).
    dropped = (~keep).astype(pred_stds.dtype)
    pred_stds = pred_stds + jnp.abs(U2) @ dropped
    return pred_stds, Q


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def register(
    model: VoxelModel,
    scan2: jax.Array,
    x0: jax.Array,
    cfg: ICETConfig,
    axis_name: str | None = None,
    corr_mask: jax.Array | None = None,
    want_static_mask: bool = True,
    it_offset=0,
) -> RegistrationResult:
    """Solve for the 6-DOF transform aligning scan 2 to the voxel model.

    Under shard_map with ``axis_name``, ``scan2`` is the local point shard and
    the returned ``static_mask`` covers only that shard; everything else is
    replicated across the axis.

    ``want_static_mask=False`` skips the final cloud2_static pass (an extra
    transform + rebin + per-point table gather) and returns an empty (0,)
    mask — the odometry hot path doesn't consume it.

    ``it_offset`` is the GLOBAL index of this call's first iteration, for
    callers that split one logical solve into phases (the DNN filter runs
    dnn_start_iter plain iterations then per-iteration filtered steps):
    iteration-indexed schedules — moving-object rejection's
    ``it >= rm_start_iter`` — see the global index, so a phase restart
    cannot silently deactivate them.  May be a traced scalar when the
    early-exit while_loop is not in play (n_iters == 1 phases).
    """
    # All post-stage model tables packed into one buffer: the GN loop body
    # then DMAs a single table per iteration (see _pack_model_planes).
    packed = _pack_model_planes(model)

    # Iteration 0 is unrolled: it runs the cold eigendecomposition and seeds
    # the warm eigenbasis carried through the scanned remaining iterations
    # (keeping the cold/warm branch out of the scan body).
    X1, w0, keep0, corr0, U2_0, diag0 = _iteration(
        model, scan2, x0.astype(scan2.dtype), it_offset, cfg, axis_name,
        corr_mask, None, packed
    )

    def body(carry, it):
        X, _, _, _, U2_warm = carry
        X_new, w6, keep, corr, U2, diag = _iteration(
            model, scan2, X, it + it_offset, cfg, axis_name, corr_mask,
            U2_warm, packed
        )
        return (X_new, w6, keep, corr, U2), diag

    init = (X1, w0, keep0, corr0, U2_0)
    stat_scale = cfg.convergence_stat_scale
    if cfg.n_iters > 1 and (cfg.convergence_tol > 0.0 or stat_scale > 0.0):
        # Early exit: run iterations under lax.while_loop until |dx| < tol
        # (n_iters stays the hard cap).  Under vmap the loop runs until all
        # lanes converge; under shard_map every device sees the same
        # (psummed) dx so trip counts agree.  Diagnostics for skipped
        # iterations repeat the last executed values — so dx_norm[-1] is
        # the true final step norm, not a misleading zero.
        n_it = cfg.n_iters
        tol = cfg.convergence_tol
        # Moving-object rejection only activates at it >= rm_start_iter;
        # exiting earlier would silently skip it on exactly the easy
        # (fast-converging) frames where a moving vehicle biases the lock.
        # Force at least one post-activation iteration when it's enabled.
        # (it_offset must be concrete here — the while_loop path is only
        # reachable with n_iters > 1 phases, which phase-splitting callers
        # never combine with a traced offset.)
        if cfg.remove_moving:
            min_it = min(max(cfg.rm_start_iter + 1 - int(it_offset), 1), n_it)
        else:
            min_it = 1

        # One packed (n_it, 8) diagnostics carry instead of six (n_it,)
        # buffers (see _diag_pack: fewer loop-carried DMAs per iteration).
        diag_buf = jnp.zeros((n_it, 8), jnp.float32).at[0].set(
            _diag_pack(diag0)
        )

        def _exit_thresh(w6, U2, keep):
            """Per-iteration step-norm exit threshold.

            max(tol, stat_scale * |stds|): the statistical exit stops
            refining once the step falls below the solve's own predicted
            standard error (6x6 math, negligible next to the iteration).
            Uses the UNINFLATED stds (sqrt diag Q, identifiable axes only;
            dropped axes contribute zero) — the dx step also never moves
            along pruned axes, and the dropped-axis inflation of
            _predicted_covariance would otherwise trigger premature exits
            in degenerate scenes exactly where more iterations still help
            the identifiable components.
            """
            t = jnp.asarray(tol, w6.dtype)
            if stat_scale > 0.0:
                wmax = jnp.max(jnp.abs(w6))
                inv_ok = jnp.abs(w6) > cfg.pinv_rcond * wmax
                inv = jnp.where(inv_ok, 1.0 / jnp.where(inv_ok, w6, 1.0), 0.0)
                var = jnp.sum(U2 * U2 * inv[None, :], axis=1)
                t = jnp.maximum(
                    t, stat_scale * jnp.sqrt(jnp.sum(jnp.abs(var)))
                )
            return t

        def w_cond(carry):
            it, _, _, dx_prev, thresh = carry
            return (it < n_it) & ((dx_prev >= thresh) | (it < min_it))

        def w_body(carry):
            it, (X, _, _, _, U2_warm), diags, _, _ = carry
            X_new, w6, keep, corr, U2, d = _iteration(
                model, scan2, X, it + it_offset, cfg, axis_name, corr_mask,
                U2_warm, packed
            )
            diags = diags.at[it].set(_diag_pack(d))
            return (
                it + 1, (X_new, w6, keep, corr, U2), diags, d.dx_norm,
                _exit_thresh(w6, U2, keep),
            )

        carry0 = (
            jnp.int32(1), init, diag_buf, diag0.dx_norm,
            _exit_thresh(w0, U2_0, keep0),
        )
        it_end, (X, w6, keep, corr, _U2), diags, _, _ = jax.lax.while_loop(
            w_cond, w_body, carry0
        )
        fill = jnp.minimum(jnp.arange(n_it), it_end - 1)
        diags = _diag_unpack(diags[fill])
    elif cfg.n_iters > 1:
        (X, w6, keep, corr, _U2), diags_rest = jax.lax.scan(
            body, init, jnp.arange(1, cfg.n_iters)
        )
        diags = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), diag0, diags_rest
        )
    else:
        X, corr = X1, corr0
        w6, keep, _U2 = w0, keep0, U2_0
        diags = jax.tree_util.tree_map(lambda a: a[None], diag0)

    if cfg.range_sigma > 0.0:
        # One extra assembly pass at the CONVERGED X to extract the range-
        # calibration sensitivity (H^T W r_hat) alongside a fresh final
        # eigensystem — ~1 GN iteration of extra work, paid only when the
        # calibration-aware covariance is enabled.  The RM schedule sees the
        # final iteration's index so the correspondence set matches the
        # solve's last iteration.
        _, w6, keep, _corr_s, _U2, _d, htwg = _iteration(
            model, scan2, X, it_offset + cfg.n_iters - 1, cfg, axis_name,
            corr_mask, _U2, packed, want_range_sens=True,
        )
        pred_stds, Q = _predicted_covariance(w6, _U2, keep, cfg, htwg)
    else:
        pred_stds, Q = _predicted_covariance(w6, _U2, keep, cfg)

    if want_static_mask:
        # Scan-2 points inside used (non-moving) voxels at the final estimate
        # (reference cloud2_static, ICET_spherical.py:482-487).
        raw_ok = jnp.linalg.norm(scan2, axis=-1) >= cfg.min_range
        p2 = transform_points(scan2, X)
        rtp2 = cart_to_spherical(p2)
        vid2 = voxel_ids(rtp2, cfg)
        member2 = membership(
            vid2, rtp2[..., 0], raw_ok, model.bounds, cfg.n_voxels
        )
        static_mask = member2 & corr[jnp.where(member2, vid2, cfg.n_voxels)]
    else:
        static_mask = jnp.zeros((0,), bool)

    return RegistrationResult(
        X=X, pred_stds=pred_stds, Q=Q, diagnostics=diags, static_mask=static_mask
    )


def register_pair_impl(
    scan1: jax.Array,
    scan2: jax.Array,
    x0: jax.Array,
    cfg: ICETConfig,
    axis_name: str | None = None,
    want_static_mask: bool = True,
) -> RegistrationResult:
    """Un-jitted end-to-end registration (composable under shard_map/vmap)."""
    model = prepare_reference(scan1, cfg, axis_name)
    return register(
        model, scan2, x0, cfg, axis_name, want_static_mask=want_static_mask
    )


@functools.partial(jax.jit, static_argnums=(3,))
def register_pair(
    scan1: jax.Array,
    scan2: jax.Array,
    x0: jax.Array,
    cfg: ICETConfig,
) -> RegistrationResult:
    """End-to-end registration of a scan pair (the ICET ctor equivalent,
    reference src/icet.cpp:29-63)."""
    return register_pair_impl(scan1, scan2, x0, cfg)


@functools.partial(jax.jit, static_argnums=(1,))
def prepare_reference_jit(scan1: jax.Array, cfg: ICETConfig) -> VoxelModel:
    return prepare_reference(scan1, cfg)


@functools.partial(jax.jit, static_argnums=(3,))
def odometry_step_jit(
    model: VoxelModel, scan: jax.Array, x0: jax.Array, cfg: ICETConfig
) -> tuple[RegistrationResult, VoxelModel]:
    """Fused odometry step: register the new scan against the previous
    frame's voxel model AND fit the new scan's own model for the next frame —
    one device dispatch per frame instead of two (dispatch latency matters at
    sub-100us solve times)."""
    res = register(model, scan, x0, cfg, want_static_mask=False)
    new_model = prepare_reference(scan, cfg)
    return res, new_model


@functools.partial(jax.jit, static_argnums=(3,))
def register_jit(
    model: VoxelModel, scan2: jax.Array, x0: jax.Array, cfg: ICETConfig
) -> RegistrationResult:
    return register(model, scan2, x0, cfg)
