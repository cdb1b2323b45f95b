"""Fused Pallas TPU kernel: scan transform + spherical rebin + anchored
moment accumulation in a single pass.

This is the solver's entire per-iteration hot path (reference fitScan2's
transform + sortSphericalCoordinates + filterPointsInsideCluster + Gaussian
fit, src/icet.cpp:372-404) as ONE kernel.  The XLA op-by-op formulation
streams the (N, 3) cloud through ~20 HBM round trips per iteration
(transform, c2s, bin ids, membership gathers, feature build, accumulation);
here each point block is loaded into VMEM once and leaves only as its
(Vpad, 16) moment-sum contribution.

Key tricks:
* Membership (r inside the voxel's radial bounds) folds into the one-hot
  build as a broadcast compare against the bounds ROWS — no per-point
  gather, which Mosaic's vector units dislike.
* The per-point anchor is fetched by the one-hot itself:
  ``a = onehot @ anchors`` (each row of onehot has at most a single 1), so
  anchored features need no gather either.  Anchors are pre-rounded to bf16
  so kernel and finalize agree bit-for-bit.
* The (block, Vpad) one-hot exists only in VMEM; both matmuls ride the MXU.

Grid steps run sequentially per core, so accumulating into one output block
is race-free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icet_tpu.config import ICETConfig

_N_FEATURES = 16


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _atan_poly(t):
    """Minimax atan on [0, 1], abs error ~1e-6 (classic 6-term odd poly).

    Mosaic has no atan/atan2 primitive; the angles computed here feed only
    the BIN INDEX (moments are accumulated from exact cartesian values), so
    1e-6 rad — 1e-5 of a bin width — is far more than enough.
    """
    s = t * t
    p = -0.0117212
    p = p * s + 0.05265332
    p = p * s + -0.11643287
    p = p * s + 0.19354346
    p = p * s + -0.33262347
    p = p * s + 0.99997726
    return t * p


def _atan2(y, x):
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, 1e-30)
    r = _atan_poly(t)
    r = jnp.where(ay > ax, 0.5 * jnp.pi - r, r)
    r = jnp.where(x < 0.0, jnp.pi - r, r)
    return jnp.where(y < 0.0, -r, r)


def _kernel(params_ref, pts_ref, bounds_ref, anchors_ref, out_ref, *, cfg_tuple):
    (n_theta, n_phi, phi_min, phi_span, min_range, radial_fixed, n_shells,
     shell_log_growth, n_voxels) = cfg_tuple
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # 6-DOF state: translation + euler angles (scalars from VMEM row).
    tx = params_ref[0, 0]
    ty = params_ref[0, 1]
    tz = params_ref[0, 2]
    a_phi = -params_ref[0, 3]
    a_theta = -params_ref[0, 4]
    a_psi = -params_ref[0, 5]
    cf, sf = jnp.cos(a_phi), jnp.sin(a_phi)
    ct, st = jnp.cos(a_theta), jnp.sin(a_theta)
    cp, sp = jnp.cos(a_psi), jnp.sin(a_psi)
    # euler_R(-angs) rows (geometry.euler_R convention).
    r00, r01, r02 = ct * cp, sp * cf + sf * st * cp, sf * sp - st * cf * cp
    r10, r11, r12 = -sp * ct, cf * cp - sf * st * sp, sf * cp + st * sp * cf
    r20, r21, r22 = st, -sf * ct, cf * ct

    p = pts_ref[:]  # (BLK, 3)
    x0, y0, z0 = p[:, 0], p[:, 1], p[:, 2]
    # p' = R p + t
    x = r00 * x0 + r01 * y0 + r02 * z0 + tx
    y = r10 * x0 + r11 * y0 + r12 * z0 + ty
    z = r20 * x0 + r21 * y0 + r22 * z0 + tz

    r2 = x * x + y * y + z * z
    r = jnp.sqrt(r2)
    theta = _atan2(y, x)
    theta = jnp.where(theta < 0.0, theta + 2.0 * jnp.pi, theta)
    safe_r = jnp.maximum(r, 1e-9)
    cos_phi = jnp.clip(z / safe_r, -1.0, 1.0)
    # acos via atan2 (Mosaic has no arccos primitive).
    phi = _atan2(jnp.sqrt(jnp.maximum(1.0 - cos_phi * cos_phi, 0.0)), cos_phi)

    itheta = jnp.clip(
        (theta * (n_theta / (2.0 * jnp.pi))).astype(jnp.int32), 0, n_theta - 1
    )
    fphi = (phi - phi_min) * (n_phi / phi_span)
    iphi = jnp.floor(fphi).astype(jnp.int32)
    ok = (iphi >= 0) & (iphi < n_phi) & (r >= min_range)
    vid = iphi * n_theta + itheta
    if radial_fixed:
        shell = jnp.floor(
            jnp.log(jnp.maximum(r, min_range) / min_range) / shell_log_growth
        ).astype(jnp.int32)
        ok = ok & (shell >= 0) & (shell < n_shells)
        shell = jnp.clip(shell, 0, n_shells - 1)
        vid = shell * (n_theta * n_phi) + vid
    v_pad = out_ref.shape[0]
    vid = jnp.where(ok, vid, n_voxels)

    # One-hot with the radial-bounds membership folded in (broadcast against
    # the bounds rows — no gather).
    cols = jax.lax.broadcasted_iota(jnp.int32, (p.shape[0], v_pad), 1)
    b_lo = bounds_ref[:, 0][None, :]
    b_hi = bounds_ref[:, 1][None, :]
    rb = r[:, None]
    # f32 one-hot shared by both MXU contractions; default dot precision
    # truncates operands to bf16, which is exact for 0/1 and for the
    # pre-rounded anchors.
    onehot = (
        (vid[:, None] == cols) & (rb >= b_lo) & (rb <= b_hi)
    ).astype(jnp.float32)

    # Per-point anchor via the one-hot (row has at most one 1 -> exact).
    a = jax.lax.dot_general(
        onehot,
        anchors_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BLK, 3)
    gx = x - a[:, 0]
    gy = y - a[:, 1]
    gz = z - a[:, 2]

    ones = jnp.ones_like(gx)
    zeros = jnp.zeros_like(gx)
    feats = jnp.stack(
        [ones, gx, gy, gz, gx * gx, gy * gy, gz * gz, gx * gy, gx * gz,
         gy * gz, zeros, zeros, zeros, zeros, zeros, zeros],
        axis=-1,
    )  # (BLK, 16)

    out_ref[:] += jax.lax.dot_general(
        onehot,
        feats,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _windowed_kernel(
    params_ref, pts_ref, bounds_ref, anchors_ref, out_ref, bscr, ascr, *,
    cfg_tuple, window,
):
    """Scan-order-windowed variant: each point block touches a narrow
    contiguous band of voxel ids (spinning lidar sweeps azimuth smoothly), so
    the one-hot is (BLK, window) at a per-block dynamic offset instead of
    (BLK, Vpad) — ~Vpad/window less MXU work.  Points outside the window are
    counted in ovf_ref; the caller falls back to the dense path when any
    overflow occurs (shuffled inputs stay correct, just slower)."""
    (n_theta, n_phi, phi_min, phi_span, min_range, radial_fixed, n_shells,
     shell_log_growth, n_voxels) = cfg_tuple
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tx = params_ref[0, 0]
    ty = params_ref[0, 1]
    tz = params_ref[0, 2]
    a_phi = -params_ref[0, 3]
    a_theta = -params_ref[0, 4]
    a_psi = -params_ref[0, 5]
    cf, sf = jnp.cos(a_phi), jnp.sin(a_phi)
    ct, st = jnp.cos(a_theta), jnp.sin(a_theta)
    cp, sp = jnp.cos(a_psi), jnp.sin(a_psi)
    r00, r01, r02 = ct * cp, sp * cf + sf * st * cp, sf * sp - st * cf * cp
    r10, r11, r12 = -sp * ct, cf * cp - sf * st * sp, sf * cp + st * sp * cf
    r20, r21, r22 = st, -sf * ct, cf * ct

    p = pts_ref[:]
    x0, y0, z0 = p[:, 0], p[:, 1], p[:, 2]
    x = r00 * x0 + r01 * y0 + r02 * z0 + tx
    y = r10 * x0 + r11 * y0 + r12 * z0 + ty
    z = r20 * x0 + r21 * y0 + r22 * z0 + tz

    r = jnp.sqrt(x * x + y * y + z * z)
    theta = _atan2(y, x)
    theta = jnp.where(theta < 0.0, theta + 2.0 * jnp.pi, theta)
    cos_phi = jnp.clip(z / jnp.maximum(r, 1e-9), -1.0, 1.0)
    phi = _atan2(jnp.sqrt(jnp.maximum(1.0 - cos_phi * cos_phi, 0.0)), cos_phi)

    itheta = jnp.clip(
        (theta * (n_theta / (2.0 * jnp.pi))).astype(jnp.int32), 0, n_theta - 1
    )
    fphi = (phi - phi_min) * (n_phi / phi_span)
    iphi = jnp.floor(fphi).astype(jnp.int32)
    ok = (iphi >= 0) & (iphi < n_phi) & (r >= min_range)
    vid = iphi * n_theta + itheta
    if radial_fixed:
        shell = jnp.floor(
            jnp.log(jnp.maximum(r, min_range) / min_range) / shell_log_growth
        ).astype(jnp.int32)
        ok = ok & (shell >= 0) & (shell < n_shells)
        shell = jnp.clip(shell, 0, n_shells - 1)
        vid = shell * (n_theta * n_phi) + vid
    v_pad = out_ref.shape[1]  # out is (16, v_pad) — voxel axis on lanes
    big = jnp.int32(2**30)
    vid_or_big = jnp.where(ok, vid, big)

    # Per-block window start: min valid vid, aligned down to a full lane
    # tile (Mosaic requires 128-aligned dynamic offsets on these refs).
    vmin = jnp.min(vid_or_big)
    vmin = jnp.where(vmin == big, 0, vmin)
    start = jnp.maximum(jnp.minimum((vmin // 128) * 128, v_pad - window), 0)

    # The window's LAST column is reserved as the overflow counter: valid
    # points outside [start, start+window-1) map there carrying a single
    # indicator feature (row 15), so the overflow count rides the same
    # matmul + roll as the real sums (any other encoding — second outputs,
    # iota-adds to the MXU-layout contrib — trips Mosaic layout tracking
    # with "Not implemented: Offset change").
    in_win = ok & (vid >= start) & (vid < start + window - 1)
    overflow = ok & ~in_win

    # All voxel-axis data lives on the LANE axis ((rows, v_pad) layout):
    # Mosaic supports dynamic lane rotates but not dynamic sublane offsets.
    # The rolled tables MUST be materialised through scratch before slicing:
    # roll-then-slice miscompiles silently (returns zeros) on Mosaic.
    bscr[:] = pltpu.roll(bounds_ref[:], -start, 1)
    ascr[:] = pltpu.roll(anchors_ref[:], -start, 1)
    b = bscr[:, 0:window]  # (2, window)
    anc = ascr[:, 0:window]  # (3, window)

    local = jnp.where(
        in_win, vid - start, jnp.where(overflow, window - 1, window)
    )  # 'window' = no column at all (invalid/padded points)
    cols = jax.lax.broadcasted_iota(jnp.int32, (p.shape[0], window), 1)
    rb = r[:, None]
    member_r = (rb >= b[0][None, :]) & (rb <= b[1][None, :])
    # Overflow points must match their reserved column unconditionally.
    onehot = (
        (local[:, None] == cols) & (member_r | overflow[:, None])
    ).astype(jnp.float32)

    # Per-point anchor: contract the window axis against anchors' lane axis.
    a = jax.lax.dot_general(
        onehot,
        anc,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BLK, 3)
    # Features masked to in-window membership; overflow points carry only
    # the row-15 indicator (their reserved column must not pollute counts).
    m = in_win.astype(jnp.float32)
    gx = (x - a[:, 0]) * m
    gy = (y - a[:, 1]) * m
    gz = (z - a[:, 2]) * m
    ovf_feat = overflow.astype(jnp.float32)
    zeros = jnp.zeros_like(gx)
    feats = jnp.stack(
        [m, gx, gy, gz, gx * gx, gy * gy, gz * gz, gx * gy, gx * gz,
         gy * gz, zeros, zeros, zeros, zeros, zeros, ovf_feat],
        axis=-1,
    )  # (BLK, 16)
    contrib = jax.lax.dot_general(
        feats,
        onehot,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (16, window)
    v_pad_c = out_ref.shape[1]
    padded = jnp.pad(contrib, ((0, 0), (0, v_pad_c - window)))
    out_ref[:] += pltpu.roll(padded, start, 1)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def fused_moment_sums_windowed(
    pts: jax.Array,
    X: jax.Array,
    bounds: jax.Array,
    anchors: jax.Array,
    cfg: ICETConfig,
    block: int = 512,
    window: int = 256,
) -> tuple[jax.Array, jax.Array]:
    """Windowed fused accumulation.  Returns (sums (V+1, 16), overflow count).

    Correct ONLY when overflow == 0 (every block's valid points fit its
    window); callers must fall back to a dense path otherwise — see
    solver usage with lax.cond.
    """
    n = pts.shape[0]
    v1 = cfg.n_voxels + 1
    v_pad = max(_round_up(v1, 128), 2 * window)
    pad_n = (-n) % block
    if pad_n:
        pts = jnp.concatenate([pts, jnp.zeros((pad_n, 3), pts.dtype)])
    # Voxel tables transposed: voxel axis on lanes (dynamic lane rotates).
    bounds_t = jnp.zeros((2, v_pad), jnp.float32).at[:, :v1].set(bounds.T)
    anchors_t = jnp.zeros((3, v_pad), jnp.float32).at[:, :v1].set(anchors.T)
    params = jnp.zeros((1, 8), jnp.float32).at[0, :6].set(X.astype(jnp.float32))

    import math

    cfg_tuple = (
        cfg.n_theta,
        cfg.n_phi,
        float(cfg.phi_min),
        float(cfg.phi_max - cfg.phi_min),
        float(cfg.min_range),
        cfg.radial_mode == "fixed",
        cfg.n_shells,
        float(math.log(cfg.shell_growth)),
        cfg.n_voxels,
    )

    sums_t = pl.pallas_call(
        functools.partial(_windowed_kernel, cfg_tuple=cfg_tuple, window=window),
        grid=(pts.shape[0] // block,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, v_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, v_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_N_FEATURES, v_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((_N_FEATURES, v_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, v_pad), jnp.float32),
            pltpu.VMEM((3, v_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * pts.shape[0] * window * (_N_FEATURES + 3),
            bytes_accessed=pts.shape[0] * 12 + v_pad * 84,
            transcendentals=pts.shape[0] * 6,
        ),
        interpret=jax.default_backend() != "tpu",
    )(params, pts, bounds_t, anchors_t)
    ovf = jnp.sum(sums_t[15])
    sums = sums_t.T[:v1]
    sums = sums.at[:, 15].set(0.0)
    return sums, ovf


@functools.partial(jax.jit, static_argnums=(4, 5))
def fused_moment_sums(
    pts: jax.Array,
    X: jax.Array,
    bounds: jax.Array,
    anchors: jax.Array,
    cfg: ICETConfig,
    block: int = 512,
) -> jax.Array:
    """Transform scan by X, rebin, and accumulate (V+1, 16) moment sums.

    Non-member / out-of-grid / padded points contribute nothing (their
    one-hot row is zero).  ``anchors`` must be the bf16-rounded table from
    grid.voxel_anchors so finalize_moments subtracts identical values.
    """
    n = pts.shape[0]
    v1 = cfg.n_voxels + 1
    v_pad = _round_up(v1, 128)
    pad_n = (-n) % block
    if pad_n:
        pts = jnp.concatenate([pts, jnp.zeros((pad_n, 3), pts.dtype)])
    bounds_p = jnp.zeros((v_pad, 2), jnp.float32).at[:v1].set(bounds)
    # Padded rows keep bounds (0, 0) => r >= min_range can never be a member.
    anchors_p = jnp.zeros((v_pad, 3), jnp.float32).at[:v1].set(anchors)
    params = jnp.zeros((1, 8), jnp.float32).at[0, :6].set(X.astype(jnp.float32))

    phi_span = cfg.phi_max - cfg.phi_min
    import math

    cfg_tuple = (
        cfg.n_theta,
        cfg.n_phi,
        float(cfg.phi_min),
        float(phi_span),
        float(cfg.min_range),
        cfg.radial_mode == "fixed",
        cfg.n_shells,
        float(math.log(cfg.shell_growth)),
        cfg.n_voxels,
    )

    out = pl.pallas_call(
        functools.partial(_kernel, cfg_tuple=cfg_tuple),
        grid=(pts.shape[0] // block,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v_pad, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v_pad, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (v_pad, _N_FEATURES), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((v_pad, _N_FEATURES), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * pts.shape[0] * v_pad * (_N_FEATURES + 3),
            bytes_accessed=pts.shape[0] * 12 + v_pad * 84,
            transcendentals=pts.shape[0] * 6,
        ),
        interpret=jax.default_backend() != "tpu",
    )(params, pts, bounds_p, anchors_p)
    return out[:v1]
