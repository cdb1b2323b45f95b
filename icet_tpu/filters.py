"""Voxel rejection filters beyond the solver's built-in moving-object test.

Implements the DNN perspective-shift filter (reference
python/ICET_spherical.py:288-390): sample a fixed number of points per voxel
from each scan, ask the bias network for the voxel's true inter-scan
translation, and reject voxels where ICET's own mean-residual disagrees with
the network beyond a threshold (those voxels' residuals are dominated by
perspective shift, not motion).

The reference runs the filter every iteration past ``start_filter_iter`` with
host-side numpy shuffling per voxel (ICET_spherical.py:303-312, an eager
host<->device ping-pong).  Here the filter runs ONCE at the iteration
boundary as a jitted pass — rejection sets are stable across late
iterations — and the sampling is a dense sort-and-slice with no raggedness.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from typing import TYPE_CHECKING

from icet_tpu.config import ICETConfig

if TYPE_CHECKING:  # runtime imports stay lazy: flax/optax only load when
    from icet_tpu.models.bias_net import BiasNet  # the DNN path is used
from icet_tpu.ops.clustering import membership
from icet_tpu.ops.geometry import cart_to_spherical, transform_points
from icet_tpu.ops.grid import voxel_ids
from icet_tpu.solver import (
    RegistrationResult,
    VoxelModel,
    prepare_reference,
    register,
)

_HI = jax.lax.Precision.HIGHEST


def _moment_method_is_fused(cfg: ICETConfig) -> bool:
    """Mirror of solver._moment_method's fused/segsum choice (the filter's
    moments pass follows the same backend policy as the solve's)."""
    if cfg.moment_method == "auto":
        return jax.default_backend() == "tpu" and cfg.radial_mode != "fixed"
    return cfg.moment_method == "fused" and cfg.radial_mode != "fixed"


def sample_voxel_points(
    points: jax.Array,
    vid: jax.Array,
    member: jax.Array,
    n_voxels: int,
    n_samples: int,
    mode: str = "head",
    counts: jax.Array | None = None,
    fill_tail: bool = True,
) -> tuple[jax.Array, jax.Array | None]:
    """Fixed-size per-voxel point samples, dense: ``(V+1, S, 3)``.

    Sorts point indices by voxel id and slices S per voxel, replacing the
    reference's per-voxel host-side shuffles (ICET_spherical.py:303-312).

    ``mode="head"`` (default) takes the first S of each voxel's run (the
    voxel's FIRST point repeated in the tail when shorter — max-pool
    neutral; see the inline note below).  Scan order is
    preserved, so on beam-major scans this is the voxel's lowest beam
    rows — a spatially biased subset in theory, but the MEASURED-better
    choice: on the fence occlusion benchmark (tests/test_dnn_filter.py)
    head sampling cuts the biased-axis error to 0.31/0.41/0.07 of plain
    across seeds, while ``mode="strided"`` (S evenly-strided positions
    spanning the whole run — the faithful analog of the reference's
    full-voxel shuffle) only reaches 0.61/1.15/0.53.  Both estimates the
    filter compares (sampled icet_shift AND the net's prediction) move
    together under the sampling scheme, so representativeness does not
    automatically help.

    Construction is SCATTER-based for head mode: one multi-operand stable
    sort carries xyz alongside the voxel-id keys, within-voxel ranks come
    from a segment-boundary cummax in sorted space, and ONE unique-index
    scatter writes the sorted points into the dense (V+1, S, 3) buffer.
    The obvious gather formulation (``points[order[take]]``) costs
    4.5 ms/call on the v5e — TPU random-row gathers run ~17 ns/row, so
    (V+1)x100 sample rows dominate the whole DNN filter.  The first
    scatter-based version sorted (vid, idx) and paid a SECOND 65k scatter
    to permute ranks back to original positions (1.70 ms/call); carrying
    the coordinates through the sort removes it (measured 1.05 ms/call,
    of which the one (n,3) scatter is ~0.7 — tools/bench_dnn_opt.py).
    Strided mode needs arbitrary per-voxel positions (no rank test
    selects them), so it keeps the gather construction.
    """
    n = points.shape[0]
    vidm = jnp.where(member, vid, n_voxels).astype(jnp.int32)
    if mode == "strided" and counts is None:
        # ``counts`` must equal the sort's segment sizes; pass the windowed
        # fast-path counts when the scan is beam-major (the 65k scatter-add
        # here measured 1.3 ms/call on the v5e vs ~0.15 windowed).
        counts = jax.ops.segment_sum(
            jnp.ones_like(vidm, jnp.int32), vidm, num_segments=n_voxels + 1
        )

    if mode == "strided":
        order = jnp.argsort(vidm)
        offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(counts)[:-1].astype(jnp.int32)]
        )
        k = jnp.arange(n_samples, dtype=jnp.int32)[None, :]
        within = (k * jnp.maximum(counts, 1)[:, None]) // n_samples
        take = jnp.clip(offsets[:, None] + within, 0, n - 1)
        return points[order[take]], counts

    S = n_samples
    v1 = n_voxels + 1
    idx = jnp.arange(n, dtype=jnp.int32)
    if not fill_tail:
        # Lean hot path: the buffer feeds ONLY the bf16 bias network (the
        # filter's means/counts are exact solver moments since round 5),
        # so coordinates are packed to bf16 pairs BEFORE the sort — the
        # sort carries 2 u32 words instead of 3 f32 and the 65k
        # unique-index scatter (the sampling pass's dominant cost, 0.70
        # ms of 1.05 on the v5e) writes rows 2/3 the size.  bf16 is what
        # the encoder sees anyway; the means that must stay exact no
        # longer come from this buffer.
        xb, yb, zb = (
            jax.lax.bitcast_convert_type(
                points[:, j].astype(jnp.bfloat16), jnp.uint16
            ).astype(jnp.uint32)
            for j in range(3)
        )
        w1 = (xb << 16) | yb
        w2 = zb << 16
        vs, w1s, w2s = jax.lax.sort(
            (vidm, w1, w2), num_keys=1, is_stable=True
        )
        seg_start = jnp.where(
            jnp.concatenate([jnp.ones((1,), bool), vs[1:] != vs[:-1]]),
            idx, 0,
        )
        start = jax.lax.associative_scan(jnp.maximum, seg_start)
        rank = idx - start
        write = (vs < n_voxels) & (rank < S)
        tgt = jnp.where(write, vs * S + rank, v1 * S)
        buf = (
            jnp.zeros((v1 * S, 2), jnp.uint32)
            .at[tgt]
            .set(jnp.stack([w1s, w2s], axis=-1), mode="drop",
                 unique_indices=True)
        )
        return buf.reshape(v1, S, 2), None
    # One stable multi-operand sort carries the coordinates alongside the
    # voxel-id keys (stable ordering keeps scan order within each voxel —
    # head semantics) so no later gather or permutation scatter is needed.
    vs, xs, ys, zs = jax.lax.sort(
        (vidm, points[:, 0], points[:, 1], points[:, 2]),
        num_keys=1, is_stable=True,
    )
    # Within-voxel rank in sorted space: position minus the running
    # maximum of segment-start positions (no gather).
    seg_start = jnp.where(
        jnp.concatenate([jnp.ones((1,), bool), vs[1:] != vs[:-1]]), idx, 0
    )
    start = jax.lax.associative_scan(jnp.maximum, seg_start)
    rank = idx - start
    write = (vs < n_voxels) & (rank < S)
    tgt = jnp.where(write, vs * S + rank, v1 * S)  # OOB row -> dropped
    buf = (
        jnp.zeros((v1 * S, 3), points.dtype)
        .at[tgt]
        .set(jnp.stack([xs, ys, zs], axis=-1), mode="drop",
             unique_indices=True)
    )
    samples = buf.reshape(v1, S, 3)
    # Written slots are recovered from the buffer itself: member points are
    # range-gated (r >= min_range and inside positive radial bounds; exact
    # origin points never pass membership), so a slot is written iff any
    # coordinate is nonzero.  Head mode returns counts CLIPPED to S, which
    # is all its consumers use (means clip anyway; min-points gates
    # satisfy min_pts <= S).
    row_ok = jnp.any(samples != 0.0, axis=-1)
    # Tail rows (count < S) repeat the voxel's FIRST point: a real point,
    # so the bias net's max-pool sees exactly the same feature set as the
    # old cyclic padding (duplicates are max-neutral), with no
    # (V+1, S)-row gather.  (Mean-padding was tried instead and WEAKENED
    # the filter on the fence-occlusion efficacy benchmark — the net never
    # saw synthetic centroid points in training.)
    samples = jnp.where(row_ok[..., None], samples, samples[:, :1, :])
    return samples, jnp.sum(row_ok.astype(jnp.int32), axis=-1)


def _unpack_fill_samples(packed: jax.Array, counts: jax.Array) -> jax.Array:
    """(V+1, S, 2) u32 bf16-packed lean samples -> (V+1, S, 3) f32 with
    each voxel's FIRST point repeated into the zero tail rows.

    ``counts`` are the caller's exact member counts (same membership as
    the sampling pass, so ``min(counts, S)`` is exactly the buffer
    occupancy).  Tail duplicates are max-pool neutral, as before; bf16
    rounding is what the encoder applies anyway."""
    hi = jax.lax.bitcast_convert_type(
        (packed >> 16).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    lo = jax.lax.bitcast_convert_type(
        (packed & 0xFFFF).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    samples = jnp.stack([hi[..., 0], lo[..., 0], hi[..., 1]], axis=-1)
    S = samples.shape[-2]
    ok = (
        jnp.arange(S, dtype=jnp.int32)[None, :]
        < jnp.clip(counts, 1, S)[:, None]
    )
    return jnp.where(ok[..., None], samples, samples[:, :1, :])


def model_voxel_samples(model: VoxelModel, scan1: jax.Array, cfg: ICETConfig):
    """Per-voxel point samples of the model's source scan — loop-invariant
    input to :func:`dnn_reject_mask` (hoist out of per-iteration loops).

    Returns ``(packed, counts)``: ZERO-TAILED bf16-packed samples
    ((V+1, S, 2) u32 — unpacked + tail-filled at use time,
    :func:`_unpack_fill_samples`) and counts CLIPPED to
    ``cfg.dnn_sample_pts`` — taken straight from the model's exact member
    counts (identical membership to the sampling pass), so nothing is
    read back from the scatter buffer (0.35 ms/call saved on the v5e)."""
    rtp = cart_to_spherical(scan1)
    vid = voxel_ids(rtp, cfg)
    member = membership(
        vid, rtp[..., 0], rtp[..., 0] >= cfg.min_range, model.bounds,
        cfg.n_voxels,
    )
    samples, _ = sample_voxel_points(
        scan1, vid, member, cfg.n_voxels, cfg.dnn_sample_pts,
        fill_tail=False,
    )
    counts = jnp.clip(
        model.count.astype(jnp.int32), 0, cfg.dnn_sample_pts
    )
    return samples, counts


class DnnFilterResult(NamedTuple):
    keep: jax.Array  # (V+1,) voxels NOT rejected
    dnn_shift: jax.Array  # (V+1, 3) network-estimated voxel translations
    icet_shift: jax.Array  # (V+1, 3) mean-residual shift used for comparison
    n_rejected: jax.Array


def dnn_reject_mask(
    bias_net: BiasNet,
    params,
    model: VoxelModel,
    scan1: jax.Array,
    scan2_aligned: jax.Array,
    cfg: ICETConfig,
    refine_steps: int | None = None,
    samples1: tuple | None = None,
) -> DnnFilterResult:
    """Compute the keep-mask for voxels whose ICET residual disagrees with
    the bias network's translation estimate (reference
    ICET_spherical.py:324-383, incl. the 2-pass iterative refinement at
    :324-336).

    ``samples1``: optional precomputed ``model_voxel_samples`` output —
    scan 1 and the model are loop-invariant across the in-loop filter's
    iterations, so its sort+scatter pass hoists out of the scanned body.

    The compared "ICET shift" is the EXACT per-voxel mean residual
    ``mean2 - mean1`` (the solver's own correspondence residual, matching
    the reference's ``it_shift`` from its solve state,
    ICET_spherical.py:355-367) computed by one windowed-moments pass over
    the aligned scan — NOT the mean of the S-point subsamples (a round-4
    approximation): exact means are both more faithful and cheaper (the
    min-points candidate gate also uses the exact counts, dropping the
    old ``min_pts <= dnn_sample_pts`` restriction).  The subsamples feed
    only the network input.
    """
    from icet_tpu.ops.moments import finalize_moments_planes

    s1, n1 = (
        samples1 if samples1 is not None
        else model_voxel_samples(model, scan1, cfg)
    )
    s2, _ = model_voxel_samples(model, scan2_aligned, cfg)

    zero6 = jnp.zeros(6, scan2_aligned.dtype)
    if _moment_method_is_fused(cfg):
        # Windowed sums + the bounded spill pass UNCONDITIONALLY — exact
        # whenever off-window points fit the spill capacity (8192; covers
        # every measured regime incl. keyframe-baseline parallax), and
        # deliberately WITHOUT the solver's overflow lax.cond: each XLA
        # conditional in the step costs ~a scheduling sync even untaken
        # (CLAUDE.md), and the round-5 chip trace showed the filter's
        # cond-bearing moments pass costing more than the sampling it
        # replaced.  Beyond-capacity overflow (heavily shuffled clouds)
        # degrades only this mask's means — the SOLVE keeps its own exact
        # fallback.
        from icet_tpu.ops.windowed_moments import (
            windowed_moment_sums,
            windowed_spill_sums,
        )

        sums2, _ovf = windowed_moment_sums(
            scan2_aligned, zero6, model.bounds, model.anchors, cfg
        )
        sums2 = sums2 + windowed_spill_sums(
            scan2_aligned, zero6, model.bounds, model.anchors, cfg,
            spill_capacity=8192,
        )
    else:
        from icet_tpu.solver import _jnp_sums

        sums2 = _jnp_sums(
            scan2_aligned, zero6, model.bounds, model.anchors, cfg
        )
    count2, mean2, _cov2 = finalize_moments_planes(sums2, model.anchors)
    icet_shift = mean2 - model.mean
    n2 = jnp.clip(count2.astype(jnp.int32), 0, cfg.dnn_sample_pts)

    # Iterative refinement: shift sample 1 by the running estimate and
    # re-predict (reference ICET_spherical.py:324-336).  apply_bias_net
    # routes through the fused Pallas encoder on TPU (VMEM-resident
    # activations; the flax apply's HBM round-trips dominated the filter's
    # per-frame cost).
    s1f = _unpack_fill_samples(s1, n1)
    s2f = _unpack_fill_samples(s2, n2)
    shift = jnp.zeros_like(icet_shift)
    if refine_steps is None:
        refine_steps = cfg.dnn_refine_steps
    for _ in range(refine_steps):
        from icet_tpu.models.bias_net import apply_bias_net, pack_voxel_samples

        inputs = pack_voxel_samples(s1f + shift[:, None, :], s2f)
        shift = shift + apply_bias_net(bias_net, params, inputs)

    # Compare in the extended-axis-suppressed frame, rotated back to xyz
    # (reference it_compact_xyz / dnn_compact_xyz, ICET_spherical.py:355-367).
    from icet_tpu.ops.linalg import small_matmul

    P = model.lmask[:, :, None] * jnp.swapaxes(model.basis, -1, -2)
    proj = small_matmul(model.basis, P)  # U diag(l) U^T
    diff = jnp.sum(proj * (icet_shift - shift)[:, None, :], axis=-1)
    # Exact member counts on both sides (model.count / the windowed
    # count2), same gate as the solver's correspondence test.
    candidates = (
        model.valid
        & (model.count >= cfg.min_pts)
        & (count2 >= cfg.min_pts)
    )
    bad = candidates & jnp.any(jnp.abs(diff) > cfg.dnn_thresh, axis=-1)
    return DnnFilterResult(
        keep=~bad,
        dnn_shift=shift,
        icet_shift=icet_shift,
        n_rejected=jnp.sum(bad.astype(jnp.int32)),
    )


_PRETRAINED_CACHE: dict[int, tuple] = {}


def pretrained_dnn(cfg: ICETConfig) -> tuple:
    """The bundled pretrained bias network for ``cfg.dnn_sample_pts``
    (process-cached: pipelines and register_scans share one load)."""
    if cfg.dnn_sample_pts not in _PRETRAINED_CACHE:
        from icet_tpu.models.bias_net import load_pretrained

        _PRETRAINED_CACHE[cfg.dnn_sample_pts] = load_pretrained(
            cfg.dnn_sample_pts
        )
    return _PRETRAINED_CACHE[cfg.dnn_sample_pts]


def register_scans(
    scan1: jax.Array,
    scan2: jax.Array,
    x0: jax.Array | None = None,
    cfg: ICETConfig | None = None,
) -> RegistrationResult:
    """Config-driven scan-pair registration entry point.

    Honors ``cfg.dnn_filter`` (the reference's ``DNN_filter`` ctor flag,
    ICET_spherical.py:21,288): when set, the bundled pretrained bias network
    is loaded (cached per sample count) and registration runs with the
    perspective-shift rejection engaged via ``register_pair_with_dnn``;
    otherwise this is exactly ``solver.register_pair``.
    """
    from icet_tpu.config import ICETConfig as _Cfg

    cfg = cfg or _Cfg()
    if x0 is None:
        x0 = jnp.zeros(6, jnp.float32)
    if not cfg.dnn_filter:
        from icet_tpu.solver import register_pair

        return register_pair(scan1, scan2, x0, cfg)
    net, params = pretrained_dnn(cfg)
    res, _ = register_pair_with_dnn(scan1, scan2, x0, cfg, net, params)
    return res


def register_with_dnn(
    model: VoxelModel,
    scan1: jax.Array,
    scan2: jax.Array,
    x0: jax.Array,
    cfg: ICETConfig,
    bias_net: BiasNet,
    params,
    want_static_mask: bool = True,
    samples1: tuple | None = None,
) -> tuple[RegistrationResult, DnnFilterResult]:
    """Registration against a prepared model with the DNN perspective-shift
    filter engaged (jittable; ``scan1`` is the model's source cloud, needed
    for per-voxel point sampling — or pass its precomputed
    ``model_voxel_samples`` as ``samples1`` to skip that pass entirely,
    e.g. when the same model serves many solves: odometry reuses the
    previous frame's samples, keyframe mode the keyframe's).

    Two modes (``cfg.dnn_in_loop``):

    - **In-loop (reference semantics, default)** — per ICET_spherical.py:
      288-390 the filter runs INSIDE the runlen loop at every iteration
      ``i >= start_filter_iter``: correspondences from the current
      cumulative estimate -> fresh reject mask -> masked WLS update of X,
      repeated.  Expressed here as ``dnn_start_iter`` plain iterations
      followed by a ``lax.scan`` whose every step recomputes the mask from
      the current X and runs one masked iteration.
    - **One-shot** — a single rejection at the phase boundary, then the
      remaining iterations run with the fixed mask.  ~(n_post-1) fewer
      bias-net forwards; equivalence on static scenes is asserted by
      tests/test_models.py.
    """
    # Total iterations stay within cfg.n_iters (the reference runs the DNN
    # filter inside the same runlen loop): the pre-filter phase is clamped
    # to n_iters - 1 so pre + post == n_iters.  With n_iters == 1 there is
    # no budget for a filtered phase — solve once, report the mask.
    if cfg.n_iters < 2:
        pre = register(model, scan2, x0, cfg.replace(n_iters=1),
                       want_static_mask=want_static_mask)
        aligned = transform_points(scan2, pre.X)
        filt = dnn_reject_mask(bias_net, params, model, scan1, aligned, cfg,
                               samples1=samples1)
        return pre, filt
    n_pre = max(min(cfg.dnn_start_iter, cfg.n_iters - 1), 1)
    n_post = cfg.n_iters - n_pre

    # Phase boundaries carry the GLOBAL iteration index via it_offset so
    # iteration-indexed schedules (moving-object rejection at
    # rm_start_iter) keep running through the filtered phase — a phase
    # restart at it=0 would silently deactivate them.
    pre = register(model, scan2, x0, cfg.replace(n_iters=n_pre),
                   want_static_mask=False)

    if not cfg.dnn_in_loop:
        aligned = transform_points(scan2, pre.X)
        filt = dnn_reject_mask(bias_net, params, model, scan1, aligned, cfg,
                               samples1=samples1)
        post = register(
            model, scan2, pre.X, cfg.replace(n_iters=n_post),
            corr_mask=filt.keep, want_static_mask=want_static_mask,
            it_offset=n_pre,
        )
        return post, filt

    step_cfg = cfg.replace(n_iters=1, convergence_tol=0.0)
    # Scan 1's per-voxel samples are invariant across the filtered
    # iterations — one sort+gather pass instead of n_post (or zero when
    # the caller already holds them).
    s1 = samples1 if samples1 is not None else model_voxel_samples(
        model, scan1, cfg
    )

    def body(X, k):
        aligned = transform_points(scan2, X)
        filt = dnn_reject_mask(bias_net, params, model, scan1, aligned, cfg,
                               samples1=s1)
        res = register(model, scan2, X, step_cfg, corr_mask=filt.keep,
                       want_static_mask=False, it_offset=n_pre + k)
        return res.X, None

    X_mid = pre.X
    if n_post > 1:
        X_mid, _ = jax.lax.scan(body, pre.X, jnp.arange(n_post - 1))
    # Final filtered iteration UNROLLED as a full register call: its result
    # carries the converged estimate, covariance, and — when requested —
    # the solver's own static mask (correspondences ∧ moving-object keep ∧
    # this mask), identical semantics to the one-shot mode's last phase.
    aligned = transform_points(scan2, X_mid)
    filt = dnn_reject_mask(bias_net, params, model, scan1, aligned, cfg,
                           samples1=s1)
    res = register(
        model, scan2, X_mid, step_cfg, corr_mask=filt.keep,
        want_static_mask=want_static_mask, it_offset=cfg.n_iters - 1,
    )
    return res, filt


@functools.partial(jax.jit, static_argnums=(3, 4))
def register_pair_with_dnn(
    scan1: jax.Array,
    scan2: jax.Array,
    x0: jax.Array,
    cfg: ICETConfig,
    bias_net: BiasNet,
    params,
) -> tuple[RegistrationResult, DnnFilterResult]:
    """Pair-level entry: fit scan1's model, then register with the filter."""
    model = prepare_reference(scan1, cfg)
    return register_with_dnn(model, scan1, scan2, x0, cfg, bias_net, params)


@functools.partial(jax.jit, static_argnums=(2,))
def model_voxel_samples_jit(
    model: VoxelModel, scan: jax.Array, cfg: ICETConfig
):
    return model_voxel_samples(model, scan, cfg)


@functools.partial(jax.jit, static_argnums=(5, 6))
def odometry_step_dnn_jit(
    model: VoxelModel,
    prev_scan: jax.Array,
    prev_samples: tuple,
    scan: jax.Array,
    x0: jax.Array,
    cfg: ICETConfig,
    bias_net: BiasNet,
    params,
) -> tuple[RegistrationResult, VoxelModel, tuple]:
    """DNN-filtered twin of ``solver.odometry_step_jit``: register the new
    scan against the previous frame's model WITH the perspective-shift
    filter, and fit the new scan's own model + per-voxel samples for the
    NEXT frame — still one dispatch, and the reference cloud's sampling
    pass is paid once per frame instead of once per solve."""
    res, _filt = register_with_dnn(
        model, prev_scan, scan, x0, cfg, bias_net, params,
        want_static_mask=False, samples1=prev_samples,
    )
    new_model = prepare_reference(scan, cfg)
    new_samples = model_voxel_samples(new_model, scan, cfg)
    return res, new_model, new_samples
