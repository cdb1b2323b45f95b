"""Configuration for the ICET-TPU registration engine.

The reference (mcdermatt/ICET) has no config system: every knob is a hard-coded
constant scattered across C++ and Python, with commented-out alternates as the
de-facto configuration mechanism (see reference src/icet.h:31-34,
src/simpleMapMaker.cpp:64-66, python/ICET_spherical.py:27-38).  This module
centralises all of them as frozen (hashable) dataclasses so they can be passed
as static arguments to jitted functions.

Canonical default values follow the C++ runtime configuration used for the
published 35 ms baseline (reference src/odometry.cpp:73-76 and
src/simpleMapMaker.cpp:113-118): 75 azimuth x 24 elevation voxels, 25 min
points per voxel, cluster gap thresh 0.1 m, bounds buffer 0.1 m, 7 iterations.

Where the reference's C++ and Python disagree, the choice and the discrepancy
are documented on the field.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class ICETConfig:
    """Static configuration for one registration solve.

    Instances are hashable and are meant to be passed as `static_argnums`
    arguments to jitted entry points; changing any field triggers a recompile.
    """

    # ---- spherical voxel grid ------------------------------------------------
    #: number of azimuthal bins over [0, 2*pi)  (reference: 75)
    n_theta: int = 75
    #: number of elevation bins over [phi_min, phi_max]  (reference: 24)
    n_phi: int = 24
    #: elevation band.  The C++ reference bins the full sphere [0, pi]
    #: (src/icet.cpp:138-139); the Python reference restricts to
    #: [3*pi/8, 7*pi/8] (python/ICET_spherical.py:101-102).  Full sphere is the
    #: default; sensor profiles may restrict the band.
    phi_min: float = 0.0
    phi_max: float = math.pi

    # ---- radial voxelization mode -------------------------------------------
    #: "adaptive": per-spike radial clustering (the ICET shadow-mitigation
    #: voxel, reference findCluster / get_cluster_fast) — the default.
    #: "fixed": regular radial shells with geometric spacing (the reference's
    #: grid_spherical NDT-style grid, ICET_spherical.py:1206-1234, used by its
    #: dead "group=1" path) — one voxel per (shell, theta, phi).
    radial_mode: str = "adaptive"
    #: number of radial shells in "fixed" mode (reference fid_r = fid)
    n_shells: int = 50

    # ---- radial clustering (shadow-mitigation voxels) -----------------------
    #: minimum points for a radial run to count as a cluster, and for a voxel
    #: to participate in the solve (reference n=25, src/odometry.cpp:75)
    min_pts: int = 25
    #: max radial gap between consecutive sorted points within one cluster
    #: (reference thresh=0.1, src/icet.cpp:557-607)
    cluster_gap: float = 0.1
    #: radial padding added on both sides of the detected cluster
    #: (reference buff=0.1, src/icet.cpp:579-580)
    cluster_buffer: float = 0.1

    # ---- point / voxel validity gates ---------------------------------------
    #: drop points closer than this to the sensor (reference: 0.2 m for
    #: mapping, simpleMapMaker.cpp:98-110; 2.0 m for odometry, odometry.cpp:58)
    min_range: float = 0.2
    #: voxels whose outer cluster bound is below this are suppressed
    #: (reference uses 0.1 in fitCells1 at icet.cpp:158 and 1.0 in fitCells2 at
    #: icet.cpp:290; we use one gate)
    min_outer_range: float = 0.1

    # ---- solver -------------------------------------------------------------
    #: number of Gauss-Newton iterations (reference runlen: 7 odometry /
    #: 12 mapping)
    n_iters: int = 7
    #: early-exit tolerance on the GN step norm |dx|: iterations stop once
    #: |dx| falls below this (n_iters remains the hard cap).  0 disables the
    #: check and always runs exactly n_iters — the reference's fixed-runlen
    #: semantics (src/icet.cpp:55-63 has no convergence test).  Measured on
    #: the bundled frames at 1e-4: the solve is identical to fixed-runlen to
    #: < 1e-4 per component, cold starts converge in 4 iterations and
    #: warm-started odometry steps in 1-2 (vs always paying 7).
    convergence_tol: float = 0.0
    #: statistical early exit: additionally stop once the GN step norm falls
    #: below this multiple of the predicted solution standard-error norm
    #: ``|pred_stds|`` (the solver's own error estimate, reference
    #: icet.cpp:410-417).  Iterating further refines the estimate below its
    #: own noise floor — measured on the city drive the skipped iterations'
    #: corrections are < 0.5 sigma and the trajectory ATE is unchanged while
    #: mean iterations drop from ~2.3 to ~1.2.  0 disables (default; the
    #: reference has no convergence test at all).
    convergence_stat_scale: float = 0.0
    #: scale (in sigma) for the extended-surface endpoint test.  C++ uses 2.0
    #: (icet.cpp:191), Python uses 3.0 (ICET_spherical.py:541).  Default 2.0.
    sigma_scale: float = 2.0
    #: extended-surface suppression mode.  "endpoint" (default): the sigma
    #: endpoint test used by both reference main paths (icet.cpp:186-233 /
    #: ICET_spherical.py:522-585).  "ndt": the legacy eigenvalue-threshold
    #: test of the reference's get_U_and_L(method=0) "NDT override"
    #: (ICET_spherical.py:682-716) — axis k is pruned when any Cartesian
    #: component of |u_k| * lambda_k exceeds the voxel's radial width
    #: squared.  In "fixed" radial mode the width is the shell width, exactly
    #: the reference's diff(unique grid r); in adaptive mode the voxel's own
    #: cluster-bound width is the natural analog (documented deviation — the
    #: legacy reference path only ran on the fixed grid).
    suppression: str = "endpoint"
    #: condition-number cutoff for global axis pruning.  C++ uses 1e6
    #: (icet.cpp:453), Python 1e7 (ICET_spherical.py:783).  Default 1e6.
    condition_cutoff: float = 1e6
    #: relative eigenvalue floor used in pseudo-inverses
    pinv_rcond: float = 1e-7
    #: clip-fill suppression guard (0 disables; capability BEYOND the
    #: reference).  The endpoint test compares the +-s*sigma excursion
    #: against the voxel's actual bounds, which the points fill by
    #: construction — at grazing incidence an along-surface axis is
    #: near-RADIAL, its run bounds are exactly the surface's own extent,
    #: and the false grid-clipped constraint survives (measured: a
    #: corridor scene solves the unobservable along-track axis to "0 +- 4
    #: mm" while truly off by the full motion; see
    #: tests/test_montecarlo.py corridor cases).  With clip_fill = f > 0,
    #: axis k of a voxel is ALSO pruned when ``sigma_scale * sqrt(lam_k)``
    #: exceeds ``f/2 x`` the cell's extent along that axis (L1 box bound in
    #: the local spherical frame) — i.e. when the distribution is clipped
    #: by the cell rather than ending inside it, regardless of bounds
    #: slack.  0.7 is the validated setting (uniform fill scores ~1.15,
    #: 3D-compact features < 0.4).
    clip_fill: float = 0.0
    #: 1-sigma per-scan COMMON-MODE range error in metres (0 disables;
    #: capability beyond the reference).  Per-revolution calibration
    #: jitter shifts every return radially by the same delta; the solve
    #: absorbs it as pose error that residual statistics cannot see (the
    #: Monte-Carlo suite measures 6-12x pred_stds understatement at 2 cm
    #: jitter).  When set, register() computes the pose sensitivity
    #: v = dX/d(delta) from the final normal equations and reports
    #: ``Q += 2 * range_sigma^2 * v v^T`` (both scans jitter
    #: independently), restoring consistency for pose-graph weighting.
    range_sigma: float = 0.0

    # ---- moving-object rejection (reference ICET_spherical.py:175-285) ------
    remove_moving: bool = False
    #: first iteration at which rejection runs (reference start_RM_iter=4)
    rm_start_iter: int = 4
    #: compact-residual cutoff in metres (reference RM_thresh=0.3)
    rm_residual_thresh: float = 0.3
    #: per-voxel covariance-yaw change cutoff in radians (reference 0.1,
    #: ICET_spherical.py:267)
    rm_yaw_thresh: float = 0.1

    # ---- DNN perspective-shift filter (reference ICET_spherical.py:288-390) -
    dnn_filter: bool = False
    #: first iteration at which the DNN filter runs (reference
    #: start_filter_iter=7)
    dnn_start_iter: int = 7
    #: ICET-vs-DNN disagreement cutoff (reference DNN_thresh=0.05)
    dnn_thresh: float = 0.05
    #: points sampled per scan per voxel for the DNN input (reference 100)
    dnn_sample_pts: int = 100
    #: refinement passes of the bias network per rejection: the running
    #: shift estimate re-centres sample 1 and the net re-predicts
    #: (reference ICET_spherical.py:324-336 hard-codes 2).  Each pass costs
    #: one encoder forward (~0.95 ms at V=1801, S=100 on the v5e).
    #: Default 1 — a DOCUMENTED deviation: on the fence-occlusion efficacy
    #: benchmark (tests/test_dnn_filter.py, seeds 11/23/42) one pass
    #: already rejects the bias (0.69/0.03/0.23 mm vs 1.25/0.47/0.70
    #: unfiltered) and the second pass's change is within seed noise
    #: (0.52/0.17/0.22 mm) while costing a full extra forward.  Set 2 for
    #: exact reference semantics.
    dnn_refine_steps: int = 1
    #: True = reference semantics: the filter mask is recomputed from the
    #: CURRENT cumulative estimate before every iteration past
    #: dnn_start_iter, inside the solve loop (ICET_spherical.py:288-390).
    #: False = one cheaper rejection at the dnn_start_iter phase boundary.
    dnn_in_loop: bool = True

    # ---- implementation knobs (no reference equivalent) ---------------------
    #: moment accumulation strategy: "segsum" (XLA scatter-add segment_sum),
    #: "onehot" (blocked one-hot matmul riding the MXU), or "auto"
    moment_method: str = "auto"
    #: point-block size for the "onehot" accumulator
    moment_block: int = 1024

    @property
    def n_voxels(self) -> int:
        if self.radial_mode == "fixed":
            return self.n_shells * self.n_theta * self.n_phi
        return self.n_theta * self.n_phi

    @property
    def n_angular(self) -> int:
        """Voxels per radial shell (= all voxels in adaptive mode)."""
        return self.n_theta * self.n_phi

    @property
    def shell_growth(self) -> float:
        """Geometric shell spacing factor making cells ~cubic (reference
        ICET_spherical.py:1230: r_new = r_last * (1 + atan(2*pi/fid_theta)))."""
        return 1.0 + math.atan(2.0 * math.pi / self.n_theta)

    def replace(self, **kw) -> "ICETConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class OdometryConfig:
    """Frame-loop configuration (reference src/odometry.cpp:22-212)."""

    #: warm-start each solve with the previous solution
    #: (reference odometry.cpp:82)
    warm_start: bool = True
    #: warm-start seed construction: "previous" = the previous frame's
    #: solution verbatim (reference odometry.cpp:82 — a constant-velocity
    #: assumption); "extrapolate" = constant-ACCELERATION prediction from
    #: the last two frame deltas, ``D_k ∘ (D_{k-1}⁻¹ ∘ D_k)``, which on
    #: smooth segments starts the solve closer and cuts iterations (no
    #: reference equivalent).  Ignored when ``warm_start`` is False.
    warm_start_mode: str = "previous"
    #: zero the transform if any component exceeds this (divergence guard,
    #: reference simpleMapMaker.cpp:129-137)
    divergence_clamp: float = 0.3
    #: assumed sensor rate, used for twist scaling
    #: (reference odometry.cpp:134-140)
    sensor_hz: float = 10.0


@dataclasses.dataclass(frozen=True)
class MapConfig:
    """HD-map accumulator configuration (reference src/simpleMapMaker.cpp)."""

    #: fixed map capacity in points (reference EigenQueue 600k,
    #: simpleMapMaker.cpp:62)
    capacity: int = 600_000
    #: points retained per scan on insert (reference 2000,
    #: simpleMapMaker.cpp:150-160)
    points_per_scan: int = 2_000


@dataclasses.dataclass(frozen=True)
class KeyframeConfig:
    """Keyframe odometry (scan-to-keyframe registration).

    The reference registers every scan against the immediately previous one
    (odometry.cpp:73-82), so drift compounds per frame and every frame pays a
    full scan-1 fit.  Registering against a held KEYFRAME until the sensor
    moves too far (a) removes per-frame drift compounding within the keyframe
    window and (b) amortizes the prepare stage over the keyframe lifetime.
    """

    #: spawn policy.  "auto" (default): spawn on observable solve health —
    #: predicted-error growth versus the keyframe's first solve
    #: (``stds_growth``), correspondence-count drop
    #: (``min_corr_fraction``), windowed-moments overflow approaching the
    #: spill capacity (``ovf_spawn``; predicts the 2x fallback path), or
    #: divergence — with ``spawn_distance``/``spawn_angle`` as loose
    #: backstops.  "fixed": distance/angle/corr-drop/divergence only (the
    #: hand-tuned pre-round-5 policy; its optimum flips with scene scale —
    #: RESULTS.md).
    spawn: str = "auto"
    #: ("auto") spawn when sqrt(sum(pred_stds^2)) of the keyframe-relative
    #: solve exceeds this multiple of the value right after the keyframe
    #: was spawned — conditioning degradation measured by the solver
    #: itself, scale-free where the distance trigger is not
    stds_growth: float = 2.5
    #: ("auto") spawn when the final iteration's windowed-moments overflow
    #: exceeds this many points — i.e. as soon as keyframe-baseline
    #: parallax pushes real work onto the bounded spill path (capacity
    #: 8192; crossing THAT silently demotes every iteration to the 2x
    #: segsum fallback).  Chip-measured on the bench drive
    #: (tools/bench_kf_spawnperf.py): 512 cuts keyframe_frame_ms
    #: 1.94 -> 1.72-1.81 vs the distance-only policy's 1.96, with a
    #: plateau below it (128/32 within noise).  Only nonzero on the TPU
    #: windowed path — CPU runs never trigger it (their spill diag is 0),
    #: so CPU trajectories are unchanged.
    ovf_spawn: int = 512
    #: spawn a new keyframe when the translation from the current one
    #: exceeds this (metres)
    spawn_distance: float = 2.0
    #: ... or when any Euler angle from it exceeds this (radians)
    spawn_angle: float = 0.25
    #: ... or when the solver's final correspondence count falls below this
    #: fraction of the count right after the keyframe was spawned
    min_corr_fraction: float = 0.35
    #: divergence guard on the per-frame DELTA (the keyframe-relative X can
    #: be legitimately large; the frame-to-frame step cannot) — analog of the
    #: reference's 0.3 clamp (simpleMapMaker.cpp:129-137)
    delta_clamp: float = 0.3


@dataclasses.dataclass(frozen=True)
class BlockMapConfig:
    """Keyframe block map (city-scale redesign of the reference's single
    600k-point ring, simpleMapMaker.cpp:18-62).

    Points are stored per keyframe BLOCK in that keyframe's own frame; only
    the 6-DOF block poses move when the trajectory is refined, so map upkeep
    is O(1) per frame instead of the reference's O(map) re-expression, and
    the block axis shards cleanly across devices.
    """

    #: number of keyframe blocks held (oldest evicted ring-wise beyond this)
    n_blocks: int = 64
    #: point capacity per block
    block_capacity: int = 16_384
    #: points inserted per scan (range-gated random downsample)
    points_per_scan: int = 1_000


# Canonical sensor / application profiles, replacing the reference's
# commented-out alternates.
PROFILES = {
    # 64-channel outdoor lidar, mapping node defaults
    # (simpleMapMaker.cpp:113-119)
    "mapping": ICETConfig(n_iters=12, min_range=0.2),
    # odometry node defaults (odometry.cpp:58,73-76); early exit on
    # convergence — warm-started steady-state frames solve in 1-2 iterations.
    # The statistical exit (stop once the step is < 1 sigma of the predicted
    # solution error) cuts mean iterations ~2.3 -> ~1.7 at unchanged
    # trajectory ATE (city drive: 1.080 -> 1.083 cm).
    "odometry": ICETConfig(
        n_iters=7, min_range=2.0, convergence_tol=1e-4,
        convergence_stat_scale=1.0,
    ),
    # Degeneracy-guarded odometry for tunnel/corridor/open-field regimes:
    # the clip-fill suppression guard + a tightened condition cutoff make
    # weakly-observed directions flag as unobservable (pred_stds inflate
    # to ~1) instead of being pinned by grid artifacts with mm-scale
    # claimed precision — Monte-Carlo-validated in
    # tests/test_montecarlo.py (corridor cases); solve-level neutral on
    # the clean fixture, but costs a few cm on rich dynamic drives
    # (flagship: odometry ATE 33.4 vs 28.7 plain — RESULTS.md), which is
    # why it is a PROFILE and the base defaults stay at reference parity.
    "odometry_guarded": ICETConfig(
        n_iters=7, min_range=2.0, convergence_tol=1e-4,
        convergence_stat_scale=1.0, clip_fill=0.6, condition_cutoff=1e4,
    ),
    # Python-notebook configuration (fid=50) used by the bundled sample clouds
    # (python/ICET_demo.ipynb, grid at ICET_spherical.py:1206-1234)
    "notebook": ICETConfig(
        n_theta=50,
        n_phi=15,
        phi_min=3 * math.pi / 8,
        phi_max=7 * math.pi / 8,
        n_iters=5,
        cluster_gap=0.5,
        cluster_buffer=0.1,
        min_range=0.2,
        sigma_scale=3.0,
        condition_cutoff=1e7,
        # The demo notebook runs moving-object rejection ON
        # (ICET_demo.ipynb: is_remove_moving=True; ctor default RM=True,
        # start_RM_iter=4, RM_thresh=0.3 — ICET_spherical.py:22,37-38).
        remove_moving=True,
    ),
}
