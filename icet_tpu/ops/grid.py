"""Spherical voxel grid: dense fixed-shape binning.

The reference keeps per-voxel state in nested ``std::map``s keyed by
(theta, phi) bin (src/icet.h:27-29) or ragged tensors keyed by "occupied
spikes" (python/ICET_spherical.py:119-126).  The TPU-native form is a dense
``[V]`` array over ALL voxels with validity masks — static shapes, no
occupancy bookkeeping, scatter/gather by a flat voxel id.

Voxel id layout matches the C++ reference's ``numBinsTheta * phi + theta``
row-major layout (src/icet.cpp:149).  Points outside the elevation band or
below the range gate get the sentinel id ``V`` (one extra padding row on all
voxel tables).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from icet_tpu.config import ICETConfig
from icet_tpu.ops.geometry import TWO_PI, spherical_to_cart


def voxel_ids(rtp: jax.Array, cfg: ICETConfig) -> jax.Array:
    """Flat voxel id for each spherical point ``(..., 3) -> (...,) int32``.

    Binning follows reference src/icet.cpp:534-554: uniform angular bins,
    ``binTheta = floor(theta / 2pi * n_theta)``, ``binPhi`` over the
    configured elevation band.  In "fixed" radial mode the id additionally
    carries a geometric radial-shell index
    (``vid = shell * n_angular + iphi * n_theta + itheta``).  Out-of-band /
    out-of-range points map to the sentinel id ``cfg.n_voxels``.
    """
    r, theta, phi = rtp[..., 0], rtp[..., 1], rtp[..., 2]
    itheta = jnp.clip(
        (theta / TWO_PI * cfg.n_theta).astype(jnp.int32), 0, cfg.n_theta - 1
    )
    phi_span = cfg.phi_max - cfg.phi_min
    fphi = (phi - cfg.phi_min) / phi_span * cfg.n_phi
    iphi = jnp.floor(fphi).astype(jnp.int32)
    in_band = (iphi >= 0) & (iphi < cfg.n_phi) & (r >= cfg.min_range)
    vid = iphi * cfg.n_theta + itheta
    if cfg.radial_mode == "fixed":
        g = cfg.shell_growth
        safe_r = jnp.maximum(r, cfg.min_range)
        shell = jnp.floor(
            jnp.log(safe_r / cfg.min_range) / np.log(g)
        ).astype(jnp.int32)
        in_band = in_band & (shell >= 0) & (shell < cfg.n_shells)
        shell = jnp.clip(shell, 0, cfg.n_shells - 1)
        vid = shell * cfg.n_angular + vid
    return jnp.where(in_band, vid, cfg.n_voxels).astype(jnp.int32)


def shell_edges(cfg: ICETConfig) -> jax.Array:
    """Radial shell edges (n_shells + 1,) for "fixed" mode (reference
    grid_spherical geometric spacing, ICET_spherical.py:1226-1234)."""
    k = np.arange(cfg.n_shells + 1, dtype=np.float64)
    return jnp.asarray(cfg.min_range * cfg.shell_growth**k, jnp.float32)


def fixed_shell_bounds(cfg: ICETConfig) -> jax.Array:
    """(V+1, 2) radial bounds table for "fixed" mode: every voxel spans its
    shell; sentinel row zero."""
    edges = shell_edges(cfg)
    inner = jnp.repeat(edges[:-1], cfg.n_angular)
    outer = jnp.repeat(edges[1:], cfg.n_angular)
    bounds = jnp.stack([inner, outer], axis=-1)
    return jnp.concatenate(
        [bounds, jnp.zeros((1, 2), bounds.dtype)], axis=0
    )


def voxel_angle_centers(cfg: ICETConfig):
    """Bin-center (theta, phi) for every voxel id, each shape ``(V,)``.

    In fixed radial mode the angular pattern repeats per shell
    (``vid % n_angular`` recovers the angular bin).
    """
    ang = jnp.arange(cfg.n_voxels, dtype=jnp.int32) % cfg.n_angular
    itheta = ang % cfg.n_theta
    iphi = ang // cfg.n_theta
    theta_c = (itheta.astype(jnp.float32) + 0.5) / cfg.n_theta * TWO_PI
    phi_span = cfg.phi_max - cfg.phi_min
    phi_c = cfg.phi_min + (iphi.astype(jnp.float32) + 0.5) / cfg.n_phi * phi_span
    return theta_c, phi_c


def voxel_anchors(bounds: jax.Array, cfg: ICETConfig) -> jax.Array:
    """Cartesian anchor point per voxel ``(V+1, 3)`` (sentinel row = 0).

    Anchors sit at the radial midpoint of the cluster bounds on the voxel's
    angular bin center.  They are subtracted from points before moment
    accumulation so single-pass f32 covariance sums do not lose precision to
    catastrophic cancellation (no reference equivalent; the reference uses
    Eigen's two-pass f32 math per voxel, icet.cpp:160-162).
    """
    theta_c, phi_c = voxel_angle_centers(cfg)
    r_mid = 0.5 * (bounds[: cfg.n_voxels, 0] + bounds[: cfg.n_voxels, 1])
    rtp = jnp.stack([r_mid, theta_c, phi_c], axis=-1)
    anchors = spherical_to_cart(rtp)
    anchors = jnp.concatenate(
        [anchors, jnp.zeros((1, 3), dtype=anchors.dtype)], axis=0
    )
    # Round to bf16 so the fused Pallas accumulator (which fetches anchors
    # through a bf16 one-hot matmul) subtracts bit-identical values.
    return anchors.astype(jnp.bfloat16).astype(jnp.float32)


def voxel_corners(bounds: jax.Array, cfg: ICETConfig) -> jax.Array:
    """Spherical-space corner coordinates ``(V, 8, 3)`` of each voxel frustum.

    Visualization/export analog of reference get_corners_cluster
    (ICET_spherical.py:864-882).
    """
    ang = jnp.arange(cfg.n_voxels, dtype=jnp.int32) % cfg.n_angular
    itheta = (ang % cfg.n_theta).astype(jnp.float32)
    iphi = (ang // cfg.n_theta).astype(jnp.float32)
    th0 = itheta / cfg.n_theta * TWO_PI
    th1 = (itheta + 1.0) / cfg.n_theta * TWO_PI
    phi_span = cfg.phi_max - cfg.phi_min
    ph0 = cfg.phi_min + iphi / cfg.n_phi * phi_span
    ph1 = cfg.phi_min + (iphi + 1.0) / cfg.n_phi * phi_span
    r0 = bounds[: cfg.n_voxels, 0]
    r1 = bounds[: cfg.n_voxels, 1]
    corners = []
    for r in (r0, r1):
        for th in (th0, th1):
            for ph in (ph0, ph1):
                corners.append(jnp.stack([r, th, ph], axis=-1))
    return jnp.stack(corners, axis=1)
