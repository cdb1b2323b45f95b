"""Training data for the perspective-shift bias network.

Two sources:

* Synthetic planar patches (bias_net.make_patch_batch) — fast, fully on
  device, covers the translation-regression core.
* Raycast voxel pairs (here) — ecologically valid: two simulated lidar scans
  of the same scene from DIFFERENT sensor poses are voxelised with the real
  solver pipeline, so the samples carry genuine perspective-shift support
  changes (the effect the filter must see through), plus a known injected
  translation as the regression target.  This replaces the reference's
  KITTI-derived training set (its trained weights are stripped from its
  repo).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from icet_tpu.config import ICETConfig
from icet_tpu.datasets.synthetic import scan_pair_with_ground_truth
from icet_tpu.filters import sample_voxel_points
from icet_tpu.models.bias_net import pack_voxel_samples
from icet_tpu.ops.clustering import membership
from icet_tpu.ops.geometry import cart_to_spherical, transform_points
from icet_tpu.ops.grid import voxel_ids


def _voxel_samples(points, model, cfg, n_samples):
    rtp = cart_to_spherical(points)
    vid = voxel_ids(rtp, cfg)
    member = membership(
        vid, rtp[..., 0], rtp[..., 0] >= cfg.min_range, model.bounds,
        cfg.n_voxels,
    )
    return sample_voxel_points(points, vid, member, cfg.n_voxels, n_samples)


def make_raycast_voxel_pairs(
    n_pairs: int = 6,
    samples_per_voxel: int = 100,
    min_pts: int = 30,
    seed: int = 0,
    cfg: ICETConfig | None = None,
):
    """Build (sample1, sample2) voxel pairs with REAL perspective shift.

    Returns (s1 (B, S, 3), s2 (B, S, 3)) numpy arrays of aligned voxel point
    samples drawn from two different sensor poses of the same scene.  Any
    residual translation between them is ~0 (alignment uses the exact ground
    truth), so callers inject their own regression targets.
    """
    from icet_tpu.solver import prepare_reference_jit

    cfg = cfg or ICETConfig(
        n_theta=48, n_phi=16, phi_min=np.pi / 3, phi_max=2 * np.pi / 3,
        min_pts=20, min_range=1.0, moment_method="segsum",
    )
    rng = np.random.default_rng(seed)
    all1, all2 = [], []
    for k in range(n_pairs):
        X_true = np.concatenate(
            [rng.uniform(-0.5, 0.5, 3), rng.uniform(-0.02, 0.02, 3)]
        ).astype(np.float32)
        scan1, scan2 = scan_pair_with_ground_truth(X_true, seed=seed + 17 * k)
        s1d = jnp.asarray(scan1)
        s2d = transform_points(jnp.asarray(scan2), jnp.asarray(X_true))
        model = prepare_reference_jit(s1d, cfg)
        s1, n1 = _voxel_samples(s1d, model, cfg, samples_per_voxel)
        s2, n2 = _voxel_samples(s2d, model, cfg, samples_per_voxel)
        ok = np.asarray(
            model.valid & (n1 >= min_pts) & (n2 >= min_pts)
        )
        all1.append(np.asarray(s1)[ok])
        all2.append(np.asarray(s2)[ok])
    return np.concatenate(all1), np.concatenate(all2)


def make_real_pair_voxel_samples(
    scan1: np.ndarray,
    scan2: np.ndarray,
    X_true: np.ndarray,
    cfg: ICETConfig,
    samples_per_voxel: int = 100,
    min_pts: int = 30,
):
    """Distillation samples from a REAL scan pair with a known transform.

    Aligns scan 2 by ``X_true`` (e.g. the golden solution for the bundled
    Ouster frames) and extracts per-voxel sample pairs exactly like
    :func:`make_raycast_voxel_pairs` — any residual per-voxel mean offset
    after TRUE alignment is genuine perspective-shift bias, the signal the
    filter compares against.  Returns (s1 (B, S, 3), s2 (B, S, 3)); feed to
    :func:`raycast_batch_iter` alongside the raycast pairs to mix real
    sensor statistics (beam dropout, range noise, real surfaces) into
    training.
    """
    from icet_tpu.solver import prepare_reference_jit

    s1d = jnp.asarray(np.asarray(scan1, np.float32))
    s2d = transform_points(
        jnp.asarray(np.asarray(scan2, np.float32)),
        jnp.asarray(np.asarray(X_true, np.float32)),
    )
    model = prepare_reference_jit(s1d, cfg)
    s1, n1 = _voxel_samples(s1d, model, cfg, samples_per_voxel)
    s2, n2 = _voxel_samples(s2d, model, cfg, samples_per_voxel)
    ok = np.asarray(model.valid & (n1 >= min_pts) & (n2 >= min_pts))
    return np.asarray(s1)[ok], np.asarray(s2)[ok]


def raycast_batch_iter(s1, s2, key, batch: int = 256, shift_scale: float = 0.3):
    """Infinite iterator of (inputs, targets) from pre-built voxel pairs:
    each batch resamples voxels and injects a fresh known translation."""
    n = s1.shape[0]
    s1 = jnp.asarray(s1)
    s2 = jnp.asarray(s2)
    while True:
        key, k1, k2 = jax.random.split(key, 3)
        idx = jax.random.randint(k1, (batch,), 0, n)
        d = jax.random.uniform(k2, (batch, 3), minval=-shift_scale, maxval=shift_scale)
        a = s1[idx]
        b = s2[idx] + d[:, None, :]
        yield pack_voxel_samples(a, b), d


def train_bias_net_mixed(
    steps: int = 1200,
    batch: int = 256,
    sample_pts: int = 100,
    lr: float = 1e-3,
    seed: int = 0,
    n_pairs: int = 6,
    extra_pairs=None,
):
    """Train on a 50/50 mix of synthetic patches and raycast voxel pairs.

    ``extra_pairs``: optional (s1, s2) voxel-sample arrays appended to the
    raycast pool — e.g. :func:`make_real_pair_voxel_samples` output from
    real sensor pairs (distillation of real beam statistics).
    """
    from icet_tpu.models.bias_net import (
        create_train_state,
        make_patch_batch,
        train_step,
    )

    key = jax.random.PRNGKey(seed)
    k0, key = jax.random.split(key)
    model, tx, state = create_train_state(k0, lr, sample_pts)
    s1, s2 = make_raycast_voxel_pairs(
        n_pairs=n_pairs, samples_per_voxel=sample_pts, seed=seed
    )
    if extra_pairs is not None:
        s1 = np.concatenate([s1, np.asarray(extra_pairs[0], np.float32)])
        s2 = np.concatenate([s2, np.asarray(extra_pairs[1], np.float32)])
    key, kr = jax.random.split(key)
    ray_iter = raycast_batch_iter(s1, s2, kr, batch)
    losses = []
    for i in range(steps):
        if i % 2 == 0:
            inputs, targets = next(ray_iter)
        else:
            key, kp = jax.random.split(key)
            inputs, targets = make_patch_batch(kp, batch, sample_pts)
        state, loss = train_step(model, tx, state, inputs, targets)
        losses.append(float(loss))
    return model, state.params, losses, (s1, s2)
