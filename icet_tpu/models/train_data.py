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


def training_scene(rng) -> "Scene":
    """A randomized scene for bias-net training, drawn from a zoo that
    includes the geometry the filter must see through:

    - plain box fields (the original regime);
    - picket fences before a far wall — the coherent occlusion-shadow
      case: between-pillar wall patches slide at the occlusion lever
      ratio, so a net trained only on full-support voxels would report
      the slide as motion (tests/test_dnn_filter.py measures exactly this
      scenario at solve level);
    - near-wall corridors (large baseline / close structure).
    """
    from icet_tpu.datasets.synthetic import Scene

    kind = rng.integers(0, 4)
    if kind == 3:  # the original default scene (keeps the old regime mixed in)
        return Scene()
    if kind == 0:  # box field
        boxes = []
        for _ in range(rng.integers(6, 14)):
            cx, cy = rng.uniform(-18, 18, 2)
            if abs(cx) < 2.5 and abs(cy) < 2.5:
                continue
            w, d, h = rng.uniform(0.8, 3.5, 3)
            boxes.append((cx - w / 2, cx + w / 2, cy - d / 2, cy + d / 2,
                          -2.0, -2.0 + 2 * h))
        return Scene(boxes=tuple(boxes))
    if kind == 1:  # picket fence + far wall
        fx = rng.uniform(5.0, 10.0)
        wall = rng.uniform(30.0, 70.0)
        pitch = rng.uniform(1.0, 2.5)
        half_w = rng.uniform(0.15, 0.4)
        pillars = tuple(
            (fx - 0.2, fx + 0.2, y - half_w, y + half_w, -2.0, 5.0)
            for y in np.arange(-14.0, 14.01, pitch)
        )
        extra = ((-6.0, -4.0, -6.0, -4.0, -2.0, 2.0),
                 (-10.0, -8.0, 5.0, 7.0, -2.0, 3.0))
        return Scene(
            walls=((0, wall, -1), (0, -30.0, 1), (1, 25.0, -1),
                   (1, -25.0, 1)),
            boxes=pillars + extra,
        )
    # near-wall corridor
    wy = rng.uniform(1.5, 3.5)
    return Scene(
        walls=((1, wy, -1), (1, -rng.uniform(3.0, 25.0), 1),
               (0, 30.0, -1), (0, -30.0, 1)),
        boxes=(
            (6.0, 8.0, -8.0, -6.0, -2.0, 3.0),
            (-9.0, -7.0, -7.0, -5.0, -2.0, 2.0),
            (12.0, 14.0, -12.0, -10.0, -2.0, 4.0),
        ),
    )


def make_raycast_voxel_pairs(
    n_pairs: int = 6,
    samples_per_voxel: int = 100,
    min_pts: int = 30,
    seed: int = 0,
    cfg: ICETConfig | None = None,
    scene_zoo: bool = True,
):
    """Build (sample1, sample2) voxel pairs with REAL perspective shift.

    Returns (s1 (B, S, 3), s2 (B, S, 3)) numpy arrays of aligned voxel point
    samples drawn from two different sensor poses of the same scene.  Any
    residual translation between them is ~0 (alignment uses the exact ground
    truth), so callers inject their own regression targets.

    ``scene_zoo=True`` draws each pair's scene from :func:`training_scene`
    (box fields, occlusion fences, near-wall corridors); False keeps the
    original default-scene-only behavior.
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
        scene = training_scene(rng) if scene_zoo else None
        scan1, scan2 = scan_pair_with_ground_truth(
            X_true, scene=scene, seed=seed + 17 * k
        )
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
