import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icet_tpu.config import ICETConfig
from icet_tpu.datasets.synthetic import scan_pair_with_ground_truth
from icet_tpu.filters import (
    dnn_reject_mask,
    register_pair_with_dnn,
    sample_voxel_points,
)
from icet_tpu.models.bias_net import (
    BiasNet,
    create_train_state,
    make_patch_batch,
    pack_voxel_samples,
    train_bias_net,
    train_step,
)
from icet_tpu.solver import prepare_reference_jit, register_pair

CFG = ICETConfig(
    n_theta=48,
    n_phi=16,
    phi_min=np.pi / 3,
    phi_max=2 * np.pi / 3,
    n_iters=6,
    min_pts=20,
    min_range=1.0,
    dnn_start_iter=3,
    dnn_sample_pts=32,
)


def test_bias_net_shapes():
    model = BiasNet()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 64, 4)))
    out = model.apply(params, jnp.zeros((4, 64, 4)))
    assert out.shape == (4, 3)


def test_fused_encoder_matches_flax():
    """The Pallas fused encoder (interpret mode on CPU) must reproduce the
    flax apply to bf16 rounding — on the BUNDLED weights and realistic
    input scales, including a non-multiple-of-tile batch."""
    from icet_tpu.models.bias_net import apply_bias_net, load_pretrained

    net, params = load_pretrained()
    rng = np.random.default_rng(5)
    # Voxel-centred offsets (metre scale) + scan-id channel, like
    # pack_voxel_samples output; 37 voxels exercises the tile padding.
    x = np.concatenate(
        [
            rng.normal(size=(37, 200, 3)).astype(np.float32) * 0.5,
            np.tile(
                np.r_[-np.ones(100), np.ones(100)].astype(np.float32),
                (37, 1),
            )[..., None],
        ],
        axis=-1,
    )
    ref = np.asarray(net.apply(params, jnp.asarray(x)))
    got = np.asarray(
        apply_bias_net(net, params, jnp.asarray(x), fused=True,
                       interpret=True)
    )
    assert got.shape == ref.shape == (37, 3)
    # bf16 rounding flips max-pool winners between the two orderings, so
    # the gap is discrete but small (measured max 0.008 m on decimetre-
    # scale predictions) — well under the 5 cm dnn_thresh the output
    # feeds, where it can only flip voxels already sitting on the
    # rejection boundary.
    np.testing.assert_allclose(got, ref, atol=2e-2)


def test_pack_voxel_samples_invariance():
    rng = np.random.default_rng(0)
    s1 = jnp.asarray(rng.normal(size=(5, 16, 3)).astype(np.float32))
    s2 = jnp.asarray(rng.normal(size=(5, 16, 3)).astype(np.float32))
    packed = pack_voxel_samples(s1, s2)
    assert packed.shape == (5, 32, 4)
    # Joint translation cancels out.
    packed_shifted = pack_voxel_samples(s1 + 5.0, s2 + 5.0)
    np.testing.assert_allclose(
        np.asarray(packed), np.asarray(packed_shifted), atol=1e-5
    )
    # Scan-id channel is -1 for sample 1, +1 for sample 2.
    np.testing.assert_allclose(np.asarray(packed[..., :16, 3]), -1.0)
    np.testing.assert_allclose(np.asarray(packed[..., 16:, 3]), 1.0)


@pytest.mark.slow
def test_train_step_decreases_loss():
    model, tx, state = create_train_state(jax.random.PRNGKey(0), sample_pts=32)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(40):
        key, sub = jax.random.split(key)
        inputs, targets = make_patch_batch(sub, batch=128, sample_pts=32)
        state, loss = train_step(model, tx, state, inputs, targets)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[::10]


@pytest.fixture(scope="module")
def trained():
    model, params, losses = train_bias_net(
        steps=120, batch=128, sample_pts=CFG.dnn_sample_pts
    )
    assert losses[-1] < losses[0]
    return model, params


def test_sample_voxel_points_dense():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.normal(size=(200, 3)).astype(np.float32))
    vid = jnp.asarray(rng.integers(0, 4, 200).astype(np.int32))
    member = jnp.ones(200, bool)
    samples, counts = sample_voxel_points(pts, vid, member, 4, 16)
    assert samples.shape == (5, 16, 3)
    # Every sample row of voxel v is an actual voxel-v point.
    vset = {tuple(p) for p in np.asarray(pts)[np.asarray(vid) == 2]}
    for p in np.asarray(samples)[2]:
        assert tuple(p) in vset


def test_lean_packed_samples_match_full_path_to_bf16():
    """The lean (fill_tail=False) path packs coordinates to bf16 pairs
    before the sort+scatter (the buffer feeds only the bf16 encoder);
    unpack+fill must reproduce the full f32 path to bf16 rounding."""
    from icet_tpu.filters import _unpack_fill_samples

    rng = np.random.default_rng(2)
    pts = jnp.asarray((rng.normal(size=(300, 3)) * 20).astype(np.float32))
    vid = jnp.asarray(rng.integers(0, 6, 300).astype(np.int32))
    member = jnp.asarray(rng.random(300) > 0.1)
    full, counts = sample_voxel_points(pts, vid, member, 6, 8)
    packed, none = sample_voxel_points(
        pts, vid, member, 6, 8, fill_tail=False
    )
    assert none is None and packed.dtype == jnp.uint32
    assert packed.shape == (7, 8, 2)
    lean = _unpack_fill_samples(packed, counts)
    ref_bf16 = np.asarray(full.astype(jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_array_equal(np.asarray(lean), ref_bf16)


@pytest.mark.slow
def test_dnn_filter_end_to_end(trained):
    model, params = trained
    X_true = np.array([0.3, 0.1, 0.0, 0.0, 0.0, 0.01], np.float32)
    scan1, scan2 = scan_pair_with_ground_truth(X_true, seed=5)
    res, filt = register_pair_with_dnn(
        jnp.asarray(scan1), jnp.asarray(scan2), jnp.zeros(6), CFG, model, params
    )
    # The solve must stay healthy with the filter engaged.
    np.testing.assert_allclose(np.asarray(res.X)[:3], X_true[:3], atol=0.05)
    n_rej = int(filt.n_rejected)
    n_valid = int(np.asarray(
        prepare_reference_jit(jnp.asarray(scan1), CFG).valid
    ).sum())
    assert 0 <= n_rej < n_valid  # filter must not reject everything

    # Plain registration for comparison: similar answer.
    plain = register_pair(jnp.asarray(scan1), jnp.asarray(scan2), jnp.zeros(6), CFG)
    np.testing.assert_allclose(
        np.asarray(res.X), np.asarray(plain.X), atol=0.05
    )


@pytest.mark.integration
def test_dnn_filter_reduces_perspective_shift_error():
    """A/B at the canonical 75x24 config on a near-occluder scene with a
    large viewpoint change: the DNN filter must REDUCE registration error,
    not merely stay harmless (the filter's entire purpose — reference
    motivation at ICET_spherical.py:288-390).  Measured across 8 seeds this
    scenario gives mean error 0.00101 plain vs 0.00082 filtered with the
    filter winning on every seed; the test runs 3 seeds and asserts the
    mean improves."""
    from icet_tpu.datasets.synthetic import Scene
    from icet_tpu.models.bias_net import load_pretrained

    scene = Scene(
        boxes=(
            (3.0, 4.5, -1.5, 0.0, -2.0, 1.5),
            (-2.0, -0.5, 3.0, 4.5, -2.0, 2.0),
            (6.0, 7.5, 5.0, 6.5, -2.0, 1.0),
            (-8.0, -6.5, -6.0, -4.5, -2.0, 2.5),
            (2.0, 3.5, -9.0, -7.5, -2.0, 1.2),
        ),
    )
    X_true = np.array([1.2, 0.4, 0.0, 0.0, 0.0, 0.04], np.float32)
    cfg = ICETConfig()  # canonical 75x24, 7 iters
    net, params = load_pretrained(cfg.dnn_sample_pts)

    plain_errs, dnn_errs = [], []
    for seed in (0, 10, 30):
        s1, s2 = scan_pair_with_ground_truth(X_true, scene=scene, seed=seed)
        s1, s2 = jnp.asarray(s1), jnp.asarray(s2)
        x0 = jnp.zeros(6, jnp.float32)
        plain = register_pair(s1, s2, x0, cfg)
        filt_res, filt = register_pair_with_dnn(s1, s2, x0, cfg, net, params)
        plain_errs.append(np.linalg.norm(np.asarray(plain.X) - X_true))
        dnn_errs.append(np.linalg.norm(np.asarray(filt_res.X) - X_true))
        assert 10 < int(filt.n_rejected) < 400  # engaged, not wholesale

    assert np.mean(dnn_errs) < np.mean(plain_errs), (plain_errs, dnn_errs)


@pytest.mark.slow
def test_register_scans_honors_dnn_filter_knob():
    """cfg.dnn_filter routes the top-level entry through the DNN path."""
    from icet_tpu.filters import register_scans

    X_true = np.array([0.3, 0.1, 0.0, 0.0, 0.0, 0.01], np.float32)
    scan1, scan2 = scan_pair_with_ground_truth(X_true, seed=5)
    s1, s2 = jnp.asarray(scan1), jnp.asarray(scan2)
    cfg_off = ICETConfig(n_theta=48, n_phi=16, phi_min=np.pi / 3,
                         phi_max=2 * np.pi / 3, n_iters=6, min_pts=20,
                         min_range=1.0)
    res_off = register_scans(s1, s2, cfg=cfg_off)
    direct = register_pair(s1, s2, jnp.zeros(6, jnp.float32), cfg_off)
    np.testing.assert_array_equal(np.asarray(res_off.X), np.asarray(direct.X))

    cfg_on = cfg_off.replace(dnn_filter=True, dnn_start_iter=3)
    res_on = register_scans(s1, s2, cfg=cfg_on)
    # Engaged path still converges to the same neighborhood.
    np.testing.assert_allclose(np.asarray(res_on.X)[:3], X_true[:3], atol=0.05)


@pytest.mark.slow
def test_load_pretrained_weights():
    from icet_tpu.models.bias_net import load_pretrained, make_patch_batch
    import jax

    model, params = load_pretrained(100)
    inputs, targets = make_patch_batch(jax.random.PRNGKey(7), batch=64,
                                       sample_pts=100)
    pred = model.apply(params, inputs)
    mae = float(jnp.mean(jnp.abs(pred - targets)))
    # Far better than the predict-zero baseline (~0.15 on +-0.3 targets).
    assert mae < 0.12, mae


@pytest.mark.slow
def test_raycast_training_data():
    from icet_tpu.models.train_data import (
        make_raycast_voxel_pairs,
        raycast_batch_iter,
    )

    s1, s2 = make_raycast_voxel_pairs(
        n_pairs=1, samples_per_voxel=16, min_pts=10, seed=1,
        cfg=CFG.replace(moment_method="segsum"),
    )
    assert len(s1) > 20 and s1.shape == s2.shape
    assert s1.shape[1:] == (16, 3)
    # Aligned pairs: per-voxel means should be close (static scene).
    d = np.linalg.norm(s1.mean(axis=1) - s2.mean(axis=1), axis=1)
    assert np.median(d) < 0.3

    it = raycast_batch_iter(s1, s2, jax.random.PRNGKey(0), batch=8)
    inputs, targets = next(it)
    assert inputs.shape == (8, 32, 4) and targets.shape == (8, 3)


def test_real_pair_distillation_samples(rng):
    """make_real_pair_voxel_samples: aligned voxel sample pairs from a scan
    pair with known transform — per-voxel mean offsets after alignment must
    be small (the residual IS the perspective-shift signal, not the motion)."""
    from icet_tpu.models.train_data import make_real_pair_voxel_samples

    X_true = np.array([0.3, 0.1, 0.0, 0.0, 0.0, 0.02], np.float32)
    scan1, scan2 = scan_pair_with_ground_truth(X_true, seed=6)
    cfg = ICETConfig(
        n_theta=24, n_phi=8, phi_min=np.pi / 3, phi_max=2 * np.pi / 3,
        min_pts=10, min_range=1.0, moment_method="segsum",
    )
    s1, s2 = make_real_pair_voxel_samples(
        scan1, scan2, X_true, cfg, samples_per_voxel=50, min_pts=20
    )
    assert s1.shape == s2.shape and s1.shape[1:] == (50, 3)
    assert s1.shape[0] >= 20  # enough populated voxels to train on
    # After TRUE alignment the per-voxel mean offset is residual bias, far
    # smaller than the 0.32 m injected motion.
    d = np.linalg.norm(s2.mean(axis=1) - s1.mean(axis=1), axis=1)
    assert np.median(d) < 0.1, np.median(d)
