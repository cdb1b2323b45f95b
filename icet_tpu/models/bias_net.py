"""Perspective-shift bias network — the framework's DNN model family.

The reference ships a trained Keras SavedModel (``KITTINet100.kmod``, loaded
at python/ICET_spherical.py:44) whose weights file is stripped from the repo
(.MISSING_LARGE_BLOBS); only the architecture survives in keras_metadata:
[B, 200, 3] input -> conv stack (256/256/512/1024 + BatchNorm) -> maxpool ->
dense 1024/1024/512/512/256 -> 3-DOF translation, Adam + MAE.

This is a TPU-idiomatic redesign of that capability, not a port: a
PointNet-style permutation-invariant encoder (shared per-point MLP -> masked
max-pool -> dense head) sized so every matmul tiles cleanly onto the MXU.
Each voxel's input is the concatenation of S points sampled from each scan
plus a scan-id channel; the output is the predicted inter-scan translation of
that voxel's surface, used by the solver's disagreement filter
(reference ICET_spherical.py:288-390).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax


class BiasNet(nn.Module):
    """Per-voxel translation regressor over two point samples.

    Input: (B, 2*S, 4) — xyz (centred per voxel) + scan-id channel in
    {-1, +1}.  Output: (B, 3) translation estimate (scan1 -> scan2).

    The encoder computes in bfloat16 (params stay float32): its (V, 2S, 256)
    activations are the DNN filter's HBM-bandwidth bill — measured 14.5 ms
    per odometry frame in f32 on the v5e — and inputs are voxel-centred
    metre-scale offsets, so bf16's ~0.4% relative error is micrometres
    against the 5 cm disagreement threshold the output feeds.  The head
    runs in f32 on the (V, 256) pooled code (negligible traffic).
    """

    features: tuple = (64, 128, 256)
    head: tuple = (128, 64)
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x.astype(self.dtype)
        for f in self.features:
            h = nn.Dense(f, dtype=self.dtype)(h)
            h = nn.LayerNorm(dtype=self.dtype)(h)
            h = nn.relu(h)
        # Permutation-invariant pooling over the point axis.
        pooled = jnp.max(h, axis=-2).astype(jnp.float32)
        g = pooled
        for f in self.head:
            g = nn.Dense(f)(g)
            g = nn.relu(g)
        return nn.Dense(3)(g)


def pack_voxel_samples(sample1: jax.Array, sample2: jax.Array) -> jax.Array:
    """Build the network input from two (B, S, 3) point samples.

    Points are centred on the joint mean (translation invariance of the
    encoder; the target is the RELATIVE shift) and tagged with a scan-id
    channel.
    """
    both = jnp.concatenate([sample1, sample2], axis=-2)
    center = jnp.mean(both, axis=-2, keepdims=True)
    both = both - center
    s = sample1.shape[-2]
    tag = jnp.concatenate(
        [
            -jnp.ones(sample1.shape[:-1] + (1,), sample1.dtype),
            jnp.ones(sample2.shape[:-1] + (1,), sample2.dtype),
        ],
        axis=-2,
    )
    del s
    return jnp.concatenate([both, tag], axis=-1)


# ---------------------------------------------------------------------------
# Fused Pallas encoder (inference fast path)
# ---------------------------------------------------------------------------
#
# The flax encoder materialises every (V, 2S, 64/128/256) activation in HBM
# (plus LayerNorm re-reads) — measured 1.41 ms/forward in bf16 at the
# canonical V=1801, S=100 on the v5e (f32 was ~3x that).  The fused path
# SPLITS the encoder: the first Dense+LN+ReLU runs as plain XLA on the
# (V*2S, 4) rows — its 4-wide input is lane-hostile inside a kernel (TPU
# lane width 128; an all-in-kernel (TILE, 2S, 4) input block measured
# SLOWER than flax, 1.74 ms, from ~3% lane utilization + an in-kernel
# relayout) — then one Pallas kernel keeps each voxel tile's (2S, 64/128/
# 256) activations in VMEM through the remaining Dense+LN+ReLU stages and
# the max-pool.  Measured 0.97 ms/forward (tools/bench_encoder_variants.py;
# tile 8/16/32 within noise).  Static shapes, no dynamic offsets (the
# Mosaic bugs documented in ops/pallas_fused.py are all dynamic-offset
# cases).

_TILE_V = 16


def _dense_ln_relu(h, w, b, g, be):
    """One Dense+LayerNorm+ReLU matching flax bf16 semantics: f32 MXU
    accumulation cast to bf16, bias added in bf16; LayerNorm statistics in
    f32 (flax _compute_stats promotes), fast-variance form, eps 1e-6."""
    a = jnp.dot(
        h, w.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )
    a = (a.astype(jnp.bfloat16) + b.astype(jnp.bfloat16)).astype(jnp.float32)
    mu = jnp.mean(a, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(a * a, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (a - mu) * jax.lax.rsqrt(var + 1e-6)
    y = y * g.astype(jnp.float32) + be.astype(jnp.float32)
    return jnp.maximum(y, 0.0).astype(jnp.bfloat16)


def _encoder_kernel(h_ref, *refs):
    """One voxel tile through encoder stages 2..n + pool: (TB, P, C) ->
    (TB, F).  Input is the FIRST stage's (lane-wide) activations."""
    out_ref = refs[-1]
    wrefs = refs[:-1]
    tb, p, c = h_ref.shape
    h = h_ref[:].reshape(tb * p, c)
    for i in range(0, len(wrefs), 4):
        w, b, g, be = (r[:] for r in wrefs[i : i + 4])
        h = _dense_ln_relu(h, w, b, g, be)
    f = h.shape[-1]
    out_ref[:] = jnp.max(
        h.reshape(tb, p, f).astype(jnp.float32), axis=1
    )


def _split_params(params):
    p = params["params"]
    enc, i = [], 0
    while f"LayerNorm_{i}" in p:
        enc += [
            p[f"Dense_{i}"]["kernel"], p[f"Dense_{i}"]["bias"],
            p[f"LayerNorm_{i}"]["scale"], p[f"LayerNorm_{i}"]["bias"],
        ]
        i += 1
    head = []
    while f"Dense_{i}" in p:
        head.append((p[f"Dense_{i}"]["kernel"], p[f"Dense_{i}"]["bias"]))
        i += 1
    return enc, head


def apply_bias_net(net: "BiasNet", params, x: jax.Array, *,
                   fused: bool | None = None,
                   interpret: bool = False) -> jax.Array:
    """BiasNet forward with the fused Pallas encoder on TPU.

    Numerically equivalent to ``net.apply(params, x)`` to bf16 rounding
    (pinned by tests/test_models.py); elsewhere (CPU CI) falls back to the
    flax apply unless ``fused`` forces the kernel (interpret mode tests).
    """
    if fused is None:
        fused = jax.default_backend() == "tpu"
    if not fused:
        return net.apply(params, x)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    enc, head = _split_params(params)
    b, p_pts, c = x.shape
    feat = enc[-1].shape[0]  # final LayerNorm width == pooled width
    # Stage 1 in XLA: (V*2S, 4) -> (V*2S, 64).  The kernel's remaining
    # stages then load lane-wide (>= 64) blocks.
    h1 = _dense_ln_relu(
        x.reshape(b * p_pts, c).astype(jnp.bfloat16), *enc[:4]
    ).reshape(b, p_pts, -1)
    kenc = enc[4:]
    if not kenc:  # single-stage encoder: nothing left to fuse — pool + head
        pooled = jnp.max(h1.astype(jnp.float32), axis=-2)
    else:
        pad = (-b) % _TILE_V
        hp = jnp.pad(h1, ((0, pad), (0, 0), (0, 0))) if pad else h1
        grid = (hp.shape[0] // _TILE_V,)
        pooled = pl.pallas_call(
            _encoder_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (_TILE_V, p_pts, hp.shape[-1]),
                    lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(kenc),
            out_specs=pl.BlockSpec(
                (_TILE_V, feat), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((hp.shape[0], feat), jnp.float32),
            interpret=interpret,
        )(hp, *kenc)
        pooled = pooled[:b]
    g = pooled
    # f32 head on the pooled codes (negligible traffic), as in BiasNet.
    for w, bias in head[:-1]:
        g = jnp.maximum(jnp.dot(g, w) + bias, 0.0)
    w, bias = head[-1]
    return jnp.dot(g, w) + bias


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def create_train_state(key, lr: float = 1e-3, sample_pts: int = 100):
    model = BiasNet()
    params = model.init(key, jnp.zeros((1, 2 * sample_pts, 4)))
    tx = optax.adam(lr)
    return model, tx, TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def mae_loss(model: BiasNet, params, inputs, targets):
    """Mean absolute error, the reference's training loss (keras_metadata)."""
    pred = model.apply(params, inputs)
    return jnp.mean(jnp.abs(pred - targets))


@functools.partial(jax.jit, static_argnums=(0, 1))
def train_step(model: BiasNet, tx, state: TrainState, inputs, targets):
    loss, grads = jax.value_and_grad(
        lambda p: mae_loss(model, p, inputs, targets)
    )(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss


# ---------------------------------------------------------------------------
# Synthetic training data: surface patches observed twice with a known shift
# and density/perspective mismatch (the failure mode the filter detects).
# ---------------------------------------------------------------------------


def make_patch_batch(key, batch: int = 256, sample_pts: int = 100):
    """Random oriented planar patches sampled twice.

    Sample 1 and sample 2 draw DIFFERENT subsets/densities from the same
    patch; sample 2 is additionally translated by the target.  Mimics
    inter-scan resampling + the perspective-induced support shift (different
    visible extent per scan).
    """
    ks = jax.random.split(key, 8)
    # Patch frame: random orientation, random in-plane extents.
    normal = jax.random.normal(ks[0], (batch, 3))
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    a = jnp.cross(normal, jnp.array([0.0, 0.0, 1.0]) + 1e-3)
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = jnp.cross(normal, a)
    ext = jax.random.uniform(ks[1], (batch, 2), minval=0.2, maxval=2.0)

    def draw(k, shift_frac):
        u = jax.random.uniform(k, (batch, sample_pts, 2), minval=-1.0, maxval=1.0)
        # Perspective shift: each scan sees a slightly different window of
        # the surface.
        u = u * (1.0 - jnp.abs(shift_frac)) + shift_frac
        pts = (
            u[..., :1] * ext[:, None, :1] * a[:, None, :]
            + u[..., 1:] * ext[:, None, 1:] * b[:, None, :]
        )
        noise = 0.02 * jax.random.normal(jax.random.fold_in(k, 1), pts.shape)
        return pts + noise * normal[:, None, :]

    window = jax.random.uniform(ks[2], (batch, 1, 1), minval=-0.4, maxval=0.4)
    s1 = draw(ks[3], jnp.zeros_like(window))
    s2 = draw(ks[4], window)
    target = jax.random.uniform(ks[5], (batch, 3), minval=-0.3, maxval=0.3)
    s2 = s2 + target[:, None, :]
    return pack_voxel_samples(s1, s2), target


_WEIGHTS_DIR = __file__.rsplit("/", 1)[0] + "/weights"


def load_pretrained(sample_pts: int = 100):
    """Load the bundled pretrained BiasNet (trained on synthetic patches,
    see train_bias_net; MAE ~0.08 m on +-0.3 m shifts).

    Returns (model, params) ready for filters.register_pair_with_dnn.
    """
    from icet_tpu.utils.checkpoint import load_checkpoint

    path = f"{_WEIGHTS_DIR}/bias_net_s{sample_pts}.npz"
    params = jax.tree_util.tree_map(
        jnp.asarray, load_checkpoint(path)
    )
    return BiasNet(), params


def train_bias_net(
    key=None, steps: int = 300, batch: int = 256, sample_pts: int = 100, lr=1e-3
):
    """Train a BiasNet on synthetic patches; returns (model, params, losses)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    k0, key = jax.random.split(key)
    model, tx, state = create_train_state(k0, lr, sample_pts)
    losses = []
    for i in range(steps):
        key, sub = jax.random.split(key)
        inputs, targets = make_patch_batch(sub, batch, sample_pts)
        state, loss = train_step(model, tx, state, inputs, targets)
        losses.append(float(loss))
    return model, state.params, losses
