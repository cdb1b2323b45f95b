"""Encoder fused-kernel variants: why is the Pallas encoder 10x off roofline?

Hypothesis: the (TILE, 200, 4) input block has a 4-wide LANE dim (TPU lane
width is 128) -> ~3% lane utilization on the input DMA plus an in-kernel
relayout for the (TILE*200, 4) reshape.  Variants:

  V0 flax apply (bf16)                 — baseline
  V1 current fused kernel tile16       — shipping path
  V2 fused kernel tile32 / tile64      — amortization check
  V3 split: Dense1 in XLA + kernel(64) — lane-efficient kernel input
  V4 split variant, tile sweep

Usage: timeout 1800 python tools/bench_encoder_variants.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CHAINS = (8, 40)


def slope_ms(make, args):
    import jax

    fns, totals = {}, {}
    for chain in CHAINS:
        fns[chain] = make(chain)
        out = np.asarray(jax.block_until_ready(fns[chain](*args)))
        assert np.isfinite(out).all()
        totals[chain] = float("inf")
    for _ in range(4):
        for chain in CHAINS:
            t0 = time.perf_counter()
            jax.block_until_ready(fns[chain](*args))
            totals[chain] = min(totals[chain], time.perf_counter() - t0)
    return (totals[CHAINS[1]] - totals[CHAINS[0]]) / (CHAINS[1] - CHAINS[0]) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import bench
    from icet_tpu import ICETConfig
    from icet_tpu.filters import model_voxel_samples, pretrained_dnn
    from icet_tpu.models.bias_net import (
        _split_params,
        apply_bias_net,
        pack_voxel_samples,
    )
    from icet_tpu.solver import prepare_reference

    cfg = ICETConfig(n_iters=7, dnn_filter=True)
    drive = jax.device_put(bench._drive_frames())
    model = jax.block_until_ready(
        jax.jit(prepare_reference, static_argnums=1)(drive[0], cfg)
    )
    net, params = pretrained_dnn(cfg)
    params = jax.device_put(params)
    s1, _ = jax.block_until_ready(
        jax.jit(lambda s: model_voxel_samples(model, s, cfg))(drive[0])
    )
    s2, _ = jax.block_until_ready(
        jax.jit(lambda s: model_voxel_samples(model, s, cfg))(drive[1])
    )
    enc, head = _split_params(params)

    def fwd_make(apply_fn):
        def make(chain):
            @jax.jit
            def g(a, b):
                def body(shift, _):
                    inputs = pack_voxel_samples(a + shift[:, None, :], b)
                    return shift + apply_fn(inputs), None

                shift0 = jnp.zeros((a.shape[0], 3), a.dtype)
                out, _ = jax.lax.scan(body, shift0, None, length=chain)
                return out

            return g

        return make

    def run(name, apply_fn):
        print(f"{name:36s}{slope_ms(fwd_make(apply_fn), (s1, s2)):8.3f} ms",
              flush=True)

    def head_f32(g):
        for w, bias in head[:-1]:
            g = jnp.maximum(jnp.dot(g, w) + bias, 0.0)
        w, bias = head[-1]
        return jnp.dot(g, w) + bias

    def dense_ln(h, i, out_f32=False):
        """One Dense+LN+ReLU stage matching flax bf16 semantics."""
        w, bb, g, be = enc[i : i + 4]
        a = jnp.dot(h, w.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        a = (a.astype(jnp.bfloat16) + bb.astype(jnp.bfloat16)).astype(
            jnp.float32
        )
        mu = jnp.mean(a, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(a * a, axis=-1, keepdims=True) - mu * mu,
                          0.0)
        y = (a - mu) * jax.lax.rsqrt(var + 1e-6)
        y = y * g + be
        r = jnp.maximum(y, 0.0)
        return r if out_f32 else r.astype(jnp.bfloat16)

    # ---- V3: Dense1 in XLA, kernel fuses stages 2..3 + pool --------------
    def make_split_kernel(tile_v):
        w2 = enc[4:]

        def kern(h_ref, *refs):
            out_ref = refs[-1]
            wrefs = refs[:-1]
            tb, p, c = h_ref.shape
            h = h_ref[:].reshape(tb * p, c)
            for i in range(0, len(wrefs), 4):
                w, b, g, be = (r[:] for r in wrefs[i : i + 4])
                a = jnp.dot(h, w.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                a = (a.astype(jnp.bfloat16) + b.astype(jnp.bfloat16)).astype(
                    jnp.float32
                )
                mu = jnp.mean(a, axis=-1, keepdims=True)
                var = jnp.maximum(
                    jnp.mean(a * a, axis=-1, keepdims=True) - mu * mu, 0.0
                )
                y = (a - mu) * jax.lax.rsqrt(var + 1e-6)
                y = y * g.astype(jnp.float32) + be.astype(jnp.float32)
                h = jnp.maximum(y, 0.0).astype(jnp.bfloat16)
            f = h.shape[-1]
            out_ref[:] = jnp.max(
                h.reshape(tb, p, f).astype(jnp.float32), axis=1
            )

        def apply_fn(x):
            b, p, c = x.shape
            h1 = dense_ln(x.reshape(b * p, c).astype(jnp.bfloat16), 0)
            feat = enc[-1].shape[0]
            h1 = h1.reshape(b, p, -1)
            pad = (-b) % tile_v
            if pad:
                h1 = jnp.pad(h1, ((0, pad), (0, 0), (0, 0)))
            grid = (h1.shape[0] // tile_v,)
            pooled = pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((tile_v, p, h1.shape[-1]),
                                 lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
                ]
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(w2),
                out_specs=pl.BlockSpec((tile_v, feat), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((h1.shape[0], feat),
                                               jnp.float32),
            )(h1, *w2)
            return head_f32(pooled[:b])

        return apply_fn

    run("V0 flax apply (bf16)", lambda x: net.apply(params, x))
    run("V1 fused tile16 (shipping)",
        lambda x: apply_bias_net(net, params, x, fused=True))
    for tv in (8, 16, 32):
        run(f"V3 split dense1-XLA + kern t{tv}", make_split_kernel(tv))

    # ---- V5: all-XLA but bf16 h1 then segments: measure stage costs ------
    def xla_stages(x):
        b, p, c = x.shape
        h = x.reshape(b * p, c).astype(jnp.bfloat16)
        h = dense_ln(h, 0)
        h = dense_ln(h, 4)
        h = dense_ln(h, 8, out_f32=True)
        pooled = jnp.max(h.reshape(b, p, -1), axis=1)
        return head_f32(pooled)

    run("V5 xla staged bf16", xla_stages)


if __name__ == "__main__":
    main()
