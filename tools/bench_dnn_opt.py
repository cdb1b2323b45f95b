"""Round-5 DNN-cost attack bench: sampling-path + encoder candidates.

Stage table from tools/bench_dnn_stages.py (r5, on chip):
  A model_voxel_samples  1.68 ms   (x2 per frame)
  B net forward          1.4-1.7   (x2 per frame)
  E DNN odometry step    7.58      (plain step 1.07)

This tool slope-benchmarks (CLAUDE.md honest-chain method) the PIECES of
the sampling pass and candidate replacements, then the encoder variants,
to find where the time actually goes before rewriting anything.

Usage: timeout 1800 python tools/bench_dnn_opt.py
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


def chained(f):
    import jax
    import jax.numpy as jnp

    def make(chain):
        @jax.jit
        def g(s):
            def body(c, _):
                return c + f(c) * 1e-9, None

            out, _ = jax.lax.scan(body, s, None, length=chain)
            return out

        return g

    return make


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from icet_tpu import ICETConfig
    from icet_tpu.filters import (
        model_voxel_samples, pretrained_dnn, sample_voxel_points,
    )
    from icet_tpu.ops.clustering import membership
    from icet_tpu.ops.geometry import cart_to_spherical
    from icet_tpu.ops.grid import voxel_ids
    from icet_tpu.ops.windowed_moments import windowed_vid_counts
    from icet_tpu.solver import prepare_reference

    cfg = ICETConfig(n_iters=7, dnn_filter=True)
    drive = jax.device_put(bench._drive_frames())
    scan = drive[1]
    model = jax.block_until_ready(
        jax.jit(prepare_reference, static_argnums=1)(drive[0], cfg)
    )
    S = cfg.dnn_sample_pts
    V = cfg.n_voxels
    n = scan.shape[0]
    v1 = V + 1

    def prepass(s):
        rtp = cart_to_spherical(s)
        v = voxel_ids(rtp, cfg)
        m = membership(v, rtp[..., 0], rtp[..., 0] >= cfg.min_range,
                       model.bounds, V)
        return jnp.where(m, v, V).astype(jnp.int32), m

    def counts_of(vidm, m):
        cw, ovf = windowed_vid_counts(vidm, m, cfg)
        return jax.lax.cond(
            ovf == 0,
            lambda: cw,
            lambda: jax.ops.segment_sum(
                jnp.ones_like(vidm, jnp.int32), jnp.where(m, vidm, V),
                num_segments=v1,
            ),
        )

    # --- ladder: current path pieces ------------------------------------
    def l0(s):
        vidm, m = prepass(s)
        return jnp.sum(vidm.astype(jnp.float32)) * 1e-12

    def l1(s):
        vidm, m = prepass(s)
        c = counts_of(vidm, m)
        return jnp.sum(c.astype(jnp.float32)) * 1e-12

    def l2(s):
        vidm, m = prepass(s)
        idx = jnp.arange(n, dtype=jnp.int32)
        vs, order = jax.lax.sort_key_val(vidm, idx, is_stable=True)
        return jnp.sum(order[:8].astype(jnp.float32)) * 1e-12

    def l3(s):
        # multi-operand sort carrying xyz: no later gather/perm-scatter
        vidm, m = prepass(s)
        vs, xs, ys, zs = jax.lax.sort(
            (vidm, s[:, 0], s[:, 1], s[:, 2]), num_keys=1, is_stable=True
        )
        return (jnp.sum(xs[:8]) + jnp.sum(vs[:8].astype(jnp.float32))) * 1e-12

    def l4(s):
        # rank in sorted space (cummax of segment starts)
        vidm, m = prepass(s)
        vs, xs, ys, zs = jax.lax.sort(
            (vidm, s[:, 0], s[:, 1], s[:, 2]), num_keys=1, is_stable=True
        )
        idx = jnp.arange(n, dtype=jnp.int32)
        seg_start = jnp.where(
            jnp.concatenate([jnp.ones((1,), bool), vs[1:] != vs[:-1]]), idx, 0
        )
        start = jax.lax.associative_scan(jnp.maximum, seg_start)
        rank = idx - start
        return (jnp.sum(xs[:8]) + jnp.sum(rank[:8].astype(jnp.float32))) * 1e-12

    def l5(s):
        # + single (n,3) scatter into the (v1*S, 3) buffer = NEW full path
        vidm, m = prepass(s)
        vs, xs, ys, zs = jax.lax.sort(
            (vidm, s[:, 0], s[:, 1], s[:, 2]), num_keys=1, is_stable=True
        )
        idx = jnp.arange(n, dtype=jnp.int32)
        seg_start = jnp.where(
            jnp.concatenate([jnp.ones((1,), bool), vs[1:] != vs[:-1]]), idx, 0
        )
        start = jax.lax.associative_scan(jnp.maximum, seg_start)
        rank = idx - start
        write = (vs < V) & (rank < S)
        tgt = jnp.where(write, vs * S + rank, v1 * S)
        pts = jnp.stack([xs, ys, zs], axis=-1)
        buf = (
            jnp.zeros((v1 * S, 3), s.dtype)
            .at[tgt]
            .set(pts, mode="drop", unique_indices=True)
        )
        return jnp.mean(buf)

    def l6(s):
        smp, _c = model_voxel_samples(model, s, cfg)
        return jnp.sum(smp.astype(jnp.float32)) * 1e-12

    def raw_scatter(s):
        # isolated: one 65k-row (n,3) unique .set scatter
        tgt = (jnp.arange(n, dtype=jnp.int32) * 7919) % (v1 * S)
        tgt = tgt + (s[:, 0] > 1e9).astype(jnp.int32)  # depend on carry
        buf = (
            jnp.zeros((v1 * S, 3), s.dtype)
            .at[tgt]
            .set(s, mode="drop", unique_indices=True)
        )
        return jnp.mean(buf)

    def raw_scatter1d(s):
        tgt = (jnp.arange(n, dtype=jnp.int32) * 7919) % (v1 * S)
        tgt = tgt + (s[:, 0] > 1e9).astype(jnp.int32)
        buf = (
            jnp.zeros((v1 * S,), s.dtype)
            .at[tgt]
            .set(s[:, 0], mode="drop", unique_indices=True)
        )
        return jnp.mean(buf)

    def raw_scatter2w(s):
        # (n, 2) u32 scatter — the round-5 bf16-packed lean path's write
        tgt = (jnp.arange(n, dtype=jnp.int32) * 7919) % (v1 * S)
        tgt = tgt + (s[:, 0] > 1e9).astype(jnp.int32)
        w = jax.lax.bitcast_convert_type(s[:, :2], jnp.uint32)
        buf = (
            jnp.zeros((v1 * S, 2), jnp.uint32)
            .at[tgt]
            .set(w, mode="drop", unique_indices=True)
        )
        return jnp.sum(buf.astype(jnp.float32)) * 1e-12

    def l7(s):
        # round-5 lean packed path end to end
        vidm, m = prepass(s)
        smp, _ = sample_voxel_points(
            s, vidm, m, V, S, fill_tail=False
        )
        return jnp.sum(smp.astype(jnp.float32)) * 1e-12

    for name, f in (
        ("L0 prepass (c2s+vid+member)", l0),
        ("L1  + windowed counts", l1),
        ("L2  + sort_key_val(vid,idx)", l2),
        ("L3  prepass+multiop sort xyz", l3),
        ("L4  + rank cummax", l4),
        ("L5  + one (n,3) scatter=NEW", l5),
        ("L6 current model_voxel_samples", l6),
        ("L7 lean bf16-packed path (r5)", l7),
        ("R1 raw 65k (n,3) .set scatter", raw_scatter),
        ("R2 raw 65k (n,) .set scatter", raw_scatter1d),
        ("R3 raw 65k (n,2) u32 scatter", raw_scatter2w),
    ):
        print(f"{name:34s}{slope_ms(chained(f), (scan,)):8.3f} ms", flush=True)

    # --- encoder variants ------------------------------------------------
    from icet_tpu.models.bias_net import (
        apply_bias_net,
        pack_voxel_samples,
    )

    net, params = pretrained_dnn(cfg)
    params = jax.device_put(params)
    s1, _n1 = jax.block_until_ready(
        jax.jit(lambda s: model_voxel_samples(model, s, cfg))(drive[0])
    )
    s2, _n2 = jax.block_until_ready(
        jax.jit(lambda s: model_voxel_samples(model, s, cfg))(scan)
    )

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

    def slope_fwd(apply_fn):
        return slope_ms(fwd_make(apply_fn), (s1, s2))

    print(f"{'F1 flax apply (bf16)':34s}{slope_fwd(lambda x: net.apply(params, x)):8.3f} ms", flush=True)
    print(f"{'F2 fused pallas tile16':34s}{slope_fwd(lambda x: apply_bias_net(net, params, x, fused=True)):8.3f} ms", flush=True)

    # F3: plain XLA bf16 reshaped (no layernorm re-reads? same as flax but
    # flattened rows) — establishes whether flax's shape bookkeeping costs.
    from icet_tpu.models.bias_net import _split_params

    enc, head = _split_params(params)

    def xla_flat(x):
        b, p, c = x.shape
        h = x.reshape(b * p, c).astype(jnp.bfloat16)
        for i in range(0, len(enc), 4):
            w, bb, g, be = enc[i : i + 4]
            a = jnp.dot(h, w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            a = (a.astype(jnp.bfloat16) + bb.astype(jnp.bfloat16)).astype(
                jnp.float32
            )
            mu = jnp.mean(a, axis=-1, keepdims=True)
            var = jnp.maximum(jnp.mean(a * a, axis=-1, keepdims=True) - mu * mu, 0.0)
            y = (a - mu) * jax.lax.rsqrt(var + 1e-6)
            y = y * g + be
            h = jnp.maximum(y, 0.0).astype(jnp.bfloat16)
        f = h.shape[-1]
        pooled = jnp.max(h.reshape(b, p, f).astype(jnp.float32), axis=1)
        gg = pooled
        for w, bias in head[:-1]:
            gg = jnp.maximum(jnp.dot(gg, w) + bias, 0.0)
        w, bias = head[-1]
        return jnp.dot(gg, w) + bias

    print(f"{'F3 xla flat bf16':34s}{slope_fwd(xla_flat):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
