"""Where do model_voxel_samples' ~6 ms go?  (round 4: dnn_frame_ms)

Slope-benchmarks the pieces of the per-voxel sampling pass on the bench
drive's geometry: the vid argsort, the counts segment_sum, the two
gathers, and the assembled function — plus candidate replacements.

Usage: timeout 1200 python tools/bench_sampling.py
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

    import bench
    from icet_tpu import ICETConfig
    from icet_tpu.filters import model_voxel_samples
    from icet_tpu.ops.clustering import membership
    from icet_tpu.ops.geometry import cart_to_spherical
    from icet_tpu.ops.grid import voxel_ids
    from icet_tpu.solver import prepare_reference

    cfg = ICETConfig(n_iters=7, dnn_filter=True)
    drive = jax.device_put(bench._drive_frames())
    scan = drive[1]
    model = jax.block_until_ready(
        jax.jit(prepare_reference, static_argnums=1)(drive[0], cfg)
    )
    S = cfg.dnn_sample_pts
    V = cfg.n_voxels

    def chained(f):
        """Chain f over a varying scan: every stage derives from the carry
        (a loop-INVARIANT stage input lets XLA hoist the whole stage out
        of the scan and benchmark nothing — first version of this tool
        measured a '0.017 ms 65k argsort' that way)."""
        def make(chain):
            @jax.jit
            def g(s):
                def body(c, _):
                    return c + f(c) * 1e-9, None

                out, _ = jax.lax.scan(body, s, None, length=chain)
                return out

            return g

        return make

    # Cumulative ladder: each rung recomputes everything from the carry.
    n = scan.shape[0]

    def prepass(s):
        rtp = cart_to_spherical(s)
        v = voxel_ids(rtp, cfg)
        m = membership(v, rtp[..., 0], rtp[..., 0] >= cfg.min_range,
                       model.bounds, V)
        return jnp.where(m, v, V).astype(jnp.int32)

    def l1(s):
        return jnp.sum(prepass(s).astype(jnp.float32)) * 1e-12

    def l2(s):
        order = jnp.argsort(prepass(s))
        return jnp.sum(order[:8].astype(jnp.float32)) * 1e-12

    def l3(s):
        vidm = prepass(s)
        order = jnp.argsort(vidm)
        counts = jax.ops.segment_sum(
            jnp.ones_like(vidm), vidm, num_segments=V + 1
        )
        offs = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(counts)[:-1].astype(jnp.int32)]
        )
        k = jnp.arange(S, dtype=jnp.int32)[None, :]
        take = jnp.clip(
            offs[:, None] + k % jnp.maximum(counts, 1)[:, None], 0, n - 1
        )
        return (jnp.sum(take[:4, :4].astype(jnp.float32))
                + jnp.sum(order[:8].astype(jnp.float32))) * 1e-12

    def l4(s):
        vidm = prepass(s)
        order = jnp.argsort(vidm)
        counts = jax.ops.segment_sum(
            jnp.ones_like(vidm), vidm, num_segments=V + 1
        )
        offs = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(counts)[:-1].astype(jnp.int32)]
        )
        k = jnp.arange(S, dtype=jnp.int32)[None, :]
        take = jnp.clip(
            offs[:, None] + k % jnp.maximum(counts, 1)[:, None], 0, n - 1
        )
        idx = order[take]
        return jnp.sum(idx.astype(jnp.float32)) * 1e-12

    def l5(s):
        smp, _cnt = model_voxel_samples(model, s, cfg)
        return jnp.mean(smp)

    for name, f in (
        ("L1 prepass (c2s+vid+member)", l1),
        ("L2  + argsort(vid)", l2),
        ("L3  + counts/cumsum/take", l3),
        ("L4  + order[take] gather", l4),
        ("L5 full (+ points gather)", l5),
    ):
        print(f"{name:31s}{slope_ms(chained(f), (scan,)):8.3f} ms")


if __name__ == "__main__":
    main()
