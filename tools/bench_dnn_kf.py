"""Keyframe-mode DNN odometry cost on chip (VERDICT r4 #1 follow-through).

The frame-to-frame DNN step pays per frame: its own reject mask (aligned
scan sampled + forward) PLUS the next frame's model fit AND sampling pass.
Keyframe mode amortises the second half across the keyframe lifetime (the
keyframe's samples are cached at spawn), and large keyframe baselines are
exactly where perspective shift is biggest — the regime the filter exists
for.  This slope-measures the fused keyframe DNN step chained over the
bench drive (honest methodology, CLAUDE.md).

Run (chip): timeout 1500 python tools/bench_dnn_kf.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CHAINS = (10, 50)


def slope_ms(make, args, consume):
    totals = {}
    for chain in CHAINS:
        fn = make(chain)
        out = consume(fn(*args))
        assert np.isfinite(out).all()
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            consume(fn(*args))
            best = min(best, time.perf_counter() - t0)
        totals[chain] = best
    return (totals[CHAINS[1]] - totals[CHAINS[0]]) / (CHAINS[1] - CHAINS[0]) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from bench import _drive_frames
    from icet_tpu import ICETConfig
    from icet_tpu.config import BlockMapConfig, KeyframeConfig
    from icet_tpu.filters import (
        model_voxel_samples_jit,
        pretrained_dnn,
    )
    from icet_tpu.keyframe import (
        _keyframe_step_impl,
        blockmap_init,
        keyframe_spawn_jit,
        update_health0,
    )
    from icet_tpu.ops.geometry import compose_states

    cfg = ICETConfig(
        n_iters=7, convergence_tol=1e-4, convergence_stat_scale=1.0,
        dnn_filter=True,
    )
    kf_cfg = KeyframeConfig(spawn_distance=3.0, spawn_angle=0.3,
                            delta_clamp=2.5)
    bm_cfg = BlockMapConfig()
    net, params = pretrained_dnn(cfg)
    params = jax.device_put(params)
    drive = jax.device_put(_drive_frames())
    x0 = jax.device_put(np.zeros(6, np.float32))
    jax.block_until_ready((drive, x0))
    nf = drive.shape[0]

    def make(chain):
        @jax.jit
        def g(frames, x):
            from icet_tpu.filters import (
                model_voxel_samples,
                register_with_dnn,
            )

            scan0 = frames[0]
            bm0 = blockmap_init(bm_cfg)
            model0, bm0 = keyframe_spawn_jit(
                bm0, scan0, jnp.zeros(6, jnp.float32),
                jax.random.PRNGKey(1), jnp.asarray(True), cfg, bm_cfg,
            )
            samples0 = model_voxel_samples(model0, scan0, cfg)
            ks = (jnp.arange(chain) + 1) % nf

            def body(carry, k):
                model, bm, ksc, ksmp, x_rel, delta, world, key, h0 = carry
                scan = frames[k]
                key, sub, sub2 = jax.random.split(key, 3)

                def solve_fn(m, scan_res):
                    res, _f = register_with_dnn(
                        m, ksc, scan_res, jnp.zeros(6, scan.dtype), cfg,
                        net, params, want_static_mask=False, samples1=ksmp,
                    )
                    return res

                res, x2, d2, _div, spawn, health, bm2 = _keyframe_step_impl(
                    model, bm, scan, x_rel, delta, sub, h0,
                    cfg, kf_cfg, bm_cfg, solve_fn=solve_fn,
                )
                h0 = update_health0(h0, health)
                world2 = compose_states(world, x2)

                def do_spawn(_):
                    m2, bm3 = keyframe_spawn_jit(
                        bm2, scan, world2, sub2, jnp.asarray(True),
                        cfg, bm_cfg)
                    smp2 = model_voxel_samples(m2, scan, cfg)
                    return (m2, bm3, scan, smp2, jnp.zeros(6, jnp.float32),
                            jnp.zeros(2, jnp.float32), world2)

                def keep(_):
                    return model, bm2, ksc, ksmp, x2, h0, world

                model, bm, ksc, ksmp, x_rel, h0, world = jax.lax.cond(
                    spawn, do_spawn, keep, None
                )
                return (model, bm, ksc, ksmp, x_rel, d2, world, key, h0), None

            carry0 = (
                model0, bm0, scan0, samples0, jnp.zeros(6, jnp.float32),
                jnp.zeros(6, jnp.float32), jnp.zeros(6, jnp.float32),
                jax.random.PRNGKey(0), jnp.zeros(2, jnp.float32),
            )
            (model, bm, _ks, _sm, x_rel, delta, world, _, _), _ = (
                jax.lax.scan(body, carry0, ks)
            )
            bm_dep = (
                bm.points[0, 0, 0] + bm.valid.sum().astype(jnp.float32)
            ) * 1e-20
            return world + delta * 0 + x_rel * 0 + bm_dep

        return g

    def consume(out):
        out = np.asarray(out)
        assert np.linalg.norm(out[:3]) > 1.0, out
        return out

    ms = slope_ms(make, (drive, x0), consume)
    print(f"keyframe DNN odometry step: {ms:8.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
