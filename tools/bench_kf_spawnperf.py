"""keyframe_frame_ms vs spawn cadence (VERDICT r4 #5: target <= 1.6 ms).

The bench drive moves 1 m/frame; with spawn_distance=3.0 frames at 2-3 m
keyframe baseline pay the windowed-spill path (the "spawn regime", ~1.48
ms vs 0.50 in-keyframe — RESULTS.md).  Spawning earlier trades more
prepare passes (~0.45 ms each, amortised over the keyframe) for cheaper
per-frame solves; the ovf_spawn trigger does the same adaptively on chip
(spill counts are only nonzero on the windowed TPU path).  This tool
slope-measures bench.py's exact keyframe chain across spawn configs.

Run (chip): timeout 1500 python tools/bench_kf_spawnperf.py
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
    from icet_tpu.keyframe import (
        blockmap_init,
        keyframe_spawn_jit,
        keyframe_step_jit,
        update_health0,
    )
    from icet_tpu.ops.geometry import compose_states

    cfg = ICETConfig(
        n_iters=7, convergence_tol=1e-4, convergence_stat_scale=1.0
    )
    bm_cfg = BlockMapConfig()
    drive = jax.device_put(_drive_frames())
    x0 = jax.device_put(np.zeros(6, np.float32))
    jax.block_until_ready((drive, x0))
    nf = drive.shape[0]

    def make_kf(kf_cfg):
        def make(chain):
            @jax.jit
            def g(frames, x):
                scan0 = frames[0]
                bm0 = blockmap_init(bm_cfg)
                model0, bm0 = keyframe_spawn_jit(
                    bm0, scan0, jnp.zeros(6, jnp.float32),
                    jax.random.PRNGKey(1), jnp.asarray(True), cfg, bm_cfg,
                )
                ks = (jnp.arange(chain) + 1) % nf

                def body(carry, k):
                    model, bm, x_rel, delta, world, key, h0 = carry
                    scan = frames[k]
                    key, sub, sub2 = jax.random.split(key, 3)
                    res, x_rel2, delta2, _d, spawn, health, bm2 = (
                        keyframe_step_jit(
                            model, bm, scan, x_rel, delta, sub, h0,
                            cfg, kf_cfg, bm_cfg,
                        )
                    )
                    h0 = update_health0(h0, health)
                    world2 = compose_states(world, x_rel2)

                    def do_spawn(_):
                        m2, bm3 = keyframe_spawn_jit(
                            bm2, scan, world2, sub2, jnp.asarray(True),
                            cfg, bm_cfg)
                        return (m2, bm3, jnp.zeros(6, jnp.float32),
                                jnp.zeros(2, jnp.float32), world2)

                    def keep(_):
                        return model, bm2, x_rel2, h0, world

                    model, bm, x_rel, h0, world = jax.lax.cond(
                        spawn, do_spawn, keep, None
                    )
                    return (model, bm, x_rel, delta2, world, key, h0), None

                carry0 = (
                    model0, bm0, jnp.zeros(6, jnp.float32),
                    jnp.zeros(6, jnp.float32), jnp.zeros(6, jnp.float32),
                    jax.random.PRNGKey(0), jnp.zeros(2, jnp.float32),
                )
                (model, bm, x_rel, delta, world, _, _), _ = jax.lax.scan(
                    body, carry0, ks
                )
                bm_dep = (
                    bm.points[0, 0, 0] + bm.valid.sum().astype(jnp.float32)
                ) * 1e-20
                return world + delta * 0 + x_rel * 0 + bm_dep

            return g
        return make

    def consume(out):
        out = np.asarray(out)
        assert np.linalg.norm(out[:3]) > 1.0, out
        return out

    configs = [
        ("dist3.0 auto ovf512",
         KeyframeConfig(spawn_distance=3.0, spawn_angle=0.3,
                        delta_clamp=2.5, ovf_spawn=512)),
        ("dist3.0 auto ovf128",
         KeyframeConfig(spawn_distance=3.0, spawn_angle=0.3,
                        delta_clamp=2.5, ovf_spawn=128)),
        ("dist3.0 auto ovf32",
         KeyframeConfig(spawn_distance=3.0, spawn_angle=0.3,
                        delta_clamp=2.5, ovf_spawn=32)),
        ("dist2.5 auto ovf512",
         KeyframeConfig(spawn_distance=2.5, spawn_angle=0.3,
                        delta_clamp=2.5, ovf_spawn=512)),
    ]
    for name, kf_cfg in configs:
        ms = slope_ms(make_kf(kf_cfg), (drive, x0), consume)
        print(f"{name:38s}{ms:8.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
