"""Where do keyframe-odometry's ~3 ms/frame go?  (VERDICT r3 #3)

Slope-benchmarks (CLAUDE.md honest-chain methodology) the keyframe step's
stages on the same 24-frame city drive bench.py uses:

  A  residual-frame register only (pre-transform + register + compose + Q)
  B  A + block-map insert (the 65k argsort + one-block scatter)
  C  full keyframe_step_jit, spawn never fires (steady state within one
     keyframe: fixed scan, warm x_rel)
  D  full bench regime: real drive, spawn every ~3rd frame (reproduces
     bench.py's keyframe_frame_ms)

D - C ~= amortized spawn (prepare + block seed) cost; B - A = insert;
C - B = step glue (delta/spawn logic, cond overhead).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CHAINS = (10, 50)


def slope_ms(make, args):
    import jax

    totals = {}
    for chain in CHAINS:
        fn = make(chain)
        out = np.asarray(fn(*args))
        assert np.isfinite(out).all(), out
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
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
        _blockmap_insert,
        blockmap_init,
        keyframe_spawn_jit,
        keyframe_step_jit,
        update_health0,
    )
    from icet_tpu.ops.geometry import compose_states, transform_points
    from icet_tpu.solver import prepare_reference, register

    cfg = ICETConfig(
        n_iters=7, convergence_tol=1e-4, convergence_stat_scale=1.0
    )
    bm_cfg = BlockMapConfig()
    drive = jax.device_put(_drive_frames())
    nf = drive.shape[0]
    x0 = jax.device_put(np.zeros(6, np.float32))
    jax.block_until_ready((drive, x0))
    _HI = jax.lax.Precision.HIGHEST

    # --- A: residual-frame register + compose + exact Q propagation -------
    def make_reg(chain):
        @jax.jit
        def g(frames, x):
            model = prepare_reference(frames[0], cfg)
            xk = jnp.asarray([1.0, 0, 0, 0, 0, 0], jnp.float32)

            def body(carry, _):
                x_rel, xq = carry
                scan = frames[1]
                r = jnp.linalg.norm(scan, axis=-1)
                scan0 = jnp.where(
                    (r >= cfg.min_range)[:, None],
                    transform_points(scan, x_rel), 0.0,
                )
                res = register(model, scan0, jnp.zeros(6), cfg,
                               want_static_mask=False)
                X = compose_states(res.X, x_rel)
                J = jax.jacfwd(lambda d: compose_states(d, x_rel))(res.X)
                Q = jnp.matmul(jnp.matmul(J, res.Q, precision=_HI), J.T,
                               precision=_HI)
                # consume Q; keep x_rel stationary (steady in-keyframe)
                return (xk + X * 1e-9, xq + jnp.diag(Q)), None

            (xf, xq), _ = jax.lax.scan(
                body, (xk, jnp.zeros(6)), None, length=chain)
            return xf + xq

        return g

    a_ms = slope_ms(make_reg, (drive, x0))
    print(f"A register(residual)+compose+Q      {a_ms:8.3f} ms")

    # --- B: A + block-map insert ------------------------------------------
    def make_reg_ins(chain):
        @jax.jit
        def g(frames, x):
            model = prepare_reference(frames[0], cfg)
            bm0 = blockmap_init(bm_cfg)
            bm0, _ = (bm0._replace(n_blocks=jnp.int32(1)), None)
            xk = jnp.asarray([1.0, 0, 0, 0, 0, 0], jnp.float32)

            def body(carry, _):
                x_rel, bm, key = carry
                scan = frames[1]
                r = jnp.linalg.norm(scan, axis=-1)
                scan0 = jnp.where(
                    (r >= cfg.min_range)[:, None],
                    transform_points(scan, x_rel), 0.0,
                )
                res = register(model, scan0, jnp.zeros(6), cfg,
                               want_static_mask=False)
                X = compose_states(res.X, x_rel)
                J = jax.jacfwd(lambda d: compose_states(d, x_rel))(res.X)
                Q = jnp.matmul(jnp.matmul(J, res.Q, precision=_HI), J.T,
                               precision=_HI)
                key, sub = jax.random.split(key)
                bm = _blockmap_insert(bm, scan, X, sub, bm_cfg,
                                      cfg.min_range)
                # reset cursor so the scatter never saturates mid-chain
                bm = bm._replace(cursor=jnp.int32(0))
                return (xk + X * 1e-9 + jnp.diag(Q) * 1e-9, bm, key), None

            (xf, bm, _), _ = jax.lax.scan(
                body, (xk, bm0, jax.random.PRNGKey(0)), None, length=chain)
            return xf + bm.points[0, 0, 0] * 1e-9

        return g

    b_ms = slope_ms(make_reg_ins, (drive, x0))
    print(f"B  + blockmap insert                {b_ms:8.3f} ms"
          f"   (insert = {b_ms - a_ms:+.3f})")

    # --- C: full keyframe step, spawn never fires --------------------------
    kf_off = KeyframeConfig(spawn_distance=1e9, spawn_angle=1e9,
                            min_corr_fraction=0.0, delta_clamp=2.5)

    def make_step_nospawn(chain):
        @jax.jit
        def g(frames, x):
            bm0 = blockmap_init(bm_cfg)
            model0, bm0 = keyframe_spawn_jit(
                bm0, frames[0], jnp.zeros(6, jnp.float32),
                jax.random.PRNGKey(1), jnp.asarray(True), cfg, bm_cfg,
            )

            def body(carry, _):
                model, bm, x_rel, delta, key, n0 = carry
                key, sub = jax.random.split(key)
                res, x2, d2, _div, _spawn, n_corr, bm2 = keyframe_step_jit(
                    model, bm, frames[1], x_rel, delta, sub, n0,
                    cfg, kf_off, bm_cfg,
                )
                n0 = update_health0(n0, n_corr)
                bm2 = bm2._replace(cursor=jnp.int32(0))
                return (model, bm2, x2, d2, key, n0), None

            carry0 = (
                model0, bm0, jnp.zeros(6, jnp.float32),
                jnp.zeros(6, jnp.float32), jax.random.PRNGKey(0),
                jnp.zeros(2, jnp.float32),
            )
            (model, bm, x2, d2, _, _), _ = jax.lax.scan(
                body, carry0, None, length=chain)
            return x2 + d2 + bm.points[0, 0, 0] * 1e-9

        return g

    c_ms = slope_ms(make_step_nospawn, (drive, x0))
    print(f"C full step, no spawn               {c_ms:8.3f} ms"
          f"   (glue  = {c_ms - b_ms:+.3f})")

    # --- D: bench regime (spawn every ~3rd frame on the real drive) --------
    kf_cfg = KeyframeConfig(spawn_distance=3.0, spawn_angle=0.3,
                            delta_clamp=2.5)

    def make_step_bench(chain):
        @jax.jit
        def g(frames, x):
            bm0 = blockmap_init(bm_cfg)
            model0, bm0 = keyframe_spawn_jit(
                bm0, frames[0], jnp.zeros(6, jnp.float32),
                jax.random.PRNGKey(1), jnp.asarray(True), cfg, bm_cfg,
            )
            ks = (jnp.arange(chain) + 1) % nf

            def body(carry, k):
                model, bm, x_rel, delta, world, key, n0 = carry
                scan = frames[k]
                key, sub, sub2 = jax.random.split(key, 3)
                res, x2, d2, _div, spawn, n_corr, bm2 = keyframe_step_jit(
                    model, bm, scan, x_rel, delta, sub, n0,
                    cfg, kf_cfg, bm_cfg,
                )
                n0 = update_health0(n0, n_corr)
                world2 = compose_states(world, x2)

                def do_spawn(_):
                    m2, bm3 = keyframe_spawn_jit(
                        bm2, scan, world2, sub2, jnp.asarray(True),
                        cfg, bm_cfg)
                    return (m2, bm3, jnp.zeros(6, jnp.float32),
                            jnp.zeros(2, jnp.float32), world2)

                def keep(_):
                    return model, bm2, x2, n0, world

                model, bm, x_rel, n0, world = jax.lax.cond(
                    spawn, do_spawn, keep, None)
                return (model, bm, x_rel, d2, world, key, n0), None

            carry0 = (
                model0, bm0, jnp.zeros(6, jnp.float32),
                jnp.zeros(6, jnp.float32), jnp.zeros(6, jnp.float32),
                jax.random.PRNGKey(0), jnp.zeros(2, jnp.float32),
            )
            (model, bm, x_rel, d2, world, _, _), _ = jax.lax.scan(
                body, carry0, ks)
            return (world + x_rel + d2
                    + bm.points[0, 0, 0] * 1e-9
                    + model.mean[0, 0] * 1e-9)

        return g

    d_ms = slope_ms(make_step_bench, (drive, x0))
    print(f"D bench regime (spawn ~1/3 frames)  {d_ms:8.3f} ms"
          f"   (spawn amortized = {d_ms - c_ms:+.3f})")


if __name__ == "__main__":
    main()
