"""Chip cost of the DNN-filtered odometry step (the last unmeasured path).

Chains ``filters.odometry_step_dnn_jit`` over the cached city drive exactly
like bench.py's sequence headline (true data dependencies, slope between two
chain lengths — see CLAUDE.md "the tunnel LIES") and prints the per-frame
cost next to the plain step's, i.e. what engaging ``cfg.dnn_filter``
(reference DNN_filter ctor flag, ICET_spherical.py:288-390 in-loop
semantics) costs per frame on the chip.

Usage: timeout 900 python tools/bench_dnn.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CHAINS = (10, 50)


def slope_ms(fn_for_chain, args):
    totals = {}
    for chain in CHAINS:
        fn = fn_for_chain(chain)
        out = np.asarray(fn(*args))
        assert np.isfinite(out).all(), out
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        totals[chain] = best
    return (totals[CHAINS[1]] - totals[CHAINS[0]]) / (CHAINS[1] - CHAINS[0]) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from icet_tpu import ICETConfig
    from icet_tpu.filters import (
        model_voxel_samples,
        odometry_step_dnn_jit,
        pretrained_dnn,
    )
    from icet_tpu.solver import odometry_step_jit, prepare_reference

    drive = jax.device_put(bench._drive_frames())
    x0 = jax.device_put(np.zeros(6, np.float32))
    jax.block_until_ready((drive, x0))
    nf = drive.shape[0]

    for label, in_loop in (("dnn_in_loop", True), ("dnn_one_shot", False)):
        cfg = ICETConfig(
            n_iters=7, convergence_tol=1e-4, dnn_filter=True,
            dnn_in_loop=in_loop,
        )
        net, params = pretrained_dnn(cfg)
        params = jax.device_put(params)

        def make_seq(chain, cfg=cfg, net=net, params=params):
            @jax.jit
            def g(frames, x):
                model0 = prepare_reference(frames[0], cfg)
                samples0 = model_voxel_samples(model0, frames[0], cfg)
                ks = (jnp.arange(chain) + 1) % nf

                def body(carry, k):
                    model, prev_scan, samples, xc = carry
                    scan = frames[k]
                    res, next_model, next_samples = odometry_step_dnn_jit(
                        model, prev_scan, samples, scan, xc, cfg, net, params
                    )
                    return (next_model, scan, next_samples, res.X), None

                (_, _, _, xf), _ = jax.lax.scan(
                    body, (model0, frames[0], samples0, x), ks
                )
                return xf

            return g

        ms = slope_ms(make_seq, (drive, x0))
        print(f"{label:16s} {ms:7.4f} ms/frame")

    cfg_plain = ICETConfig(n_iters=7, convergence_tol=1e-4)

    def make_plain(chain):
        @jax.jit
        def g(frames, x):
            model0 = prepare_reference(frames[0], cfg_plain)
            ks = (jnp.arange(chain) + 1) % nf

            def body(carry, k):
                model, xc = carry
                res, next_model = odometry_step_jit(
                    model, frames[k], xc, cfg_plain
                )
                return (next_model, res.X), None

            (_, xf), _ = jax.lax.scan(body, (model0, x), ks)
            return xf

        return g

    ms = slope_ms(make_plain, (drive, x0))
    print(f"{'plain':16s} {ms:7.4f} ms/frame")


if __name__ == "__main__":
    main()
