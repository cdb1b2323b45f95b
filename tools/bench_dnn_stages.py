"""Where do the DNN filter's ~13 ms/frame go?  (VERDICT r4: dnn_frame_ms)

Slope-benchmarks (CLAUDE.md honest-chain methodology) the pieces of one
``dnn_reject_mask`` call on the bench city drive's geometry:

  A  model_voxel_samples            (65k argsort + (V,S) gather)
  B  pack + 1 bias-net forward      (the (V, 2S, 256) encoder)
  C  full dnn_reject_mask           (A for scan2 + 2 refine forwards + proj)
  D  plain odometry step            (the no-filter baseline)
  E  DNN odometry step              (bench.py's dnn_frame_ms reproduction)

Each stage is chained with true data dependencies (stage output perturbs the
next iteration's input) so the tunnel cannot elide work.

Usage: timeout 1200 python tools/bench_dnn_stages.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CHAINS = (8, 40)


def slope_ms(make, args):
    import jax

    totals = {}
    for chain in CHAINS:
        fn = make(chain)
        out = np.asarray(jax.block_until_ready(fn(*args)))
        assert np.isfinite(out).all(), out
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            best = min(best, time.perf_counter() - t0)
        totals[chain] = best
    return (totals[CHAINS[1]] - totals[CHAINS[0]]) / (CHAINS[1] - CHAINS[0]) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from icet_tpu import ICETConfig
    from icet_tpu.filters import (
        dnn_reject_mask,
        model_voxel_samples,
        odometry_step_dnn_jit,
        pretrained_dnn,
    )
    from icet_tpu.models.bias_net import pack_voxel_samples
    from icet_tpu.solver import odometry_step_jit, prepare_reference

    cfg = ICETConfig(n_iters=7, convergence_tol=1e-4, dnn_filter=True)
    net, params = pretrained_dnn(cfg)

    drive = jax.device_put(bench._drive_frames())
    params = jax.device_put(params)
    scan1 = drive[0]
    scan2 = drive[1]
    model = jax.block_until_ready(
        jax.jit(prepare_reference, static_argnums=1)(scan1, cfg)
    )

    # --- A: per-voxel sampling pass -------------------------------------
    def make_sample(chain):
        @jax.jit
        def g(scan):
            def body(s, _):
                smp, n = model_voxel_samples(model, s, cfg)
                # data dependency: nudge the scan by a sample-derived epsilon
                return s + jnp.mean(smp) * 1e-9, None

            s, _ = jax.lax.scan(body, scan, None, length=chain)
            return s

        return g

    print(f"A model_voxel_samples        {slope_ms(make_sample, (scan2,)):8.3f} ms")

    # --- B: one bias-net forward on (unpacked) samples -------------------
    from icet_tpu.filters import _unpack_fill_samples

    ps1, n1 = jax.block_until_ready(
        jax.jit(lambda s: model_voxel_samples(model, s, cfg))(scan1)
    )
    s1 = jax.block_until_ready(
        jax.jit(_unpack_fill_samples)(ps1, n1)
    )
    s2 = jax.block_until_ready(
        jax.jit(
            lambda s: _unpack_fill_samples(*model_voxel_samples(model, s, cfg))
        )(scan2)
    )

    def make_forward(apply_fn):
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

    from icet_tpu.models.bias_net import apply_bias_net

    flax_fwd = make_forward(lambda x: net.apply(params, x))
    fused_fwd = make_forward(
        lambda x: apply_bias_net(net, params, x, fused=True)
    )
    print(f"B pack + net forward (flax)  {slope_ms(flax_fwd, (s1, s2)):8.3f} ms")
    print(f"B'pack + net forward (fused) {slope_ms(fused_fwd, (s1, s2)):8.3f} ms")

    # --- C: full reject mask (sampling of scan2 + 2 forwards + proj) ----
    def make_mask(chain):
        @jax.jit
        def g(scan):
            def body(s, _):
                filt = dnn_reject_mask(net, params, model, scan1, s, cfg,
                                       samples1=(ps1, n1))
                return s + jnp.mean(filt.dnn_shift) * 1e-9, None

            s, _ = jax.lax.scan(body, scan, None, length=chain)
            return s

        return g

    print(f"C dnn_reject_mask            {slope_ms(make_mask, (scan2,)):8.3f} ms")

    # --- D/E: plain vs DNN odometry step over the drive ------------------
    nf = drive.shape[0]
    x0 = jax.device_put(np.zeros(6, np.float32))

    cfg_plain = ICETConfig(n_iters=7, convergence_tol=1e-4)

    def make_plain(chain):
        @jax.jit
        def g(frames, x):
            model0 = prepare_reference(frames[0], cfg_plain)
            ks = (jnp.arange(chain) + 1) % nf

            def body(carry, k):
                m, xc = carry
                res, nm = odometry_step_jit(m, frames[k], xc, cfg_plain)
                return (nm, res.X), None

            (_, xf), _ = jax.lax.scan(body, (model0, x), ks)
            return xf

        return g

    print(f"D plain odometry step        {slope_ms(make_plain, (drive, x0)):8.3f} ms")

    def make_dnn(chain):
        @jax.jit
        def g(frames, x):
            model0 = prepare_reference(frames[0], cfg)
            samples0 = model_voxel_samples(model0, frames[0], cfg)
            ks = (jnp.arange(chain) + 1) % nf

            def body(carry, k):
                m, prev, smp, xc = carry
                res, nm, nsmp = odometry_step_dnn_jit(
                    m, prev, smp, frames[k], xc, cfg, net, params
                )
                return (nm, frames[k], nsmp, res.X), None

            (_, _, _, xf), _ = jax.lax.scan(
                body, (model0, frames[0], samples0, x), ks
            )
            return xf

        return g

    print(f"E DNN odometry step          {slope_ms(make_dnn, (drive, x0)):8.3f} ms")


if __name__ == "__main__":
    main()
