"""Capture + parse an xprof trace of the chained registration on the TPU.

Usage: timeout 600 python tools/trace_solve.py [--chain 20] [--odometry]

Prints the top device ops by total time, scaled to per-solve cost.  Parsing
goes through tensorflow.tsl's xplane protobuf with the pure-python protobuf
implementation (the tensorboard plugin converter is broken in this image).
"""

import argparse
import glob
import os
import sys
from collections import defaultdict

os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=20)
    ap.add_argument("--odometry", action="store_true",
                    help="trace the fused register+prepare odometry step")
    ap.add_argument("--headline", action="store_true",
                    help="trace bench.py's exact headline program: the "
                         "fused odometry step over the city drive with the "
                         "production early exit (tol 1e-4 + 1-sigma "
                         "statistical) — the while-loop path, NOT the "
                         "fixed-runlen scan path the default traces")
    ap.add_argument("--keyframe", action="store_true",
                    help="trace bench.py's keyframe regime: keyframe_step "
                         "+ block-map insert + spawn every ~3rd frame on "
                         "the city drive")
    ap.add_argument("--top", type=int, default=45)
    ap.add_argument("--logdir", default="/tmp/icet_trace_r2")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from icet_tpu import ICETConfig
    from icet_tpu.datasets.loaders import detect_beam_count, to_beam_major
    from icet_tpu.solver import prepare_reference, register

    scan1 = np.load("/root/reference/src/sample_data/frame_804.npy").astype(np.float32)
    scan2 = np.load("/root/reference/src/sample_data/frame_805.npy").astype(np.float32)
    nb = detect_beam_count(scan1) or 64
    c1 = jax.device_put(to_beam_major(scan1, nb))
    c2 = jax.device_put(to_beam_major(scan2, nb))
    x0 = jax.device_put(np.zeros(6, np.float32))
    jax.block_until_ready((c1, c2, x0))
    cfg = ICETConfig(n_iters=7)
    chain = args.chain

    if args.headline:
        from bench import _drive_frames
        from icet_tpu.solver import odometry_step_jit

        hcfg = ICETConfig(
            n_iters=7, convergence_tol=1e-4, convergence_stat_scale=1.0
        )
        drive = jax.device_put(_drive_frames())
        nf = drive.shape[0]

        @jax.jit
        def g(frames, _s2, x):
            model0 = prepare_reference(frames[0], hcfg)
            ks = (jnp.arange(chain) + 1) % nf

            def body(carry, k):
                model, xc = carry
                res, nm = odometry_step_jit(model, frames[k], xc, hcfg)
                return (nm, res.X), None

            (_, xf), _ = jax.lax.scan(body, (model0, x), ks)
            return xf

        c1 = drive  # reuse the arg plumbing below
    elif args.keyframe:
        from bench import _drive_frames
        from icet_tpu.config import BlockMapConfig, KeyframeConfig
        from icet_tpu.keyframe import (
            blockmap_init,
            keyframe_spawn_jit,
            keyframe_step_jit,
            update_health0,
        )
        from icet_tpu.ops.geometry import compose_states

        hcfg = ICETConfig(
            n_iters=7, convergence_tol=1e-4, convergence_stat_scale=1.0
        )
        kf_cfg = KeyframeConfig(
            spawn_distance=3.0, spawn_angle=0.3, delta_clamp=2.5
        )
        bm_cfg = BlockMapConfig()
        drive = jax.device_put(_drive_frames())
        nf = drive.shape[0]

        @jax.jit
        def g(frames, _s2, x):
            bm0 = blockmap_init(bm_cfg)
            model0, bm0 = keyframe_spawn_jit(
                bm0, frames[0], jnp.zeros(6, jnp.float32),
                jax.random.PRNGKey(1), jnp.asarray(True), hcfg, bm_cfg,
            )
            ks = (jnp.arange(chain) + 1) % nf

            def body(carry, k):
                model, bm, x_rel, delta, world, key, n0 = carry
                scan = frames[k]
                key, sub, sub2 = jax.random.split(key, 3)
                res, x2, d2, _div, spawn, n_corr, bm2 = keyframe_step_jit(
                    model, bm, scan, x_rel, delta, sub, n0,
                    hcfg, kf_cfg, bm_cfg,
                )
                n0 = update_health0(n0, n_corr)
                world2 = compose_states(world, x2)

                def do_spawn(_):
                    m2, bm3 = keyframe_spawn_jit(
                        bm2, scan, world2, sub2, jnp.asarray(True),
                        hcfg, bm_cfg)
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

        c1 = drive
    elif args.odometry:
        @jax.jit
        def g(s1, s2, x):
            model0 = prepare_reference(s1, cfg)

            def body(carry, _):
                model, xc = carry
                res = register(model, s2, xc, cfg)
                new_model = prepare_reference(s2, cfg)
                return (new_model, res.X), None

            (model, xf), _ = jax.lax.scan(body, (model0, x), None, length=chain)
            return xf
    else:
        @jax.jit
        def g(s1, s2, x):
            model = prepare_reference(s1, cfg)

            def body(xc, _):
                return register(model, s2, xc, cfg).X, None

            xf, _ = jax.lax.scan(body, x, None, length=chain)
            return xf

    x = np.asarray(g(c1, c2, x0))  # compile + warm
    assert np.isfinite(x).all(), x
    print("warm X:", np.round(x, 4))

    os.makedirs(args.logdir, exist_ok=True)
    jax.profiler.start_trace(args.logdir)
    np.asarray(g(c1, c2, x0))
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(args.logdir + "/**/*.xplane.pb", recursive=True))
    assert paths, f"no xplane under {args.logdir}"
    parse(paths[-1], chain, args.top)
    return 0


def parse(path: str, chain: int, top: int) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name or "#Chip" not in plane.name.replace(" ", ""):
            if not plane.name.startswith("/device:TPU"):
                continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        totals = defaultdict(float)
        counts = defaultdict(int)
        plane_total = 0.0
        for line in plane.lines:
            if "XLA Op" not in line.name and "Ops" not in line.name:
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                dur_us = ev.duration_ps / 1e6
                totals[name] += dur_us
                counts[name] += 1
                plane_total += dur_us
        if not totals:
            continue
        print(f"\n=== plane {plane.name}: total {plane_total/1e3:.3f} ms "
              f"({plane_total/chain:.1f} us/solve over chain={chain}) ===")
        rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
        for name, us in rows:
            print(f"{us/chain:9.1f} us/solve  x{counts[name]:5d}  {name[:110]}")


if __name__ == "__main__":
    sys.exit(main())
