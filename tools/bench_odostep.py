"""Isolate where the fused odometry step loses time vs register+prepare."""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CHAINS = (10, 50)


def slope_ms(make, args):
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

    from icet_tpu import ICETConfig
    from icet_tpu.datasets.loaders import detect_beam_count, to_beam_major
    from icet_tpu.solver import odometry_step_jit, prepare_reference, register

    s1 = np.load("/root/reference/src/sample_data/frame_804.npy").astype(np.float32)
    s2 = np.load("/root/reference/src/sample_data/frame_805.npy").astype(np.float32)
    nb = detect_beam_count(s1) or 64
    c1 = jax.device_put(to_beam_major(s1, nb))
    c2 = jax.device_put(to_beam_major(s2, nb))
    x0 = jax.device_put(np.zeros(6, np.float32))
    jax.block_until_ready((c1, c2, x0))
    cfg = ICETConfig(n_iters=7)

    # A: register-only, model closed over (the old headline)
    def make_reg(chain):
        @jax.jit
        def g(s1, s2, x):
            model = prepare_reference(s1, cfg)

            def body(xc, _):
                return register(model, s2, xc, cfg).X, None

            xf, _ = jax.lax.scan(body, x, None, length=chain)
            return xf

        return g

    # B: register-only but model as loop CARRY (no alternation)
    def make_reg_carry(chain):
        @jax.jit
        def g(s1, s2, x):
            model0 = prepare_reference(s1, cfg)

            def body(carry, _):
                model, xc = carry
                res = register(model, s2, xc, cfg)
                return (model, res.X), None

            (_, xf), _ = jax.lax.scan(body, (model0, x), None, length=chain)
            return xf

        return g

    # C: odometry step, FIXED scan (always s2), model carried
    def make_odo_fixed(chain):
        @jax.jit
        def g(s1, s2, x):
            model0 = prepare_reference(s1, cfg)

            def body(carry, _):
                model, xc = carry
                res, nm = odometry_step_jit(model, s2, xc, cfg)
                return (nm, res.X), None

            (_, xf), _ = jax.lax.scan(body, (model0, x), None, length=chain)
            return xf

        return g

    # D: odometry step, alternating scans (the new headline)
    def make_odo_alt(chain):
        @jax.jit
        def g(s1, s2, x):
            model0 = prepare_reference(s1, cfg)
            parity = jnp.arange(chain) % 2

            def body(carry, p):
                model, xc = carry
                scan = jnp.where(p == 0, s2, s1)
                res, nm = odometry_step_jit(model, scan, xc, cfg)
                return (nm, res.X), None

            (_, xf), _ = jax.lax.scan(body, (model0, x), parity)
            return xf

        return g

    # E: prepare alone chained via model carry (scan fixed)
    def make_prep_carry(chain):
        @jax.jit
        def g(s1, s2, x):
            model0 = prepare_reference(s1, cfg)

            def body(m, _):
                nm = prepare_reference(s2 + m.mean[0, 0] * 1e-12, cfg)
                return nm, None

            mf, _ = jax.lax.scan(body, model0, None, length=chain)
            return mf.mean

        return g

    for name, mk in [
        ("A register, model closure", make_reg),
        ("B register, model carry", make_reg_carry),
        ("C odo step, fixed scan", make_odo_fixed),
        ("D odo step, alternating", make_odo_alt),
        ("E prepare, model carry", make_prep_carry),
    ]:
        ms = slope_ms(mk, (c1, c2, x0))
        print(f"{name:28s} {ms:8.3f} ms")


if __name__ == "__main__":
    main()


def variants2():
    import jax
    import jax.numpy as jnp

    from icet_tpu import ICETConfig
    from icet_tpu.datasets.loaders import detect_beam_count, to_beam_major
    from icet_tpu.solver import odometry_step_jit, prepare_reference, register

    s1 = np.load("/root/reference/src/sample_data/frame_804.npy").astype(np.float32)
    s2 = np.load("/root/reference/src/sample_data/frame_805.npy").astype(np.float32)
    nb = detect_beam_count(s1) or 64
    c1 = jax.device_put(to_beam_major(s1, nb))
    c2 = jax.device_put(to_beam_major(s2, nb))
    x0 = jax.device_put(np.zeros(6, np.float32))
    jax.block_until_ready((c1, c2, x0))
    cfg = ICETConfig(n_iters=7)

    # F: scans delivered as lax.scan xs (production shape: fresh frame per step)
    def make_odo_xs(chain):
        @jax.jit
        def g(s1, xs, x):
            model0 = prepare_reference(s1, cfg)

            def body(carry, scan):
                model, xc = carry
                res, nm = odometry_step_jit(model, scan, xc, cfg)
                return (nm, res.X), None

            (_, xf), _ = jax.lax.scan(body, (model0, x), xs)
            return xf

        return g

    def args_odo_xs(chain):
        frames = np.stack([np.asarray(c2), np.asarray(c1)] * (chain // 2 + 1))[:chain]
        return (c1, jax.device_put(frames), x0)

    # G: register-only with per-step scan jitter (defeats scan2 hoisting)
    def make_reg_jitter(chain):
        @jax.jit
        def g(s1, s2, x):
            model = prepare_reference(s1, cfg)

            def body(xc, _):
                s = s2 + xc[0] * 1e-12
                return register(model, s, xc, cfg).X, None

            xf, _ = jax.lax.scan(body, x, None, length=chain)
            return xf

        return g

    # H: odo step with per-step scan jitter (no select, no xs slice)
    def make_odo_jitter(chain):
        @jax.jit
        def g(s1, s2, x):
            model0 = prepare_reference(s1, cfg)

            def body(carry, _):
                model, xc = carry
                s = s2 + xc[0] * 1e-12
                res, nm = odometry_step_jit(model, s, xc, cfg)
                return (nm, res.X), None

            (_, xf), _ = jax.lax.scan(body, (model0, x), None, length=chain)
            return xf

        return g

    totalsF = {}
    for chain in CHAINS:
        fn = make_odo_xs(chain)
        args = args_odo_xs(chain)
        out = np.asarray(fn(*args))
        assert np.isfinite(out).all(), out
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        totalsF[chain] = best
    msF = (totalsF[CHAINS[1]] - totalsF[CHAINS[0]]) / (CHAINS[1] - CHAINS[0]) * 1e3
    print(f"{'F odo step, xs frames':28s} {msF:8.3f} ms")

    for name, mk in [
        ("G register, scan jitter", make_reg_jitter),
        ("H odo step, scan jitter", make_odo_jitter),
    ]:
        ms = slope_ms(mk, (c1, c2, x0))
        print(f"{name:28s} {ms:8.3f} ms")


def variants3():
    import jax
    import jax.numpy as jnp

    from icet_tpu import ICETConfig
    from icet_tpu.datasets.loaders import detect_beam_count, to_beam_major
    from icet_tpu.solver import odometry_step_jit, prepare_reference

    s1 = np.load("/root/reference/src/sample_data/frame_804.npy").astype(np.float32)
    s2 = np.load("/root/reference/src/sample_data/frame_805.npy").astype(np.float32)
    nb = detect_beam_count(s1) or 64
    c1 = jax.device_put(to_beam_major(s1, nb))
    c2 = jax.device_put(to_beam_major(s2, nb))
    x0 = jax.device_put(np.zeros(6, np.float32))
    jax.block_until_ready((c1, c2, x0))
    cfg = ICETConfig(n_iters=7)

    # F2: frames fed as (chain, 3, N) — transpose inside body should be a
    # layout no-op if the compute wants N-minor.
    def make_odo_xsT(chain):
        @jax.jit
        def g(s1, xsT, x):
            model0 = prepare_reference(s1, cfg)

            def body(carry, scanT):
                model, xc = carry
                res, nm = odometry_step_jit(model, scanT.T, xc, cfg)
                return (nm, res.X), None

            (_, xf), _ = jax.lax.scan(body, (model0, x), xsT)
            return xf

        return g

    def args_odo_xsT(chain):
        frames = np.stack(
            [np.asarray(c2).T, np.asarray(c1).T] * (chain // 2 + 1)
        )[:chain]
        return (c1, jax.device_put(np.ascontiguousarray(frames)), x0)

    # F3: frames fed flat (chain, N*3) then reshaped
    def make_odo_xsflat(chain):
        @jax.jit
        def g(s1, xsf, x):
            model0 = prepare_reference(s1, cfg)

            def body(carry, scanf):
                model, xc = carry
                res, nm = odometry_step_jit(
                    model, scanf.reshape(-1, 3), xc, cfg
                )
                return (nm, res.X), None

            (_, xf), _ = jax.lax.scan(body, (model0, x), xsf)
            return xf

        return g

    def args_odo_xsflat(chain):
        frames = np.stack(
            [np.asarray(c2).reshape(-1), np.asarray(c1).reshape(-1)]
            * (chain // 2 + 1)
        )[:chain]
        return (c1, jax.device_put(frames), x0)

    for name, mk, mkargs in [
        ("F2 odo step, (3,N) frames", make_odo_xsT, args_odo_xsT),
        ("F3 odo step, flat frames", make_odo_xsflat, args_odo_xsflat),
    ]:
        totals = {}
        for chain in CHAINS:
            fn = mk(chain)
            args = mkargs(chain)
            out = np.asarray(fn(*args))
            assert np.isfinite(out).all(), out
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn(*args))
                best = min(best, time.perf_counter() - t0)
            totals[chain] = best
        ms = (totals[CHAINS[1]] - totals[CHAINS[0]]) / (CHAINS[1] - CHAINS[0]) * 1e3
        print(f"{name:28s} {ms:8.3f} ms")


def variants4():
    import jax
    import jax.numpy as jnp

    from icet_tpu import ICETConfig
    from icet_tpu.datasets.loaders import detect_beam_count, to_beam_major
    from icet_tpu.solver import odometry_step_jit, prepare_reference

    s1 = np.load("/root/reference/src/sample_data/frame_804.npy").astype(np.float32)
    s2 = np.load("/root/reference/src/sample_data/frame_805.npy").astype(np.float32)
    nb = detect_beam_count(s1) or 64
    c1 = jax.device_put(to_beam_major(s1, nb))
    c2 = jax.device_put(to_beam_major(s2, nb))
    x0 = jax.device_put(np.zeros(6, np.float32))
    jax.block_until_ready((c1, c2, x0))
    cfg = ICETConfig(n_iters=7)

    # D2: alternating scans with SIGN-CORRECTED warm start (constant-velocity
    # analog for the reversing 2-frame sequence).
    def make_odo_alt_warm(chain):
        @jax.jit
        def g(s1, s2, x):
            model0 = prepare_reference(s1, cfg)
            parity = jnp.arange(chain) % 2

            def body(carry, p):
                model, xc = carry
                scan = jnp.where(p == 0, s2, s1)
                res, nm = odometry_step_jit(model, scan, xc, cfg)
                return (nm, -res.X), None

            (_, xf), _ = jax.lax.scan(body, (model0, x), parity)
            return xf

        return g

    ms = slope_ms(make_odo_alt_warm, (c1, c2, x0))
    print(f"{'D2 odo alt, signed warmstart':28s} {ms:8.3f} ms")
