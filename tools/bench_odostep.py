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

