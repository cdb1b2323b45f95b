"""Stage-level slope benchmark of ONE register iteration's internals on TPU.

Chains each stage inside a jitted lax.scan with a true data dependency
(a tiny function of the stage output perturbs the next input — the eliding
tunnel cannot skip any step; see CLAUDE.md) and reports the slope between
two chain lengths per stage.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CHAINS = (20, 100)


def slope_us(make, args):
    import jax

    totals = {}
    for chain in CHAINS:
        fn = jax.jit(make(chain))
        out = np.asarray(fn(*args))
        assert np.isfinite(out).all(), out
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        totals[chain] = best
    return (totals[CHAINS[1]] - totals[CHAINS[0]]) / (CHAINS[1] - CHAINS[0]) * 1e6


def main():
    import jax
    import jax.numpy as jnp

    from icet_tpu import ICETConfig
    from icet_tpu.datasets.loaders import detect_beam_count, to_beam_major
    from icet_tpu.ops.moments import finalize_moments
    from icet_tpu.ops.windowed_moments import windowed_moment_sums
    from icet_tpu.ops.wls_planes import (
        assemble_normal_equations,
        eigh3_planes,
        residual_compact_planes,
    )
    from icet_tpu.ops.geometry import rotation_jacobian
    from icet_tpu.ops.linalg import eigh_small, eigh_small_warm_safe
    from icet_tpu.solver import _iteration, _pack_model_planes, prepare_reference

    s1 = np.load("/root/reference/src/sample_data/frame_804.npy").astype(np.float32)
    s2 = np.load("/root/reference/src/sample_data/frame_805.npy").astype(np.float32)
    nb = detect_beam_count(s1) or 64
    c1 = jax.device_put(to_beam_major(s1, nb))
    c2 = jax.device_put(to_beam_major(s2, nb))
    x0 = jax.device_put(np.zeros(6, np.float32))
    cfg = ICETConfig(n_iters=7)
    model = jax.jit(prepare_reference, static_argnums=1)(c1, cfg)
    jax.block_until_ready((c1, c2, x0, model))

    sums0, _ = windowed_moment_sums(c2, x0, model.bounds, model.anchors, cfg)
    m20 = finalize_moments(sums0, model.anchors)

    # --- full iteration ---
    def make_full(chain):
        def g(scan2, x):
            def body(carry, it):
                X, U2w = carry
                Xn, _, _, _, U2, _ = _iteration(
                    model, scan2, X, it, cfg, None, None, U2w
                )
                return (Xn, U2), None

            (xf, _), _ = jax.lax.scan(
                body, (x, jnp.eye(6)), jnp.arange(1, chain + 1)
            )
            return xf

        return g

    # --- full iteration, post-stage tables packed into one buffer ---
    packed0 = jax.jit(_pack_model_planes)(model)
    jax.block_until_ready(packed0)

    def make_full_packed(chain):
        def g(scan2, x):
            packed = _pack_model_planes(model)

            def body(carry, it):
                X, U2w = carry
                Xn, _, _, _, U2, _ = _iteration(
                    model, scan2, X, it, cfg, None, None, U2w, packed
                )
                return (Xn, U2), None

            (xf, _), _ = jax.lax.scan(
                body, (x, jnp.eye(6)), jnp.arange(1, chain + 1)
            )
            return xf

        return g

    # --- windowed sums alone ---
    def make_sums(chain):
        def g(scan2, x):
            def body(X, _):
                sums, ovf = windowed_moment_sums(
                    scan2, X, model.bounds, model.anchors, cfg
                )
                return x + sums[0, 0] * 1e-20 + ovf * 1e-20, None

            xf, _ = jax.lax.scan(body, x, None, length=chain)
            return xf

        return g

    # --- finalize + residual + assemble + eigh (everything after sums) ---
    def make_post(chain):
        def g(scan2, x):
            dR = rotation_jacobian(x[3:6])

            def body(carry, _):
                X, U2w = carry
                sums = sums0 + X[0] * 1e-20
                m2 = finalize_moments(sums, model.anchors)
                corr = model.valid & (m2.count >= cfg.min_pts)
                cm = corr.astype(jnp.float32)
                HTWH, HTWdz, _ = assemble_normal_equations(
                    model.basis, model.lmask, model.cov, model.count,
                    m2.cov, m2.count, model.mean, m2.mean, dR, cm,
                    cfg.pinv_rcond,
                )
                w6, U2 = eigh_small_warm_safe(HTWH, U2w)
                dx = U2 @ (U2.T @ HTWdz / jnp.maximum(jnp.abs(w6), 1e-9))
                return (X + dx * 1e-20, U2), None

            (xf, _), _ = jax.lax.scan(body, (x, jnp.eye(6)), None, length=chain)
            return xf

        return g

    # --- assemble_normal_equations alone ---
    def make_asm(chain):
        def g(scan2, x):
            dR = rotation_jacobian(x[3:6])
            cm = model.valid.astype(jnp.float32)

            def body(X, _):
                HTWH, HTWdz, _ = assemble_normal_equations(
                    model.basis, model.lmask, model.cov, model.count,
                    m20.cov + X[0] * 1e-20, m20.count, model.mean, m20.mean,
                    dR, cm, cfg.pinv_rcond,
                )
                return X + HTWdz * 1e-20, None

            xf, _ = jax.lax.scan(body, x, None, length=chain)
            return xf

        return g

    # --- warm 6x6 eigh alone ---
    def make_eigh(chain):
        H0 = jnp.eye(6) * jnp.arange(1, 7)

        def g(scan2, x):
            def body(carry, _):
                H, U2w = carry
                w6, U2 = eigh_small_warm_safe(H, U2w)
                return (H + w6[0] * 1e-20, U2), None

            (Hf, _), _ = jax.lax.scan(body, (H0 + x[0], jnp.eye(6)), None, length=chain)
            return Hf[0]

        return g

    for name, make, args in [
        ("full_iteration", make_full, (c2, x0)),
        ("full_iteration_packed", make_full_packed, (c2, x0)),
        ("windowed_sums", make_sums, (c2, x0)),
        ("post_sums(finalize+asm+eigh)", make_post, (c2, x0)),
        ("assemble_normals", make_asm, (c2, x0)),
        ("warm_eigh6", make_eigh, (c2, x0)),
    ]:
        us = slope_us(make, args)
        print(f"{name:32s} {us:9.1f} us/step")


if __name__ == "__main__":
    main()
