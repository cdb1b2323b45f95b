"""Stage-level slope benchmark of prepare_reference on the TPU.

Chains each stage inside one jitted lax.scan (output perturbs the next
input — a true data dependency, see CLAUDE.md on the eliding tunnel) and
reports the slope between two chain lengths per stage.
"""

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
    from icet_tpu.ops.geometry import cart_to_spherical
    from icet_tpu.ops.grid import voxel_ids, voxel_anchors
    from icet_tpu.ops.clustering import radial_cluster_bounds
    from icet_tpu.ops.windowed_moments import windowed_moment_sums
    from icet_tpu.ops.moments import finalize_moments
    from icet_tpu.ops.wls_planes import eigh3_planes
    from icet_tpu.solver import prepare_reference, _sigma_axis_mask

    scan1 = np.load(
        "/root/reference/src/sample_data/frame_804.npy"
    ).astype(np.float32)
    nb = detect_beam_count(scan1) or 64
    c1 = jax.device_put(to_beam_major(scan1, nb))
    jax.block_until_ready(c1)
    cfg = ICETConfig(n_iters=7)

    def chained(stage_fn):
        """stage_fn: scan -> scalar-ish output; chains via input jitter."""

        def make(chain):
            @jax.jit
            def g(s):
                def body(carry, _):
                    out = stage_fn(s + carry * 1e-12)
                    return jnp.sum(out).astype(s.dtype) * 1e-12, None

                acc, _ = jax.lax.scan(
                    body, jnp.zeros((), s.dtype), None, length=chain
                )
                return acc

            return g

        return make

    def s_c2s(s):
        rtp = cart_to_spherical(s)
        return rtp[..., 0] + voxel_ids(rtp, cfg).astype(s.dtype)

    def s_sort(s):
        rtp = cart_to_spherical(s)
        r = rtp[..., 0]
        vid = voxel_ids(rtp, cfg)
        vid_s, r_s = jax.lax.sort((vid, r), num_keys=2)
        return r_s + vid_s.astype(s.dtype)

    def s_cluster(s):
        rtp = cart_to_spherical(s)
        r = rtp[..., 0]
        cl = radial_cluster_bounds(
            voxel_ids(rtp, cfg), r, r >= cfg.min_range, cfg.n_voxels,
            cfg.min_pts, cfg.cluster_gap, cfg.cluster_buffer,
        )
        return cl.bounds

    def s_moments(s):
        cl = s_cluster_result(s)
        anchors = voxel_anchors(cl.bounds, cfg)
        sums, _ = windowed_moment_sums(
            s, jnp.zeros(6, s.dtype), cl.bounds, anchors, cfg
        )
        return sums

    def s_cluster_result(s):
        rtp = cart_to_spherical(s)
        r = rtp[..., 0]
        return radial_cluster_bounds(
            voxel_ids(rtp, cfg), r, r >= cfg.min_range, cfg.n_voxels,
            cfg.min_pts, cfg.cluster_gap, cfg.cluster_buffer,
        )

    def s_full(s):
        m = prepare_reference(s, cfg)
        return m.mean

    def s_moments_only(s):
        # windowed sums with FIXED bounds (no clustering dependency)
        bounds = jnp.ones((cfg.n_voxels + 1, 2), s.dtype) * jnp.array([0.0, 100.0])
        anchors = jnp.zeros((cfg.n_voxels + 1, 3), s.dtype)
        sums, _ = windowed_moment_sums(
            s, jnp.zeros(6, s.dtype), bounds, anchors, cfg
        )
        return sums

    def s_eigh(s):
        cl = s_cluster_result(s)
        anchors = voxel_anchors(cl.bounds, cfg)
        sums, _ = windowed_moment_sums(
            s, jnp.zeros(6, s.dtype), cl.bounds, anchors, cfg
        )
        mom = finalize_moments(sums, anchors)
        ev, basis = eigh3_planes(mom.cov)
        return ev + jnp.sum(basis, axis=-1)

    stages = [
        ("c2s+vids", s_c2s),
        ("+lex sort", s_sort),
        ("+run detect (cluster)", s_cluster),
        ("+windowed moments", s_moments),
        ("+eigh3", s_eigh),
        ("full prepare", s_full),
        ("[moments alone, fixed bounds]", s_moments_only),
    ]
    for name, fn in stages:
        ms = slope_ms(chained(fn), (c1,))
        print(f"{name:32s} {ms:8.3f} ms")


if __name__ == "__main__":
    main()
