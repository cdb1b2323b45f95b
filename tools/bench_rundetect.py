"""Micro-bench the internals of radial_cluster_bounds run detection."""

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
    from icet_tpu.ops.grid import voxel_ids

    scan1 = np.load(
        "/root/reference/src/sample_data/frame_804.npy"
    ).astype(np.float32)
    nb = detect_beam_count(scan1) or 64
    c1 = jax.device_put(to_beam_major(scan1, nb))
    jax.block_until_ready(c1)
    cfg = ICETConfig(n_iters=7)
    n_voxels = cfg.n_voxels
    _BIG = jnp.iinfo(jnp.int32).max

    def chained(stage_fn):
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

    def base(s):
        rtp = cart_to_spherical(s)
        r = rtp[..., 0]
        vid = voxel_ids(rtp, cfg)
        valid = r >= cfg.min_range
        vid = jnp.where(valid, vid, n_voxels).astype(jnp.int32)
        return jax.lax.sort((vid, r), num_keys=2)

    def s_sorted(s):
        vid_s, r_s = base(s)
        return r_s + vid_s.astype(r_s.dtype)

    def s_brk(s):
        vid_s, r_s = base(s)
        idx = jnp.arange(r_s.shape[0], dtype=jnp.int32)
        prev_vid = jnp.concatenate([jnp.full((1,), -1, jnp.int32), vid_s[:-1]])
        prev_r = jnp.concatenate([jnp.zeros((1,), r_s.dtype), r_s[:-1]])
        brk = (vid_s != prev_vid) | ((r_s - prev_r) > cfg.cluster_gap)
        return brk.astype(jnp.float32)

    def s_cummax(s):
        vid_s, r_s = base(s)
        n = r_s.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        prev_vid = jnp.concatenate([jnp.full((1,), -1, jnp.int32), vid_s[:-1]])
        prev_r = jnp.concatenate([jnp.zeros((1,), r_s.dtype), r_s[:-1]])
        brk = (vid_s != prev_vid) | ((r_s - prev_r) > cfg.cluster_gap)
        run_start = jax.lax.cummax(jnp.where(brk, idx, 0))
        return run_start.astype(jnp.float32)

    def s_bothscans(s):
        vid_s, r_s = base(s)
        n = r_s.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        prev_vid = jnp.concatenate([jnp.full((1,), -1, jnp.int32), vid_s[:-1]])
        prev_r = jnp.concatenate([jnp.zeros((1,), r_s.dtype), r_s[:-1]])
        brk = (vid_s != prev_vid) | ((r_s - prev_r) > cfg.cluster_gap)
        run_start = jax.lax.cummax(jnp.where(brk, idx, 0))
        nxt_brk_incl = jax.lax.cummin(jnp.where(brk, idx, _BIG), reverse=True)
        return run_start.astype(jnp.float32) + nxt_brk_incl.astype(jnp.float32)

    def s_segmin(s):
        vid_s, r_s = base(s)
        n = r_s.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        prev_vid = jnp.concatenate([jnp.full((1,), -1, jnp.int32), vid_s[:-1]])
        prev_r = jnp.concatenate([jnp.zeros((1,), r_s.dtype), r_s[:-1]])
        brk = (vid_s != prev_vid) | ((r_s - prev_r) > cfg.cluster_gap)
        run_start = jax.lax.cummax(jnp.where(brk, idx, 0))
        cand = jnp.where(run_start >= 0, run_start, _BIG)
        first = jax.ops.segment_min(
            cand, vid_s, num_segments=n_voxels + 1, indices_are_sorted=True
        )
        return first.astype(jnp.float32)

    from icet_tpu.ops.clustering import radial_cluster_bounds

    def s_full(s):
        rtp = cart_to_spherical(s)
        r = rtp[..., 0]
        cl = radial_cluster_bounds(
            voxel_ids(rtp, cfg), r, r >= cfg.min_range, n_voxels,
            cfg.min_pts, cfg.cluster_gap, cfg.cluster_buffer,
        )
        return cl.bounds

    stages = [
        ("sort only", s_sorted),
        ("+brk", s_brk),
        ("+cummax", s_cummax),
        ("+cummax+revcummin", s_bothscans),
        ("+segment_min (no cummin)", s_segmin),
        ("full cluster", s_full),
    ]
    for name, fn in stages:
        ms = slope_ms(chained(fn), (c1,))
        print(f"{name:28s} {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
