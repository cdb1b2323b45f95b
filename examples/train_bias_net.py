"""Train the perspective-shift bias network and save deployable weights.

Mixes synthetic planar patches with raycast voxel pairs (real perspective
shift from two sensor poses of the same simulated scene).

Usage: python examples/train_bias_net.py [--steps 1500] [--out weights.npz]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--pairs", type=int, default=6)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "icet_tpu", "models", "weights", "bias_net_s100.npz",
        ),
    )
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--real-pairs", action="store_true",
        help="distill the bundled REAL Ouster pair into training: solve it "
             "with ICET (self-labeling), align by the solution, and mix its "
             "voxel samples (real beam dropout / range noise / surfaces) "
             "into the raycast pool",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from icet_tpu.models.train_data import train_bias_net_mixed
    from icet_tpu.utils.checkpoint import save_checkpoint

    extra = None
    if args.real_pairs:
        import jax.numpy as jnp

        from icet_tpu import ICETConfig
        from icet_tpu.datasets.loaders import detect_beam_count, to_beam_major
        from icet_tpu.models.train_data import make_real_pair_voxel_samples
        from icet_tpu.solver import register_pair

        ref = "/root/reference/src/sample_data"
        f1 = np.load(f"{ref}/frame_804.npy").astype(np.float32)
        f2 = np.load(f"{ref}/frame_805.npy").astype(np.float32)
        nb = detect_beam_count(f1) or 64
        f1, f2 = to_beam_major(f1, nb), to_beam_major(f2, nb)
        cfg = ICETConfig(n_iters=7)
        res = register_pair(
            jnp.asarray(f1), jnp.asarray(f2), jnp.zeros(6), cfg
        )
        extra = make_real_pair_voxel_samples(f1, f2, np.asarray(res.X), cfg)
        print(f"real-pair distillation: {extra[0].shape[0]} voxel pairs "
              f"(teacher X = {np.round(np.asarray(res.X), 4)})")

    t0 = time.time()
    model, params, losses, _ = train_bias_net_mixed(
        steps=args.steps, batch=args.batch, n_pairs=args.pairs,
        extra_pairs=extra,
    )
    print(
        f"trained {args.steps} steps in {time.time() - t0:.0f}s; "
        f"loss {losses[0]:.3f} -> {np.mean(losses[-100:]):.4f}"
    )
    params_np = jax.tree_util.tree_map(lambda a: np.asarray(a), params)
    save_checkpoint(args.out, params_np)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
