"""Registration demo — the reference's python/ICET_demo.ipynb, headless.

Registers the two bundled sample clouds at the notebook's configuration and
prints the solved transform + predicted error stds; optionally writes PNG
visualizations.

Usage: python examples/demo_registration.py [--viz out_dir] [--tpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--viz", default=None, help="directory for PNG artifacts")
    ap.add_argument("--cloud1", default="/root/reference/python/point_clouds/sample_pc_1.npy")
    ap.add_argument("--cloud2", default="/root/reference/python/point_clouds/sample_pc_2.npy")
    ap.add_argument("--cpu", action="store_true", help="force CPU")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from icet_tpu import PROFILES, register_pair
    from icet_tpu.solver import prepare_reference_jit

    cfg = PROFILES["notebook"]
    c1 = jnp.asarray(np.load(args.cloud1).astype(np.float32))
    c2 = jnp.asarray(np.load(args.cloud2).astype(np.float32))

    t0 = time.perf_counter()
    res = register_pair(c1, c2, jnp.zeros(6), cfg)
    jax.block_until_ready(res)
    t1 = time.perf_counter()

    print(f"devices: {jax.devices()}")
    print(f"solve (incl. compile): {(t1 - t0) * 1e3:.1f} ms")
    print("estimated solution vector X:\n", np.asarray(res.X))
    print("pred_stds:\n", np.asarray(res.pred_stds))
    print("correspondences per iteration:", np.asarray(res.diagnostics.n_corr))

    if args.viz:
        from icet_tpu import viz

        os.makedirs(args.viz, exist_ok=True)
        viz.plot_registration(
            os.path.join(args.viz, "registration.png"),
            np.asarray(c1), np.asarray(c2), np.asarray(res.X),
        )
        model = prepare_reference_jit(c1, cfg)
        viz.plot_voxel_model(
            os.path.join(args.viz, "voxel_model.png"), model,
            scale=cfg.sigma_scale,
        )
        print(f"wrote {args.viz}/registration.png, voxel_model.png")


if __name__ == "__main__":
    main()
