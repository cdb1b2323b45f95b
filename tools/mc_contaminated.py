"""Measure Monte-Carlo pred_stds consistency under contamination — the
experiment behind tests/test_montecarlo.py's contaminated + corridor cases
(VERDICT r4 #3).  Prints NEES / coverage / spread-ratio tables per scenario
so the test bounds are set from measured values, not guesses.

Scenarios:
  clean      — the existing suite's fixture (baseline for comparison)
  dynamic    — moving car (displaces between the two scans) + per-trial
               azimuth dropout sector + per-trial common-mode range bias,
               moving-object rejection ON (the flagship drive's regime)
  corridor   — degenerate geometry: long corridor, weak along-axis texture;
               validates that condition pruning + pred_stds inflation never
               UNDERSTATE the error on the ill-conditioned axis

Run: python tools/mc_contaminated.py [--trials 256] [--dnn]
"""

import argparse
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from icet_tpu.config import ICETConfig
from icet_tpu.datasets.synthetic import Scene, simulate_scan
from icet_tpu.ops.geometry import euler_R

CFG = ICETConfig(
    n_theta=48, n_phi=16, phi_min=np.pi / 3, phi_max=2 * np.pi / 3,
    n_iters=6, min_pts=20, min_range=1.0,
)
KW = dict(n_beams=48, n_azimuth=512)


def corrupt(scan, rng, dropout_frac=0.12, range_bias_std=0.02):
    """Per-trial contamination: azimuth dropout sector + common-mode range
    bias (the CityDriveSource --dynamic corruptions, replay.py:270-283)."""
    scan = scan.copy()
    r = np.linalg.norm(scan, axis=1, keepdims=True)
    bias = rng.normal(0.0, range_bias_std)
    scale = (r + bias) / np.maximum(r, 1e-6)
    scan = np.where(r > 1e-6, scan * scale, scan).astype(np.float32)
    az = np.arctan2(scan[:, 1], scan[:, 0])
    a0 = rng.uniform(-np.pi, np.pi)
    half = dropout_frac * np.pi
    d = np.abs((az - a0 + np.pi) % (2 * np.pi) - np.pi)
    scan[(d < half) & (r[:, 0] > 1e-6)] = 0.0
    return scan


def solve_mc(scan1, scans2, cfg, x0s=None):
    """``x0s``: optional (K, 6) per-trial warm starts (the odometry regime —
    required for corridor fixtures whose thin crossing faces only
    correspond within their radial run bounds)."""
    from icet_tpu.solver import prepare_reference, register

    K = scans2.shape[0]
    B = 32
    assert K % B == 0
    if x0s is None:
        x0s = np.zeros((K, 6), np.float32)

    @jax.jit
    def run(s1, s2chunks, x0chunks):
        model = prepare_reference(s1, cfg)

        def chunk(_, args):
            s2b, x0b = args
            f = lambda s2, x0: register(model, s2, x0, cfg)
            r = jax.vmap(f)(s2b, x0b)
            return None, (r.X, r.pred_stds)

        _, (Xs, stds) = jax.lax.scan(chunk, None, (s2chunks, x0chunks))
        return Xs.reshape(-1, 6), stds.reshape(-1, 6)

    Xs, stds = run(jnp.asarray(scan1),
                   jnp.asarray(scans2.reshape(K // B, B, -1, 3)),
                   jnp.asarray(x0s.reshape(K // B, B, 6).astype(np.float32)))
    return np.asarray(Xs), np.asarray(stds)


def report(name, X, S, X_true):
    err = X - np.asarray(X_true)[None, :]
    bias = err.mean(axis=0)
    z = (err - bias) / S
    nees = (z ** 2).mean(axis=0)
    cover = (np.abs(z) < 3.0).mean()
    ratio = err.std(axis=0) / S.mean(axis=0)
    print(f"\n== {name} ==")
    print("bias       ", np.array2string(bias, precision=5))
    print("emp std    ", np.array2string(err.std(axis=0), precision=5))
    print("pred std   ", np.array2string(S.mean(axis=0), precision=5))
    print("NEES       ", np.array2string(nees, precision=3))
    print("coverage3s ", round(float(cover), 4))
    print("ratio      ", np.array2string(ratio, precision=3))
    print("bias/pred  ", np.array2string(np.abs(bias) / S.mean(axis=0),
                                         precision=3))
    return dict(nees=nees, cover=cover, ratio=ratio, bias=bias,
                pred=S.mean(axis=0))


def scenario_clean(trials):
    X_true = np.array([0.3, -0.1, 0.02, 0.0, 0.0, 0.01])
    R_c = np.asarray(euler_R(jnp.asarray(-X_true[3:6])))
    scan1 = simulate_scan(seed=7, **KW)
    scans2 = np.stack([
        simulate_scan(pose_t=X_true[:3], pose_R=R_c, seed=100 + i, **KW)
        for i in range(trials)
    ])
    X, S = solve_mc(scan1, scans2, CFG)
    return report("clean (existing fixture)", X, S, X_true)


def scenario_dynamic(trials, dnn=False, range_sigma=0.0):
    X_true = np.array([0.9, -0.1, 0.0, 0.0, 0.0, 0.02])
    R_c = np.asarray(euler_R(jnp.asarray(-X_true[3:6])))
    base = Scene()
    # A car-sized box 8 m ahead in scan1, displaced 1.5 m (its own motion)
    # in scan2 — a genuine moving object across the pair.
    car1 = (7.0, 9.4, -3.2, -0.8, -2.0, -0.4)
    car2 = (8.5, 10.9, -3.2, -0.8, -2.0, -0.4)
    sc1 = dataclasses.replace(base, boxes=base.boxes + (car1,))
    sc2 = dataclasses.replace(base, boxes=base.boxes + (car2,))
    scan1 = simulate_scan(seed=7, scene=sc1, **KW)
    rng = np.random.default_rng(4242)
    scans2 = np.stack([
        corrupt(
            simulate_scan(pose_t=X_true[:3], pose_R=R_c, scene=sc2,
                          seed=100 + i, **KW),
            rng,
        )
        for i in range(trials)
    ])
    cfg = CFG.replace(remove_moving=True, rm_start_iter=3, n_iters=8,
                      dnn_filter=dnn, range_sigma=range_sigma)
    if dnn:
        from icet_tpu.filters import pretrained_dnn, register_with_dnn
        from icet_tpu.solver import prepare_reference

        net, params = pretrained_dnn(cfg)

        @jax.jit
        def run(s1, s2chunks):
            model = prepare_reference(s1, cfg)

            def chunk(_, s2b):
                def f(s2):
                    r, _ = register_with_dnn(
                        model, s1, s2, jnp.zeros(6, jnp.float32), cfg,
                        net, params,
                    )
                    return r

                r = jax.vmap(f)(s2b)
                return None, (r.X, r.pred_stds)

            _, (Xs, stds) = jax.lax.scan(chunk, None, s2chunks)
            return Xs.reshape(-1, 6), stds.reshape(-1, 6)

        B = 32
        Xs, stds = run(jnp.asarray(scan1),
                       jnp.asarray(scans2.reshape(trials // B, B, -1, 3)))
        X, S = np.asarray(Xs), np.asarray(stds)
        return report("dynamic + DNN", X, S, X_true)
    X, S = solve_mc(scan1, scans2, cfg)
    return report(
        f"dynamic (car + dropout + range bias, RM on, "
        f"range_sigma={range_sigma})", X, S, X_true,
    )


def corridor_scene(textured: bool) -> Scene:
    """Corridor along +x: walls at y = +-3, ground at -2.  ``textured``
    adds two full-height door jambs (the only true along-track
    information); thin faces only correspond within their radial run
    bounds, so corridor trials run WARM-STARTED (the odometry regime)."""
    boxes = ()
    if textured:
        boxes = (
            (14.0, 14.5, 0.5, 3.0, -2.0, 10.0),
            (-11.0, -10.5, -3.0, -0.5, -2.0, 10.0),
        )
    return Scene(ground_z=-2.0, walls=((1, 3.0, -1), (1, -3.0, 1)),
                 boxes=boxes, max_range=120.0)


def scenario_corridor(trials, textured=False, clip_fill=0.0,
                      condition_cutoff=1e6):
    sc = corridor_scene(textured)
    X_true = np.array([0.4, 0.0, 0.0, 0.0, 0.0, 0.0])
    scan1 = simulate_scan(seed=7, scene=sc, **KW)
    rng = np.random.default_rng(777)
    scans2 = np.stack([
        simulate_scan(pose_t=X_true[:3], pose_R=np.eye(3), scene=sc,
                      seed=100 + i, **KW)
        for i in range(trials)
    ])
    # Warm starts: truth +- 5 cm / 0.5 deg (steady-state odometry seeds).
    x0s = X_true[None] + np.concatenate([
        rng.uniform(-0.05, 0.05, (trials, 3)),
        rng.uniform(-0.01, 0.01, (trials, 3)),
    ], axis=1)
    cfg = CFG.replace(clip_fill=clip_fill, condition_cutoff=condition_cutoff)
    X, S = solve_mc(scan1, scans2, cfg, x0s=x0s)
    tag = (f"corridor textured={textured} clip_fill={clip_fill} "
           f"cutoff={condition_cutoff:.0e}")
    return report(tag, X, S, X_true)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=256)
    ap.add_argument("--dnn", action="store_true")
    ap.add_argument("--only", default=None,
                    choices=[None, "clean", "dynamic", "corridor"])
    args = ap.parse_args()
    t0 = time.time()
    if args.only in (None, "clean"):
        scenario_clean(args.trials)
    if args.only in (None, "dynamic"):
        scenario_dynamic(args.trials)
        scenario_dynamic(args.trials, range_sigma=0.02)
        if args.dnn:
            scenario_dynamic(args.trials, dnn=True)
    if args.only in (None, "corridor"):
        scenario_corridor(args.trials)  # reference-parity boundary
        scenario_corridor(args.trials, clip_fill=0.6, condition_cutoff=1e4)
        scenario_corridor(args.trials, textured=True)
        scenario_corridor(args.trials, textured=True, clip_fill=0.6,
                          condition_cutoff=1e4)
    print(f"\ntotal {time.time() - t0:.1f}s")
