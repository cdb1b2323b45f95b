"""Long-sequence odometry + loop-closure evaluation on the city drive.

The reference's accuracy story rests on KITTI/Ford/CODD urban sequences
(/root/reference/README.md:67-110) that do not ship with it.  This harness
reproduces that regime with the raycast city block (exact ground truth):
multi-lap drive -> streaming odometry -> spatial-hash loop detection ->
re-registration loop factors -> block-sparse pose-graph refinement, with
ATE/RPE reported before and after refinement.

Usage:
  python examples/eval_citydrive.py --frames 550 --cpu        # hermetic
  python examples/eval_citydrive.py --frames 550               # on the TPU
  python examples/eval_citydrive.py --beams 64 --azimuth 1024  # KITTI-like
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=550)
    ap.add_argument("--seed", type=int, default=0,
                    help="drive fixture seed (scene layout + corruption "
                         "streams)")
    ap.add_argument("--speed", type=float, default=1.0)
    ap.add_argument("--beams", type=int, default=64)
    ap.add_argument("--azimuth", type=int, default=1024)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--spawn", default="auto", choices=["auto", "fixed"],
                    help="keyframe spawn policy (KeyframeConfig.spawn): "
                         "'auto' (default) = the distance prior PLUS "
                         "health safety triggers; 'fixed' = distance/angle"
                         "/corr-drop only")
    ap.add_argument("--spawn-distance", type=float, default=None,
                    help="spawn distance prior (both policies; default "
                         "1.5 dynamic / 3.0 benign)")
    ap.add_argument("--stds-growth", type=float, default=None,
                    help="auto-spawn predicted-error growth trigger "
                         "(KeyframeConfig.stds_growth default when unset)")
    ap.add_argument("--keyframe", action="store_true",
                    help="use scan-to-keyframe odometry (KeyframeOdometry) "
                         "instead of frame-to-frame")
    ap.add_argument("--radius", type=float, default=8.0,
                    help="loop-candidate search radius (m) on the drifted "
                         "estimated trajectory")
    ap.add_argument("--min-gap", type=int, default=100,
                    help="minimum frame separation for a loop candidate")
    ap.add_argument("--loop-k", type=int, default=1,
                    help="loop candidates kept per frame (k nearest)")
    ap.add_argument("--out", default=None, help="write TUM trajectories here")
    ap.add_argument("--save-graph", default=None,
                    help="npz path to dump the pose graph (debugging)")
    ap.add_argument("--dynamic", action="store_true",
                    help="non-benign drive: 3 moving cars on the ring, 12%% "
                         "per-frame azimuth dropout, 2 cm per-frame range "
                         "bias jitter — makes odometry error non-systematic "
                         "so pose-graph refinement has real drift to fix")
    ap.add_argument("--chained", action="store_true",
                    help="run the drive through the device-chained "
                         "sequence runners (64-frame lax.scan blocks per "
                         "dispatch) instead of one dispatch per frame — "
                         "~50x less host-link latency on recorded data; "
                         "ignores --chunk checkpoints (it does not need "
                         "them) and has no DNN variant yet")
    ap.add_argument("--guarded", action="store_true",
                    help="enable the degeneracy guard (clip_fill=0.6, "
                         "condition_cutoff=1e4 — PROFILES['odometry_"
                         "guarded']): validated neutral on rich scenes, "
                         "honest in corridors")
    ap.add_argument("--range-sigma", type=float, default=0.0,
                    help="per-scan common-mode range error in metres "
                         "(ICETConfig.range_sigma): adds the calibration-"
                         "aware covariance term so pose-graph weighting "
                         "sees the error mass residuals cannot — the "
                         "--dynamic fixture's jitter is 0.02")
    ap.add_argument("--dnn", action="store_true",
                    help="engage the DNN perspective-shift filter in every "
                         "solve (cfg.dnn_filter; bundled pretrained net)")
    ap.add_argument("--state", default=None,
                    help="chunked/resumable run: checkpoint prefix.  The "
                         "drive is generated once and cached beside it; each "
                         "invocation resumes where the last stopped — run "
                         "under `timeout` and re-invoke until done (tunnel-"
                         "hang-proof device runs, VERDICT r3 #4)")
    ap.add_argument("--chunk", type=int, default=0,
                    help="with --state: stop and checkpoint after this many "
                         "frames per invocation (0 = run to completion)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from icet_tpu.config import ICETConfig, OdometryConfig
    from icet_tpu.datasets.replay import CityDriveSource
    from icet_tpu.odometry import OdometryPipeline
    from icet_tpu.pose_graph import (
        detect_loop_candidates,
        graph_from_odometry,
        optimize_poses_sparse,
        states_to_poses,
    )
    from icet_tpu.utils.metrics import ate_rmse, rpe, save_tum

    cfg = ICETConfig()  # canonical 75x24, 7 iters (odometry profile)
    if args.dynamic:
        cfg = cfg.replace(remove_moving=True)
    if args.range_sigma > 0.0:
        cfg = cfg.replace(range_sigma=args.range_sigma)
    if args.guarded:
        cfg = cfg.replace(clip_fill=0.6, condition_cutoff=1e4)
    if args.dnn:
        cfg = cfg.replace(dnn_filter=True)
    # The reference's 0.3 m clamp assumes slow indoor motion
    # (simpleMapMaker.cpp:129-137); at KITTI speeds (~1 m/frame at 10 Hz)
    # legitimate motion exceeds it.
    odo_cfg = OdometryConfig(divergence_clamp=2.5)

    dyn = dict(moving_cars=3, dropout_frac=0.12, range_bias_std=0.02)
    src = CityDriveSource(
        n_frames=args.frames, speed=args.speed,
        n_beams=args.beams, n_azimuth=args.azimuth, seed=args.seed,
        **(dyn if args.dynamic else {}),
    )
    print(f"city drive: {args.frames} frames x {args.beams}x{args.azimuth} "
          f"rays, {src.lap_length:.0f} m/lap, "
          f"{args.frames * args.speed / src.lap_length:.1f} laps")

    if args.keyframe:
        from icet_tpu.config import KeyframeConfig
        from icet_tpu.keyframe import KeyframeOdometry

        # On corrupted scans the FIXED spawn distance dominates keyframe-
        # mode ATE and its optimum is scale/resolution dependent: at the
        # flagship scale (399 frames, 64x1024, 75x24 grid) spawn
        # 1.5/3.0/6.0 m give odometry ATE 37/80/107 cm (refined 19/61/95),
        # while the small 150-frame 48x512 sweep ordered the other way
        # (88/116/47 cm).  The "auto" policy (default) replaces the
        # hand-picked constant with the solver's own health signals
        # (KeyframeConfig.spawn) and a loose distance backstop.
        # Both policies keep the regime's distance prior: "auto" adds the
        # health safety triggers ON TOP of it (replacing the prior with
        # loose-backstop health thresholds measured non-robust — RESULTS
        # spawn-policy table).
        if args.spawn_distance is not None:
            dist = args.spawn_distance
        else:
            dist = 1.5 if args.dynamic else 3.0
        kf_kw = {}
        if args.stds_growth is not None:
            kf_kw["stds_growth"] = args.stds_growth
        pipe = KeyframeOdometry(
            cfg,
            KeyframeConfig(spawn=args.spawn, spawn_distance=dist,
                           spawn_angle=0.3,
                           delta_clamp=odo_cfg.divergence_clamp, **kf_kw),
        )
    else:
        pipe = OdometryPipeline(cfg, odo_cfg)

    # ---- frame source: streamed, or disk-cached for chunked resume ------
    hist = {"X": [], "stds": [], "T": [], "div": []}
    start_k = 0
    if args.state:
        from icet_tpu.utils.checkpoint import (
            keyframe_state, load_checkpoint, odometry_state,
            restore_keyframe, restore_odometry, save_checkpoint,
        )

        sc_path, gt_path = args.state + ".scans.npy", args.state + ".gt.npy"
        if not (os.path.exists(sc_path) and os.path.exists(gt_path)):
            sl, gl = [], []
            for scan, T in src:
                sl.append(np.asarray(scan, np.float32))
                gl.append(np.asarray(T))
            np.save(sc_path, np.stack(sl))
            np.save(gt_path, np.stack(gl))
        scans = np.load(sc_path, mmap_mode="r")
        gt = list(np.load(gt_path))
        if os.path.exists(args.state + ".npz"):
            st = load_checkpoint(args.state)
            start_k = int(st["next_k"])
            for name in hist:
                hist[name] = [v for v in np.asarray(st["hist"][name])]
            if args.keyframe:
                restore_keyframe(pipe, st["pipe"], replay_overlap=True)
            else:
                restore_odometry(pipe, st["pipe"])
                pipe._index = start_k - 1
            # Re-seed/replay the last processed scan (returns None: the
            # voxel model is refit; keyframe mode re-spawns at the restored
            # pose without re-inserting map points).
            seed = pipe.step(np.asarray(scans[start_k - 1], np.float32))
            assert seed is None, "resume seed unexpectedly registered"
            print(f"resumed at frame {start_k} "
                  f"({len(hist['X'])} frames of history)")
        frame_iter = (
            (k, scans[k], gt[k]) for k in range(start_k, args.frames)
        )
    else:
        scans, gt = [], []

        def _stream():
            for i, (scan, T) in enumerate(src):
                scans.append(scan)
                gt.append(T)
                yield i, scan, T

        frame_iter = _stream()

    if args.chained:
        if args.dnn:
            raise SystemExit("--chained has no DNN variant yet")
        if not args.state:
            sl, gl = [], []
            for s_, T_ in src:
                sl.append(np.asarray(s_, np.float32))
                gl.append(np.asarray(T_))
            scans, gt = np.stack(sl), gl
        hist = {"X": [], "stds": [], "T": [], "div": []}  # full re-run
        t0 = time.perf_counter()
        if args.keyframe:
            from icet_tpu.keyframe import run_keyframe_device

            recs, _bm = run_keyframe_device(
                np.asarray(scans), cfg, pipe.kf_cfg, pipe.bm_cfg
            )
        else:
            from icet_tpu.odometry import run_odometry_device

            recs = run_odometry_device(np.asarray(scans), cfg, odo_cfg)
        for f in recs:
            hist["X"].append(np.asarray(f.X))
            hist["stds"].append(np.asarray(f.pred_stds))
            hist["T"].append(np.asarray(f.T_world))
            hist["div"].append(bool(f.diverged))
        processed = len(recs)
        frame_iter = iter(())
    else:
        t0 = time.perf_counter()
        processed = 0
    for i, scan, T in frame_iter:
        f = pipe.step(np.asarray(scan, np.float32))
        processed += 1
        if f is not None:
            hist["X"].append(np.asarray(f.X))
            hist["stds"].append(np.asarray(f.pred_stds))
            hist["T"].append(np.asarray(f.T_world))
            hist["div"].append(bool(f.diverged))
        if i and i % 50 == 0:
            el = time.perf_counter() - t0
            print(f"  frame {i}: {el / processed * 1000:.0f} ms/frame wall "
                  f"(divergences so far: {sum(hist['div'])})")
        if (args.state and args.chunk and processed >= args.chunk
                and i + 1 < args.frames):
            save_checkpoint(args.state, {
                "next_k": np.int64(i + 1),
                "pipe": (keyframe_state(pipe) if args.keyframe
                         else odometry_state(pipe)),
                "hist": {k: np.stack(v) for k, v in hist.items()},
            })
            print(json.dumps({
                "chunk_done": True, "next_k": i + 1,
                "frames_registered": len(hist["X"]),
                "ms_per_frame_wall": round(
                    (time.perf_counter() - t0) / processed * 1000, 1),
            }))
            return
    wall = time.perf_counter() - t0

    # Rebuild frame records (mode-agnostic) from the accumulated history so
    # fresh, chunked, and resumed runs share one downstream path.
    from icet_tpu.odometry import OdometryFrame

    z6 = np.zeros(6, np.float32)
    frames = [
        OdometryFrame(
            index=i + 1, X=hist["X"][i], pred_stds=hist["stds"][i],
            T_world=hist["T"][i], pose=z6, twist=z6,
            diverged=bool(hist["div"][i]), n_corr=np.zeros(1, np.int32),
            solve_ms=0.0,
        )
        for i in range(len(hist["X"]))
    ]
    n_div = sum(f.diverged for f in frames)
    est = [np.eye(4)] + [f.T_world for f in frames]
    ref = [np.linalg.inv(gt[0]) @ T for T in gt]

    ate_odo = ate_rmse(est, ref)
    t_err, r_err = rpe(est, ref)
    print(f"\nodometry: {len(frames)} registrations, {n_div} divergences, "
          f"{wall / max(processed, 1) * 1000:.0f} ms/frame wall (this invocation)")
    print(f"  ATE RMSE {ate_odo * 100:.1f} cm | RPE {t_err.mean() * 100:.2f} cm"
          f" / {np.degrees(r_err.mean()):.4f} deg per frame")

    # Loop closure on the ESTIMATED trajectory (drifted positions are what a
    # real system has available).
    positions = np.stack([T[:3, 3] for T in est])
    cands = detect_loop_candidates(
        positions, radius=args.radius, min_gap=args.min_gap, k=args.loop_k
    )
    print(f"\nloop candidates: {len(cands)}")
    t0 = time.perf_counter()
    loops = _close(scans, cands, est, cfg)
    print(f"verified loop factors: {len(loops)} "
          f"({time.perf_counter() - t0:.1f} s)")

    states0, graph = graph_from_odometry(frames, loop_factors=loops)
    if args.save_graph:
        np.savez(
            args.save_graph,
            states0=states0,
            idx_i=np.asarray(graph.idx_i),
            idx_j=np.asarray(graph.idx_j),
            meas=np.asarray(graph.meas),
            info=np.asarray(graph.info),
            gt=np.stack(ref),
        )
    # Cauchy robust kernel at the 6-DOF 95% chi-square radius: inconsistent
    # or overconfident loop factors degrade gracefully.
    opt = np.asarray(
        optimize_poses_sparse(
            jnp.asarray(states0), graph, 10, 50, robust_delta=3.5
        )
    )
    est_opt = states_to_poses(opt)
    ate_opt = ate_rmse(list(est_opt), ref)
    print(f"pose graph: ATE RMSE {ate_opt * 100:.1f} cm "
          f"(odometry was {ate_odo * 100:.1f} cm)")

    if args.out:
        save_tum(args.out + ".odo.tum", est)
        save_tum(args.out + ".opt.tum", list(est_opt))

    print(json.dumps({
        "frames": len(frames),
        "divergences": n_div,
        "ate_odometry_cm": round(ate_odo * 100, 2),
        "ate_refined_cm": round(ate_opt * 100, 2),
        "rpe_t_cm": round(float(t_err.mean()) * 100, 3),
        "rpe_r_deg": round(float(np.degrees(r_err.mean())), 4),
        "loop_factors": len(loops),
        "ms_per_frame_wall": round(wall / max(processed, 1) * 1000, 1),
    }))


def _close(scans, cands, est, cfg):
    """Verify loop candidates with the estimated relative pose as warm start."""
    import jax.numpy as jnp

    from icet_tpu.ops.geometry import pose_to_state
    from icet_tpu.pose_graph import close_loops

    def x0_fn(i, j):
        rel = np.linalg.inv(est[i]) @ est[j]
        return np.asarray(pose_to_state(jnp.asarray(rel))).astype(np.float32)

    return close_loops(scans, cands, cfg, x0_fn=x0_fn)


if __name__ == "__main__":
    main()
