import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icet_tpu.ops.geometry import pose_matrix, pose_to_state
from icet_tpu.pose_graph import (
    PoseGraph,
    _factor_residual,
    detect_loop_candidates,
    graph_from_odometry,
    optimize_poses,
    poses_to_states,
    states_to_poses,
)


def _rel_state(xw_i, xw_j):
    """Ground-truth relative state between two world states."""
    Ti = np.asarray(pose_matrix(jnp.asarray(xw_i)))
    Tj = np.asarray(pose_matrix(jnp.asarray(xw_j)))
    rel = np.linalg.inv(Ti) @ Tj
    return np.asarray(pose_to_state(jnp.asarray(rel)))


def _make_circle(K=12, radius=5.0):
    """World states on a circle with heading tangent to it."""
    states = []
    for k in range(K):
        a = 2 * np.pi * k / K * 0.9  # not fully closed
        t = np.array([radius * np.cos(a), radius * np.sin(a), 0.0])
        states.append(np.concatenate([t, [0.0, 0.0, -a]]).astype(np.float32))
    return np.stack(states)


def test_factor_residual_zero_on_truth():
    s = _make_circle()
    for k in range(len(s) - 1):
        meas = _rel_state(s[k], s[k + 1])
        r = np.asarray(
            _factor_residual(jnp.asarray(s[k]), jnp.asarray(s[k + 1]),
                             jnp.asarray(meas))
        )
        np.testing.assert_allclose(r, 0.0, atol=1e-5)


def _noisy_graph(states_true, rng, t_noise=0.05, a_noise=0.005, loops=()):
    K = len(states_true)
    idx_i, idx_j, meas, info = [], [], [], []
    for k in range(K - 1):
        m = np.array(_rel_state(states_true[k], states_true[k + 1]))
        m[:3] += rng.normal(0, t_noise, 3)
        m[3:] += rng.normal(0, a_noise, 3)
        idx_i.append(k)
        idx_j.append(k + 1)
        meas.append(m)
        info.append(np.diag([1 / t_noise**2] * 3 + [1 / a_noise**2] * 3))
    for (i, j) in loops:
        m = _rel_state(states_true[i], states_true[j])
        idx_i.append(i)
        idx_j.append(j)
        meas.append(m)
        info.append(np.diag([1e4] * 3 + [1e6] * 3))
    return PoseGraph(
        idx_i=jnp.asarray(np.asarray(idx_i, np.int32)),
        idx_j=jnp.asarray(np.asarray(idx_j, np.int32)),
        meas=jnp.asarray(np.stack(meas).astype(np.float32)),
        info=jnp.asarray(np.stack(info).astype(np.float32)),
    )


def _integrate(graph, K):
    """Chain the odometry factors to get the unoptimized initial guess.

    Host-side numpy composition (np_pose_matrix twins): a per-step jnp
    round-trip costs ~10k tiny dispatches at K=10k and dominated the whole
    suite's wall clock."""
    from icet_tpu.keyframe import np_pose_matrix, np_pose_to_state

    meas = np.asarray(graph.meas)
    T = np.eye(4)
    states = [np.zeros(6, np.float32)]
    for k in range(K - 1):
        T = T @ np_pose_matrix(meas[k])
        states.append(np_pose_to_state(T))
    return np.stack(states).astype(np.float32)


def _rel_states_batch(states_a, states_b):
    """Vectorized _rel_state over stacked (N, 6) world-state pairs."""
    def one(a, b):
        Ti = pose_matrix(a)
        Tj = pose_matrix(b)
        Ri = Ti[:3, :3]
        rel_top = jnp.concatenate(
            [Ri.T @ Tj[:3, :3], (Ri.T @ (Tj[:3, 3] - Ti[:3, 3]))[:, None]],
            axis=1,
        )
        rel = jnp.concatenate(
            [rel_top, jnp.array([[0.0, 0.0, 0.0, 1.0]])], axis=0
        )
        return pose_to_state(rel)

    return np.array(  # np.array: writable copy (np.asarray of a jax array
        # is read-only, and callers add noise in place)
        jax.jit(jax.vmap(one))(jnp.asarray(states_a), jnp.asarray(states_b))
    )


def test_loop_closure_reduces_error(rng):
    s_true = _make_circle(K=12)
    # Express truth relative to pose 0 (gauge).
    T0 = np.asarray(pose_matrix(jnp.asarray(s_true[0])))
    rel_true = np.stack(
        [
            np.asarray(pose_to_state(jnp.asarray(np.linalg.inv(T0) @
                       np.asarray(pose_matrix(jnp.asarray(s))))))
            for s in s_true
        ]
    )
    graph = _noisy_graph(s_true, rng, loops=[(0, 11), (1, 10)])
    states0 = _integrate(graph, 12)
    opt = np.asarray(optimize_poses(jnp.asarray(states0), graph, 10))

    err0 = np.linalg.norm(states0[:, :3] - rel_true[:, :3], axis=1)
    err1 = np.linalg.norm(opt[:, :3] - rel_true[:, :3], axis=1)
    # Gauge pinned.
    np.testing.assert_allclose(opt[0], states0[0], atol=1e-3)
    # Loop closure must pull the looped poses back substantially; mid-chain
    # poses have no extra information, so the mean improves more modestly.
    assert err1[-1] < err0[-1] * 0.35, (err0[-1], err1[-1])
    assert err1.mean() < err0.mean() * 0.85


def test_optimize_recovers_exact_graph(rng):
    s_true = _make_circle(K=8)
    # Noise sets the information weights too: keep them f32-friendly
    # (1e-3 -> info 1e6; 1e-6 would put 1e12 on the normal-equation diagonal
    # and destroy f32 conditioning).
    graph = _noisy_graph(s_true, rng, t_noise=1e-3, a_noise=1e-3)
    # Perturb the initial guess; exact measurements must pull it back.
    states0 = _integrate(graph, 8)
    noisy0 = states0 + rng.normal(0, 0.05, states0.shape).astype(np.float32)
    noisy0[0] = states0[0]
    opt = np.asarray(optimize_poses(jnp.asarray(noisy0), graph, 10))
    np.testing.assert_allclose(opt, states0, atol=2e-3)


def test_sparse_matches_dense(rng):
    """Block-sparse PCG refinement must agree with the dense Cholesky path."""
    from icet_tpu.pose_graph import optimize_poses_sparse

    s_true = _make_circle(K=12)
    graph = _noisy_graph(s_true, rng, loops=[(0, 11), (1, 10)])
    states0 = jnp.asarray(_integrate(graph, 12))
    dense = np.asarray(optimize_poses(states0, graph, 10))
    sparse = np.asarray(optimize_poses_sparse(states0, graph, 10, 120))
    np.testing.assert_allclose(sparse, dense, atol=2e-3)


@pytest.mark.slow
def test_sparse_scales_to_10k_poses(rng):
    """A 10k-pose graph with loop closures optimizes in seconds on CPU and
    actually reduces trajectory error (the dense path would need a 60k x 60k
    Cholesky here)."""
    import time

    from icet_tpu.pose_graph import optimize_poses_sparse

    K = 10_000
    # Long drive: 10 laps of a 50 m circle, so every pose is revisited and
    # inter-lap loop factors can observe (most of) the drift.
    a = np.linspace(0, 20 * np.pi, K).astype(np.float64)
    t = np.stack(
        [50 * np.cos(a), 50 * np.sin(a), np.zeros(K)], axis=1
    )
    s_true = np.concatenate(
        [t, np.zeros((K, 2)), -a[:, None]], axis=1
    ).astype(np.float32)

    rng_l = np.random.default_rng(3)
    t_noise, a_noise = 0.02, 0.002
    # Consecutive factors, built vectorized (a 10k-iteration python loop of
    # tiny jnp ops took minutes and dominated the suite).
    meas_odo = _rel_states_batch(s_true[:-1], s_true[1:])
    meas_odo[:, :3] += rng_l.normal(0, t_noise, (K - 1, 3))
    meas_odo[:, 3:] += rng_l.normal(0, a_noise, (K - 1, 3))
    info_odo = np.broadcast_to(
        np.diag([1 / t_noise**2] * 3 + [1 / a_noise**2] * 3),
        (K - 1, 6, 6),
    )
    # Loop factors between consecutive laps (1000 poses/lap, every 100).
    li = np.arange(0, K - 1000, 100)
    meas_loop = _rel_states_batch(s_true[li], s_true[li + 1000])
    info_loop = np.broadcast_to(
        np.diag([1e4] * 3 + [1e6] * 3), (len(li), 6, 6)
    )
    graph = PoseGraph(
        idx_i=jnp.asarray(
            np.concatenate([np.arange(K - 1), li]).astype(np.int32)
        ),
        idx_j=jnp.asarray(
            np.concatenate([np.arange(1, K), li + 1000]).astype(np.int32)
        ),
        meas=jnp.asarray(
            np.concatenate([meas_odo, meas_loop]).astype(np.float32)
        ),
        info=jnp.asarray(
            np.concatenate([info_odo, info_loop]).astype(np.float32)
        ),
    )
    states0 = jnp.asarray(_integrate(graph, K))

    from icet_tpu.pose_graph import optimize_poses_sparse as ops_sparse

    # Odometry-backbone (block-tridiagonal) preconditioner: 25 CG iterations
    # match what block-Jacobi needed 400 for (the backbone solve propagates
    # information along the whole chain in one application).
    opt = np.asarray(ops_sparse(states0, graph, 10, 25))  # warm-up + compile
    start = time.perf_counter()
    opt = np.asarray(ops_sparse(states0, graph, 10, 25))
    elapsed = time.perf_counter() - start
    assert elapsed < 15.0, f"10k-pose solve took {elapsed:.1f}s"

    # Truth relative to pose 0 (gauge), vectorized.
    rel_true = _rel_states_batch(
        np.broadcast_to(s_true[0], s_true.shape), s_true
    )
    err0 = np.linalg.norm(np.asarray(states0)[:, :3] - rel_true[:, :3], axis=1)
    err1 = np.linalg.norm(opt[:, :3] - rel_true[:, :3], axis=1)
    assert err1.mean() < err0.mean() * 0.5, (err0.mean(), err1.mean())


def test_detect_loop_candidates_matches_bruteforce(rng):
    """Spatial-hash candidate search returns exactly the all-pairs answer."""
    pos = rng.normal(0, 12.0, (400, 3))
    radius, min_gap = 3.0, 10

    best = {}
    for i in range(len(pos)):
        for j in range(i + min_gap, len(pos)):
            d = np.linalg.norm(pos[i] - pos[j])
            if d < radius and (i not in best or d < best[i][1]):
                best[i] = (j, d)
    brute = [(i, j) for i, (j, _) in sorted(best.items())]

    assert detect_loop_candidates(pos, radius, min_gap) == brute


def test_states_poses_roundtrip(rng):
    s = rng.normal(0, 0.4, (5, 6)).astype(np.float32)
    back = poses_to_states(states_to_poses(jnp.asarray(s)))
    np.testing.assert_allclose(back, s, atol=1e-5)


def test_detect_loop_candidates():
    pos = np.zeros((30, 3))
    pos[:, 0] = np.concatenate([np.arange(15), np.arange(15)[::-1]])
    cands = detect_loop_candidates(pos, radius=0.5, min_gap=5)
    assert (0, 29) in cands
    assert all(j - i >= 5 for i, j in cands)


def test_detect_loop_candidates_topk_matches_bruteforce(rng):
    """k>1 returns the k nearest admissible j per i, nearest-first."""
    pos = rng.normal(0, 8.0, (300, 3))
    radius, min_gap, k = 4.0, 10, 3

    brute = []
    for i in range(len(pos)):
        cand = []
        for j in range(i + min_gap, len(pos)):
            d = np.linalg.norm(pos[i] - pos[j])
            if d < radius:
                cand.append((d, j))
        cand.sort()
        brute.extend((i, j) for _, j in cand[:k])

    assert detect_loop_candidates(pos, radius, min_gap, k=k) == brute


@pytest.mark.slow
def test_detect_loop_candidates_city_scale_is_fast():
    """100k poses at realistic keyframe spacing resolve in about a second
    (VERDICT r2 #8).  A 200 km out-and-back: the return pass drives 1.5 m
    beside the outbound lane, so ~every pose has loop candidates.

    Budget is contention-proof (VERDICT r4 #8): serially this runs in
    ~1.3 s on this box; an accidental O(n^2)-pairs regression would take
    minutes, which a generous bound still catches under ``-n 4`` xdist
    contention without flaking.  The observed timing is printed so slow
    drift stays visible in ``-rP`` output."""
    import time

    rng = np.random.default_rng(0)
    n, half = 100_000, 50_000
    x = np.concatenate([np.arange(half), np.arange(half)[::-1]]) * 2.0
    y = np.concatenate([np.zeros(half), np.full(half, 1.5)])
    pos = np.stack([x, y, np.zeros(n)], axis=1) + rng.normal(0, 0.3, (n, 3))
    t0 = time.monotonic()
    cands = detect_loop_candidates(pos, radius=3.0, min_gap=100, k=2)
    elapsed = time.monotonic() - t0
    print(f"detect_loop_candidates 100k poses: {elapsed:.2f} s")
    assert elapsed < 8.0, elapsed
    assert len(cands) > 50_000  # nearly every pose sees the other pass
    assert all(j - i >= 100 for i, j in cands)


def test_sharded_matches_single_device(rng):
    """Factor-sharded optimization over the CPU mesh must reproduce the
    single-device result (one psum of the normals per GN iteration)."""
    import jax
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    from icet_tpu.pose_graph import optimize_poses_sharded

    s_true = _make_circle(K=10)
    graph = _noisy_graph(s_true, rng, loops=[(0, 9)])
    states0 = _integrate(graph, 10)

    single = np.asarray(optimize_poses(jnp.asarray(states0), graph, 6))
    mesh = Mesh(mesh_utils.create_device_mesh((5,), jax.devices()[:5]), ("f",))
    sharded = np.asarray(
        optimize_poses_sharded(jnp.asarray(states0), graph, mesh, 6)
    )
    np.testing.assert_allclose(sharded, single, atol=2e-4)


def test_graph_from_odometry_frames():
    class F:
        def __init__(self, X, T):
            self.X = X
            self.pred_stds = np.full(6, 0.01, np.float32)
            self.T_world = T

    X = np.array([1, 0, 0, 0, 0, 0], np.float32)
    T1 = np.asarray(pose_matrix(jnp.asarray(X)))
    frames = [F(X, T1)]
    states0, graph = graph_from_odometry(frames)
    assert states0.shape == (2, 6)
    np.testing.assert_allclose(states0[1], X, atol=1e-6)
    assert graph.meas.shape == (1, 6)
    np.testing.assert_allclose(np.asarray(graph.info)[0], np.eye(6) * 1e4)


def test_robust_kernel_resists_outlier_loop(rng):
    """A WRONG loop-closure factor (bad data association) with confident
    information must degrade gracefully under the Huber kernel: the robust
    solve stays near the non-outlier solution while the plain L2 solve is
    dragged away."""
    from icet_tpu.pose_graph import optimize_poses_sparse

    s_true = _make_circle(K=16)
    graph = _noisy_graph(s_true, rng, loops=[(0, 15), (2, 13)])
    states0 = jnp.asarray(_integrate(graph, 16))

    clean = np.asarray(optimize_poses_sparse(states0, graph, 10, 60))

    # Corrupt one loop factor: 2 m / 0.2 rad off, same confident info.
    bad_meas = np.asarray(graph.meas).copy()
    bad_meas[-1, :3] += np.array([2.0, -1.5, 0.5])
    bad_meas[-1, 3:] += np.array([0.2, -0.1, 0.15])
    bad = PoseGraph(graph.idx_i, graph.idx_j,
                    jnp.asarray(bad_meas), graph.info)

    l2 = np.asarray(optimize_poses_sparse(states0, bad, 10, 60))
    huber = np.asarray(
        optimize_poses_sparse(states0, bad, 10, 60, robust_delta=3.5)
    )

    err_l2 = np.linalg.norm(l2[:, :3] - clean[:, :3], axis=1).max()
    err_huber = np.linalg.norm(huber[:, :3] - clean[:, :3], axis=1).max()
    assert err_l2 > 0.3, err_l2  # the outlier really does corrupt plain L2
    assert err_huber < 0.1 * err_l2, (err_huber, err_l2)
    # And with NO outlier, the kernel must be (near) inactive.
    huber_clean = np.asarray(
        optimize_poses_sparse(states0, graph, 10, 60, robust_delta=3.5)
    )
    np.testing.assert_allclose(huber_clean, clean, atol=5e-2)


@pytest.mark.slow
def test_sparse_sharded_matches_single_device(rng):
    """Factor-sharded block-sparse PCG over an 8-device mesh must agree with
    the single-device sparse path (same math, psum-assembled normals)."""
    import jax
    from jax.sharding import Mesh

    from icet_tpu.pose_graph import (
        optimize_poses_sparse,
        optimize_poses_sparse_sharded,
    )

    s_true = _make_circle(K=24)
    graph = _noisy_graph(s_true, rng, loops=[(0, 23), (3, 20), (6, 17)])
    states0 = jnp.asarray(_integrate(graph, 24))

    single = np.asarray(optimize_poses_sparse(states0, graph, 8, 40))
    mesh = Mesh(np.array(jax.devices()[:8]), ("f",))
    sharded = np.asarray(
        optimize_poses_sparse_sharded(states0, graph, mesh, 8, 40)
    )
    np.testing.assert_allclose(sharded, single, atol=2e-3)
    # Robust kernel composes with sharding too.
    sharded_r = np.asarray(
        optimize_poses_sparse_sharded(
            states0, graph, mesh, 8, 40, robust_delta=3.5
        )
    )
    assert np.isfinite(sharded_r).all()
