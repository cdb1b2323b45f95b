"""Batched small-matrix spectral kernels.

The reference calls LAPACK-style eigensolvers voxel-by-voxel
(``Eigen::SelfAdjointEigenSolver``, src/icet.cpp:181-184,455) or batched
general ``tf.linalg.eig`` (python/ICET_spherical.py:526).  On TPU we instead
run a fully vectorised cyclic Jacobi eigensolver: a fixed, unrolled schedule
of Givens rotations applied as dense (n, n) matmuls batched over all voxels —
static shapes, no data-dependent control flow, everything on the VPU/MXU.

For the 3x3 symmetric voxel covariances (V ~ 1800 per scan) and the single
6x6 normal-equation matrix this is microseconds, and unlike
``jnp.linalg.eigh`` it lowers to straight-line vectorised code instead of an
XLA custom call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def small_matmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Batched tiny-matrix product as a VPU broadcast-multiply-reduce.

    ``dot_general`` on (batch, 3, 3)-sized operands pads every matrix to MXU
    tiles (8x128 minimum) — ~1500x wasted compute; measured ~20 ms per solver
    iteration at V=1800.  The broadcast form stays elementwise on the VPU.
    Exact f32 (no bf16 passes involved).
    """
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def _jacobi_sweep_schedule(n: int, sweeps: int):
    pairs = [(p, q) for p in range(n - 1) for q in range(p + 1, n)]
    return pairs * sweeps


def _round_robin_rounds(n: int):
    """Perfect-matching decomposition of the n(n-1)/2 Jacobi pairs into n-1
    rounds of n/2 DISJOINT pairs (circle method).  Disjoint rotations commute
    and combine into a single orthogonal matrix, cutting the sequential op
    chain ~n/2-fold — the cyclic schedule's op latency (not FLOPs) dominated
    the solver's 6x6 eigendecomposition on TPU."""
    players = list(range(n))
    rounds = []
    for _ in range(n - 1):
        rounds.append(
            [tuple(sorted((players[i], players[n - 1 - i]))) for i in range(n // 2)]
        )
        players = [players[0], players[-1]] + players[1:-1]
    return rounds


@functools.partial(jax.jit, static_argnums=(1,))
def eigh_small(A: jax.Array, sweeps: int = 8):
    """Eigendecomposition of batched small symmetric matrices.

    Args:
      A: ``(..., n, n)`` symmetric (only the symmetric part is used).
      sweeps: number of full cyclic Jacobi sweeps (8 is far past convergence
        for n <= 6; Jacobi converges quadratically).

    Returns:
      ``(w, V)`` with eigenvalues ``w`` ascending ``(..., n)`` and orthonormal
      eigenvectors as **columns** of ``V`` ``(..., n, n)`` — the convention of
      ``tf.linalg.eig`` in the Python reference (ICET_spherical.py:526-527).
    """
    n = A.shape[-1]
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    V = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)

    if n % 2 == 0:
        return _eigh_parallel(A, V, n, sweeps)

    pairs = _jacobi_sweep_schedule(n, 1)

    def sweep(carry, _):
        A, V = carry
        # One full cyclic sweep, unrolled over the static pair schedule
        # (n <= 6 -> at most 15 rotations); identical sweeps are rolled up by
        # the outer lax.scan to keep the program small.  Rotations are
        # applied as direct row/column updates — batched (3, 3) matmuls on
        # TPU would pad every matrix to an MXU tile.
        for p, q in pairs:
            apq = A[..., p, q]
            app = A[..., p, p]
            aqq = A[..., q, q]
            # Givens angle zeroing A[p, q]; arctan2 handles apq == 0 smoothly.
            ang = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
            c = jnp.cos(ang)[..., None]
            s = jnp.sin(ang)[..., None]
            # Rows: A <- G^T A  (G has G[p,p]=G[q,q]=c, G[p,q]=s, G[q,p]=-s)
            row_p = c * A[..., p, :] - s * A[..., q, :]
            row_q = s * A[..., p, :] + c * A[..., q, :]
            A = A.at[..., p, :].set(row_p).at[..., q, :].set(row_q)
            # Columns: A <- A G
            col_p = c * A[..., :, p] - s * A[..., :, q]
            col_q = s * A[..., :, p] + c * A[..., :, q]
            A = A.at[..., :, p].set(col_p).at[..., :, q].set(col_q)
            # Eigenvector accumulation: V <- V G
            v_p = c * V[..., :, p] - s * V[..., :, q]
            v_q = s * V[..., :, p] + c * V[..., :, q]
            V = V.at[..., :, p].set(v_p).at[..., :, q].set(v_q)
        return (A, V), None

    (A, V), _ = jax.lax.scan(sweep, (A, V), None, length=sweeps)

    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w, V


def _eigh_parallel(A, V, n, sweeps):
    """Parallel-ordered Jacobi for even n: each round applies n/2 disjoint
    rotations as ONE combined orthogonal matrix, built vectorised from
    constant pair-index/sign masks."""
    rounds = _round_robin_rounds(n)
    # Per round: row -> its pair id, and the antisymmetric sign mask.
    pair_of = []
    sign_masks = []
    ps, qs = [], []
    for rnd in rounds:
        po = [0] * n
        sm = [[0.0] * n for _ in range(n)]
        for k, (p, q) in enumerate(rnd):
            po[p] = k
            po[q] = k
            sm[p][q] = 1.0
            sm[q][p] = -1.0
        pair_of.append(po)
        sign_masks.append(sm)
        ps.append([p for p, _ in rnd])
        qs.append([q for _, q in rnd])
    pair_of = jnp.asarray(pair_of, jnp.int32)  # (R, n)
    sign_masks = jnp.asarray(sign_masks, A.dtype)  # (R, n, n)
    ps = jnp.asarray(ps, jnp.int32)  # (R, n/2)
    qs = jnp.asarray(qs, jnp.int32)
    eye = jnp.eye(n, dtype=A.dtype)

    def sweep(carry, _):
        A, V = carry
        for r in range(len(rounds)):
            p = ps[r]
            q = qs[r]
            app = A[..., p, p]  # (..., n/2)
            aqq = A[..., q, q]
            apq = A[..., p, q]
            ang = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
            c = jnp.cos(ang)
            s = jnp.sin(ang)
            c_row = c[..., pair_of[r]]  # (..., n)
            s_row = s[..., pair_of[r]]
            G = eye * c_row[..., None, :] + sign_masks[r] * s_row[..., None, :]
            A = jnp.matmul(
                jnp.matmul(jnp.swapaxes(G, -1, -2), A, precision=_HI),
                G, precision=_HI,
            )
            V = jnp.matmul(V, G, precision=_HI)
        return (A, V), None

    (A, V), _ = jax.lax.scan(sweep, (A, V), None, length=sweeps)
    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w, V


def eigh_small_warm(A: jax.Array, V0: jax.Array, sweeps: int = 3):
    """Warm-started Jacobi eigendecomposition.

    Rotates ``A`` into the prior eigenbasis ``V0`` (from e.g. the previous
    Gauss-Newton iteration, where the normal equations change slowly) and
    runs a few polishing sweeps.  The sequential 8-sweep cold Jacobi on the
    single 6x6 system was the solver's single most expensive op on TPU
    (~0.45 ms/iteration of pure op-latency); 3 warm sweeps match it to f32
    accuracy at ~40% of the cost.
    """
    A0 = jnp.matmul(
        jnp.matmul(jnp.swapaxes(V0, -1, -2), A, precision=_HI), V0, precision=_HI
    )
    w, V1 = eigh_small(A0, sweeps)
    return w, jnp.matmul(V0, V1, precision=_HI)


def eigh_small_warm_safe(A: jax.Array, V0: jax.Array, rtol: float = 1e-5):
    """Warm-started Jacobi with ONE polishing sweep and a convergence
    safeguard.

    Across Gauss-Newton iterations the normal equations change slowly, so a
    single sweep from the previous basis is past f32 convergence (Jacobi is
    quadratic) — but a pathological jump (e.g. the moving-object filter
    toggling many voxels at its start iteration) could leave residual
    off-diagonal mass.  The safeguard measures it and runs one more sweep
    under ``lax.cond`` only when ``off > rtol * ||diag||`` — the common case
    pays 5 rotation rounds instead of 10 plus two 6x6 matmuls.
    """
    A0 = jnp.matmul(
        jnp.matmul(jnp.swapaxes(V0, -1, -2), A, precision=_HI), V0,
        precision=_HI,
    )
    w1, V1 = eigh_small(A0, sweeps=1)
    R = jnp.matmul(
        jnp.matmul(jnp.swapaxes(V1, -1, -2), A0, precision=_HI), V1,
        precision=_HI,
    )
    dg = jnp.diagonal(R, axis1=-2, axis2=-1)
    off = jnp.linalg.norm(R - dg[..., None] * jnp.eye(R.shape[-1], dtype=R.dtype))
    converged = off <= rtol * jnp.maximum(jnp.linalg.norm(dg), 1e-30)

    def _done():
        return w1, jnp.matmul(V0, V1, precision=_HI)

    def _polish():
        w2, V2 = eigh_small(R, sweeps=1)
        return w2, jnp.matmul(
            V0, jnp.matmul(V1, V2, precision=_HI), precision=_HI
        )

    return jax.lax.cond(converged, _done, _polish)


def psd_pinv(A: jax.Array, rcond: float = 1e-7, sweeps: int = 8) -> jax.Array:
    """Pseudo-inverse of batched small symmetric PSD matrices.

    Replaces the reference's per-voxel ``CompleteOrthogonalDecomposition``
    pinv (icet.cpp:320-321) / ``tf.linalg.pinv`` (ICET_spherical.py:437).
    Eigenvalues below ``rcond * max_eig`` (or below absolute 1e-12) are
    truncated to zero — rank-deficient inputs (the common case after the
    extended-axis projection) are handled exactly.
    """
    w, V = eigh_small(A, sweeps)
    wmax = jnp.max(jnp.abs(w), axis=-1, keepdims=True)
    keep = jnp.abs(w) > jnp.maximum(rcond * wmax, 1e-12)
    inv_w = jnp.where(keep, 1.0 / jnp.where(keep, w, 1.0), 0.0)
    return small_matmul(V * inv_w[..., None, :], jnp.swapaxes(V, -1, -2))
