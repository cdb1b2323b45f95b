"""Per-voxel weighted-least-squares assembly in plane (SoA) layout.

The per-voxel stage (noise projection -> 3x3 pinv -> Jacobian products ->
normal-equation reduction) operates on (V, 3, 3)-shaped tensors.  XLA lays
those out with the tiny trailing dims on the 128-lane axis (T(4,128)
layouts — 3/128 occupancy), so every op wastes ~40x of the VPU.  This module
computes the same math on "planes": each matrix entry is a full (V,) vector
with V on lanes.  Measured ~2x on the 3x3 pinv alone; the whole assembly
avoids every padded batched matmul.

Replaces (numerically identically) the AoS chain in solver._iteration:
  P = diag(l) U^T;  R = cov1/n1' + cov2/n2';  W = pinv(P R P^T)
  H = [-I | dR_k mu2];  Hz = P H;  HTWH = sum_v Hz^T W Hz;
  HTWdz = sum_v Hz^T W P (mu2 - mu1)
(reference icet.cpp:314-338, ICET_spherical.py:424-457).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _pinv3_planes(R, rcond, sweeps=5):
    """Moore-Penrose pseudo-inverse of symmetric 3x3s given as a 3x3 list of
    (V,) planes; cyclic Jacobi with direct row/col updates per lane."""
    A = [[R[i][j] for j in range(3)] for i in range(3)]
    one = jnp.ones_like(A[0][0])
    zero = jnp.zeros_like(A[0][0])
    Vm = [[one, zero, zero], [zero, one, zero], [zero, zero, one]]

    def sweep(carry, _):
        A, Vm = carry
        A = [row[:] for row in A]
        Vm = [row[:] for row in Vm]
        for p, q in ((0, 1), (0, 2), (1, 2)):
            ang = 0.5 * jnp.arctan2(2.0 * A[p][q], A[q][q] - A[p][p])
            c = jnp.cos(ang)
            s = jnp.sin(ang)
            rowp = [c * A[p][j] - s * A[q][j] for j in range(3)]
            rowq = [s * A[p][j] + c * A[q][j] for j in range(3)]
            A[p], A[q] = rowp, rowq
            for i in range(3):
                ap = c * A[i][p] - s * A[i][q]
                aq = s * A[i][p] + c * A[i][q]
                A[i][p], A[i][q] = ap, aq
                vp = c * Vm[i][p] - s * Vm[i][q]
                vq = s * Vm[i][p] + c * Vm[i][q]
                Vm[i][p], Vm[i][q] = vp, vq
        return (A, Vm), None

    (A, Vm), _ = jax.lax.scan(sweep, (A, Vm), None, length=sweeps)
    w = [A[0][0], A[1][1], A[2][2]]
    wmax = jnp.maximum(jnp.maximum(jnp.abs(w[0]), jnp.abs(w[1])), jnp.abs(w[2]))
    thresh = jnp.maximum(rcond * wmax, 1e-12)
    iw = [
        jnp.where(jnp.abs(wk) > thresh,
                  1.0 / jnp.where(jnp.abs(wk) > 1e-30, wk, 1.0), 0.0)
        for wk in w
    ]
    W = [[sum(Vm[i][k] * iw[k] * Vm[j][k] for k in range(3)) for j in range(3)]
         for i in range(3)]
    return W


def eigh3_planes(cov, sweeps=4, safeguard=True, rtol=1e-5, max_extra=2):
    """Plane-form symmetric 3x3 eigendecomposition of a (V, 3, 3) batch
    (or (V, 6) packed symmetric planes).

    Returns (eigvals (V, 3) ascending, eigvecs-as-columns (V, 3, 3)) —
    interface-compatible with linalg.eigh_small but with V on lanes
    throughout (used by prepare_reference on the voxel covariances).

    Cost is pure op-latency (each sweep = 3 serialized rotation rounds of
    (V,)-lane elementwise ops), so sweeps are the knob: 4 sweeps reach f32
    convergence on lidar voxel covariances (cyclic 3x3 Jacobi is
    quadratically convergent), and ``safeguard`` appends up to
    ``max_extra`` sweeps under a ``lax.while_loop`` only while any lane
    still carries off-diagonal mass ``> rtol * ||diag||`` — the same
    measured-safeguard pattern as linalg.eigh_small_warm_safe, batched.
    (Was a fixed 6 sweeps; the common case now pays 12 rotation rounds
    plus one cheap convergence reduce instead of 18.)
    """
    A = _sym_planes(cov)
    one = jnp.ones_like(A[0][0])
    zero = jnp.zeros_like(A[0][0])
    Vm = [[one, zero, zero], [zero, one, zero], [zero, zero, one]]

    def rotate(carry):
        A, Vm = carry
        A = [row[:] for row in A]
        Vm = [row[:] for row in Vm]
        for p, q in ((0, 1), (0, 2), (1, 2)):
            ang = 0.5 * jnp.arctan2(2.0 * A[p][q], A[q][q] - A[p][p])
            c = jnp.cos(ang)
            s = jnp.sin(ang)
            rowp = [c * A[p][j] - s * A[q][j] for j in range(3)]
            rowq = [s * A[p][j] + c * A[q][j] for j in range(3)]
            A[p], A[q] = rowp, rowq
            for i in range(3):
                ap = c * A[i][p] - s * A[i][q]
                aq = s * A[i][p] + c * A[i][q]
                A[i][p], A[i][q] = ap, aq
                vp = c * Vm[i][p] - s * Vm[i][q]
                vq = s * Vm[i][p] + c * Vm[i][q]
                Vm[i][p], Vm[i][q] = vp, vq
        return A, Vm

    def sweep(carry, _):
        return rotate(carry), None

    (A, Vm), _ = jax.lax.scan(sweep, (A, Vm), None, length=sweeps)

    if safeguard:
        def _unconverged(A):
            off = A[0][1] ** 2 + A[0][2] ** 2 + A[1][2] ** 2
            dg = A[0][0] ** 2 + A[1][1] ** 2 + A[2][2] ** 2
            return jnp.any(off > (rtol * rtol) * jnp.maximum(dg, 1e-30))

        def w_cond(carry):
            k, (A, _) = carry
            return (k < max_extra) & _unconverged(A)

        def w_body(carry):
            k, st = carry
            return k + 1, rotate(st)

        _, (A, Vm) = jax.lax.while_loop(w_cond, w_body, (jnp.int32(0), (A, Vm)))

    w = [A[0][0], A[1][1], A[2][2]]
    cols = [[Vm[i][k] for i in range(3)] for k in range(3)]  # cols[k] = evec k

    # Ascending sort of 3 (eigval, eigvec) pairs: network (0,1)(1,2)(0,1).
    def cswap(a, b):
        swap = w[a] > w[b]
        w[a], w[b] = (
            jnp.where(swap, w[b], w[a]),
            jnp.where(swap, w[a], w[b]),
        )
        for i in range(3):
            cols[a][i], cols[b][i] = (
                jnp.where(swap, cols[b][i], cols[a][i]),
                jnp.where(swap, cols[a][i], cols[b][i]),
            )

    cswap(0, 1)
    cswap(1, 2)
    cswap(0, 1)

    eigvals = jnp.stack(w, axis=-1)
    basis = jnp.stack(
        [jnp.stack([cols[k][i] for k in range(3)], axis=-1) for i in range(3)],
        axis=-2,
    )
    return eigvals, basis


def _mat_planes(m):
    """(V, 3, 3) -> 3x3 list of (V,) planes; plane lists pass through.

    The pass-through lets solver._iteration feed row slices of ONE packed
    (rows, V) model buffer straight into the math — XLA keeps static slices
    fused into their consumers (it never hoists them out of a while body as
    separate buffers), so the GN loop body DMAs a single table instead of
    ~15 separate (V,) planes per iteration."""
    if isinstance(m, (list, tuple)):
        assert len(m) == 3 and all(len(r) == 3 for r in m), (
            "plane-list matrix must be a 3x3 nested list of (V,) planes")
        return m
    return [[m[:, i, j] for j in range(3)] for i in range(3)]


def _vec3_planes(v):
    """(V, 3) -> list of 3 (V,) planes; plane lists pass through."""
    if isinstance(v, (list, tuple)):
        assert len(v) == 3, "plane-list vector must be 3 (V,) planes"
        return v
    return [v[:, j] for j in range(3)]


def residual_compact_planes(basis, lmask, mean1, mean2):
    """``diag(l) U^T (mu2 - mu1)`` as planes -> (V, 3) (the compact residual
    used by the moving-object filter before the correspondence mask exists).

    ``basis``/``lmask``/``mean1``/``mean2`` accept AoS arrays or plane
    lists (see :func:`_mat_planes`)."""
    B = _mat_planes(basis)
    L = _vec3_planes(lmask)
    M1 = _vec3_planes(mean1)
    M2 = _vec3_planes(mean2)
    res = [M2[j] - M1[j] for j in range(3)]
    out = [
        L[i] * sum(B[j][i] * res[j] for j in range(3))
        for i in range(3)
    ]
    return jnp.stack(out, axis=-1)


_SYM6 = ((0, 3, 4), (3, 1, 5), (4, 5, 2))  # (i, j) -> packed cov6 column


def _sym_planes(cov):
    """(V, 3, 3) AoS or (V, 6) packed symmetric -> 3x3 list of (V,) planes;
    plane lists pass through."""
    if isinstance(cov, (list, tuple)):
        assert len(cov) == 3 and all(len(r) == 3 for r in cov), (
            "plane-list matrix must be a 3x3 nested list of (V,) planes")
        return cov
    if cov.ndim == 3:
        return [[cov[:, i, j] for j in range(3)] for i in range(3)]
    return [[cov[:, _SYM6[i][j]] for j in range(3)] for i in range(3)]


def assemble_normal_equations(
    basis, lmask, cov1, count1, cov2, count2, mean1, mean2, dR, cm, rcond,
    extra_dz=None,
):
    """Plane-form WLS assembly.

    Args:
      basis: (V, 3, 3) eigenvectors-as-columns, or a 3x3 plane list.
      lmask: (V, 3) axis keep mask, or a 3-plane list.
      cov1/cov2: (V, 3, 3), or (V, 6) packed [xx, yy, zz, xy, xz, yz]
        (moments.finalize_moments_planes — keeps the hot path off the
        3/128-lane AoS layout), or a symmetric 3x3 plane list;
        count1/count2: (V,).
      mean1/mean2: (V, 3), or 3-plane lists.
      dR: (3, 3, 3) rotation derivative scalars (dR[..., k] = dR/da_k).
      cm: (V,) f32 correspondence mask.
      rcond: pinv eigenvalue floor.
      extra_dz: optional second residual field (3-plane list or (V, 3)) run
        through the identical H^T W pipeline — used for sensitivity right-
        hand sides, e.g. d(mu2)/d(common range delta) = r_hat(mu2) for the
        range-calibration covariance term (ICETConfig.range_sigma).

    Returns (HTWH (6, 6), HTWdz (6,), res_compact (V, 3)) — plus
    HTW@extra_dz (6,) appended when ``extra_dz`` is given.
    """
    # Extract planes.
    B = _mat_planes(basis)
    L = _vec3_planes(lmask)
    M1 = _vec3_planes(mean1)
    M2 = _vec3_planes(mean2)
    P = [[L[i] * B[j][i] for j in range(3)] for i in range(3)]
    n1 = jnp.maximum(count1 - 1.0, 1.0)
    n2 = jnp.maximum(count2 - 1.0, 1.0)
    c1p = _sym_planes(cov1)
    c2p = _sym_planes(cov2)
    R = [[c1p[i][j] / n1 + c2p[i][j] / n2 for j in range(3)]
         for i in range(3)]
    res = [M2[j] - M1[j] for j in range(3)]
    res_c = [sum(P[i][j] * res[j] for j in range(3)) for i in range(3)]

    # R_proj = P R P^T
    T = [[sum(P[i][k] * R[k][j] for k in range(3)) for j in range(3)]
         for i in range(3)]
    Rp = [[sum(T[i][k] * P[j][k] for k in range(3)) for j in range(3)]
          for i in range(3)]
    W = _pinv3_planes(Rp, rcond)

    # H columns: 0..2 = -I; 3+k = dR_k @ mu2.
    mu = M2
    Hrot = [[sum(dR[a, b, k] * mu[b] for b in range(3)) for k in range(3)]
            for a in range(3)]
    # Hz[i][c]: c < 3 -> -P[i][c];  c >= 3 -> sum_a P[i][a] * Hrot[a][c-3]
    Hz = [
        [-P[i][c] for c in range(3)]
        + [sum(P[i][a] * Hrot[a][k] for a in range(3)) for k in range(3)]
        for i in range(3)
    ]
    WHz = [[sum(W[i][j] * Hz[j][c] for j in range(3)) for c in range(6)]
           for i in range(3)]
    Wdz = [sum(W[i][j] * res_c[j] for j in range(3)) for i in range(3)]

    HTWH = jnp.zeros((6, 6), cm.dtype)
    for c in range(6):
        for d in range(c, 6):
            val = jnp.sum(cm * sum(Hz[i][c] * WHz[i][d] for i in range(3)))
            HTWH = HTWH.at[c, d].set(val)
            if d != c:
                HTWH = HTWH.at[d, c].set(val)
    HTWdz = jnp.stack(
        [jnp.sum(cm * sum(Hz[i][c] * Wdz[i] for i in range(3)))
         for c in range(6)]
    )
    res_compact = jnp.stack(res_c, axis=-1)
    if extra_dz is None:
        return HTWH, HTWdz, res_compact
    G = _vec3_planes(extra_dz)
    g_c = [sum(P[i][j] * G[j] for j in range(3)) for i in range(3)]
    Wg = [sum(W[i][j] * g_c[j] for j in range(3)) for i in range(3)]
    HTWg = jnp.stack(
        [jnp.sum(cm * sum(Hz[i][c] * Wg[i] for i in range(3)))
         for c in range(6)]
    )
    return HTWH, HTWdz, res_compact, HTWg
