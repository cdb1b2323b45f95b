"""Unit tests for the plane (SoA) WLS assembly against a naive numpy oracle."""

import numpy as np
import jax.numpy as jnp

from icet_tpu.ops.geometry import rotation_jacobian
from icet_tpu.ops.wls_planes import (
    assemble_normal_equations,
    residual_compact_planes,
)


def _naive(basis, lmask, cov1, n1c, cov2, n2c, mean1, mean2, dR, cm, rcond):
    V = basis.shape[0]
    HTWH = np.zeros((6, 6))
    HTWdz = np.zeros(6)
    for v in range(V):
        P = np.diag(lmask[v]) @ basis[v].T
        n1 = max(n1c[v] - 1.0, 1.0)
        n2 = max(n2c[v] - 1.0, 1.0)
        R = cov1[v] / n1 + cov2[v] / n2
        Rp = P @ R @ P.T
        w, U = np.linalg.eigh(Rp)
        keep = np.abs(w) > max(rcond * np.abs(w).max(), 1e-12)
        W = (U * np.where(keep, 1.0 / np.where(keep, w, 1), 0.0)) @ U.T
        H = np.zeros((3, 6))
        H[:, :3] = -np.eye(3)
        for k in range(3):
            H[:, 3 + k] = dR[:, :, k] @ mean2[v]
        Hz = P @ H
        dz = P @ (mean2[v] - mean1[v])
        HTWH += cm[v] * (Hz.T @ W @ Hz)
        HTWdz += cm[v] * (Hz.T @ W @ dz)
    return HTWH, HTWdz


def test_assembly_matches_naive(rng):
    V = 40
    B = rng.normal(size=(V, 3, 3)).astype(np.float32)
    # eigenbases: orthonormal columns via QR
    basis = np.linalg.qr(B)[0].astype(np.float32)
    lmask = (rng.random((V, 3)) > 0.3).astype(np.float32)
    c1 = rng.normal(size=(V, 3, 3)).astype(np.float32)
    cov1 = (c1 @ np.swapaxes(c1, -1, -2) * 0.01).astype(np.float32)
    c2 = rng.normal(size=(V, 3, 3)).astype(np.float32)
    cov2 = (c2 @ np.swapaxes(c2, -1, -2) * 0.01).astype(np.float32)
    n1 = rng.integers(26, 300, V).astype(np.float32)
    n2 = rng.integers(26, 300, V).astype(np.float32)
    mean1 = (rng.normal(size=(V, 3)) * 20).astype(np.float32)
    mean2 = mean1 + rng.normal(size=(V, 3)).astype(np.float32) * 0.1
    cm = (rng.random(V) > 0.2).astype(np.float32)
    angs = jnp.asarray([0.02, -0.01, 0.05], jnp.float32)
    dR = np.asarray(rotation_jacobian(angs))

    HTWH, HTWdz, res_c = assemble_normal_equations(
        jnp.asarray(basis), jnp.asarray(lmask), jnp.asarray(cov1),
        jnp.asarray(n1), jnp.asarray(cov2), jnp.asarray(n2),
        jnp.asarray(mean1), jnp.asarray(mean2), jnp.asarray(dR),
        jnp.asarray(cm), 1e-7,
    )
    eH, eb = _naive(
        basis.astype(np.float64), lmask, cov1.astype(np.float64), n1,
        cov2.astype(np.float64), n2, mean1.astype(np.float64),
        mean2.astype(np.float64), dR.astype(np.float64), cm, 1e-7,
    )
    scale = np.abs(eH).max()
    np.testing.assert_allclose(np.asarray(HTWH) / scale, eH / scale, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(HTWdz) / np.abs(eb).max(), eb / np.abs(eb).max(), atol=2e-4
    )


def test_residual_compact_planes(rng):
    V = 20
    basis = np.linalg.qr(rng.normal(size=(V, 3, 3)))[0].astype(np.float32)
    lmask = (rng.random((V, 3)) > 0.5).astype(np.float32)
    m1 = rng.normal(size=(V, 3)).astype(np.float32)
    m2 = rng.normal(size=(V, 3)).astype(np.float32)
    out = np.asarray(
        residual_compact_planes(
            jnp.asarray(basis), jnp.asarray(lmask), jnp.asarray(m1),
            jnp.asarray(m2),
        )
    )
    for v in range(V):
        expected = np.diag(lmask[v]) @ basis[v].T @ (m2[v] - m1[v])
        np.testing.assert_allclose(out[v], expected, atol=1e-5)


def test_eigh3_planes_matches_eigh_small(rng):
    from icet_tpu.ops.linalg import eigh_small
    from icet_tpu.ops.wls_planes import eigh3_planes

    B = rng.normal(size=(200, 3, 3)).astype(np.float32)
    A = B @ np.swapaxes(B, -1, -2)
    w_p, V_p = eigh3_planes(jnp.asarray(A))
    w_s, V_s = eigh_small(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_s), atol=1e-3)
    # Eigenvectors up to sign: compare |dot| of matching columns.
    dots = np.abs(np.einsum("vik,vik->vk", np.asarray(V_p), np.asarray(V_s)))
    assert (dots > 0.999).mean() > 0.98  # allow rare degenerate pairs


def test_eigh3_planes_safeguard_rescues_short_schedule(rng):
    """The measured safeguard (extra sweeps only while any lane carries
    off-diagonal mass) must rescue a deliberately short base schedule —
     1 base sweep is far from converged on ill-conditioned batches, so the
    while_loop must fire and still land on the true decomposition."""
    from icet_tpu.ops.wls_planes import eigh3_planes

    B = rng.normal(size=(64, 3, 3)).astype(np.float32)
    A = (B @ np.swapaxes(B, -1, -2)).astype(np.float32)
    # Ill-condition some lanes: stretch one axis by 1e4.
    A[::4, 0, 0] *= 1e4

    # ZERO base sweeps: with the safeguard off this returns the identity
    # basis / raw diagonal (the negative control); with it on, the
    # while_loop alone must drive the decomposition to convergence.
    w1, V1 = eigh3_planes(jnp.asarray(A), sweeps=0, safeguard=True,
                          max_extra=6)
    recon = np.einsum("vik,vk,vjk->vij", np.asarray(V1), np.asarray(w1),
                      np.asarray(V1))
    rel = np.abs(recon - A) / np.abs(A).max(axis=(1, 2), keepdims=True)
    assert rel.max() < 2e-3, rel.max()

    w_off, V_off = eigh3_planes(jnp.asarray(A), sweeps=0, safeguard=False)
    np.testing.assert_array_equal(
        np.sort(np.asarray(V_off), axis=None),
        np.sort(np.broadcast_to(np.eye(3, dtype=np.float32), A.shape),
                axis=None),
    )
