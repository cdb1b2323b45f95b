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


def _jacobi_sweep_schedule(n: int, sweeps: int):
    pairs = [(p, q) for p in range(n - 1) for q in range(p + 1, n)]
    return pairs * sweeps


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

    eye = jnp.eye(n, dtype=A.dtype)
    pairs = _jacobi_sweep_schedule(n, 1)

    def sweep(carry, _):
        A, V = carry
        # One full cyclic sweep, unrolled over the static pair schedule
        # (n <= 6 -> at most 15 rotations); identical sweeps are rolled up by
        # the outer lax.scan to keep the program small.
        for p, q in pairs:
            apq = A[..., p, q]
            app = A[..., p, p]
            aqq = A[..., q, q]
            # Givens angle zeroing A[p, q]; arctan2 handles apq == 0 smoothly.
            ang = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
            c = jnp.cos(ang)
            s = jnp.sin(ang)
            # G = I with G[p,p]=c, G[q,q]=c, G[p,q]=s, G[q,p]=-s
            G = jnp.broadcast_to(eye, A.shape)
            G = G.at[..., p, p].set(c)
            G = G.at[..., q, q].set(c)
            G = G.at[..., p, q].set(s)
            G = G.at[..., q, p].set(-s)
            GT = jnp.swapaxes(G, -1, -2)
            # f32 precision is required: bf16 MXU passes would wreck the
            # orthogonality of the accumulated eigenvector basis.
            A = jnp.matmul(jnp.matmul(GT, A, precision=_HI), G, precision=_HI)
            V = jnp.matmul(V, G, precision=_HI)
        return (A, V), None

    (A, V), _ = jax.lax.scan(sweep, (A, V), None, length=sweeps)

    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w, V


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
    return jnp.matmul(
        V * inv_w[..., None, :], jnp.swapaxes(V, -1, -2), precision=_HI
    )
