import numpy as np
import jax.numpy as jnp

from icet_tpu.ops.linalg import eigh_small, psd_pinv


def _check_eigh(A, atol=1e-4):
    w, V = eigh_small(jnp.asarray(A))
    w, V = np.asarray(w), np.asarray(V)
    # Ascending order
    assert (np.diff(w, axis=-1) >= -atol).all()
    # A V = V diag(w)
    recon = (V * w[..., None, :]) @ np.swapaxes(V, -1, -2)
    np.testing.assert_allclose(recon, A, atol=atol * np.abs(A).max() + atol)
    # Orthonormal columns
    eye = np.broadcast_to(np.eye(A.shape[-1]), A.shape)
    np.testing.assert_allclose(V @ np.swapaxes(V, -1, -2), eye, atol=atol)
    # Eigenvalues match LAPACK
    np.testing.assert_allclose(w, np.linalg.eigvalsh(A), atol=atol * (1 + np.abs(A).max()))


def test_eigh3_random_batch(rng):
    A = rng.normal(size=(500, 3, 3)).astype(np.float32)
    A = A + np.swapaxes(A, -1, -2)
    _check_eigh(A)


def test_eigh3_psd_batch(rng):
    B = rng.normal(size=(500, 3, 3)).astype(np.float32)
    _check_eigh(B @ np.swapaxes(B, -1, -2))


def test_eigh6_random(rng):
    A = rng.normal(size=(32, 6, 6)).astype(np.float32)
    A = A + np.swapaxes(A, -1, -2)
    _check_eigh(A)


def test_eigh_degenerate_cases():
    cases = np.stack(
        [
            np.zeros((3, 3), np.float32),
            np.eye(3, dtype=np.float32),
            np.diag([1.0, 1.0, 2.0]).astype(np.float32),  # repeated eigenvalue
            np.diag([1e-8, 1.0, 1e8]).astype(np.float32),  # wide spread
            np.array([[1, 1, 0], [1, 1, 0], [0, 0, 0]], np.float32),  # rank 1
        ]
    )
    _check_eigh(cases, atol=1e-3)


def test_eigh_planar_covariances(rng):
    # Degenerate/planar voxel covariances are the COMMON case in ICET
    # (flat walls/ground) — exercise near-rank-2 matrices heavily.
    u = rng.normal(size=(200, 3, 2)).astype(np.float32)
    A = u @ np.swapaxes(u, -1, -2) + 1e-7 * np.eye(3, dtype=np.float32)
    _check_eigh(A, atol=1e-3)


def test_psd_pinv_full_rank(rng):
    B = rng.normal(size=(100, 3, 3)).astype(np.float32)
    A = B @ np.swapaxes(B, -1, -2) + 0.1 * np.eye(3, dtype=np.float32)
    P = np.asarray(psd_pinv(jnp.asarray(A)))
    np.testing.assert_allclose(P, np.linalg.inv(A), rtol=2e-3, atol=1e-4)


def test_psd_pinv_rank_deficient(rng):
    u = rng.normal(size=(50, 3, 1)).astype(np.float32)
    A = u @ np.swapaxes(u, -1, -2)  # rank 1
    P = np.asarray(psd_pinv(jnp.asarray(A)))
    # rcond matters: the f32 rounding of u u^T has ~1e-8 junk eigenvalues that
    # a default-rcond pinv would invert into garbage.
    expected = np.linalg.pinv(A.astype(np.float64), rcond=1e-6).astype(np.float32)
    scale = np.abs(expected).max(axis=(-1, -2), keepdims=True)
    np.testing.assert_allclose(P / scale, expected / scale, atol=5e-3)


def test_psd_pinv_zero():
    P = np.asarray(psd_pinv(jnp.zeros((4, 3, 3))))
    np.testing.assert_allclose(P, 0.0)
