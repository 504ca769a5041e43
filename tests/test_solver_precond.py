"""Parity tests for the closed-form |D|^-1 preconditioner blocks.

spd.abs_inv_3x3 replaces the batched `eigh` custom-call on the adjoint
preconditioner's per-backward-step path (solver.solve_adjoint /
solve_minres); these tests pin it to the eigh-based formulation it
replaced, including the degenerate cases (clustered / near-zero / negative
eigenvalues, scalar matrices) where the guarded divided differences kick
in. Reference being rebuilt keeps no analogue (Taichi LDL direct solve,
engine/sparse_solver.py); the |D| floor semantics mirror the original
eigh form (|lam| >= 1e-6 * max|lam|).
"""
import jax.numpy as jnp
import numpy as np

from thinshelllab_tpu.ops import spd


def _abs_inv_eigh(D, floor_rel=1e-6):
    lam, Q = np.linalg.eigh(np.asarray(D, np.float64))
    mx = np.max(np.abs(lam), axis=-1, keepdims=True)
    lam = np.maximum(np.abs(lam), floor_rel * mx + 1e-300)
    return np.einsum("...ik,...k,...jk->...ij", Q, 1.0 / lam, Q)


def _sym(rng, n, scale=1.0):
    A = rng.normal(size=(n, 3, 3)) * scale
    return 0.5 * (A + np.swapaxes(A, -1, -2))


def test_abs_inv_matches_eigh_generic():
    rng = np.random.default_rng(0)
    D = _sym(rng, 256, scale=3.0)
    got = np.asarray(spd.abs_inv_3x3(jnp.asarray(D)))
    want = _abs_inv_eigh(D)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_abs_inv_indefinite_blocks():
    rng = np.random.default_rng(1)
    # force indefiniteness: D = Q diag(+,-,+) Q^T
    lam = np.stack(
        [rng.uniform(0.5, 2, 128), -rng.uniform(0.5, 2, 128),
         rng.uniform(3, 9, 128)], axis=-1)
    A = rng.normal(size=(128, 3, 3))
    Q, _ = np.linalg.qr(A)
    D = np.einsum("nik,nk,njk->nij", Q, lam, Q)
    got = np.asarray(spd.abs_inv_3x3(jnp.asarray(D)))
    want = _abs_inv_eigh(D)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_abs_inv_clustered_and_scalar():
    rng = np.random.default_rng(2)
    # clustered: lam = (1, 1+3e-9, 5); interpolation error vanishes with
    # the cluster width, so the result still matches eigh closely
    lam = np.array([[1.0, 1.0 + 3e-9, 5.0]] * 16)
    A = rng.normal(size=(16, 3, 3))
    Q, _ = np.linalg.qr(A)
    D = np.einsum("nik,nk,njk->nij", Q, lam, Q)
    got = np.asarray(spd.abs_inv_3x3(jnp.asarray(D)))
    want = _abs_inv_eigh(D)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)
    # exactly scalar matrices (p2 == 0 branch)
    Ds = np.einsum("n,ij->nij", np.array([2.0, -3.0, 1e-4]), np.eye(3))
    got = np.asarray(spd.abs_inv_3x3(jnp.asarray(Ds)))
    want = _abs_inv_eigh(Ds)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_abs_inv_near_singular_floor():
    rng = np.random.default_rng(3)
    # one eigenvalue far below the 1e-6 relative floor: both forms clamp
    # it to floor_rel * max|lam|, keeping |D|^-1 bounded
    lam = np.stack(
        [np.full(32, 1e-12), rng.uniform(1, 2, 32), np.full(32, 4.0)],
        axis=-1)
    A = rng.normal(size=(32, 3, 3))
    Q, _ = np.linalg.qr(A)
    D = np.einsum("nik,nk,njk->nij", Q, lam, Q)
    got = np.asarray(spd.abs_inv_3x3(jnp.asarray(D)))
    want = _abs_inv_eigh(D)
    # the floored direction dominates the norm; agreement there certifies
    # both the clamp and the polynomial construction
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=1e-7)
    assert np.all(np.isfinite(got))


def test_abs_inv_spd_blocks_are_plain_inverse():
    rng = np.random.default_rng(4)
    A = rng.normal(size=(64, 3, 3))
    D = np.einsum("nij,nkj->nik", A, A) + 0.1 * np.eye(3)
    got = np.asarray(spd.abs_inv_3x3(jnp.asarray(D)))
    want = np.linalg.inv(D)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)
