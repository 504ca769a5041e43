"""Batched SPD (positive-semidefinite) projection of small symmetric blocks.

TPU-native replacement for the reference's in-kernel Householder+QR
eigensolver (engine/linalg.py:29-148): we use XLA's batched `eigh` on
vmapped k x k blocks and clamp negative eigenvalues to zero.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def project_psd(H):
    """H: (..., k, k) symmetric -> nearest PSD (eigenvalue clamp)."""
    Hs = 0.5 * (H + jnp.swapaxes(H, -1, -2))
    w, v = jnp.linalg.eigh(Hs)
    w = jnp.maximum(w, 0.0)
    return jnp.einsum("...ik,...k,...jk->...ij", v, w, v)


def project_psd_2x2(H):
    """Closed-form 2x2 PSD projection (reference linalg.SPD_project_2d:6-12
    via SVD; here: direct symmetric eigen-decomposition)."""
    a = H[..., 0, 0]
    b = 0.5 * (H[..., 0, 1] + H[..., 1, 0])
    c = H[..., 1, 1]
    tr = a + c
    det_s = jnp.sqrt(jnp.maximum(((a - c) * 0.5) ** 2 + b * b, 0.0))
    l1 = 0.5 * tr + det_s
    l2 = 0.5 * tr - det_s
    # eigenvector for l1: (b, l1 - a) unless degenerate
    tiny = jnp.finfo(jnp.result_type(b)).tiny
    vx = jnp.where(jnp.abs(b) > tiny, b, 1.0)
    vy = jnp.where(jnp.abs(b) > tiny, l1 - a, 0.0)
    nrm = jnp.sqrt(vx * vx + vy * vy)
    vx, vy = vx / nrm, vy / nrm
    l1c = jnp.maximum(l1, 0.0)
    l2c = jnp.maximum(l2, 0.0)
    # P = l1c v v^T + l2c v_perp v_perp^T where v_perp = (-vy, vx)
    out = jnp.stack(
        [
            jnp.stack([l1c * vx * vx + l2c * vy * vy, (l1c - l2c) * vx * vy], -1),
            jnp.stack([(l1c - l2c) * vx * vy, l1c * vy * vy + l2c * vx * vx], -1),
        ],
        axis=-2,
    )
    return out


def gershgorin_psd(H):
    """Cheap PSD-ification: H + max(0, -lambda_lb) I with the Gershgorin
    lower bound lambda_lb = min_i (H_ii - sum_{j!=i} |H_ij|).

    Compile- and runtime-friendly alternative to the eigenvalue clamp for the
    forward Newton Hessian (the backward pass always uses the exact
    unprojected Hessian); more conservative than eigh-clamping but keeps the
    Newton direction a descent direction, which is all the line-searched
    solver needs."""
    Hs = 0.5 * (H + jnp.swapaxes(H, -1, -2))
    k = Hs.shape[-1]
    diag = jnp.diagonal(Hs, axis1=-2, axis2=-1)
    offsum = jnp.sum(jnp.abs(Hs), axis=-1) - jnp.abs(diag)
    lam_lb = jnp.min(diag - offsum, axis=-1)
    shift = jnp.maximum(0.0, -lam_lb)
    eye = jnp.eye(k, dtype=H.dtype)
    return Hs + shift[..., None, None] * eye


def project_psd_method(H, method: str):
    if method == "shift":
        return gershgorin_psd(H)
    return project_psd(H)


def _eigvals_sym3(D):
    """Closed-form (trigonometric Cardano) eigenvalues of batched symmetric
    3x3 blocks, ascending. Pure elementwise math -- replaces the batched
    `eigh` custom-call on the adjoint-preconditioner hot path (measured
    ~12 ms/backward-step at bench size for (NV, 3, 3) blocks, round-5
    trace), which on TPU dispatches a latency-bound LAPACK-style loop.

    Standard stable form: shift by the trace mean, scale by
    p = sqrt(tr((D - qI)^2) / 6), then the eigenvalues of the normalized
    matrix B are 2 cos((acos(det(B)/2) + 2 pi k) / 3)."""
    dt = D.dtype
    a, b, c = D[..., 0, 0], D[..., 1, 1], D[..., 2, 2]
    d, e, f = D[..., 0, 1], D[..., 1, 2], D[..., 0, 2]
    q = (a + b + c) / 3.0
    p2 = ((a - q) ** 2 + (b - q) ** 2 + (c - q) ** 2
          + 2.0 * (d * d + e * e + f * f))
    tiny = jnp.finfo(dt).tiny
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, tiny))
    # det((D - qI) / p), closed form
    a_, b_, c_ = (a - q) / p, (b - q) / p, (c - q) / p
    d_, e_, f_ = d / p, e / p, f / p
    detB = (a_ * (b_ * c_ - e_ * e_) - d_ * (d_ * c_ - e_ * f_)
            + f_ * (d_ * e_ - b_ * f_))
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_pi_3 = jnp.asarray(2.0943951023931953, dt)
    lam_hi = q + 2.0 * p * jnp.cos(phi)
    lam_lo = q + 2.0 * p * jnp.cos(phi + two_pi_3)
    lam_mid = 3.0 * q - lam_hi - lam_lo
    # p2 ~ 0 (scalar matrix): all eigenvalues are q exactly
    scalar = p2 <= 6.0 * tiny
    lam_hi = jnp.where(scalar, q, lam_hi)
    lam_mid = jnp.where(scalar, q, lam_mid)
    lam_lo = jnp.where(scalar, q, lam_lo)
    return jnp.stack([lam_lo, lam_mid, lam_hi], axis=-1)


def abs_inv_3x3(D, floor_rel=1e-6):
    """Batched |D|^-1 for symmetric 3x3 blocks WITHOUT an eigenvector
    solve: |D|^-1 = f(D) with f(lam) = 1 / max(|lam|, floor) is a
    polynomial in D (degree 2, Cayley-Hamilton), built from the closed-form
    eigenvalues via Newton divided differences:

        f(D) = f(l1) I + f[l1,l2] (D - l1 I)
                        + f[l1,l2,l3] (D - l1 I)(D - l2 I)

    Exact where eigenvalues are distinct; where they cluster the guarded
    divided differences approach the (smooth, floored) f's derivatives and
    the interpolation error vanishes with the cluster width. This feeds
    the block-Jacobi part of the adjoint GMRES/MINRES preconditioner, so
    approximation only shifts iteration counts; GMRES measures the true
    residual. Matches the eigh-based form (tests/test_solver_precond.py)."""
    dt = D.dtype
    Ds = 0.5 * (D + jnp.swapaxes(D, -1, -2))
    lam = _eigvals_sym3(Ds)
    mx = jnp.max(jnp.abs(lam), axis=-1, keepdims=True)
    tiny = jnp.finfo(dt).tiny
    floor = floor_rel * mx + tiny
    fl = 1.0 / jnp.maximum(jnp.abs(lam), floor)
    l1, l2, l3 = lam[..., 0], lam[..., 1], lam[..., 2]
    f1, f2, f3 = fl[..., 0], fl[..., 1], fl[..., 2]
    # guarded divided differences (sign-preserving denominators)
    eps = jnp.finfo(dt).eps
    gscale = eps * mx[..., 0] + tiny

    def _gdiv(num, den):
        mag = jnp.maximum(jnp.abs(den), gscale)
        return num / jnp.where(den < 0, -mag, mag)

    c1 = _gdiv(f2 - f1, l2 - l1)
    c2 = _gdiv(_gdiv(f3 - f2, l3 - l2) - c1, l3 - l1)
    eye = jnp.eye(3, dtype=dt)
    M1 = Ds - l1[..., None, None] * eye
    M2 = Ds - l2[..., None, None] * eye
    out = (f1[..., None, None] * eye + c1[..., None, None] * M1
           + c2[..., None, None] * jnp.einsum("...ij,...jk->...ik", M1, M2))
    return 0.5 * (out + jnp.swapaxes(out, -1, -2))


def value_grad_hess(energy_fn, argnum: int = 0):
    """Returns f(x, *a) -> (E, dE/dx, d2E/dx2) for a scalar energy of a
    flattened coordinate vector x. Hessian via forward-over-reverse."""
    grad_fn = jax.grad(energy_fn, argnums=argnum)
    hess_fn = jax.jacfwd(grad_fn, argnums=argnum)

    def f(*args):
        return energy_fn(*args), grad_fn(*args), hess_fn(*args)

    return f
