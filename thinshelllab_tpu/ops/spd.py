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


def value_grad_hess(energy_fn, argnum: int = 0):
    """Returns f(x, *a) -> (E, dE/dx, d2E/dx2) for a scalar energy of a
    flattened coordinate vector x. Hessian via forward-over-reverse."""
    grad_fn = jax.grad(energy_fn, argnums=argnum)
    hess_fn = jax.jacfwd(grad_fn, argnums=argnum)

    def f(*args):
        return energy_fn(*args), grad_fn(*args), hess_fn(*args)

    return f
