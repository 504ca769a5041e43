"""Per-element scalar energy functions.

Each takes flattened element coordinates plus per-element parameters and
returns a scalar. Forces and element Hessian blocks are obtained by AD
(`jax.grad` / `jax.jacfwd(jax.grad)`) and vmapped over element soups -- the
TPU-native replacement for the reference's hand-derived Taichi kernels.

Reference energy definitions:
  * membrane edge:  Kl (1 - l/l0)^2 l0              (model_fold_offset.py:159-167)
  * membrane area:  Ka (1 - A/A0)^2 A0              (model_fold_offset.py:150-156)
  * bending:        Kb (theta - theta_ref)^2 dx^2/3 (model_fold_offset.py:109-124)
  * neo-Hookean:    W [mu/2 (tr(F^T F)-3) - mu log J + lam/2 log^2 J],
                    J clamped >= 0.01               (model_elastic_offset.py:315-331)
  * tactile:        W [mu/2 (I1-3) + lam/2 (J-alpha)^2], alpha = 1 + mu/lam
                                                    (model_elastic_tactile.py:184-201)
  * contact barrier: 0.5 k (g - eps)^2 for g < eps with
                    g = det(p1,p2,p)/|p1 x p2|      (BaseScene.py:487-543, contact_diff.py)
  * friction:       k f0(|T (dx - dx0)|) with the reference's smoothed
                    Coulomb mollifier f0            (BaseScene.py:453-478,548-595)

The dihedral angle uses the smooth signed form
  theta = atan2((n1 x n2) . e_hat, n1 . n2)
which is exactly equal to the reference's acos + side-sign convention
(model_fold_offset.py:126-138) but differentiable at theta = 0.
"""
from __future__ import annotations

import jax.numpy as jnp


# --------------------------------------------------------------------------
# Cloth membrane (per face, 9 coords)
# --------------------------------------------------------------------------


def membrane_energy(x, l0, rest_area, kl, ka):
    """x: (3,3) face vertex positions [f2v order]. Edge l: x[l] -> x[(l+1)%3]."""
    e_sum = 0.0
    for l in range(3):
        d = x[l] - x[(l + 1) % 3]
        ln = jnp.sqrt(jnp.sum(d * d))
        e_sum = e_sum + kl * (1.0 - ln / l0[l]) ** 2 * l0[l]
    n = jnp.cross(x[1] - x[0], x[2] - x[0])
    area = 0.5 * jnp.sqrt(jnp.sum(n * n))
    e_sum = e_sum + ka * (1.0 - area / rest_area) ** 2 * rest_area
    return e_sum


# --------------------------------------------------------------------------
# Bending (per hinge, 12 coords)
# --------------------------------------------------------------------------


def hinge_angle(x, sel):
    """x: (4,3) = [v0, v1, v2, v3] hinge stencil.

    `sel` is a (4, 4) one-hot selection matrix whose rows pick, in order,
    (xa, xb, ea, eb): the counter-face cycle after v3 visits xa then xb, and
    the shared edge runs ea -> eb with orientation fixed at build time so the
    sign convention matches the reference (theta < 0 iff
    n2 . (x_sb - x_v0) < 0, model_fold_offset.py:126-138). One-hot selection
    (a 4x4 matmul) instead of dynamic indexing keeps the vmapped
    forward-over-reverse Hessian TPU-friendly.

    theta = atan2((n1 x n2) . e_hat, n1 . n2) is the smooth signed dihedral
    angle: exactly equal to the reference's acos + side-sign form but
    differentiable at theta = 0 (the flat state).

    The selection is a broadcast multiply-reduce, NOT a matmul: under vmap
    a `sel @ x` becomes a batched (NH,4,4)x(NH,4,3) dot that the TPU runs
    as bf16 MXU passes at the default f32 matmul precision -- rounding the
    POSITIONS to 8 mantissa bits on the way in (measured: the dominant
    on-chip adjoint error, BASELINE.md round 5). Multiplying by exact
    0.0/1.0 and summing zeros on the VPU is exact at any precision
    setting."""
    rows = jnp.sum(sel[:, :, None] * x[None, :, :], axis=1)  # [xa,xb,xea,xeb]
    xa, xb, xea, xeb = rows[0], rows[1], rows[2], rows[3]
    n1 = jnp.cross(x[1] - x[0], x[2] - x[1])
    n1 = n1 / jnp.linalg.norm(n1)
    n2 = jnp.cross(xa - x[3], xb - xa)
    n2 = n2 / jnp.linalg.norm(n2)
    e = xeb - xea
    ehat = e / jnp.linalg.norm(e)
    return jnp.arctan2(jnp.dot(jnp.cross(n1, n2), ehat), jnp.dot(n1, n2))


def stencil_to_sel(ja, jb, ea, eb, dtype=None):
    """Build the (4,4) one-hot selection matrix from stencil indices."""
    import numpy as _np

    sel = _np.zeros((4, 4), dtype or _np.float64)
    for r, i in enumerate((ja, jb, ea, eb)):
        sel[r, i] = 1.0
    return sel


def bending_energy(x, sel, ref_angle, coef, kb):
    """coef = dx^2 / 3 (reference model_fold_offset.py:120)."""
    theta = hinge_angle(x, sel)
    return kb * (theta - ref_angle) ** 2 * coef


def bending_energy_batch(x, sel, ref_angle, coef, kb):
    """Per-hinge bending energies over the whole soup at once: x (NH,4,3),
    sel (NH,4,4) -> (NH,).

    Same arithmetic as vmap(bending_energy) to ULP level (measured max rel
    diff ~9e-16; asserted at rtol 5e-15 by tests/test_energies.py -- the two
    forms fuse the per-hinge arithmetic slightly differently, so exact
    bitwise equality is NOT guaranteed), but the 8 geometry rows (the 4 stencil
    vertices + the 4 sel-selected rows) come out of ONE einsum stacked
    along a LEADING axis. The vmapped form instead slices x[:, k] -- a
    strided mid-dim read of the (NH,4,3) soup that XLA materializes as
    (NH,1,3) copy ops: ~17 ms/step of pure layout traffic at bench size in
    the round-4 device trace (the micro-Newton loop evaluates this 8-16
    times per step). Extracting the stencil vertices through one-hot rows
    of the same einsum is exact (multiplication by 0/1 and adding zeros
    are exact in floats)."""
    eye = jnp.broadcast_to(jnp.eye(4, dtype=x.dtype), sel.shape)
    sel8 = jnp.concatenate([eye, sel], axis=1)  # (NH, 8, 4)
    # broadcast multiply-reduce, not a batched dot: exact 0/1 selection on
    # the VPU regardless of the matmul-precision setting (see hinge_angle)
    rows = jnp.transpose(
        jnp.sum(sel8[:, :, :, None] * x[:, None, :, :], axis=2), (1, 0, 2)
    )  # (8, NH, 3): leading split
    x0, x1, x2, x3, xa, xb, xea, xeb = rows

    def _hat(v):
        return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))

    n1 = _hat(jnp.cross(x1 - x0, x2 - x1))
    n2 = _hat(jnp.cross(xa - x3, xb - xa))
    ehat = _hat(xeb - xea)
    theta = jnp.arctan2(
        jnp.sum(jnp.cross(n1, n2) * ehat, axis=-1), jnp.sum(n1 * n2, axis=-1)
    )
    return kb * (theta - ref_angle) ** 2 * coef


# --------------------------------------------------------------------------
# Volumetric elastics (per tet, relative coords D: (3,3) columns x_i - x_3)
# --------------------------------------------------------------------------


def neo_energy(D, B, W, mu, lam):
    # true-f32 deformation gradient: at the TPU default matmul precision the
    # vmapped 3x3 dot rounds D (position differences) to bf16 -- a direct
    # Hessian/force accuracy loss; the 6-pass f32 product on a per-tet 3x3
    # is noise next to the surrounding AD graph
    F = jnp.matmul(D, B, precision="highest")
    J = jnp.linalg.det(F)
    logJ = jnp.log(jnp.maximum(J, 0.01))
    phi = 0.5 * mu * (jnp.sum(F * F) - 3.0) - mu * logJ + 0.5 * lam * logJ**2
    return W * phi


def tactile_energy(D, B, W, mu, lam):
    F = jnp.matmul(D, B, precision="highest")  # see neo_energy
    J = jnp.linalg.det(F)
    I1 = jnp.sum(F * F)
    alpha = 1.0 + mu / lam
    phi = 0.5 * mu * (I1 - 3.0) + 0.5 * lam * (J - alpha) ** 2
    return W * phi


# --------------------------------------------------------------------------
# Contact barrier (relative coords: a = p1-p0, b = p2-p0, c = p-p0)
# --------------------------------------------------------------------------


def contact_gap(rel):
    """rel: (3,3) rows [a, b, c]. g = det(a,b,c)/|a x b| (signed point-plane
    distance of the projecting vertex over the triangle)."""
    a, b, c = rel[0], rel[1], rel[2]
    d = jnp.dot(jnp.cross(a, b), c)
    cn = jnp.linalg.norm(jnp.cross(a, b))
    return d / cn


def barrier_energy(rel, k_contact, eps_contact):
    g = contact_gap(rel)
    viol = g < eps_contact
    # guard: when inactive the quadratic is zeroed (smooth C1 barrier)
    e = 0.5 * k_contact * (g - eps_contact) ** 2
    return jnp.where(viol, e, 0.0)


# --------------------------------------------------------------------------
# Friction (12 coords; semi-implicit: k and dx0 held from step start)
# --------------------------------------------------------------------------


def f0_smooth(x, eps_v, h):
    """Reference BaseScene.f0 :453-460 mollifier of |u|."""
    eh = eps_v * h
    quad = -(x**3) / (3.0 * eh * eh) + x * x / eh + eh / 3.0
    return jnp.where(x > eh, x, quad)


def f1_over_x(x, eps_v, h):
    """f0'(x)/x (reference BaseScene.f1 :462-469)."""
    eh = eps_v * h
    return jnp.where(x > eh, 1.0 / x, -x / (eh * eh) + 2.0 / eh)


def friction_energy(x, w, T, dx0, k, eps_v, h):
    """x: (4,3) = [p0, p1, p2, p] (triangle + projecting vertex).

    u = T @ (p - sum_i w_i p_i - dx0); E = k f0(|u|).  |u| is smoothed near 0
    to keep AD well-defined (f0 is even in u so the sqrt guard is exact)."""
    xc = w[0] * x[0] + w[1] * x[1] + w[2] * x[2]
    dx = x[3] - xc - dx0
    u = T @ dx
    r2 = jnp.sum(u * u)
    r = jnp.sqrt(r2 + jnp.finfo(jnp.result_type(r2)).tiny)
    return k * f0_smooth(r, eps_v, h)


# --------------------------------------------------------------------------
# Inertia + external (per vertex; quadratic -- handled in closed form)
# --------------------------------------------------------------------------


def inertia_external_energy(pos, prev_pos, vel, mass, gravity, ext_force, dt):
    """sum_i [ 0.5 m |x - x_prev - v dt|^2 / dt^2 - (m g + f_ext) . x ]
    (reference model_fold_offset.compute_energy:191-200 and
    model_elastic_offset.compute_energy:315-323)."""
    X = pos - prev_pos - vel * dt
    e_inertia = 0.5 * jnp.sum(mass * jnp.sum(X * X, axis=-1)) / dt**2
    f = mass[:, None] * gravity + ext_force
    e_ext = -jnp.sum(f * pos)
    return e_inertia + e_ext
