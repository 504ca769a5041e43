"""Element evaluation: energies, forces (AD gradients) and per-element
Hessian blocks (AD forward-over-reverse), vmapped over element soups.

Each evaluation produces a list of "groups": dicts with
    idx: (E, k) int32 global vertex ids
    g:   (E, k, 3) per-element energy gradient (zeroed when inactive)
    H:   (E, k, k, 3, 3) element Hessian blocks H[e,a,b] = d2E/dx_a dx_b

Assembly (residual scatter, dense Hessian, matrix-free Hvp, block-Jacobi
diagonal, frozen-column products for the adjoint) is generic over groups --
this replaces the reference's per-material `add_F`/`add_H` Taichi scatter
kernels (BaseScene.py:392-405) and its dense-storage SparseMatrix
(engine/sparse_solver.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.spec import ContactSet, Params, SceneSpec
from ..ops import energies as en
from ..ops.spd import project_psd, project_psd_2x2, project_psd_method

# Module-level constants are plain NUMPY (CLAUDE.md rule: no device ops at
# import time -- a jnp literal here would eagerly initialize the pinned TPU
# backend in processes that must stay CPU-only, e.g. dryrun_multichip).
# S[j, a] maps vertex index a to tet shape-matrix column j: D[:, j] = x_j - x_3
_S_TET = np.concatenate([np.eye(3), -np.ones((1, 3))], axis=0)  # (4, 3) [a, j]
# Contact relative rows R[r] = x_{r+1} - x_0
_S_REL = np.concatenate([-np.ones((1, 3)), np.eye(3)], axis=0)  # (4, r)


# The _S_TET/_S_REL contractions written as exact slicing/sums instead of
# einsums: at the TPU's DEFAULT f32 matmul precision a batched einsum with
# these +-1/0 matrices runs as bf16 MXU passes, rounding the POSITIONS to 8
# mantissa bits on the way in -- measured as the dominant on-chip adjoint
# error (BASELINE.md round 5). Subtractions/negated sums on the VPU are
# mathematically identical (multiplying by exact 0/+-1 and adding zeros is
# exact) and precision-setting-independent.


def _tet_D(x):
    """D[t, i, j] = x[t, j, i] - x[t, 3, i] (einsum('aj,tai->tij', S, x))."""
    return jnp.swapaxes(x[:, :3] - x[:, 3:4], 1, 2)


def _tet_g(G):
    """g[t, a, i] = sum_j G[t, i, j] S[a, j] (einsum('tij,aj->tai'))."""
    Gt = jnp.swapaxes(G, 1, 2)  # (T, j, i)
    return jnp.concatenate([Gt, -Gt.sum(axis=1, keepdims=True)], axis=1)


def _tet_H(Hd):
    """H[t,a,b,i,k] = sum_jl Hd[t,i,j,k,l] S[a,j] S[b,l]
    (einsum('tijkl,aj,bl->tabik'))."""
    A = jnp.transpose(Hd, (0, 2, 4, 1, 3))  # (T, j, l, i, k)
    A = jnp.concatenate([A, -A.sum(axis=1, keepdims=True)], axis=1)
    A = jnp.concatenate([A, -A.sum(axis=2, keepdims=True)], axis=2)
    return A


def _rel_R(x):
    """R[c, r] = x[c, r+1] - x[c, 0] (einsum('ar,cai->cri', SR, x))."""
    return x[:, 1:] - x[:, :1]


def _rel_g(G):
    """g[c, a] : a=0 -> -sum_r G[c, r]; a>=1 -> G[c, a-1]
    (einsum('cri,ar->cai', G, SR))."""
    return jnp.concatenate([-G.sum(axis=1, keepdims=True), G], axis=1)


def _rel_H(Hr):
    """H[c,a,b,i,k] = sum_rs Hr[c,r,i,s,k] SR[a,r] SR[b,s]
    (einsum('crisk,ar,bs->cabik'))."""
    A = jnp.transpose(Hr, (0, 1, 3, 2, 4))  # (C, r, s, i, k)
    A = jnp.concatenate([-A.sum(axis=1, keepdims=True), A], axis=1)
    A = jnp.concatenate([-A.sum(axis=2, keepdims=True), A], axis=2)
    return A


# --------------------------------------------------------------------------
# per-soup energy evaluation
# --------------------------------------------------------------------------


def _face_params(spec: SceneSpec, params: Params):
    kl = params.kl[spec.cloth.cloth_id]
    ka = params.ka[spec.cloth.cloth_id]
    return kl, ka


def _skew(v):
    """(..., 3) -> (..., 3, 3) with skew(v) @ w = v x w."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], z, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], z], -1),
        ],
        -2,
    )


def membrane_hess_closed(x, l0, rest_area, kl, ka):
    """EXACT closed-form membrane Hessian blocks (E, 3, 3, 3, 3), layout
    H[e, a, b] = d2E/dx_a dx_b -- replaces the 9-pass forward-over-reverse
    AD (verified against it to f64 roundoff in tests/test_assembly.py).

    Edge springs s(l) = kl (1 - l/l0)^2 l0 on d = x_a - x_b:
        H_dd = s'' dh dh^T + (s'/l)(I - dh dh^T).
    Area term p(A) = ka (1 - A/A0)^2 A0 with A = |c1 x c2|/2, c1 = x1-x0,
    c2 = x2-x0:
        d2E = p'' dA dA^T + p' d2A,
        d2A = J_u^T (I - nh nh^T) J_v / (2|n|) -+ [nh]x / 2 cross blocks,
        J1 = -[c2]x, J2 = [c1]x."""
    dt_ = x.dtype
    eye = jnp.eye(3, dtype=dt_)
    Eb = x.shape[0]
    H = jnp.zeros((Eb, 3, 3, 3, 3), dt_)
    for l_ in range(3):
        a, b = l_, (l_ + 1) % 3
        d = x[:, a] - x[:, b]
        ln = jnp.sqrt(jnp.sum(d * d, axis=1))
        dh = d / ln[:, None]
        P = dh[:, :, None] * dh[:, None, :]
        spp = (2.0 * kl / l0[:, l_])[:, None, None]
        spl = ((-2.0 * kl * (1.0 - ln / l0[:, l_])) / ln)[:, None, None]
        Hd = spp * P + spl * (eye - P)
        H = H.at[:, a, a].add(Hd)
        H = H.at[:, b, b].add(Hd)
        H = H.at[:, a, b].add(-Hd)
        H = H.at[:, b, a].add(-Hd)

    c1 = x[:, 1] - x[:, 0]
    c2 = x[:, 2] - x[:, 0]
    n = jnp.cross(c1, c2)
    nn = jnp.linalg.norm(n, axis=1)
    nh = n / nn[:, None]
    A = 0.5 * nn
    p1 = (-2.0 * ka * (1.0 - A / rest_area))[:, None, None]   # p'
    p2 = (2.0 * ka / rest_area)[:, None, None]                # p''
    g1 = 0.5 * jnp.cross(c2, nh)
    g2 = 0.5 * jnp.cross(nh, c1)
    P = eye - nh[:, :, None] * nh[:, None, :]
    S1 = _skew(c1)
    S2 = _skew(c2)
    Sn = _skew(nh)
    inv2n = (0.5 / nn)[:, None, None]
    # true-f32 3x3 chains: at default TPU matmul precision these batched
    # dots round the position-difference skews to bf16 (Hessian accuracy)
    _hp = jax.lax.Precision.HIGHEST
    PS1 = jnp.einsum("eij,ejk->eik", P, S1, precision=_hp)
    PS2 = jnp.einsum("eij,ejk->eik", P, S2, precision=_hp)
    K11 = -jnp.einsum("eij,ejk->eik", S2, PS2, precision=_hp) * inv2n
    K12 = jnp.einsum("eij,ejk->eik", S2, PS1, precision=_hp) * inv2n
    K22 = -jnp.einsum("eij,ejk->eik", S1, PS1, precision=_hp) * inv2n
    C11 = p2 * g1[:, :, None] * g1[:, None, :] + p1 * K11
    C12 = p2 * g1[:, :, None] * g2[:, None, :] + p1 * (K12 - 0.5 * Sn)
    C22 = p2 * g2[:, :, None] * g2[:, None, :] + p1 * K22
    C21 = jnp.swapaxes(C12, -1, -2)
    H = H.at[:, 1, 1].add(C11)
    H = H.at[:, 1, 2].add(C12)
    H = H.at[:, 2, 1].add(C21)
    H = H.at[:, 2, 2].add(C22)
    H = H.at[:, 0, 1].add(-(C11 + C21))
    H = H.at[:, 0, 2].add(-(C12 + C22))
    H = H.at[:, 1, 0].add(-(C11 + C12))
    H = H.at[:, 2, 0].add(-(C21 + C22))
    H = H.at[:, 0, 0].add(C11 + C12 + C21 + C22)
    return H


def membrane_eval(spec, params, pos, with_hess: bool, spd: bool):
    c = spec.cloth
    x = pos[c.f2v]  # (E, 3, 3)
    kl, ka = _face_params(spec, params)

    def e_fn(xf, l0, area, kl_, ka_):
        return en.membrane_energy(xf, l0, area, kl_, ka_)

    g_fn = jax.grad(e_fn)
    E = jax.vmap(e_fn)(x, c.l0, c.rest_area, kl, ka)
    g = jax.vmap(g_fn)(x, c.l0, c.rest_area, kl, ka)
    out = {"idx": c.f2v, "g": g}
    if with_hess:
        H = membrane_hess_closed(x, c.l0, c.rest_area, kl, ka)
        if spd:
            H9 = H.transpose(0, 1, 3, 2, 4).reshape(-1, 9, 9)
            H9 = project_psd_method(H9, spec.spd_method)
            H = H9.reshape(-1, 3, 3, 3, 3).transpose(0, 1, 3, 2, 4)
        out["H"] = H
    return jnp.sum(E), out


_CANON_STENCIL = np.array(
    [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [-1.0, 1.0, 0.3]]
)


def bending_eval(spec, params, pos, ref_angle, with_hess: bool, spd: bool):
    c = spec.cloth
    x = pos[c.hinge_verts]  # (NH, 4, 3)
    # inactive hinges have degenerate stencils; evaluate them on a canonical
    # non-degenerate configuration so NaNs never enter the masked terms
    mask = c.hinge_mask
    x = jnp.where(
        mask[:, None, None], x, _CANON_STENCIL.astype(pos.dtype)[None]
    )
    kb = params.kb[c.hinge_cloth]
    sel = jnp.asarray(c.hinge_sel, pos.dtype)

    m = mask.astype(pos.dtype)

    def e_fn(xh, sel_, ref, coef, kb_):
        return en.bending_energy(xh, sel_, ref, coef, kb_)

    g_fn = jax.grad(e_fn)
    # batched energy+force (no strided per-column soup slices; ULP-level
    # agreement with the vmapped per-hinge form -- see bending_soup_eg)
    E, g = bending_soup_eg(spec, params, x, ref_angle)
    out = {"idx": c.hinge_verts, "g": g}
    if with_hess:
        # NOTE (measured, round 2): a hand-derived closed-form d2theta
        # (exact, verified to 1e-15) was 4x SLOWER here than this
        # forward-over-reverse AD -- XLA fuses the 12 JVP passes into pure
        # elementwise code, while the closed form's (NH,4,4,3,3) einsum
        # chain materializes intermediates through HBM. Keep AD.
        H = jax.vmap(jax.jacfwd(g_fn))(x, sel, ref_angle, c.hinge_coef, kb)
        H = jnp.transpose(H, (0, 1, 3, 2, 4)) * m[:, None, None, None, None]
        if spd:
            H12 = H.transpose(0, 1, 3, 2, 4).reshape(-1, 12, 12)
            H12 = project_psd_method(H12, spec.spd_method)
            H = H12.reshape(-1, 4, 3, 4, 3).transpose(0, 1, 3, 2, 4)
        out["H"] = H
    return E, out


def _tet_eval(energy, soup, mu_arr, lam_arr, pos, with_hess: bool, spd: bool,
              spd_method: str = "eigh"):
    x = pos[soup.tets]  # (T, 4, 3)
    D = _tet_D(x)  # columns x_a - x_3 (exact, no bf16 MXU pass)
    mu = mu_arr[soup.group]
    lam = lam_arr[soup.group]

    def e_fn(Dm, B, W, mu_, lam_):
        return energy(Dm, B, W, mu_, lam_)

    g_fn = jax.grad(e_fn)
    E = jax.vmap(e_fn)(D, soup.B, soup.W, mu, lam)
    G = jax.vmap(g_fn)(D, soup.B, soup.W, mu, lam)  # (T, 3, 3) dE/dD_ij
    g = _tet_g(G)
    out = {"idx": soup.tets, "g": g}
    if with_hess:
        Hd = jax.vmap(jax.jacfwd(g_fn))(D, soup.B, soup.W, mu, lam)  # (T,3,3,3,3)
        if spd:
            H9 = Hd.reshape(-1, 9, 9)
            H9 = project_psd_method(H9, spd_method)
            Hd = H9.reshape(-1, 3, 3, 3, 3)
        H = _tet_H(Hd)
        out["H"] = H
    return jnp.sum(E), out


def neo_eval(spec, params, pos, with_hess, spd):
    return _tet_eval(
        en.neo_energy, spec.neo, params.neo_mu, params.neo_lam, pos, with_hess,
        spd, spec.spd_method,
    )


def tact_eval(spec, params, pos, with_hess, spd):
    return _tet_eval(
        en.tactile_energy, spec.tact, params.tact_mu, params.tact_lam, pos,
        with_hess, spd, spec.spd_method,
    )


def barrier_eval(spec, contact: ContactSet, pos, with_hess: bool, spd: bool):
    idx = contact.idx
    x = pos[idx]  # (C, 4, 3)
    R = _rel_R(x)  # rows x_{r+1} - x_0 (exact, no bf16 MXU pass)

    def e_fn(Rm):
        return en.barrier_energy(Rm, spec.k_contact, spec.eps_contact)

    g_fn = jax.grad(e_fn)
    E = jax.vmap(e_fn)(R)
    G = jax.vmap(g_fn)(R)  # (C, 3, 3)
    m = contact.active.astype(pos.dtype)
    g = _rel_g(G) * m[:, None, None]
    out = {"idx": idx, "g": g}
    if with_hess:
        Hr = jax.vmap(jax.jacfwd(g_fn))(R)  # (C, 3,3,3,3): (r,i,s,k)
        if spd:
            H9 = Hr.reshape(-1, 9, 9)
            H9 = project_psd_method(H9, spec.spd_method)
            Hr = H9.reshape(-1, 3, 3, 3, 3)
        H = _rel_H(Hr)
        out["H"] = H * m[:, None, None, None, None]
    return jnp.sum(E * m), out


def friction_slip(spec, contact: ContactSet, xc):
    """Slip kinematics of the gathered contact soup xc = pos[contact.idx]:
    tangential displacement u (C, 2) and its guarded norm r. The ONE copy
    of this math -- friction_eval, the gather-free line-search energy, the
    soup force path, and the adjoint chains all consume it, so the
    bit-identity their consistency tests rely on holds by construction.

    Guarded norm: u is EXACTLY zero at the contact-build state (dx0 cancels
    by construction) and d|u|/du is NaN there; f0 is even in u so the
    epsilon is exact for the gradient (cf. energies.friction_energy).
    linalg.norm here NaN-poisoned grads of any state evaluated at build
    positions -- caught by the self-contact end-to-end test."""
    xcen = jnp.einsum("ck,cki->ci", contact.w, xc[:, :3],
                      precision=jax.lax.Precision.HIGHEST)
    dx = xc[:, 3] - xcen - contact.dx0
    u = jnp.einsum("cti,ci->ct", contact.T, dx,
                   precision=jax.lax.Precision.HIGHEST)  # (C, 2)
    r = jnp.sqrt(jnp.sum(u * u, axis=1) + jnp.finfo(u.dtype).tiny)
    return u, r


def friction_f1(spec, r):
    """f1 = f0' / r of the smoothed Coulomb magnitude (BaseScene.py:548)."""
    eh = spec.eps_v * spec.dt
    tiny = jnp.finfo(jnp.result_type(r)).tiny
    return jnp.where(r > eh, 1.0 / jnp.maximum(r, tiny), -r / eh**2 + 2.0 / eh)


def _friction_w1(w):
    return jnp.concatenate([-w, jnp.ones((w.shape[0], 1), w.dtype)], axis=1)


def _friction_force_rows(spec, contact: ContactSet, xc, u, r):
    """Masked per-element force rows (C, 4, 3) from precomputed slip."""
    f1 = friction_f1(spec, r)
    g_u = u * (contact.k * f1)[:, None]          # (C, 2)
    g1 = jnp.einsum("ct,cti->ci", g_u, contact.T)  # (C, 3)
    w1 = _friction_w1(contact.w)
    m = contact.active.astype(xc.dtype)
    return w1[:, :, None] * g1[:, None, :] * m[:, None, None]


def friction_eval(spec, contact: ContactSet, pos, with_hess: bool, spd: bool):
    """Smoothed Coulomb friction (reference BaseScene.py:548-595). The force
    and Hessian have the closed form
        g = k f1(r) T^T u,  H = w1 w1^T (x) k T^T h T,
        h = f1(r) I + (f1'(r)/r) u u^T
    with w1 = [-w0, -w1, -w2, 1]; the reference SPD-projects only h (2x2)."""
    idx = contact.idx
    x = pos[idx]
    w = contact.w
    T = contact.T
    k = contact.k
    eh = spec.eps_v * spec.dt

    u, r = friction_slip(spec, contact, x)
    f1 = friction_f1(spec, r)
    E = k * en.f0_smooth(r, spec.eps_v, spec.dt)

    m = contact.active.astype(pos.dtype)
    g = _friction_force_rows(spec, contact, x, u, r)
    out = {"idx": idx, "g": g}
    if with_hess:
        tiny = jnp.finfo(jnp.result_type(r)).tiny
        w1 = _friction_w1(w)
        f1p = jnp.where(r > eh, -1.0 / jnp.maximum(r, tiny) ** 2, -1.0 / eh**2)
        uu = jnp.einsum("ct,cs->cts", u, u)
        # reference drops the outer-product term for r <= 1e-9 (BaseScene:659)
        coef = jnp.where(r > 1e-9, f1p / jnp.maximum(r, 1e-9), 0.0)
        h = f1[:, None, None] * jnp.eye(2, dtype=pos.dtype) + coef[:, None, None] * uu
        if spd:
            h = project_psd_2x2(h)
        h1 = k[:, None, None] * jnp.einsum("cti,cts,csj->cij", T, h, T)
        H = jnp.einsum("ca,cb,cij->cabij", w1, w1, h1)
        out["H"] = H * m[:, None, None, None, None]
    return jnp.sum(E * m), out


# --------------------------------------------------------------------------
# Totals
# --------------------------------------------------------------------------


def total_energy(spec, params, pos, prev_pos, vel, ref_angle, contact):
    e = en.inertia_external_energy(
        pos, prev_pos, vel, spec.mass, spec.gravity, spec.ext_force, spec.dt
    )
    e_m, _ = membrane_eval(spec, params, pos, False, False)
    e_b, _ = bending_eval(spec, params, pos, ref_angle, False, False)
    e_n, _ = neo_eval(spec, params, pos, False, False)
    e_t, _ = tact_eval(spec, params, pos, False, False)
    e_c, _ = barrier_eval(spec, contact, pos, False, False)
    e_f, _ = friction_eval(spec, contact, pos, False, False)
    return e + e_m + e_b + e_n + e_t + e_c + e_f


def _bend_use_batch(spec):
    """spec.bend_batch opts into the leading-axis-split batched hinge
    evaluation (en.bending_energy_batch). Default OFF: the on-chip A/B at
    full bench size (round 4) measured the batch form 12% SLOWER end-to-end
    (4.54 vs 5.11 steps/s) -- XLA fuses the vmapped per-hinge form better
    on TPU (same lesson as the round-2 closed-form-Hessian negative
    result). Both forms agree to ULP level (tests/test_energies.py). A
    static spec field (not an env read at trace time) so the choice is part
    of the spec hash and constant across every jitted function of one
    scene; the TSL_BEND_BATCH env override is applied once at scene build
    (core/builder.py)."""
    return spec.bend_batch


def bending_soup_eg(spec, params, xb, ref_angle, want_grad=True):
    """Bending energy sum + masked force group from the gathered hinge soup
    (NH,4,3). The gradient comes from jax.vjp with the 0/1 hinge mask as
    the cotangent (batch form) or vmap(grad) * mask (default form). Within
    either form the masking styles are exact (scaling a backward seed by
    exactly 0.0/1.0 is exact); ACROSS the two forms agreement is ULP-level
    only (tests/test_energies.py, rtol 5e-15) -- every engine path uses one
    form per spec (spec.bend_batch), never a mix."""
    c = spec.cloth
    kb = params.kb[c.hinge_cloth]
    sel = jnp.asarray(c.hinge_sel, xb.dtype)
    m = c.hinge_mask.astype(xb.dtype)

    if not _bend_use_batch(spec):
        eb = jax.vmap(en.bending_energy)(xb, sel, ref_angle, c.hinge_coef,
                                         kb)
        if not want_grad:
            return jnp.sum(eb * m), None
        gb = jax.vmap(jax.grad(en.bending_energy))(xb, sel, ref_angle,
                                                   c.hinge_coef, kb)
        return jnp.sum(eb * m), gb * m[:, None, None]

    def f(xx):
        return en.bending_energy_batch(xx, sel, ref_angle, c.hinge_coef, kb)

    if not want_grad:
        return jnp.sum(f(xb) * m), None
    eb, vjp = jax.vjp(f, xb)
    (gb,) = vjp(m)
    return jnp.sum(eb * m), gb


def linesearch_energy_fn(spec, params, pos, p, prev_pos, vel, ref_angle,
                         contact, soups=None, dsoups=None):
    """Energy along the search line, E(alpha) = total_energy(pos - alpha p),
    with every soup gather hoisted out of the alpha loop.

    Gathering commutes with the affine step ((pos - a p)[idx] =
    pos[idx] - a p[idx]), so each backtracking trial is pure elementwise
    work on pre-gathered stencils. Besides skipping the per-trial gathers,
    this removes the row-major ((NV,3) {1,0}) layout requirement inside the
    line-search while_loop: with gathers present XLA carried pos in {1,0}
    there while the Newton/CG loops carry {0,1}, inserting boundary
    layout-conversion copies measured at ~64 ms/step (x16) at bench size.

    soups/dsoups: optional pre-gathered stencils (gather_soups of pos and
    of p with direction=True) -- the Newton micro loop passes them so this
    function gathers nothing at all.

    Matches total_energy term by term (same masks, same canon-stencil
    substitution on inactive hinges, same friction sqrt guard)."""
    c = spec.cloth
    kl, ka = _face_params(spec, params)
    if soups is None:
        soups = gather_soups(spec, contact, pos)
    if dsoups is None:
        dsoups = gather_soups(spec, contact, p, direction=True)
    xm, dm = soups["xm"], dsoups["xm"]
    xb, db = soups["xb"], dsoups["xb"]
    kb = params.kb[c.hinge_cloth]
    sel = jnp.asarray(c.hinge_sel, pos.dtype)
    mb = c.hinge_mask.astype(pos.dtype)

    tet_parts = []
    for key, soup, mu_arr, lam_arr, efn in (
        ("xn", spec.neo, params.neo_mu, params.neo_lam, en.neo_energy),
        ("xt", spec.tact, params.tact_mu, params.tact_lam,
         en.tactile_energy),
    ):
        if soup.tets.shape[0]:
            tet_parts.append(
                (soup, mu_arr[soup.group], lam_arr[soup.group], efn,
                 soups[key], dsoups[key])
            )

    xc, dc = soups["xc"], dsoups["xc"]
    mC = contact.active.astype(pos.dtype)

    def E_of(alpha):
        e = en.inertia_external_energy(
            pos - alpha * p, prev_pos, vel, spec.mass, spec.gravity,
            spec.ext_force, spec.dt,
        )
        e = e + jnp.sum(
            jax.vmap(en.membrane_energy)(xm - alpha * dm, c.l0, c.rest_area,
                                         kl, ka)
        )
        if _bend_use_batch(spec):
            eb = en.bending_energy_batch(xb - alpha * db, sel, ref_angle,
                                         c.hinge_coef, kb)
        else:
            eb = jax.vmap(en.bending_energy)(xb - alpha * db, sel,
                                             ref_angle, c.hinge_coef, kb)
        e = e + jnp.sum(eb * mb)
        for soup, mu, lam, efn, xt, dt_ in tet_parts:
            D = _tet_D(xt - alpha * dt_)
            e = e + jnp.sum(jax.vmap(efn)(D, soup.B, soup.W, mu, lam))
        xc_ = xc - alpha * dc
        R = _rel_R(xc_)
        eC = jax.vmap(
            lambda Rm: en.barrier_energy(Rm, spec.k_contact, spec.eps_contact)
        )(R)
        e = e + jnp.sum(eC * mC)
        # friction: friction_eval's energy term via the shared slip helper
        _u, r = friction_slip(spec, contact, xc_)
        eF = contact.k * en.f0_smooth(r, spec.eps_v, spec.dt)
        e = e + jnp.sum(eF * mC)
        return e

    return E_of


def linesearch_ef_fn(spec, params, pos, p, prev_pos, vel, ref_angle,
                     contact, soups, dsoups):
    """Fused line-search evaluation: EF_of(alpha) -> (E, g_fused) with E the
    line-search energy and g_fused the (E4, 4, 3) fused force-group gradient
    at pos - alpha p, both from the pre-gathered soups.

    Measured on-chip (scripts/probe_phase_costs.py): value_and_grad of the
    per-element energies costs the same as the gradient alone (XLA shares
    the primal), so the accepted trial's force group is FREE -- the micro
    Newton loop then skips its separate residual force pass entirely (the
    next iteration's residual is assemble_residual of the accepted g_fused).

    Bit-exactness contract (tests/test_assembly.py):
      * E equals linesearch_energy_fn's E_of(alpha) term by term (same
        element functions, same masks, same reduction order);
      * g_fused equals force_groups_from_soups(soups - alpha*dsoups)["g"]
        (same vmapped jax.grad computations, fused in the same family
        order as fuse_groups).
    """
    c = spec.cloth
    kl, ka = _face_params(spec, params)
    xm, dm = soups["xm"], dsoups["xm"]
    xb, db = soups["xb"], dsoups["xb"]

    tet_parts = []
    for key, soup, mu_arr, lam_arr, efn in (
        ("xn", spec.neo, params.neo_mu, params.neo_lam, en.neo_energy),
        ("xt", spec.tact, params.tact_mu, params.tact_lam,
         en.tactile_energy),
    ):
        if soup.tets.shape[0]:
            tet_parts.append(
                (soup, mu_arr[soup.group], lam_arr[soup.group], efn,
                 soups[key], dsoups[key])
            )

    xc, dc = soups["xc"], dsoups["xc"]
    mC = contact.active.astype(pos.dtype)

    def EF_of(alpha):
        gs = []
        e = en.inertia_external_energy(
            pos - alpha * p, prev_pos, vel, spec.mass, spec.gravity,
            spec.ext_force, spec.dt,
        )
        em, gm = jax.vmap(jax.value_and_grad(en.membrane_energy))(
            xm - alpha * dm, c.l0, c.rest_area, kl, ka)
        e = e + jnp.sum(em)
        gs.append(gm)
        e_b, gb = bending_soup_eg(spec, params, xb - alpha * db, ref_angle)
        e = e + e_b
        gs.append(gb)
        for soup, mu, lam, efn, xt, dt_ in tet_parts:
            D = _tet_D(xt - alpha * dt_)
            et, G = jax.vmap(jax.value_and_grad(efn))(D, soup.B, soup.W,
                                                      mu, lam)
            e = e + jnp.sum(et)
            gs.append(_tet_g(G))
        xc_ = xc - alpha * dc
        R = _rel_R(xc_)
        eC, Gb = jax.vmap(jax.value_and_grad(
            lambda Rm: en.barrier_energy(Rm, spec.k_contact,
                                         spec.eps_contact)))(R)
        e = e + jnp.sum(eC * mC)
        g_bar = _rel_g(Gb) * mC[:, None, None]
        # friction: shared slip helper feeds both the energy term and the
        # force rows (identical to linesearch_energy_fn / friction_eval)
        u, r = friction_slip(spec, contact, xc_)
        eF = contact.k * en.f0_smooth(r, spec.eps_v, spec.dt)
        e = e + jnp.sum(eF * mC)
        g_fr = _friction_force_rows(spec, contact, xc_, u, r)
        gs.append(g_bar + g_fr)
        # fuse in the same family order/padding as fuse_groups
        fused = []
        for g in gs:
            if g.shape[1] < 4:
                g = jnp.concatenate(
                    [g, jnp.zeros((g.shape[0], 4 - g.shape[1], 3),
                                  g.dtype)], axis=1)
            fused.append(g)
        return e, jnp.concatenate(fused)

    return EF_of


def gather_soups(spec, contact, v, direction=False):
    """Gather every element family's stencil values from a global (NV, 3)
    vector, ONCE. Soups are affine in v -- gathering commutes with the
    line-search step, so
        gather_soups(pos - a p) == tree_map(lambda x, d: x - a d,
                                            gather_soups(pos),
                                            gather_soups(p, direction=True))
    bit-exactly (same scalar subtractions on the same values). This is what
    lets one gather pass per Newton iteration (the direction p) serve the
    residual, the line search, AND the next iteration's position soups.

    direction=False substitutes _CANON_STENCIL on masked-out hinges (the
    NaN-safety rule); direction=True zeroes them so the affine identity
    above preserves the canon rows."""
    c = spec.cloth
    out = {"xm": v[c.f2v]}
    if direction:
        xb = jnp.where(c.hinge_mask[:, None, None], v[c.hinge_verts], 0.0)
    else:
        xb = jnp.where(
            c.hinge_mask[:, None, None], v[c.hinge_verts],
            _CANON_STENCIL.astype(v.dtype)[None],
        )
    out["xb"] = xb
    if spec.neo.tets.shape[0]:
        out["xn"] = v[spec.neo.tets]
    if spec.tact.tets.shape[0]:
        out["xt"] = v[spec.tact.tets]
    out["xc"] = v[contact.idx]
    return out


def _friction_force_from_soup(spec, contact, xc):
    """Per-element friction force from the gathered contact soup (the
    force-only half of friction_eval, same guards)."""
    u, r = friction_slip(spec, contact, xc)
    return _friction_force_rows(spec, contact, xc, u, r)


def force_groups_from_soups(spec, params, soups, ref_angle, contact):
    """The fused force-only group (all_groups with_hess=False) computed from
    pre-gathered soups -- no (NV, 3) gathers. Mirrors each *_eval's force
    path exactly (same masks/guards), so the result is bit-identical to
    all_groups(..., with_hess=False)."""
    c = spec.cloth
    groups = []
    kl, ka = _face_params(spec, params)
    gm = jax.vmap(jax.grad(en.membrane_energy))(
        soups["xm"], c.l0, c.rest_area, kl, ka)
    groups.append({"idx": c.f2v, "g": gm})

    _, gb = bending_soup_eg(spec, params, soups["xb"], ref_angle)
    groups.append({"idx": c.hinge_verts, "g": gb})

    for key, soup, mu_arr, lam_arr, efn in (
        ("xn", spec.neo, params.neo_mu, params.neo_lam, en.neo_energy),
        ("xt", spec.tact, params.tact_mu, params.tact_lam,
         en.tactile_energy),
    ):
        if key not in soups:
            continue
        D = _tet_D(soups[key])
        mu = mu_arr[soup.group]
        lam = lam_arr[soup.group]
        G = jax.vmap(jax.grad(efn))(D, soup.B, soup.W, mu, lam)
        groups.append({"idx": soup.tets, "g": _tet_g(G)})

    R = _rel_R(soups["xc"])
    Gb = jax.vmap(jax.grad(
        lambda Rm: en.barrier_energy(Rm, spec.k_contact, spec.eps_contact)
    ))(R)
    mC = contact.active.astype(soups["xc"].dtype)
    g_bar = _rel_g(Gb) * mC[:, None, None]
    g_fr = _friction_force_from_soup(spec, contact, soups["xc"])
    groups.append({"idx": contact.idx, "g": g_bar + g_fr})
    return fuse_groups(spec, groups, with_hess=False)


def all_groups(spec, params, pos, ref_angle, contact, with_hess=True, spd=True):
    """Evaluate every element soup and fuse into ONE padded block group:
        idx: (E, 4) int32 (3-vertex elements padded with a ghost vertex NV)
        g:   (E, 4, 3)
        H:   (E, 4, 4, 3, 3) when with_hess
    A single fused group means one gather/scatter per assembly operation --
    the TPU-friendly layout (scatter-adds dominate the runtime otherwise)."""
    if not with_hess:
        soups = gather_soups(spec, contact, pos)
        return force_groups_from_soups(spec, params, soups, ref_angle,
                                       contact)
    groups = []
    _, gm = membrane_eval(spec, params, pos, with_hess, spd)
    groups.append(gm)
    _, gb = bending_eval(spec, params, pos, ref_angle, with_hess, spd)
    groups.append(gb)
    if spec.neo.tets.shape[0]:
        _, gn = neo_eval(spec, params, pos, with_hess, spd)
        groups.append(gn)
    if spec.tact.tets.shape[0]:
        _, gt = tact_eval(spec, params, pos, with_hess, spd)
        groups.append(gt)
    # barrier + friction share the same 4-vertex stencil (triangle + query
    # vertex): summing their blocks halves the dynamic-contact gather and
    # scatter traffic in every CG matvec (SPD projection stays per-part,
    # matching the reference which projects the 9x9 barrier and the 2x2
    # friction core separately)
    _, gc = barrier_eval(spec, contact, pos, with_hess, spd)
    _, gf = friction_eval(spec, contact, pos, with_hess, spd)
    merged = {"idx": gc["idx"], "g": gc["g"] + gf["g"]}
    if with_hess:
        merged["H"] = gc["H"] + gf["H"]
    groups.append(merged)
    return fuse_groups(spec, groups, with_hess)


def fuse_groups(spec, groups, with_hess=True):
    ghost = spec.NV
    idxs, gs, Hs = [], [], []
    for g in groups:
        idx = jnp.asarray(g["idx"])
        E, k = idx.shape
        grad = g["g"]
        if k < 4:
            pad = 4 - k
            idx = jnp.concatenate(
                [idx, jnp.full((E, pad), ghost, idx.dtype)], axis=1
            )
            grad = jnp.concatenate(
                [grad, jnp.zeros((E, pad, 3), grad.dtype)], axis=1
            )
            if with_hess:
                Hb = g["H"]
                Hb = jnp.pad(Hb, ((0, 0), (0, pad), (0, pad), (0, 0), (0, 0)))
                Hs.append(Hb)
        elif with_hess:
            Hs.append(g["H"])
        idxs.append(idx)
        gs.append(grad)
    fused = {"idx": jnp.concatenate(idxs), "g": jnp.concatenate(gs)}
    if with_hess:
        fused["H"] = jnp.concatenate(Hs)
    return fused


# --------------------------------------------------------------------------
# Assembly (operates on the fused group)
# --------------------------------------------------------------------------


def assemble_residual(spec, fused, pos, prev_pos, vel):
    """Global gradient of the incremental potential, with frozen DOFs zeroed
    (reference compute_residual_and_Hessian:976-989 + apply_frozen).

    With a DiaPlan, the static part uses the scatter-free row gather
    (plan.row_tab); only the dynamic contact part scatters."""
    X = pos - prev_pos - vel * spec.dt
    F = jnp.asarray(spec.mass)[:, None] * X / spec.dt**2
    F = F - jnp.asarray(spec.mass)[:, None] * jnp.asarray(spec.gravity)
    F = F - jnp.asarray(spec.ext_force)
    if spec.dia is not None:
        plan = spec.dia
        ns = static_block_count(spec)
        g = fused["g"]
        Fp = jnp.zeros((spec.NV + 1, 3), F.dtype)
        import numpy as _np

        for (N, M, v_off, fb, hb, fams, res_fams) in plan.cloths:
            # transpose once so family slices are contiguous (see
            # assemble_dia)
            gf = jnp.transpose(
                g[fb : fb + 2 * N * M].reshape(N, M, 2, 4, 3),
                (2, 3, 4, 0, 1),
            )  # (2, 4, 3, N, M)
            gh = jnp.transpose(
                g[hb : hb + 6 * N * M].reshape(N, M, 6, 4, 3),
                (2, 3, 4, 0, 1),
            )
            ii, jj = _np.meshgrid(_np.arange(N), _np.arange(M),
                                  indexing="ij")
            par_np = ((ii + jj) % 2).astype(bool)
            acc = jnp.zeros((3, N + 1, M + 1), F.dtype)
            # same destination-grouping as assemble_dia: one DUS per
            # distinct destination region, sources summed first
            dests = {}
            for (kind, cc, a, i0, i1, j0, j1, di, dj, par) in res_fams:
                key = (i0 + di, i1 + di, j0 + dj, j1 + dj)
                dests.setdefault(key, []).append(
                    (kind, cc, a, i0, i1, j0, j1, par))
            for (I0, I1, J0, J1), srcs in dests.items():
                tot = None
                for (kind, cc, a, i0, i1, j0, j1, par) in srcs:
                    gg = gf if kind == 0 else gh
                    pm = jnp.asarray(
                        (par_np[i0:i1, j0:j1] == bool(par)).astype(
                            _np.float32),
                        F.dtype,
                    )
                    term = gg[cc, a, :, i0:i1, j0:j1] * pm[None]
                    tot = term if tot is None else tot + term
                acc = acc.at[:, I0:I1, J0:J1].add(tot)
            Fp = Fp.at[v_off : v_off + (N + 1) * (M + 1)].add(
                acc.reshape(3, -1).T
            )
        gflat = jnp.concatenate(
            [g[:ns].reshape(ns * 4, 3), jnp.zeros((1, 3), g.dtype)], axis=0
        )
        if plan.rows.shape[0]:
            Fp = Fp.at[jnp.asarray(plan.rows)].add(
                gflat[jnp.asarray(plan.row_tab)].sum(1)
            )
        if plan.extra_ea.shape[0]:
            Fp = Fp.at[jnp.asarray(plan.extra_rows)].add(
                gflat[jnp.asarray(plan.extra_ea)]
            )
        Fp = Fp.at[fused["idx"][ns:]].add(g[ns:])
        F = F + Fp[: spec.NV]
    else:
        Fp = jnp.concatenate([F, jnp.zeros((1, 3), F.dtype)], axis=0)
        F = Fp.at[fused["idx"]].add(fused["g"])[: spec.NV]
    return jnp.where(jnp.asarray(spec.frozen), 0.0, F)


def dense_hessian(spec, fused):
    """Assemble the full (3NV, 3NV) Hessian. Frozen rows/cols of element
    blocks are dropped; the inertia diagonal m/dt^2 is kept for all DOFs
    (matching the reference, where the mass diagonal bypasses add_H)."""
    n = (spec.NV + 1) * 3
    md = jnp.asarray(spec.mass)
    unf = jnp.concatenate(
        [jnp.asarray(~spec.frozen, md.dtype).reshape(-1), jnp.zeros(3, md.dtype)]
    )
    H = jnp.zeros((n, n), md.dtype)
    idx = fused["idx"]
    Hb = fused["H"]
    dof = idx[..., None] * 3 + jnp.arange(3)  # (E, 4, 3)
    rows = jnp.broadcast_to(dof[:, :, None, :, None], Hb.shape)
    cols = jnp.broadcast_to(dof[:, None, :, None, :], Hb.shape)
    vals = Hb * unf[rows] * unf[cols]
    H = H.at[rows.reshape(-1), cols.reshape(-1)].add(vals.reshape(-1))
    diag = jnp.repeat(md / spec.dt**2, 3)
    H = H[: spec.NV * 3, : spec.NV * 3] + jnp.diag(diag)
    return H


def hvp(spec, fused, x):
    """Matrix-free H @ x with the same frozen masking as dense_hessian.
    x: (NV, 3) -> (NV, 3)."""
    md = jnp.asarray(spec.mass)
    unf = jnp.concatenate(
        [jnp.asarray(~spec.frozen, x.dtype), jnp.zeros((1, 3), x.dtype)]
    )
    y = (md / spec.dt**2)[:, None] * x
    xp = jnp.concatenate([x, jnp.zeros((1, 3), x.dtype)], axis=0) * unf
    idx = fused["idx"]
    xg = xp[idx]  # (E, 4, 3)
    contrib = jnp.einsum("eabij,ebj->eai", fused["H"], xg)
    yp = jnp.zeros_like(xp)
    yp = yp.at[idx].add(contrib * unf[idx])
    return y + yp[: spec.NV]


def diag_blocks(spec, fused):
    """(NV, 3, 3) block diagonal of the assembled Hessian (block-Jacobi)."""
    # follow the element-block dtype (the spec's mass array may be stored at
    # a different precision, e.g. an f64-promoted adjoint solve on f32 specs)
    md = jnp.asarray(spec.mass, fused["H"].dtype)
    unf = jnp.concatenate(
        [jnp.asarray(~spec.frozen, md.dtype), jnp.zeros((1, 3), md.dtype)]
    )
    eye = jnp.eye(3, dtype=md.dtype)
    D = jnp.zeros((spec.NV + 1, 3, 3), md.dtype)
    idx = fused["idx"]
    for a in range(4):
        blk = fused["H"][:, a, a]
        mask = unf[idx[:, a]]
        blk = blk * mask[:, :, None] * mask[:, None, :]
        D = D.at[idx[:, a]].add(blk)
    D = D[: spec.NV] + (md / spec.dt**2)[:, None, None] * eye
    return D


def frozen_column_product(spec, fused, z):
    """tmp_z_frozen[j] = - sum_{i unfrozen} H_ij z_i for frozen DOFs j
    (reference add_H counting path, BaseScene.py:403-405). z: (NV, 3)."""
    unf = jnp.concatenate(
        [jnp.asarray(~spec.frozen, z.dtype), jnp.zeros((1, 3), z.dtype)]
    )
    fro = jnp.concatenate(
        [jnp.asarray(spec.frozen, z.dtype), jnp.zeros((1, 3), z.dtype)]
    )
    zp = jnp.concatenate([z, jnp.zeros((1, 3), z.dtype)], axis=0)
    idx = fused["idx"]
    zg = zp[idx] * unf[idx]
    contrib = jnp.einsum("eabij,eai->ebj", fused["H"], zg)
    tp = jnp.zeros_like(zp)
    tp = tp.at[idx].add(-contrib * fro[idx])
    return tp[: spec.NV]


# --------------------------------------------------------------------------
# Pull-based Hvp (static sparsity)
# --------------------------------------------------------------------------


def static_block_count(spec) -> int:
    """Number of leading STATIC elements in the fused block array (membrane,
    bending, neo, tact -- in fuse_groups order); barrier+friction follow."""
    n = spec.cloth.f2v.shape[0] + spec.cloth.hinge_verts.shape[0]
    n += spec.neo.tets.shape[0] + spec.tact.tets.shape[0]
    return n


def _enumerate_static_slots(spec):
    """All static block slots as flat arrays (rows, e, ab, cols)."""
    import numpy as _np

    NV = spec.NV
    groups = []  # (idx (E,k), base, k)
    base = 0
    f2v = _np.asarray(spec.cloth.f2v)
    groups.append((f2v, base, 3))
    base += f2v.shape[0]
    hv = _np.asarray(spec.cloth.hinge_verts)
    hm = _np.asarray(spec.cloth.hinge_mask)
    groups.append((hv, base, 4, hm))
    base += hv.shape[0]
    for soup in (spec.neo, spec.tact):
        t = _np.asarray(soup.tets)
        if t.shape[0]:
            groups.append((t, base, 4))
        base += t.shape[0]

    rows_all, e_all, ab_all, col_all = [], [], [], []
    for g in groups:
        idx, gbase, k = g[0], g[1], g[2]
        gmask = g[3] if len(g) > 3 else None
        E = idx.shape[0]
        if E == 0:
            continue
        e_ids = gbase + _np.arange(E, dtype=_np.int64)
        for a in range(k):
            for b in range(k):
                rows = idx[:, a].astype(_np.int64)
                if gmask is not None:
                    sel = gmask
                    rows_all.append(rows[sel])
                    e_all.append(e_ids[sel])
                    ab_all.append(_np.full(sel.sum(), a * 4 + b, _np.int64))
                    col_all.append(idx[sel, b].astype(_np.int64))
                else:
                    rows_all.append(rows)
                    e_all.append(e_ids)
                    ab_all.append(_np.full(E, a * 4 + b, _np.int64))
                    col_all.append(idx[:, b].astype(_np.int64))
    rows = _np.concatenate(rows_all)
    e_arr = _np.concatenate(e_all)
    ab_arr = _np.concatenate(ab_all)
    col_arr = _np.concatenate(col_all)
    return rows, e_arr, ab_arr, col_arr


def build_hvp_slots(spec, keep_mask=None):
    """Host-side (numpy) construction of HvpSlots for the static soups.
    Padding slots point at a membrane element's always-zero (3,3) pad block
    and column NV (the zero row of the padded x). keep_mask optionally
    restricts to a subset of slots (the hybrid DIA leftover)."""
    import numpy as _np

    from ..core.spec import HvpSlots

    NV = spec.NV
    rows, e_arr, ab_arr, col_arr = _enumerate_static_slots(spec)
    if keep_mask is not None:
        rows, e_arr, ab_arr, col_arr = (
            rows[keep_mask], e_arr[keep_mask], ab_arr[keep_mask],
            col_arr[keep_mask],
        )
    if len(rows) == 0:
        return HvpSlots(
            slot_e=_np.zeros((0, 0), _np.int32),
            slot_ab=_np.zeros((0, 0), _np.int32),
            slot_col=_np.zeros((0, 0), _np.int32),
            row_ids=_np.zeros((0,), _np.int32),
            D=0,
        )

    order = _np.argsort(rows, kind="stable")
    rows, e_arr, ab_arr, col_arr = (
        rows[order], e_arr[order], ab_arr[order], col_arr[order]
    )
    counts = _np.bincount(rows, minlength=NV)
    row_ids = _np.nonzero(counts)[0].astype(_np.int32)
    R = len(row_ids)
    D = int(counts.max()) if len(counts) else 1
    # pad block: membrane element 0 has zero blocks at (a=3, b=3)
    assert spec.cloth.f2v.shape[0] > 0, "hvp slots need at least one cloth"
    slot_e = _np.zeros((R, D), _np.int32)
    slot_ab = _np.full((R, D), 15, _np.int32)  # (3,3) pad block
    slot_col = _np.full((R, D), NV, _np.int32)
    start = _np.zeros(NV + 1, _np.int64)
    _np.cumsum(counts, out=start[1:NV + 1])
    for ri, v in enumerate(row_ids):
        c = counts[v]
        s0 = start[v]
        slot_e[ri, :c] = e_arr[s0 : s0 + c]
        slot_ab[ri, :c] = ab_arr[s0 : s0 + c]
        slot_col[ri, :c] = col_arr[s0 : s0 + c]
    return HvpSlots(slot_e=slot_e, slot_ab=slot_ab, slot_col=slot_col,
                    row_ids=row_ids, D=D)


def gather_neighbor_blocks(spec, fused, x_dtype):
    """(R, D, 3, 3) static-part blocks in pull layout, frozen-masked.
    Done ONCE per Newton iteration."""
    sl = spec.hvp_slots
    Hs = fused["H"]
    e = jnp.asarray(sl.slot_e)
    ab = jnp.asarray(sl.slot_ab)
    nbr = Hs[e, ab // 4, ab % 4]  # (R, D, 3, 3)
    unf = jnp.concatenate(
        [jnp.asarray(~spec.frozen, x_dtype), jnp.zeros((1, 3), x_dtype)]
    )
    colm = unf[jnp.asarray(sl.slot_col)]  # (R, D, 3)
    rowm = unf[jnp.asarray(sl.row_ids)][:, None, :]  # (R, 1, 3)
    return nbr * rowm[..., None] * colm[:, :, None, :]


def _pull_apply(spec, nbr, xm):
    """Leftover pull product: per-row (R, D) slot contraction."""
    sl = spec.hvp_slots
    xg = xm[jnp.asarray(sl.slot_col)]  # (R, D, 3)
    return jnp.einsum("rdij,rdj->ri", nbr, xg)


def hvp_pull(spec, nbr, fused, x):
    """H @ x with the static part as gather+einsum over the precomputed
    neighbor blocks and only the (small, dynamic) contact part as a
    scatter."""
    sl = spec.hvp_slots
    md = jnp.asarray(spec.mass)
    unf = jnp.concatenate(
        [jnp.asarray(~spec.frozen, x.dtype), jnp.zeros((1, 3), x.dtype)]
    )
    xp = jnp.concatenate([x, jnp.zeros((1, 3), x.dtype)], axis=0)
    yr = _pull_apply(spec, nbr, xp)
    y = jnp.zeros_like(x).at[jnp.asarray(sl.row_ids)].add(yr)
    y = y + (md / spec.dt**2)[:, None] * x

    ns = static_block_count(spec)
    idx = fused["idx"][ns:]
    Hd = fused["H"][ns:]
    xpm = xp * unf
    contrib = jnp.einsum("eabij,ebj->eai", Hd, xpm[idx])
    yp = jnp.zeros_like(xp)
    yp = yp.at[idx].add(contrib * unf[idx])
    return y + yp[: spec.NV]


def _padded_static_idx(spec):
    """(ns, 4) numpy: fused-order element vertex ids, 3-vertex elements
    padded with the ghost vertex NV (matching fuse_groups)."""
    import numpy as _np

    NV = spec.NV
    f2v = _np.asarray(spec.cloth.f2v)
    parts = [
        _np.concatenate(
            [f2v, _np.full((f2v.shape[0], 1), NV, f2v.dtype)], axis=1
        ),
        _np.asarray(spec.cloth.hinge_verts),
    ]
    for soup in (spec.neo, spec.tact):
        t = _np.asarray(soup.tets)
        if t.shape[0]:
            parts.append(t)
    return _np.concatenate(parts, axis=0)


def _decompose_shift_candidates(rel: int, M: int):
    """All (di, dj) splits of a flat vertex shift rel on the (N+1, M+1)
    grid with dj in the stencil window [-3, 3]. Narrow grids alias flat
    shifts, so the planner tries each candidate against the member set."""
    out = []
    for dj in range(-3, 4):
        if (rel - dj) % (M + 1) == 0:
            out.append(((rel - dj) // (M + 1), dj))
    return out


def _plan_cloth_stencils(spec):
    """Per-cloth stencil families: verify that every (parity, class, vertex
    slot) of the raster-ordered face/hinge soups sits at a constant shift
    from the cell origin, and emit slice-add families for assembly. Classes
    that fail verification are routed to the fallback lists."""
    import numpy as _np

    c = spec.cloth
    NF_total = c.f2v.shape[0]
    f2v = _np.asarray(c.f2v)
    hv = _np.asarray(c.hinge_verts)
    hm = _np.asarray(c.hinge_mask)

    cloths = []
    offsets = []

    def o_id(o):
        if o not in offsets:
            offsets.append(o)
        return offsets.index(o)

    mem_cov = _np.zeros(NF_total, bool)      # class-level coverage per face
    hinge_cov = _np.zeros(len(hm), bool)     # per hinge
    extra_ea, extra_rows = [], []

    for ci in range(c.n_cloths):
        N, M = c.N[ci], c.M[ci]
        v_off = c.offsets[ci]
        fb = c.face_offsets[ci]
        NFc = 2 * N * M
        f_g = f2v[fb : fb + NFc].reshape(N, M, 2, 3)
        h_g = hv[3 * fb : 3 * fb + 3 * NFc].reshape(N, M, 6, 4)
        hm_g = hm[3 * fb : 3 * fb + 3 * NFc].reshape(N, M, 6)
        ii, jj = _np.meshgrid(_np.arange(N), _np.arange(M), indexing="ij")
        origin = v_off + ii * (M + 1) + jj
        par_g = (ii + jj) % 2

        fams, res_fams = [], []
        for kind, varr, n_cls, act, kk in (
            (0, f_g, 2, None, 3),
            (1, h_g, 6, hm_g, 4),
        ):
            for par in (0, 1):
                for cc in range(n_cls):
                    members = par_g == par
                    if act is not None:
                        members = members & act[:, :, cc]
                    if not members.any():
                        continue
                    rels, ok = [], True
                    for a in range(kk):
                        vals = (varr[:, :, cc, a] - origin)[members]
                        if not (vals == vals[0]).all():
                            ok = False
                            break
                        rels.append(int(vals[0]))
                    regions = []
                    if ok:
                        mi, mj = _np.nonzero(members)
                        for a in range(kk):
                            found = None
                            for di, dj in _decompose_shift_candidates(
                                rels[a], M
                            ):
                                i0, i1 = max(0, -di), min(N, N + 1 - di)
                                j0, j1 = max(0, -dj), min(M, M + 1 - dj)
                                if (
                                    i0 < i1 and j0 < j1
                                    and not (mi < i0).any()
                                    and not (mi >= i1).any()
                                    and not (mj < j0).any()
                                    and not (mj >= j1).any()
                                ):
                                    found = (i0, i1, j0, j1, di, dj)
                                    break
                            if found is None:
                                ok = False
                                break
                            regions.append(found)
                    if not ok:
                        # fallback: residual scatter + leftover pull blocks
                        mi, mj = _np.nonzero(members)
                        if kind == 0:
                            e_gl = fb + (mi * M + mj) * 2 + cc
                            for a in range(kk):
                                extra_ea.extend((e_gl * 4 + a).tolist())
                                extra_rows.extend(
                                    f2v[e_gl, a].tolist())
                        else:
                            h_gl = 3 * fb + (mi * M + mj) * 6 + cc
                            e_gl = NF_total + h_gl
                            for a in range(kk):
                                extra_ea.extend((e_gl * 4 + a).tolist())
                                extra_rows.extend(hv[h_gl, a].tolist())
                        continue
                    # coverage bookkeeping
                    mi, mj = _np.nonzero(members)
                    if kind == 0:
                        mem_cov[fb + (mi * M + mj) * 2 + cc] = True
                    else:
                        hinge_cov[3 * fb + (mi * M + mj) * 6 + cc] = True
                    for a in range(kk):
                        i0, i1, j0, j1, di, dj = regions[a]
                        res_fams.append(
                            (kind, cc, a, i0, i1, j0, j1, di, dj, par))
                        for b in range(kk):
                            o = rels[b] - rels[a]
                            fams.append((kind, cc, a, b, o_id(o),
                                         i0, i1, j0, j1, di, dj, par))
        cloths.append((N, M, v_off, fb, NF_total + 3 * fb,
                       tuple(fams), tuple(res_fams)))
    return (tuple(cloths), offsets, mem_cov, hinge_cov,
            _np.asarray(extra_ea, _np.int64),
            _np.asarray(extra_rows, _np.int64))


def build_dia_plan(spec, min_count=64):
    """Host-side hybrid DIA plan. Returns (DiaPlan|None, leftover_mask|None).

    Three tiers (see DiaPlan docstring): cloth faces/hinges as 2D stencil
    slice-adds; lattice/tactile tet blocks on offsets carrying >= min_count
    blocks via a compact row gather + one-hot placement; everything else on
    the pull path (leftover mask over the _enumerate_static_slots order)."""
    import numpy as _np

    from ..core.spec import DiaPlan

    NV = spec.NV
    if spec.cloth.f2v.shape[0] == 0:
        return None, None
    # grids narrower than a TPU sublane (8) miscompile the stencil
    # slice-adds inside the adjoint scan (observed TPU INTERNAL fault on
    # the 16x4 folding cloth); such scenes are tiny -- use the pull path
    if min(m + 1 for m in spec.cloth.M) < 8:
        return None, None
    (cloths, offsets, mem_cov, hinge_cov, extra_ea,
     extra_rows) = _plan_cloth_stencils(spec)
    if not offsets:
        return None, None

    # ---- tet sub-assembly: all tet (e, a) incidences, dense offsets only
    ns = static_block_count(spec)
    NF_total = spec.cloth.f2v.shape[0]
    NH_total = spec.cloth.hinge_verts.shape[0]
    tet_base = NF_total + NH_total
    tets = []
    for soup in (spec.neo, spec.tact):
        t = _np.asarray(soup.tets)
        if t.shape[0]:
            tets.append(t)
    neo_in = _np.zeros((4, 4, _np.asarray(spec.neo.tets).shape[0]), bool)
    tact_in = _np.zeros((4, 4, _np.asarray(spec.tact.tets).shape[0]), bool)
    if tets:
        tet_idx = _np.concatenate(tets, axis=0)  # (T, 4) global vertex ids
        T = tet_idx.shape[0]
        off_all = (tet_idx[:, None, :] - tet_idx[:, :, None]).reshape(-1)
        uniq, counts = _np.unique(off_all, return_counts=True)
        dense_t = set(int(o) for o in uniq[counts >= min_count])
        dense_t |= set(offsets)
        for o in sorted(dense_t):
            if o not in offsets:
                offsets.append(o)
        off_sorted = _np.sort(_np.asarray(offsets))
        lane = {int(o): i for i, o in enumerate(offsets)}

        # compact rows
        rows_all = _np.unique(tet_idx.reshape(-1))
        Rn = len(rows_all)
        row_of = {int(v): i for i, v in enumerate(rows_all)}
        inc = [[] for _ in range(Rn)]
        for e_loc in range(T):
            e_gl = tet_base + e_loc
            for a in range(4):
                inc[row_of[int(tet_idx[e_loc, a])]].append(e_gl * 4 + a)
        Dr = max(len(x) for x in inc)
        sentinel = ns * 4
        row_tab = _np.full((Rn, Dr), sentinel, _np.int32)
        for r, lst in enumerate(inc):
            row_tab[r, : len(lst)] = lst
        n_off = len(offsets)
        o_idx = _np.full((Rn, Dr, 4), n_off, _np.int32)
        tet_in = _np.zeros((T, 4, 4), bool)
        for r, lst in enumerate(inc):
            rv = int(rows_all[r])
            for d, ea in enumerate(lst):
                e_loc = ea // 4 - tet_base
                a = ea % 4
                for b in range(4):
                    o = int(tet_idx[e_loc, b]) - rv
                    if o in lane:
                        o_idx[r, d, b] = lane[o]
                        tet_in[e_loc, a, b] = True
        nT_neo = neo_in.shape[2]
        neo_in = _np.transpose(tet_in[:nT_neo], (1, 2, 0))
        tact_in = _np.transpose(tet_in[nT_neo:], (1, 2, 0))
        rows_arr = rows_all.astype(_np.int32)
        o_idx = o_idx.reshape(Rn, Dr * 4)
    else:
        row_tab = _np.zeros((0, 1), _np.int32)
        o_idx = _np.zeros((0, 4), _np.int32)
        rows_arr = _np.zeros((0,), _np.int32)
        Dr = 1

    # ---- leftover mask in _enumerate_static_slots order
    hm = _np.asarray(spec.cloth.hinge_mask)
    parts = [
        _np.concatenate(
            [mem_cov for _ in range(9)]
        ),
        _np.concatenate(
            [hinge_cov[hm] for _ in range(16)]
        ),
        neo_in.reshape(-1),
        tact_in.reshape(-1),
    ]
    in_dia = _np.concatenate([p for p in parts if p.size])
    if in_dia.size == 0:
        return None, None

    plan = DiaPlan(
        row_tab=row_tab,
        o_idx=o_idx,
        rows=rows_arr,
        extra_ea=extra_ea.astype(_np.int32),
        extra_rows=extra_rows.astype(_np.int32),
        offsets=tuple(int(o) for o in offsets),
        max_abs_off=int(max(abs(int(o)) for o in offsets)),
        Dr=Dr,
        NVp=-(-(NV + 1) // 1024) * 1024,
        cloths=cloths,
    )
    return plan, ~in_dia


def assemble_dia(spec, fused, dtype):
    """(n_off, 3, 3, NVp) diagonal store from the fused static blocks
    (once per Newton iteration): cloth families as static slice-adds, tet
    blocks as a compact row gather + one-hot MXU placement. Scatter-free
    except one tiny (Rn-row) lane write. NVp pads the DOF-row axis to a
    multiple of 1024 so the store reshapes losslessly into the Pallas
    SpMV's (Spad, 128) sublane/lane image (ops/dia_spmv.py)."""
    import numpy as _np

    plan = spec.dia
    n_off = len(plan.offsets)
    NV = spec.NV
    ns = static_block_count(spec)
    H = fused["H"]
    # accumulate directly in the matvec layout (n_off, 3, 3, NVp)
    dia = jnp.zeros((n_off, 3, 3, plan.NVp), dtype)

    for (N, M, v_off, fb, hb, fams, _res) in plan.cloths:
        # one transpose per soup so every family slice below is a
        # CONTIGUOUS (3, 3, si, sj) block (strided mid-dim slices DMA ~50x
        # slower on TPU)
        Hf = jnp.transpose(
            H[fb : fb + 2 * N * M].reshape(N, M, 2, 4, 4, 3, 3),
            (2, 3, 4, 5, 6, 0, 1),
        )  # (2, 4, 4, 3, 3, N, M)
        Hh = jnp.transpose(
            H[hb : hb + 6 * N * M].reshape(N, M, 6, 4, 4, 3, 3),
            (2, 3, 4, 5, 6, 0, 1),
        )
        ii, jj = _np.meshgrid(_np.arange(N), _np.arange(M), indexing="ij")
        par_np = ((ii + jj) % 2).astype(bool)
        acc = jnp.zeros((n_off, 3, 3, N + 1, M + 1), dtype)
        # group families by DESTINATION slice (o-lane + region): sources
        # sharing a destination are summed first, so the accumulator sees
        # ONE dynamic-update-slice per distinct destination (~4x fewer
        # multi-MB DUS ops in the HLO; the adds fuse elementwise)
        dests = {}
        for (kind, cc, a, b, o, i0, i1, j0, j1, di, dj, par) in fams:
            key = (o, i0 + di, i1 + di, j0 + dj, j1 + dj)
            dests.setdefault(key, []).append(
                (kind, cc, a, b, i0, i1, j0, j1, par))
        for (o, I0, I1, J0, J1), srcs in dests.items():
            tot = None
            for (kind, cc, a, b, i0, i1, j0, j1, par) in srcs:
                Hg = Hf if kind == 0 else Hh
                src = Hg[cc, a, b, :, :, i0:i1, j0:j1]
                pm = jnp.asarray(
                    (par_np[i0:i1, j0:j1] == bool(par)).astype(_np.float32),
                    dtype,
                )
                term = src * pm[None, None]
                tot = term if tot is None else tot + term
            acc = acc.at[o, :, :, I0:I1, J0:J1].add(tot)
        dia = dia.at[:, :, :, v_off : v_off + (N + 1) * (M + 1)].add(
            acc.reshape(n_off, 3, 3, -1)
        )

    if plan.rows.shape[0]:
        Hea = H[:ns].reshape(ns * 4, 4, 3, 3)
        Hea = jnp.concatenate(
            [Hea, jnp.zeros((1, 4, 3, 3), Hea.dtype)], axis=0
        )
        vals = Hea[jnp.asarray(plan.row_tab)]  # (Rn, Dr, 4, 3, 3)
        vals = vals.reshape(-1, plan.Dr * 4, 9).astype(dtype)
        onehot = jax.nn.one_hot(
            jnp.asarray(plan.o_idx), n_off + 1, dtype=dtype
        )
        # one-hot placement MUST be true-f32: a bf16 MXU pass would round
        # the tet Hessian blocks themselves (operator accuracy, fwd + adjoint)
        part = jnp.einsum("rkc,rko->ocr", vals, onehot,
                          precision=jax.lax.Precision.HIGHEST)[:n_off]
        dia = dia.at[:, :, :, jnp.asarray(plan.rows)].add(
            part.reshape(n_off, 3, 3, -1)
        )
    return dia


def diag_blocks_dia(spec, fused, dia, nbr_left, return_contact=False):
    """(NV, 3, 3) block diagonal extracted from the DIA store (offset-0
    lane) + leftover pull diag + dynamic contact diag + inertia, with the
    same frozen masking as diag_blocks. With return_contact, also returns
    the contact-only diagonal (the smoothed preconditioner approximates the
    contact term by its block diagonal)."""
    NV = spec.NV
    md = jnp.asarray(spec.mass)
    unf = jnp.asarray(~spec.frozen, md.dtype)  # (NV, 3)
    off0 = spec.dia.offsets.index(0)
    D = jnp.transpose(dia[off0, :, :, :NV], (2, 0, 1))  # (NV, 3, 3)
    D = D * unf[:, :, None] * unf[:, None, :]
    sl = spec.hvp_slots
    if sl is not None and sl.D > 0 and nbr_left is not None:
        diag_m = (
            jnp.asarray(sl.slot_col) == jnp.asarray(sl.row_ids)[:, None]
        ).astype(md.dtype)
        D = D.at[jnp.asarray(sl.row_ids)].add(
            jnp.einsum("rd,rdij->rij", diag_m, nbr_left)
        )
    ns = static_block_count(spec)
    idx = fused["idx"][ns:]
    unf_p = jnp.concatenate([unf, jnp.zeros((1, 3), md.dtype)], axis=0)
    Dp = jnp.zeros((NV + 1, 3, 3), md.dtype)
    for a in range(4):
        blk = fused["H"][ns:, a, a]
        m = unf_p[idx[:, a]]
        Dp = Dp.at[idx[:, a]].add(blk * m[:, :, None] * m[:, None, :])
    D = D + Dp[:NV] + (md / spec.dt**2)[:, None, None] * jnp.eye(
        3, dtype=md.dtype
    )
    if return_contact:
        return D, Dp[:NV]
    return D


def use_pallas_spmv(spec, dtype) -> bool:
    """'auto' resolves to the Pallas kernel on TPU f32, XLA elsewhere.

    The isolated microbenchmark favors XLA (15.2 vs 20.6 us/apply,
    scripts/ab_dia_spmv.py) but the FULL step favors the kernel by ~14
    ms/step (193.6 vs 207.3 ms, scripts/ab_step_spmv.py): the step is
    dispatch-latency bound (bench.py cost-model fields: hbm_util ~8%, mfu
    ~0.04%), and the XLA formulation issues ~70 dynamic-slice HLOs per
    apply (x ~4 applies per CG iteration) while the kernel is ONE op.
    Microbenchmarks hide dispatch latency behind pipelining; op count is
    the real currency here."""
    if spec.spmv == "pallas":
        return True
    if spec.spmv == "auto":
        return dtype == jnp.float32 and jax.default_backend() == "tpu"
    return False


def hvp_dia_static(spec, dia, nbr_left, x):
    """Static part of H @ x: DIA shifts for the regular offsets (Pallas
    streaming kernel on TPU, padded-slices einsum elsewhere), pull gather
    for the leftover, inertia diagonal. Frozen-masked. This is also the
    cheap operator used by the smoothed preconditioner."""
    from ..ops import dia_spmv as _spmv

    plan = spec.dia
    NV = spec.NV
    NVp = plan.NVp
    md = jnp.asarray(spec.mass)
    unf = jnp.asarray(~spec.frozen, x.dtype)  # (NV, 3)
    xm2 = jnp.zeros((3, NVp), x.dtype)
    xm2 = xm2.at[:, :NV].set((x * unf).T)  # column-masked, zero padding

    if use_pallas_spmv(spec, x.dtype):
        yT = _spmv.dia_spmv(dia, xm2, plan.offsets)  # (3, NVp)
    else:
        P = plan.max_abs_off
        xpad = jnp.concatenate(
            [jnp.zeros((3, P), x.dtype), xm2, jnp.zeros((3, P), x.dtype)],
            axis=1,
        )  # (3, NVp+2P)
        shifted = jnp.stack(
            [
                jax.lax.dynamic_slice_in_dim(xpad, P + o, NVp, axis=1)
                for o in plan.offsets
            ],
            axis=1,
        )  # (3, n_off, NVp)
        yT = jnp.einsum("oijn,jon->in", dia, shifted)  # (3, NVp)
    y = yT[:, :NV].T * unf  # row mask
    y = y + (md / spec.dt**2)[:, None] * x

    # leftover pull part (irregular static elements, compact rows)
    if spec.hvp_slots is not None and spec.hvp_slots.D > 0:
        xm = jnp.concatenate([x * unf, jnp.zeros((1, 3), x.dtype)], axis=0)
        yr = _pull_apply(spec, nbr_left, xm)
        y = y.at[jnp.asarray(spec.hvp_slots.row_ids)].add(yr)
    return y


def to_t2(spec, v):
    """(NV, 3) -> (3, NVp) transposed/padded vector (the DIA matvec's native
    layout). Padding columns are zero."""
    plan = spec.dia
    return jnp.zeros((3, plan.NVp), v.dtype).at[:, : spec.NV].set(v.T)


def from_t2(spec, v2):
    """(3, NVp) -> (NV, 3)."""
    return v2[:, : spec.NV].T


def hvp_dia_static_T(spec, dia, nbr_left, x2, unf2, m2):
    """Static part of H @ x entirely in the transposed (3, NVp) layout --
    the same math as hvp_dia_static with the (NV, 3) <-> (3, NVp) layout
    conversions REMOVED (round-2 traces measured the per-while-loop-boundary
    conversions of the (NV,3) carries at multi-ms x ~16/step; carrying the
    CG state transposed eliminates every in-loop transpose).

    x2: (3, NVp) with zero padding; unf2: (3, NVp) unfrozen mask (zero in
    padding); m2: (NVp,) mass/dt^2 (zero in padding)."""
    from ..ops import dia_spmv as _spmv

    plan = spec.dia
    xm2 = x2 * unf2  # column mask
    if use_pallas_spmv(spec, x2.dtype):
        yT = _spmv.dia_spmv(dia, xm2, plan.offsets)  # (3, NVp)
    else:
        P = plan.max_abs_off
        xpad = jnp.concatenate(
            [jnp.zeros((3, P), x2.dtype), xm2, jnp.zeros((3, P), x2.dtype)],
            axis=1,
        )
        shifted = jnp.stack(
            [
                jax.lax.dynamic_slice_in_dim(xpad, P + o, plan.NVp, axis=1)
                for o in plan.offsets
            ],
            axis=1,
        )
        yT = jnp.einsum("oijn,jon->in", dia, shifted)
    y2 = yT * unf2 + m2 * x2  # row mask + inertia (all DOFs, frozen incl.)

    if spec.hvp_slots is not None and spec.hvp_slots.D > 0:
        sl = spec.hvp_slots
        xg = xm2[:, jnp.asarray(sl.slot_col)]  # (3, R, D)
        yr = jnp.einsum("rdij,jrd->ir", nbr_left, xg)  # (3, R)
        y2 = y2.at[:, jnp.asarray(sl.row_ids)].add(yr)
    return y2


def hvp_dia_contact_T(spec, fused, x2, unf2, DconT=None):
    """Dynamic contact part of H @ x in the transposed layout (mirrors
    hvp_dia_contact, including the 'mm' selection-matmul pairs; DconT is
    the pre-transposed (3, 3, NVp) frozen-source diagonal when the split
    is present)."""
    xm2 = x2 * unf2
    yp2 = jnp.zeros_like(x2)
    y_diag2 = jnp.zeros_like(x2)
    if "idx_con" in fused:
        idx = fused["idx_con"]
        Hd = fused["H_con"]
        if DconT is not None:
            y_diag2 = jnp.einsum("ijn,jn->in", DconT, x2)
        if "mm_S" in fused:
            hp = jax.lax.Precision.HIGHEST
            _d, mm_ranges, _g = contact_static_split(spec)
            for (_cs, cnt, v_lo, f_vlo, f_vn), S, Hm in zip(
                    mm_ranges, fused["mm_S"], fused["mm_H"]):
                xf = jnp.einsum("caf,jf->caj", S,
                                xm2[:, f_vlo : f_vlo + f_vn], precision=hp)
                xq = jnp.swapaxes(xm2[:, v_lo : v_lo + cnt], 0, 1)
                xg = jnp.concatenate([xf, xq[:, None, :]], axis=1)
                contrib = jnp.einsum("eabij,ebj->eai", Hm, xg)
                yp2 = yp2.at[:, v_lo : v_lo + cnt].add(
                    jnp.swapaxes(contrib[:, 3], 0, 1)
                    * unf2[:, v_lo : v_lo + cnt])
                yf = jnp.einsum("caf,cai->if", S, contrib[:, :3],
                                precision=hp)
                yp2 = yp2.at[:, f_vlo : f_vlo + f_vn].add(
                    yf * unf2[:, f_vlo : f_vlo + f_vn])
    else:
        ns = static_block_count(spec)
        idx = fused["idx"][ns:]
        Hd = fused["H"][ns:]
    if idx.shape[0] > 0:
        xg = xm2[:, idx]  # (3, C, 4)
        contrib = jnp.einsum("eabij,jeb->iea", Hd, xg)  # (3, C, 4)
        yp2 = yp2.at[:, idx].add(contrib * unf2[:, idx])
    return yp2 + y_diag2


def t2_consts(spec, dtype):
    """Loop-invariant transposed constants for the T-layout solve: unf2
    (3, NVp) unfrozen mask and m2 (NVp,) inertia diagonal, zero in padding.
    Computed from spec constants, so XLA hoists them out of solve loops."""
    plan = spec.dia
    NV = spec.NV
    unf2 = jnp.zeros((3, plan.NVp), dtype).at[:, :NV].set(
        jnp.asarray(~spec.frozen, dtype).T)
    m2 = jnp.zeros((plan.NVp,), dtype).at[:NV].set(
        jnp.asarray(spec.mass, dtype) / spec.dt**2)
    return unf2, m2


def blocks_to_t33(spec, B, dtype):
    """(NV, 3, 3) per-vertex blocks -> (3, 3, NVp) transposed layout (zero
    padding), for 'ijn,jn->in' einsums against (3, NVp) vectors."""
    plan = spec.dia
    return jnp.zeros((3, 3, plan.NVp), dtype).at[:, :, : spec.NV].set(
        jnp.transpose(B, (1, 2, 0)))


def contact_static_split(spec):
    """Static partition of the merged contact group's slots.

    A pair whose ENTIRE source-face vertex set is frozen
    (ContactSpec.frozen_src, computed by the builder) has every face
    row/column of its (4, 4, 3, 3) contact blocks masked away: the exact
    masked contribution of each slot is just the query vertex's (3, 3)
    diagonal block Hd[slot, 3, 3] (contact idx layout [i0, i1, i2, q]).
    Those slots collapse into a per-vertex diagonal accumulated ONCE per
    operator build (static slice-adds -- builder queries are arange over the
    target body), leaving only the remaining pairs on the per-CG-iteration
    gather/scatter path. At bench size this removes ~half of the 43k dynamic
    indices the contact matvec moved per iteration (the top CG cost in the
    round-3 device trace).

    A non-frozen-source pair whose query slots are contiguous and whose
    SOURCE body vertex range is bounded (spec.contact.src_vrange /
    mm_budget) is classified 'mm': its face-side gather/scatter becomes a
    one-hot selection matmul over the source body's vertex slice and its
    query side becomes static slice reads/writes -- the per-CG-iteration
    dynamic-index traffic for such pairs drops to zero (gathers/scatters on
    TPU are index-rate limited, ~100 ns/index; the selection matmul rides
    the MXU at ~us for the same coupling). Pairs that qualify for neither
    (self-contact, oversized, non-contiguous) stay on the gather/scatter
    path.

    Returns (diag_ranges, mm_ranges, gen_ranges) with entries
    (cq_start, count, v_lo) / (cq_start, count, v_lo, f_vlo, f_vn) /
    (cq_start, count), or None when no pair qualifies for diag or mm."""
    import numpy as _np

    con = spec.contact
    if not con.pair_desc:
        return None
    diag_ranges, mm_ranges, gen_ranges = [], [], []
    for pi, (cq_start, count, _fs, _nf, is_self) in enumerate(con.pair_desc):
        frozen_q = (pi < len(con.frozen_src) and con.frozen_src[pi]
                    and not is_self)
        v_lo = int(con.cq_vert[cq_start])
        contig = bool(
            (_np.asarray(con.cq_vert[cq_start : cq_start + count])
             == _np.arange(v_lo, v_lo + count)).all()
        )
        if frozen_q and contig:
            diag_ranges.append((cq_start, count, v_lo))
            continue
        if (contig and not is_self and con.mm_budget > 0
                and pi < len(con.src_vrange)):
            f_vlo, f_vn = con.src_vrange[pi]
            if f_vn > 0 and count * 3 * f_vn <= con.mm_budget:
                mm_ranges.append((cq_start, count, v_lo, f_vlo, f_vn))
                continue
        gen_ranges.append((cq_start, count))
    if not diag_ranges and not mm_ranges:
        return None
    return tuple(diag_ranges), tuple(mm_ranges), tuple(gen_ranges)


def build_contact_split(spec, idx_c, H_c, dtype):
    """Per-operator-build arrays for the split contact matvec: the exact
    frozen-source diagonal Dcon (NV, 3, 3) via static slice-adds, the
    per-pair one-hot selection matrices + Hessian slices of the 'mm'
    (matmul) pairs, plus the compacted (idx, H) of the remaining general
    slots (static slices, no gather). idx_c/H_c are the contact rows of
    the fused group. Inactive slots carry exactly-zero H blocks (sanitized
    contact evaluation), so their selection rows contribute nothing -- the
    same invariant the scatter path relies on."""
    split = contact_static_split(spec)
    if split is None:
        return None
    diag_ranges, mm_ranges, gen_ranges = split
    NV = spec.NV
    unf = jnp.asarray(~spec.frozen, dtype)
    out = {}
    if diag_ranges:
        Dcon = jnp.zeros((NV, 3, 3), dtype)
        for (cs, cnt, v_lo) in diag_ranges:
            Dcon = Dcon.at[v_lo : v_lo + cnt].add(H_c[cs : cs + cnt, 3, 3])
        out["Dcon"] = Dcon * unf[:, :, None] * unf[:, None, :]
    if mm_ranges:
        Ss, Hs = [], []
        for (cs, cnt, _v_lo, f_vlo, f_vn) in mm_ranges:
            loc = idx_c[cs : cs + cnt, :3] - f_vlo  # (cnt, 3) local face ids
            S = (loc[..., None]
                 == jnp.arange(f_vn, dtype=loc.dtype)).astype(dtype)
            Ss.append(S)  # (cnt, 3, f_vn) one-hot
            Hs.append(H_c[cs : cs + cnt])
        out["mm_S"] = tuple(Ss)
        out["mm_H"] = tuple(Hs)
    if gen_ranges:
        idx_gen = jnp.concatenate(
            [idx_c[cs : cs + cnt] for (cs, cnt) in gen_ranges], axis=0)
        H_gen = jnp.concatenate(
            [H_c[cs : cs + cnt] for (cs, cnt) in gen_ranges], axis=0)
    else:
        idx_gen = idx_c[:0]
        H_gen = H_c[:0]
    out["idx_con"] = idx_gen
    out["H_con"] = H_gen
    return out


def hvp_dia_contact(spec, fused, x):
    """Dynamic contact part of H @ x, frozen-masked. With a split present
    in `fused` (keys idx_con/H_con + optional Dcon/mm_S/mm_H from
    build_contact_split): frozen-source slots apply as a fused diagonal
    einsum, 'mm' pairs as static slices + one-hot selection matmuls (zero
    dynamic indices), and only the leftover general slots gather/scatter;
    otherwise the whole merged contact group takes the gather/scatter
    path. Output masking commutes with the scatter (the unfrozen factor
    depends only on the target vertex), so the mm path masks its target
    slices instead of gathering unf[idx]."""
    unf = jnp.concatenate(
        [jnp.asarray(~spec.frozen, x.dtype), jnp.zeros((1, 3), x.dtype)]
    )
    xp = jnp.concatenate([x, jnp.zeros((1, 3), x.dtype)], axis=0)
    xm = xp * unf
    yp = jnp.zeros_like(xp)
    y_diag = jnp.zeros_like(x)
    if "idx_con" in fused:
        idx = fused["idx_con"]
        Hd = fused["H_con"]
        if "Dcon" in fused:
            y_diag = jnp.einsum("nij,nj->ni", fused["Dcon"], x)
        if "mm_S" in fused:
            hp = jax.lax.Precision.HIGHEST
            _d, mm_ranges, _g = contact_static_split(spec)
            for (_cs, cnt, v_lo, f_vlo, f_vn), S, Hm in zip(
                    mm_ranges, fused["mm_S"], fused["mm_H"]):
                xf = jnp.einsum("caf,fj->caj", S,
                                xm[f_vlo : f_vlo + f_vn], precision=hp)
                xq = xm[v_lo : v_lo + cnt]
                xg = jnp.concatenate([xf, xq[:, None, :]], axis=1)
                contrib = jnp.einsum("eabij,ebj->eai", Hm, xg)
                yp = yp.at[v_lo : v_lo + cnt].add(
                    contrib[:, 3] * unf[v_lo : v_lo + cnt])
                yf = jnp.einsum("caf,cai->fi", S, contrib[:, :3],
                                precision=hp)
                yp = yp.at[f_vlo : f_vlo + f_vn].add(
                    yf * unf[f_vlo : f_vlo + f_vn])
    else:
        ns = static_block_count(spec)
        idx = fused["idx"][ns:]
        Hd = fused["H"][ns:]
    if idx.shape[0] > 0:
        contrib = jnp.einsum("eabij,ebj->eai", Hd, xm[idx])
        yp = yp.at[idx].add(contrib * unf[idx])
    return yp[: spec.NV] + y_diag


def hvp_dia(spec, dia, nbr_left, fused, x):
    """H @ x with the hybrid layout: DIA shifts+einsum for the regular
    offsets, pull gather for the leftover, scatter for dynamic contact."""
    return hvp_dia_static(spec, dia, nbr_left, x) + hvp_dia_contact(
        spec, fused, x
    )
