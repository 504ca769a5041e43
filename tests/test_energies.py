"""Finite-difference checks of per-element energies, forces, and Hessians.

This is the test the reference only has in commented-out form
(BaseScene.check_differential:880-974): for each energy term, E1 - E0 must
match F . dx and H dx must match F1 - F0.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thinshelllab_tpu.ops import energies as en
from thinshelllab_tpu.ops.spd import project_psd, project_psd_2x2

RNG = np.random.default_rng(0)


def fd_check(e_fn, x0, rtol=1e-5, eps=1e-6):
    """Central-difference check of grad and Hessian of scalar e_fn(x)."""
    e_fn = jax.jit(e_fn)
    g_fn = jax.jit(jax.grad(e_fn))
    h_fn = jax.jit(jax.jacfwd(g_fn))
    x0 = jnp.asarray(x0)
    g = g_fn(x0)
    H = h_fn(x0)
    for trial in range(3):
        d = RNG.standard_normal(x0.shape)
        d /= np.linalg.norm(d)
        dE_fd = (e_fn(x0 + eps * d) - e_fn(x0 - eps * d)) / (2 * eps)
        dE_an = jnp.sum(g * d)
        assert abs(dE_fd - dE_an) <= rtol * max(1.0, abs(dE_an)), (
            trial, dE_fd, dE_an)
        dg_fd = (g_fn(x0 + eps * d) - g_fn(x0 - eps * d)) / (2 * eps)
        dg_an = jnp.tensordot(H, jnp.asarray(d), axes=x0.ndim)
        err = np.linalg.norm(dg_fd - dg_an) / max(1.0, np.linalg.norm(dg_an))
        assert err < rtol, (trial, err)


def test_membrane_fd():
    x = jnp.asarray(RNG.standard_normal((3, 3)) * 0.01)
    l0 = jnp.array([0.01, 0.01, 0.01414])
    fd_check(lambda xx: en.membrane_energy(xx, l0, 5e-5, 1000.0, 1000.0), x)


def test_bending_fd():
    # two non-flat faces, v3 across the shared edge from v0
    x = jnp.array(
        [[0.0, -1.0, 0.1], [0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.1, 1.2, 0.4]]
    ) * 0.01
    stencil = jnp.asarray(en.stencil_to_sel(2, 1, 1, 2))  # j cycle (v3,v2,v1); edge v1->v2
    fd_check(lambda xx: en.bending_energy(xx, stencil, 0.1, 3e-5, 100.0), x)


def test_bending_fd_flat():
    # perfectly flat configuration: gradient must be finite (zero) -- this is
    # where the reference's acos form is numerically fragile
    x = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0], [-1.0, 1.0, 0.0]]
    ) * 0.01
    stencil = jnp.asarray(en.stencil_to_sel(2, 1, 1, 2))
    g = jax.grad(lambda xx: en.bending_energy(xx, stencil, 0.0, 3e-5, 100.0))(x)
    assert np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-12)


def test_hinge_angle_matches_reference_convention():
    """theta = atan2((n1 x n2).e_hat, n1.n2) must equal the reference's
    acos magnitude + side-sign rule (model_fold_offset.py:126-138)."""
    for _ in range(50):
        base = RNG.standard_normal((4, 3))
        x = jnp.asarray(base)
        stencil = jnp.asarray(en.stencil_to_sel(2, 1, 1, 2))
        theta = en.hinge_angle(x, stencil)
        # reference computation
        n1 = np.cross(base[1] - base[0], base[2] - base[1])
        n1 /= np.linalg.norm(n1)
        n2 = np.cross(base[2] - base[3], base[1] - base[2])
        n2 /= np.linalg.norm(n2)
        cos = np.clip(np.dot(n1, n2), -1, 1)
        t_ref = np.arccos(cos)
        # sign edge: e = x_sb - x_v0 with sb = v1 here
        if np.dot(n2, base[1] - base[0]) < 0:
            t_ref = -t_ref
        np.testing.assert_allclose(float(theta), t_ref, atol=1e-10)


def test_neo_energy_fd():
    B = jnp.asarray(np.linalg.inv(RNG.standard_normal((3, 3)) + 3 * np.eye(3)))
    D0 = jnp.asarray(np.linalg.inv(np.asarray(B)) @ (np.eye(3) + 0.05 * RNG.standard_normal((3, 3))))
    fd_check(lambda D: en.neo_energy(D, B, 1e-6, 2.5e5, 0.0), D0)


def test_tactile_energy_fd():
    B = jnp.asarray(np.linalg.inv(RNG.standard_normal((3, 3)) + 3 * np.eye(3)))
    D0 = jnp.asarray(np.linalg.inv(np.asarray(B)) @ (np.eye(3) + 0.05 * RNG.standard_normal((3, 3))))
    fd_check(lambda D: en.tactile_energy(D, B, 1e-6, 1.25e5, 8.3e4), D0)


def test_barrier_fd():
    # a configuration inside the barrier: small positive gap
    rel = jnp.array(
        [[0.01, 0.0, 0.0], [0.0, 0.01, 0.0], [0.003, 0.003, 0.0002]]
    )
    g = en.contact_gap(rel)
    assert 0 < float(g) < 4e-4
    fd_check(lambda r: en.barrier_energy(r, 1e4, 4e-4), rel, rtol=1e-4)


def test_friction_fd():
    w = jnp.array([0.3, 0.3, 0.4])
    n = np.array([0.0, 0.0, 1.0])
    t1 = np.array([1.0, 0.0, 0.0])
    t2 = np.array([0.0, 1.0, 0.0])
    T = jnp.asarray(np.stack([t1, t2]))
    dx0 = jnp.array([1e-5, -2e-5, 0.0])
    x = jnp.asarray(RNG.standard_normal((4, 3)) * 1e-4)
    # both branches of the mollifier
    for scale in (1.0, 100.0):
        fd_check(
            lambda xx: en.friction_energy(xx * scale, w, T, dx0, 2.0, 0.01, 5e-3),
            x,
            rtol=2e-4,
            eps=1e-8,
        )


def test_project_psd():
    A = RNG.standard_normal((5, 9, 9))
    A = A + np.swapaxes(A, 1, 2)
    P = np.asarray(project_psd(jnp.asarray(A)))
    for i in range(5):
        w = np.linalg.eigvalsh(P[i])
        assert w.min() > -1e-9
        wa = np.linalg.eigvalsh(A[i])
        np.testing.assert_allclose(w, np.maximum(wa, 0), atol=1e-8)


def test_project_psd_2x2():
    A = RNG.standard_normal((7, 2, 2))
    A = A + np.swapaxes(A, 1, 2)
    P2 = np.asarray(project_psd_2x2(jnp.asarray(A)))
    Pe = np.asarray(project_psd(jnp.asarray(A)))
    np.testing.assert_allclose(P2, Pe, atol=1e-10)


def test_bending_energy_batch_matches_vmap_bitexact():
    """bending_energy_batch (the leading-axis-split hot-path form) computes
    the same per-hinge arithmetic as vmap(bending_energy); agreement is at
    the ULP level (fusion order differs between the two lowerings)."""
    rng = np.random.default_rng(3)
    NH = 257
    x = jnp.asarray(rng.normal(size=(NH, 4, 3)))
    def valid_sel():
        # non-degenerate on generic points: xa != x3 (ja != 3), xb != xa,
        # edge endpoints distinct
        ja, jb = rng.permutation(3)[:2]
        ea, eb = rng.permutation(4)[:2]
        return en.stencil_to_sel(ja, jb, ea, eb)

    sel = jnp.asarray(np.stack([valid_sel() for _ in range(NH)]))
    ref = jnp.asarray(rng.normal(size=NH) * 0.1)
    coef = jnp.asarray(rng.uniform(0.5, 2.0, NH))
    kb = jnp.asarray(rng.uniform(0.5, 2.0, NH))
    e_vmap = jax.jit(jax.vmap(en.bending_energy))(x, sel, ref, coef, kb)
    e_batch = jax.jit(en.bending_energy_batch)(x, sel, ref, coef, kb)
    # ULP-level agreement (measured max rel diff ~9e-16: the two forms fuse
    # the same per-hinge arithmetic slightly differently). Cross-path
    # BIT-exactness inside the engine holds because every force/energy path
    # shares bending_soup_eg (tests/test_assembly.py).
    np.testing.assert_allclose(np.asarray(e_batch), np.asarray(e_vmap),
                               rtol=5e-15, atol=0)
    g_vmap = jax.jit(jax.vmap(jax.grad(en.bending_energy)))(
        x, sel, ref, coef, kb)
    g_batch = jax.jit(jax.grad(
        lambda xx: jnp.sum(en.bending_energy_batch(xx, sel, ref, coef, kb))
    ))(x)
    np.testing.assert_allclose(np.asarray(g_batch), np.asarray(g_vmap),
                               rtol=1e-12, atol=1e-12)
