"""Exactness of the hybrid DIA assembly (stencil slice-adds + row gather +
pull leftover) against the dense Hessian, on scenes that exercise every
tier: bench (wide cloth -> stencil families + lattice tets + tactile
leftover) and folding (narrow cloth -> pull-path fallback)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thinshelllab_tpu.engine import elements, solver, stepper
from thinshelllab_tpu.scenes import bench_scene, folding


def _system(sc):
    spec, params = sc.spec, sc.params
    state = sc.state0
    rng = np.random.default_rng(0)
    pos = jnp.asarray(state.pos) + 1e-4 * rng.normal(size=state.pos.shape)
    contact, _, _ = stepper.build_contacts(
        spec, params, pos, pos, jnp.asarray(state.proj_flag),
        jnp.asarray(state.proj_dir))
    groups = elements.all_groups(spec, params, pos,
                                 jnp.asarray(state.ref_angle), contact,
                                 with_hess=True, spd=True)
    return spec, params, pos, groups


@pytest.mark.parametrize("make,kw", [
    (bench_scene.make, dict(cloth_N=12)),
    (folding.make, dict(table_n=4)),
])
def test_hvp_and_diag_match_dense(make, kw):
    sc = make(dtype=jnp.float64, solver="cg", **kw)
    spec, params, pos, groups = _system(sc)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(spec.NV, 3)))
    x = jnp.where(jnp.asarray(spec.frozen), 0.0, x)

    Hd = elements.dense_hessian(spec, groups)
    y_dense = (Hd @ x.reshape(-1)).reshape(-1, 3)
    y_dense = jnp.where(
        jnp.asarray(spec.frozen),
        (jnp.asarray(spec.mass) / spec.dt**2)[:, None] * x, y_dense)

    scale = float(jnp.max(jnp.abs(Hd))) + 1.0
    if spec.dia is not None:
        dia = elements.assemble_dia(spec, groups, x.dtype)
        nbr = (elements.gather_neighbor_blocks(spec, groups, x.dtype)
               if spec.hvp_slots is not None and spec.hvp_slots.D > 0
               else None)
        y = elements.hvp_dia(spec, dia, nbr, groups, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_dense),
                                   atol=1e-11 * scale)
        D_new = elements.diag_blocks_dia(spec, groups, dia, nbr)
        D_old = elements.diag_blocks(spec, groups)
        np.testing.assert_allclose(np.asarray(D_new), np.asarray(D_old),
                                   atol=1e-11 * scale)
    elif spec.hvp_slots is not None:
        nbr = elements.gather_neighbor_blocks(spec, groups, x.dtype)
        y = elements.hvp_pull(spec, nbr, groups, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_dense),
                                   atol=1e-11 * scale)


def test_residual_gather_matches_scatter():
    sc = bench_scene.make(cloth_N=12, dtype=jnp.float64, solver="cg")
    spec, params, pos, groups = _system(sc)
    zeros = jnp.zeros_like(pos)
    F_new = elements.assemble_residual(spec, groups, pos, pos, zeros)
    F_old = elements.assemble_residual(spec.replace(dia=None), groups, pos,
                                       pos, zeros)
    np.testing.assert_allclose(np.asarray(F_new), np.asarray(F_old),
                               atol=1e-10)


def test_smoothed_preconditioner_solve_agrees_with_dense():
    sc = bench_scene.make(cloth_N=12, dtype=jnp.float64, solver="cg")
    spec, params, pos, groups = _system(sc)
    spec = spec.replace(precond_smooth=3)
    F = elements.assemble_residual(spec, groups, pos, pos,
                                   jnp.zeros_like(pos))
    p_cg = solver.solve_cg(spec, groups, F)
    p_dn = solver.solve_dense(spec, groups, F)
    rel = float(jnp.linalg.norm(p_cg - p_dn) /
                (jnp.linalg.norm(p_dn) + 1e-30))
    assert rel < 1e-3


def test_minres_matches_dense_on_true_hessian():
    """solve_minres (the adjoint's indefinite-safe iterative solve) matches
    the dense factorization on the TRUE (unprojected) Hessian at an
    established-contact state."""
    import jax
    import jax.numpy as jnp

    from thinshelllab_tpu.engine import elements, solver, stepper
    from thinshelllab_tpu.scenes import folding

    sc = folding.make(table_n=5, max_newton_iter=20)
    spec, params = sc.spec, sc.params
    T, n = 3, sc.n_part
    dpos = np.zeros((T, n, 3))
    dpos[:, :, 2] = -0.0006
    acts = (jnp.asarray(dpos), jnp.zeros((T, n, 3)), jnp.zeros((T, n)))
    st, _ = stepper.rollout(spec, params, sc.state0, acts)
    contact, _, _ = stepper.build_contacts(spec, params, st.pos, st.pos,
                                           st.proj_flag, st.proj_dir)
    groups = elements.all_groups(spec, params, st.pos, st.ref_angle, contact,
                                 with_hess=True, spd=False)
    rng = np.random.default_rng(3)
    g = jnp.asarray(rng.normal(0, 1, (spec.NV, 3)))
    z_dense = solver.solve_dense(spec, groups, g)
    z_minres = solver.solve_minres(spec, groups, g)
    # the dense path zeroes frozen rows/cols; compare on unfrozen DOFs
    unf = ~np.asarray(spec.frozen)
    zd = np.asarray(z_dense)[unf]
    zm = np.asarray(z_minres)[unf]
    err = np.linalg.norm(zm - zd) / np.linalg.norm(zd)
    assert err < 1e-6, err


def test_hess_refresh_same_fixed_point():
    """Modified Newton (hess_refresh=2, stale operator on odd iterations)
    converges to the same solution as exact Newton, on the cg solver path."""
    import jax
    import jax.numpy as jnp

    from thinshelllab_tpu.engine import stepper
    from thinshelllab_tpu.scenes import bench_scene

    sols = {}
    for refresh in (1, 2):
        sc = bench_scene.make(cloth_N=16, dtype=jnp.float64, solver="cg",
                              max_newton_iter=30, hess_refresh=refresh)
        T, n = 2, sc.n_part
        acts = (jnp.zeros((T, n, 3)).at[:, :, 2].add(-4e-4),
                jnp.zeros((T, n, 3)), jnp.zeros((T, n)))
        st, _ = stepper.rollout(sc.spec, sc.params,
                                jax.tree.map(jnp.asarray, sc.state0), acts)
        sols[refresh] = np.asarray(st.pos)
        assert np.all(np.isfinite(sols[refresh]))
    err = np.abs(sols[2] - sols[1]).max()
    # both runs stop inside the |p|/dt < newton_tol termination ball; the
    # two iterates agree only up to a few multiples of that radius
    assert err < 1e-6, err



def test_membrane_closed_hessian_matches_ad():
    """membrane_hess_closed (exact closed form) vs forward-over-reverse AD
    at f64 roundoff."""
    import jax
    import jax.numpy as jnp

    from thinshelllab_tpu.engine import elements
    from thinshelllab_tpu.ops import energies as en

    rng = np.random.default_rng(0)
    E = 64
    x = jnp.asarray(rng.normal(0, 0.05, (E, 3, 3)))
    l0 = jnp.asarray(np.abs(rng.normal(0.05, 0.01, (E, 3))) + 0.01)
    A0 = jnp.asarray(np.abs(rng.normal(1e-3, 3e-4, (E,))) + 1e-4)
    kl = jnp.asarray(np.abs(rng.normal(1000, 100, (E,))))
    ka = jnp.asarray(np.abs(rng.normal(1000, 100, (E,))))
    g_fn = jax.grad(en.membrane_energy)
    H_ad = jnp.transpose(
        jax.vmap(jax.jacfwd(g_fn))(x, l0, A0, kl, ka), (0, 1, 3, 2, 4)
    )
    H_cl = elements.membrane_hess_closed(x, l0, A0, kl, ka)
    err = float(jnp.abs(H_cl - H_ad).max() / jnp.abs(H_ad).max())
    assert err < 1e-12, err



def test_pallas_dia_spmv_matches_xla_interpret():
    """The Pallas streaming DIA SpMV (ops/dia_spmv.py, interpret mode on
    CPU) computes the same shifted contraction as the XLA padded-slices
    einsum in hvp_dia_static, on the bench scene's real store."""
    from thinshelllab_tpu.ops import dia_spmv

    sc = bench_scene.make(cloth_N=16, dtype=jnp.float64, solver="cg")
    spec, params, pos, groups = _system(sc)
    plan = spec.dia
    assert plan is not None
    dia = elements.assemble_dia(spec, groups, jnp.float64)

    rng = np.random.default_rng(5)
    NV, NVp = spec.NV, plan.NVp
    x = jnp.asarray(rng.normal(size=(NV, 3)))
    unf = jnp.asarray(~spec.frozen, x.dtype)
    xm2 = jnp.zeros((3, NVp), x.dtype).at[:, :NV].set((x * unf).T)

    P = plan.max_abs_off
    xpad = jnp.concatenate(
        [jnp.zeros((3, P)), xm2, jnp.zeros((3, P))], axis=1)
    shifted = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(xpad, P + o, NVp, axis=1)
         for o in plan.offsets], axis=1)
    yT_xla = jnp.einsum("oijn,jon->in", dia, shifted)

    yT_pl = dia_spmv.dia_spmv(dia, xm2, plan.offsets, interpret=True)
    np.testing.assert_allclose(np.asarray(yT_pl), np.asarray(yT_xla),
                               rtol=1e-12, atol=1e-12)


def test_contact_split_hvp_matches_unsplit():
    """The frozen-source contact split (elements.build_contact_split: exact
    per-vertex diagonal for fully-frozen-source pairs + compacted general
    slots) must reproduce the unsplit merged-group contact matvec exactly,
    on a settled bench state with active contacts."""
    sc = bench_scene.make(cloth_N=16, dtype=jnp.float64, solver="cg")
    spec, params = sc.spec, sc.params
    assert any(spec.contact.frozen_src), "table pair should classify"
    assert elements.contact_static_split(spec) is not None

    T = 3
    acts = (jnp.asarray(np.tile([[0.0, 0.0, -4e-4]], (T, 1, 1))),
            jnp.zeros((T, 1, 3)), jnp.zeros((T, 1)))
    st_f, _ = stepper.rollout(spec, params,
                              jax.tree.map(jnp.asarray, sc.state0), acts)
    contact, _, _ = stepper.build_contacts(
        spec, params, st_f.pos, st_f.pos, st_f.proj_flag, st_f.proj_dir)
    assert int(contact.active.sum()) > 0
    groups = elements.all_groups(spec, params, st_f.pos, st_f.ref_angle,
                                 contact, with_hess=True, spd=False)
    stt = solver.prepare_solver_state(spec, groups, jnp.float64)
    assert "Dcon" in stt
    A, _ = solver._ops_from_state(spec, stt)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(spec.NV, 3)))
    y_split = A(x)
    g2 = {"idx": stt["idx"], "H": stt["H"]}
    y_ref = elements.hvp_dia_static(spec, stt["dia"], stt.get("nbr"), x) \
        + elements.hvp_dia_contact(spec, g2, x)
    np.testing.assert_allclose(np.asarray(y_split), np.asarray(y_ref),
                               rtol=0, atol=1e-12 * float(
                                   jnp.abs(y_ref).max()))

    # the non-frozen-source pairs (cloth->pad faces, pad->cloth faces,
    # table->cloth faces) must classify as selection-matmul ('mm') pairs:
    # their per-CG-iteration dynamic-index traffic is zero
    _diag, mm_ranges, gen_ranges = elements.contact_static_split(spec)
    assert len(mm_ranges) == 3 and not gen_ranges
    assert "mm_S" in stt and stt["idx_con"].shape[0] == 0

    # transposed-layout parity (the layout the production CG actually runs)
    plan = spec.dia
    unf2, _m2 = elements.t2_consts(spec, jnp.float64)
    x2 = jnp.zeros((3, plan.NVp)).at[:, : spec.NV].set(x.T)
    gT = {k: stt[k] for k in
          ("idx", "H", "Dcon", "idx_con", "H_con", "mm_S", "mm_H")
          if k in stt}
    DconT = elements.blocks_to_t33(spec, stt["Dcon"], jnp.float64)
    yT = elements.hvp_dia_contact_T(spec, gT, x2, unf2, DconT)
    y_con = elements.hvp_dia_contact(spec, gT, x)
    np.testing.assert_allclose(np.asarray(yT[:, : spec.NV].T),
                               np.asarray(y_con),
                               rtol=0, atol=1e-12 * float(
                                   jnp.abs(y_con).max()))


@pytest.mark.parametrize("make,kw", [
    (bench_scene.make, dict(cloth_N=12)),   # contact + tactile/ball tets
    (folding.make, dict(table_n=4)),        # plastic cloth, pull path
])
def test_linesearch_energy_matches_total(make, kw):
    """linesearch_energy_fn (gathers hoisted out of the alpha loop) must
    equal total_energy(pos - alpha p) exactly for every alpha, on scenes
    covering all element soups + active contacts."""
    sc = make(dtype=jnp.float64, solver="cg", **kw)
    spec, params = sc.spec, sc.params
    state = sc.state0
    rng = np.random.default_rng(3)
    pos = jnp.asarray(state.pos) + 1e-4 * rng.normal(size=state.pos.shape)
    vel = jnp.asarray(rng.normal(size=state.pos.shape) * 1e-3)
    prev = jnp.asarray(state.pos)
    ref = jnp.asarray(state.ref_angle)
    contact, _, _ = stepper.build_contacts(
        spec, params, pos, pos, jnp.asarray(state.proj_flag),
        jnp.asarray(state.proj_dir))
    p = jnp.asarray(rng.normal(size=pos.shape) * 1e-3)

    E_of = elements.linesearch_energy_fn(
        spec, params, pos, p, prev, vel, ref, contact)
    for alpha in (1.0, 0.5, 0.125, 0.0):
        want = elements.total_energy(spec, params, pos - alpha * p, prev,
                                     vel, ref, contact)
        got = E_of(jnp.asarray(alpha, pos.dtype))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12)


def test_pallas_dia_precond_matches_xla_interpret():
    """dia_precond (fused smoothing-polynomial kernel, interpret mode) vs an
    XLA replica of the SAME polynomial (A' = off-band DIA + full masked
    block diagonal folded into offset 0), on the bench scene's assembled
    operator with active contacts."""
    from thinshelllab_tpu.ops import dia_spmv

    sc = bench_scene.make(cloth_N=16, dtype=jnp.float64, solver="cg")
    spec, params, pos, groups = _system(sc)
    st = solver.prepare_solver_state(spec, groups, jnp.float64)
    D, Dinv = st["D"], solver._inv3x3(st["D"])
    plan = spec.dia
    NV, NVp = spec.NV, plan.NVp
    off0 = plan.offsets.index(0)
    unf = jnp.asarray(~spec.frozen, jnp.float64)

    dia_pre = st["dia"].at[off0, :, :, :NV].set(jnp.transpose(D, (1, 2, 0)))
    dinv_l = jnp.zeros((3, 3, NVp)).at[:, :, :NV].set(
        jnp.transpose(Dinv, (1, 2, 0)))
    unf2 = jnp.zeros((3, NVp)).at[:, :NV].set(unf.T)

    rng = np.random.default_rng(11)
    r = jnp.asarray(rng.normal(size=(NV, 3)))
    w, sweeps = spec.precond_omega, 3
    r2 = jnp.zeros((3, NVp)).at[:, :NV].set((r * unf).T)

    z2 = dia_spmv.dia_precond(dia_pre, r2, unf2, dinv_l, plan.offsets,
                              w, sweeps, interpret=True)

    # XLA replica of the kernel's polynomial
    P = plan.max_abs_off

    def spmv(x2):
        xpad = jnp.concatenate(
            [jnp.zeros((3, P)), x2, jnp.zeros((3, P))], axis=1)
        shifted = jnp.stack(
            [jax.lax.dynamic_slice_in_dim(xpad, P + o, NVp, axis=1)
             for o in plan.offsets], axis=1)
        return jnp.einsum("oijn,jon->in", dia_pre, shifted)

    def dmul(x2):
        return jnp.einsum("ijn,jn->in", dinv_l, x2)

    z = w * dmul(r2)
    for _ in range(sweeps):
        z = z + w * dmul(r2 - unf2 * spmv(z))
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z),
                               rtol=1e-12, atol=1e-13 * float(
                                   jnp.abs(z).max()))


def test_warm_split_optimal_scaling():
    """_warm_split: base = alpha x0 with alpha = argmin |F - a A x0|, so
    (a) an exact seed leaves a ~zero effective rhs, (b) a zero/garbage seed
    degrades exactly to the cold start, and (c) the returned correction
    problem reconstructs the original solution."""
    rng = np.random.default_rng(7)
    n = 24
    Q = rng.normal(0, 1, (n, n))
    Amat = Q @ Q.T + n * np.eye(n)
    A = lambda v: jnp.asarray(Amat) @ v
    x_true = jnp.asarray(rng.normal(0, 1, (n,)))
    F = A(x_true)

    # exact seed: correction rhs collapses to ~0
    base, b_eff = solver._warm_split(A, F, x_true)
    np.testing.assert_allclose(np.asarray(base), np.asarray(x_true),
                               rtol=1e-10)
    assert float(jnp.linalg.norm(b_eff)) < 1e-8 * float(jnp.linalg.norm(F))

    # zero seed: exact cold start
    base0, b0 = solver._warm_split(A, F, jnp.zeros_like(x_true))
    assert float(jnp.linalg.norm(base0)) == 0.0
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(F))

    # arbitrary seed: |b_eff| <= |F| (never worse than cold), and
    # base + A^-1 b_eff == x_true
    x0 = jnp.asarray(rng.normal(0, 1, (n,)))
    base1, b1 = solver._warm_split(A, F, x0)
    assert float(jnp.linalg.norm(b1)) <= float(jnp.linalg.norm(F)) + 1e-12
    corr = jnp.asarray(np.linalg.solve(Amat, np.asarray(b1)))
    np.testing.assert_allclose(np.asarray(base1 + corr),
                               np.asarray(x_true), rtol=1e-9)


def test_warm_started_cg_matches_dense():
    """Warm-started solve_cg converges to the same point as the cold start:
    the stop tolerance stays relative to the ORIGINAL rhs, so every seed
    (exact / perturbed / garbage) must land within the same residual band
    of the direct solution as the cold start does."""
    sc = bench_scene.make(cloth_N=12, dtype=jnp.float64, solver="cg")
    spec, params, pos, groups = _system(sc)
    F = elements.assemble_residual(spec, groups, pos, pos,
                                   jnp.zeros_like(pos))
    p_dn = solver.solve_dense(spec, groups, F)
    dn_norm = float(jnp.linalg.norm(p_dn)) + 1e-30
    p_cold = solver.solve_cg(spec, groups, F)
    rel_cold = float(jnp.linalg.norm(p_cold - p_dn)) / dn_norm
    rng = np.random.default_rng(11)
    for seed in (p_cold,  # exact seed
                 p_cold + 1e-3 * jnp.asarray(
                     rng.normal(0, float(jnp.abs(p_cold).max()),
                                p_cold.shape)),  # perturbed seed
                 jnp.asarray(rng.normal(0, 1.0, p_cold.shape))):  # garbage
        p_warm = solver.solve_cg(spec, groups, F, x0=seed)
        rel = float(jnp.linalg.norm(p_warm - p_dn)) / dn_norm
        assert rel < max(1e-3, 3.0 * rel_cold), (rel, rel_cold)


def test_force_groups_from_soups_bit_exact():
    """The soup-shared force path (elements.force_groups_from_soups, used by
    the Newton micro loop) is bit-identical to fusing the individual
    *_eval force groups, and the affine soup update
    gather_soups(pos - a p) == soups - a * dsoups holds bit-exactly
    (gathering commutes with the line-search step on the same scalars)."""
    sc = folding.make(table_n=4)
    spec, params, pos, _ = _system(sc)
    state = sc.state0
    ref = jnp.asarray(state.ref_angle)
    contact, _, _ = stepper.build_contacts(
        spec, params, pos, pos, jnp.asarray(state.proj_flag),
        jnp.asarray(state.proj_dir))

    # old formulation: fuse the per-family force groups directly
    groups = []
    for ev in (elements.membrane_eval,):
        _, g = ev(spec, params, pos, False, False)
        groups.append(g)
    _, gb = elements.bending_eval(spec, params, pos, ref, False, False)
    groups.append(gb)
    if spec.neo.tets.shape[0]:
        _, gn = elements.neo_eval(spec, params, pos, False, False)
        groups.append(gn)
    if spec.tact.tets.shape[0]:
        _, gt = elements.tact_eval(spec, params, pos, False, False)
        groups.append(gt)
    _, gc = elements.barrier_eval(spec, contact, pos, False, False)
    _, gf = elements.friction_eval(spec, contact, pos, False, False)
    groups.append({"idx": gc["idx"], "g": gc["g"] + gf["g"]})
    old = elements.fuse_groups(spec, groups, with_hess=False)

    new = elements.all_groups(spec, params, pos, ref, contact,
                              with_hess=False, spd=False)
    np.testing.assert_array_equal(np.asarray(old["g"]), np.asarray(new["g"]))
    np.testing.assert_array_equal(np.asarray(old["idx"]),
                                  np.asarray(new["idx"]))

    # affine soup identity, bit-exact
    rng = np.random.default_rng(5)
    p = jnp.asarray(rng.normal(0, 1e-3, pos.shape))
    a = 0.3125  # exactly representable
    soups = elements.gather_soups(spec, contact, pos)
    dsoups = elements.gather_soups(spec, contact, p, direction=True)
    fresh = elements.gather_soups(spec, contact, pos - a * p)
    derived = jax.tree.map(lambda xs, ds: xs - a * ds, soups, dsoups)
    for k in fresh:
        np.testing.assert_array_equal(np.asarray(fresh[k]),
                                      np.asarray(derived[k]), err_msg=k)


@pytest.mark.parametrize("make,kw", [
    (folding.make, dict(table_n=4)),
    (bench_scene.make, dict(cloth_N=12, table_n=4)),
])
def test_linesearch_ef_matches_energy_and_force(make, kw):
    """linesearch_ef_fn (fused value_and_grad line-search eval, used by the
    Newton micro loop) must reproduce BOTH halves bit-exactly at every
    alpha: E equals linesearch_energy_fn's E_of(alpha), and the fused
    gradient equals force_groups_from_soups on the affine-updated soups."""
    sc = make(dtype=jnp.float64, solver="cg", **kw)
    spec, params = sc.spec, sc.params
    state = sc.state0
    rng = np.random.default_rng(7)
    pos = jnp.asarray(state.pos) + 1e-4 * rng.normal(size=state.pos.shape)
    vel = jnp.asarray(rng.normal(size=state.pos.shape) * 1e-3)
    prev = jnp.asarray(state.pos)
    ref = jnp.asarray(state.ref_angle)
    contact, _, _ = stepper.build_contacts(
        spec, params, pos, pos, jnp.asarray(state.proj_flag),
        jnp.asarray(state.proj_dir))
    p = jnp.asarray(rng.normal(size=pos.shape) * 1e-3)

    soups = elements.gather_soups(spec, contact, pos)
    dsoups = elements.gather_soups(spec, contact, p, direction=True)
    E_of = elements.linesearch_energy_fn(
        spec, params, pos, p, prev, vel, ref, contact, soups=soups,
        dsoups=dsoups)
    EF_of = elements.linesearch_ef_fn(
        spec, params, pos, p, prev, vel, ref, contact, soups, dsoups)
    for alpha in (1.0, 0.5, 0.125, 0.0):
        a = jnp.asarray(alpha, pos.dtype)
        E_want = E_of(a)
        soups_a = jax.tree.map(lambda xs, ds: xs - a * ds, soups, dsoups)
        fg_want = elements.force_groups_from_soups(spec, params, soups_a,
                                                   ref, contact)
        E_got, g_got = EF_of(a)
        np.testing.assert_array_equal(np.asarray(E_got),
                                      np.asarray(E_want),
                                      err_msg=f"E alpha={alpha}")
        np.testing.assert_array_equal(np.asarray(g_got),
                                      np.asarray(fg_want["g"]),
                                      err_msg=f"g alpha={alpha}")
