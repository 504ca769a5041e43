"""Block-cyclic-reduction cloth-grid solver: extraction exactness against a
dense reconstruction of the DIA lanes, and direct-solve accuracy."""
import jax
import jax.numpy as jnp
import numpy as np

from thinshelllab_tpu.engine import elements, gridsolve, solver, stepper
from thinshelllab_tpu.scenes import bench_scene


def _setup(cloth_N=16):
    sc = bench_scene.make(cloth_N=cloth_N, dtype=jnp.float64, solver="cg")
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
    dia = elements.assemble_dia(spec, groups, jnp.float64)
    return sc, spec, groups, dia


def _dense_from_dia(spec, gp_entry, dia, Dc=None):
    """Reference: dense cloth-block matrix built entry-by-entry from the
    DIA lanes + frozen masks + inertia (+ contact diagonal)."""
    N, M, v_off, lanes = gp_entry
    W, R = M + 1, N + 1
    n = R * W * 3
    T = np.zeros((n, n))
    d = np.asarray(dia)
    unf = ~np.asarray(spec.frozen)[v_off : v_off + R * W]  # (RW, 3)
    for (oi, di, dj) in lanes:
        o = di * W + dj
        for r in range(R):
            r2 = r + di
            if not (0 <= r2 < R):
                continue
            for c in range(W):
                c2 = c + dj
                if not (0 <= c2 < W):
                    continue
                v = r * W + c
                v2 = r2 * W + c2
                for i in range(3):
                    for j in range(3):
                        if unf[v, i] and unf[v2, j]:
                            T[3 * v + i, 3 * v2 + j] += d[
                                oi, i, j, v_off + v
                            ]
    md = np.asarray(spec.mass)[v_off : v_off + R * W]
    T[np.arange(n), np.arange(n)] += np.repeat(md, 3) / spec.dt**2
    if Dc is not None:
        Dcn = np.asarray(Dc)[v_off : v_off + R * W]
        for v in range(R * W):
            blk = Dcn[v] * np.outer(unf[v], unf[v])
            T[3 * v : 3 * v + 3, 3 * v : 3 * v + 3] += blk
    return 0.5 * (T + T.T)


def _dense_from_blocks(D, U, R, W):
    nb, m, _ = D.shape
    n = 2 * nb * m // 2  # nb * m scalars
    Tf = np.zeros((nb * m, nb * m))
    Dn, Un = np.asarray(D), np.asarray(U)
    for k in range(nb):
        Tf[k * m : (k + 1) * m, k * m : (k + 1) * m] = Dn[k]
        if k + 1 < nb:
            Tf[k * m : (k + 1) * m, (k + 1) * m : (k + 2) * m] = Un[k]
            Tf[(k + 1) * m : (k + 2) * m, k * m : (k + 1) * m] = Un[k].T
    return Tf[: R * W * 3, : R * W * 3]


def test_extraction_matches_dense_lanes():
    sc, spec, groups, dia = _setup(16)
    gp = gridsolve.build_grid_plan(spec)
    assert len(gp) == 1
    _, Dc = elements.diag_blocks_dia(spec, groups, dia, None,
                                     return_contact=True)
    D, U = gridsolve.extract_cloth_tridiag(spec, gp[0], dia, Dc)
    N, M, v_off, _ = gp[0]
    T_ref = _dense_from_dia(spec, gp[0], dia, Dc)
    T_blk = _dense_from_blocks(D, U, N + 1, M + 1)
    err = np.abs(T_blk - T_ref).max() / (np.abs(T_ref).max() + 1e-30)
    assert err < 1e-12, err
    # SPD
    ev = np.linalg.eigvalsh(T_ref)
    assert ev.min() > 0, ev.min()


def test_bcr_solve_accuracy():
    sc, spec, groups, dia = _setup(16)
    gp = gridsolve.build_grid_plan(spec)
    _, Dc = elements.diag_blocks_dia(spec, groups, dia, None,
                                     return_contact=True)
    D, U = gridsolve.extract_cloth_tridiag(spec, gp[0], dia, Dc)
    N, M, v_off, _ = gp[0]
    T_ref = _dense_from_dia(spec, gp[0], dia, Dc)
    fac = gridsolve.factor_tridiag(D, U)
    rng = np.random.default_rng(1)
    n = (N + 1) * (M + 1) * 3
    b = rng.normal(size=n)
    nb = D.shape[0]
    m = D.shape[1]
    bp = np.zeros((nb * m,))
    bp[:n] = b
    x = np.asarray(
        gridsolve.solve_tridiag(fac, jnp.asarray(bp.reshape(nb, m)))
    ).reshape(-1)[:n]
    x_ref = np.linalg.solve(T_ref, b)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-8, err


def test_grid_preconditioned_minres_converges_fast():
    """MINRES with the grid preconditioner reaches cg_tol on the TRUE
    (unprojected) Hessian in a small fraction of the iteration cap."""
    sc, spec, _, _ = _setup(16)
    params = sc.params
    T_, n = 3, sc.n_part
    acts = (jnp.zeros((T_, n, 3)).at[:, :, 2].add(-4e-4),
            jnp.zeros((T_, n, 3)), jnp.zeros((T_, n)))
    st, _ = stepper.rollout(spec, params,
                            jax.tree.map(jnp.asarray, sc.state0), acts)
    contact, _, _ = stepper.build_contacts(spec, params, st.pos, st.pos,
                                           st.proj_flag, st.proj_dir)
    groups = elements.all_groups(spec, params, st.pos, st.ref_angle, contact,
                                 with_hess=True, spd=False)
    rng = np.random.default_rng(3)
    g = jnp.asarray(rng.normal(0, 1, (spec.NV, 3)))
    g = jnp.where(jnp.asarray(spec.frozen), 0.0, g)
    st_op = solver.prepare_solver_state(spec, groups, g.dtype)
    A, _ = solver._ops_from_state(spec, st_op)

    z, it = solver.solve_minres(spec, groups, g, return_iters=True)
    rel = float(jnp.linalg.norm(g - A(z)) / jnp.linalg.norm(g))
    assert rel < 1e-5, rel
    assert int(it) < spec.cg_max_iter // 2, int(it)

    # the adjoint's production path: GMRES with the exact in-band
    # (true-Hessian) BCR preconditioner
    zg = solver.solve_gmres(spec, groups, g)
    relg = float(jnp.linalg.norm(g - A(zg)) / jnp.linalg.norm(g))
    assert relg < 1e-5, relg
