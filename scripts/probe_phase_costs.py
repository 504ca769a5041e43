"""Clean device-side per-phase costs at bench size: each phase is repeated
inside ONE jit (lax.fori_loop with a data dependence) so the ~30 ms tunnel
round trip does not floor the measurement (scripts/probe_newton_tpu.py's
host-driven loop cannot resolve anything below the RTT).

Phases: operator rebuild (all_groups with_hess + prepare_solver_state),
residual eval (force groups + assemble), energy eval, fused
energy+residual via value_and_grad, one CG solve (fixed iteration count),
soup gather. Prints ms/call for each.

Usage: python scripts/probe_phase_costs.py [cloth_N] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def bench_phase(name, fn, arg, reps):
    """fn: arg -> arg (same pytree structure, data-dependent)."""

    @jax.jit
    def loop(a):
        return jax.lax.fori_loop(0, reps, lambda i, x: fn(x), a)

    out = loop(arg)
    jax.device_get(jax.tree.leaves(out)[0])  # reliable first-exec wait
    t0 = time.perf_counter()
    out = loop(arg)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:34s} {dt:8.3f} ms/call")
    return dt


def main():
    cloth_N = int(sys.argv[1]) if len(sys.argv) > 1 else 70
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from thinshelllab_tpu.engine import elements, gripper, solver, stepper
    from thinshelllab_tpu.scenes import bench_scene

    sc = bench_scene.make(cloth_N=cloth_N, dtype=jnp.float32, hess_refresh=2)
    spec, params = sc.spec, sc.params

    action = (jnp.asarray([[0.0, 0.0, -4e-4]], jnp.float32),
              jnp.zeros((1, 3), jnp.float32), jnp.zeros((1,), jnp.float32))

    # advance 2 steps so the contact set is populated (steady regime)
    @jax.jit
    def advance(state):
        st, _ = stepper.time_step(spec, params, state, action)
        st, _ = stepper.time_step(spec, params, st, action)
        return st

    state = advance(sc.state0)
    jax.device_get(state.pos)

    @jax.jit
    def setup(state):
        gs = gripper.gripper_step(spec, state.gripper, *action)
        pos = gripper.write_bound_vertices(spec, state.pos, gs)
        contact, pf, pd = stepper.build_contacts(
            spec, params, pos, pos, state.proj_flag, state.proj_dir)
        return pos, contact

    pos, contact = setup(state)
    jax.device_get(pos)
    prev_pos, vel, ref = pos, state.vel, state.ref_angle
    n_active = int(jax.device_get(contact.active.sum()))
    print(f"NV={spec.NV} active contacts {n_active}/{spec.contact.capacity} "
          f"reps={reps}")

    eps = 1e-12

    # -- contact pipeline (broadphase + analysis)
    def f_contact(p):
        c2, _, _ = stepper.build_contacts(spec, params, p, p,
                                          state.proj_flag, state.proj_dir)
        return p + eps * c2.n[0, 0]
    bench_phase("contact rebuild (broadphase)", f_contact, pos, reps)

    # -- operator rebuild
    def f_op(p):
        groups = elements.all_groups(spec, params, p, ref, contact,
                                     with_hess=True, spd=True)
        st_ = solver.prepare_solver_state(spec, groups, p.dtype)
        return p + eps * st_["D"][0, 0, 0]
    bench_phase("operator rebuild (H+prep)", f_op, pos, reps)

    # -- hessian groups only (no spd / no prep) as the adjoint builds them
    def f_hess(p):
        groups = elements.all_groups(spec, params, p, ref, contact,
                                     with_hess=True, spd=False)
        return p + eps * groups["H"][0, 0, 0, 0, 0]
    bench_phase("hessian groups (no spd)", f_hess, pos, reps)

    # -- residual eval (as the micro loop does: from soups)
    def f_resid(p):
        soups = elements.gather_soups(spec, contact, p)
        fg = elements.force_groups_from_soups(spec, params, soups, ref,
                                              contact)
        F = elements.assemble_residual(spec, fg, p, prev_pos, vel)
        return p + eps * F
    bench_phase("residual (gather+force+asm)", f_resid, pos, reps)

    # -- energy eval
    def f_energy(p):
        E = elements.total_energy(spec, params, p, prev_pos=prev_pos,
                                  vel=vel, ref_angle=ref, contact=contact)
        return p + eps * E
    bench_phase("energy eval", f_energy, pos, reps)

    # -- fused energy+residual (value_and_grad of total_energy)
    def f_eg(p):
        E, F = jax.value_and_grad(
            lambda q: elements.total_energy(spec, params, q,
                                            prev_pos=prev_pos, vel=vel,
                                            ref_angle=ref, contact=contact)
        )(p)
        return p + eps * (F + E)
    bench_phase("energy+residual (val_and_grad)", f_eg, pos, reps)

    # -- soup gather alone
    def f_soup(p):
        soups = elements.gather_soups(spec, contact, p)
        return p + eps * soups["xm"][0, 0, 0]
    bench_phase("soup gather", f_soup, pos, reps)

    # -- one warm CG solve on a fixed operator
    groups0 = jax.jit(lambda p: elements.all_groups(
        spec, params, p, ref, contact, with_hess=True, spd=True))(pos)
    st0 = jax.jit(lambda g, p: solver.prepare_solver_state(
        spec, g, p.dtype))(groups0, pos)
    F0 = jax.jit(lambda p: elements.assemble_residual(
        spec, elements.force_groups_from_soups(
            spec, params, elements.gather_soups(spec, contact, p), ref,
            contact), p, prev_pos, vel))(pos)
    jax.block_until_ready(F0)

    def f_cg(F):
        p_, _ = solver.solve_cg_prepared(spec, st0, F, return_iters=True)
        return F + eps * p_
    bench_phase("CG solve (warmless)", f_cg, F0, max(4, reps // 4))

    # -- adjoint solve (GMRES/BCR path)
    groups_t = jax.jit(lambda p: elements.all_groups(
        spec, params, p, ref, contact, with_hess=True, spd=False))(pos)
    jax.block_until_ready(groups_t["H"])

    def f_adj(F):
        z = solver.solve_adjoint(spec, groups_t, F)
        return F + eps * z
    bench_phase("adjoint solve (GMRES/BCR)", f_adj, F0, max(2, reps // 8))

    it_adj = jax.jit(lambda F: solver.solve_adjoint(
        spec, groups_t, F, return_iters=True)[1])(F0)
    print(f"  adjoint GMRES iterations: {int(jax.device_get(it_adj))}")

    # -- BCR dense-root cutoff sweep (bcr_cutoff is a static spec field now;
    # vary it with spec.replace so each leg traces a distinct program)
    for c in (8, 12, 18):
        spec_c = spec.replace(bcr_cutoff=c)

        def f_adj_c(F, spec_c=spec_c):
            z = solver.solve_adjoint(spec_c, groups_t, F)
            return F + eps * z

        bench_phase(f"adjoint solve (bcr cutoff={c})", f_adj_c, F0,
                    max(2, reps // 8))

    # -- prepare_solver_state sub-phases (scalar-carried data dependence so
    # the fori body is not hoisted as loop-invariant)
    H0 = groups0["H"]
    idx0 = groups0["idx"]
    ns = elements.static_block_count(spec)
    zscal = jnp.zeros((), jnp.float32)

    def f_spd(s):
        g = elements.all_groups(spec, params, pos + s, ref, contact,
                                with_hess=True, spd=True)
        return s + eps * g["H"][0, 0, 0, 0, 0]
    bench_phase("hessian groups (spd=True)", f_spd, zscal, reps)

    def f_dia(s):
        dia = elements.assemble_dia(spec, {"idx": idx0, "H": H0 + s},
                                    jnp.float32)
        return s + eps * dia[0, 0, 0, 0]
    bench_phase("  assemble_dia", f_dia, zscal, reps)

    if spec.hvp_slots is not None and spec.hvp_slots.D > 0:
        def f_nbr(s):
            nbr = elements.gather_neighbor_blocks(
                spec, {"idx": idx0, "H": H0 + s}, jnp.float32)
            return s + eps * jax.tree.leaves(nbr)[0].ravel()[0]
        bench_phase("  gather_neighbor_blocks", f_nbr, zscal, reps)

    dia0 = jax.jit(lambda: elements.assemble_dia(
        spec, groups0, jnp.float32))()
    nbr0 = None
    if spec.hvp_slots is not None and spec.hvp_slots.D > 0:
        nbr0 = jax.jit(lambda: elements.gather_neighbor_blocks(
            spec, groups0, jnp.float32))()
    jax.block_until_ready(dia0)

    def f_diag(s):
        D, Dc = elements.diag_blocks_dia(
            spec, {"idx": idx0, "H": H0 + s}, dia0 + s, nbr0,
            return_contact=True)
        return s + eps * D[0, 0, 0]
    bench_phase("  diag_blocks_dia", f_diag, zscal, reps)

    def f_split(s):
        sp = elements.build_contact_split(spec, idx0[ns:], H0[ns:] + s,
                                          jnp.float32)
        lv = jax.tree.leaves(sp)
        dep = lv[0].ravel()[0].astype(jnp.float32) if lv else 0.0
        return s + eps * dep
    bench_phase("  build_contact_split", f_split, zscal, reps)


if __name__ == "__main__":
    main()
