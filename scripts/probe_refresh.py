"""Probe: Newton + CG iteration counts and operator-rebuild counts as a
function of hess_refresh (how many micro iterations reuse a stale
Hessian/preconditioner). Iteration counts are hardware-independent; the
TPU win per skipped rebuild is the measured assembly+factorization cost
(~tens of ms/step at bench size), so if refresh=3/4 adds few extra
CG iterations it trades well. Eager mirror of solver.newton_solve's
modified-Newton loop (same warm start, same line search).

Usage: python scripts/probe_refresh.py [N] [T] [--cpu]
"""
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    sys.argv.remove("--cpu")

import jax.numpy as jnp
import numpy as np


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from thinshelllab_tpu.engine import elements, gripper, solver, stepper
    from thinshelllab_tpu.scenes import bench_scene

    for refresh in (1, 2, 3, 4):
        sc = bench_scene.make(cloth_N=N, dtype=jnp.float32,
                              hess_refresh=refresh)
        spec, params = sc.spec, sc.params

        op_of = jax.jit(lambda pos, ref, con: solver.prepare_solver_state(
            spec, elements.all_groups(spec, params, pos, ref, con,
                                      with_hess=True, spd=True), pos.dtype))
        resid = jax.jit(lambda pos, prev, vel, ref, con:
                        elements.assemble_residual(
                            spec, elements.all_groups(
                                spec, params, pos, ref, con,
                                with_hess=False, spd=False),
                            pos, prev, vel))
        solve = jax.jit(lambda op, F, x0: solver.solve_cg_prepared(
            spec, op, F, return_iters=True, x0=x0))
        energy = jax.jit(partial(elements.total_energy, spec, params))

        state = sc.state0
        dpos = np.zeros((1, 3), np.float32)
        dpos[0, 2] = -4e-4
        act = (jnp.asarray(dpos), jnp.zeros((1, 3), jnp.float32),
               jnp.zeros((1,), jnp.float32))

        st = state.replace(
            pos=jnp.asarray(state.pos), vel=jnp.asarray(state.vel),
            ref_angle=jnp.asarray(state.ref_angle),
            proj_flag=jnp.asarray(state.proj_flag),
            proj_dir=jnp.asarray(state.proj_dir))
        tot_cg = tot_newton = tot_rebuild = 0
        final_deltas = []
        for t in range(T):
            gs = gripper.gripper_step(spec, st.gripper, *act)
            pos = gripper.write_bound_vertices(spec, st.pos, gs)
            prev_pos = pos
            con, pf, pd = stepper.build_contacts(
                spec, params, pos, prev_pos, st.proj_flag, st.proj_dir)
            ek = dict(prev_pos=prev_pos, vel=st.vel,
                      ref_angle=st.ref_angle, contact=con)
            md = np.asarray(spec.mass)
            x_hat = pos + st.vel * spec.dt + (
                jnp.asarray(spec.gravity) + jnp.asarray(spec.ext_force)
                / md[:, None]) * spec.dt**2
            x = jnp.where(jnp.asarray(spec.frozen), pos, x_hat)
            E0 = energy(x, **ek)
            p_prev = jnp.zeros_like(x)
            it = 0
            delta = np.inf
            while it < spec.max_newton_iter and delta >= spec.newton_tol:
                op = op_of(x, st.ref_angle, con)
                tot_rebuild += 1
                for _ in range(refresh):
                    F = resid(x, prev_pos, st.vel, st.ref_angle, con)
                    p, k = solve(op, F, p_prev)
                    tot_cg += int(k)
                    delta = float(jnp.max(jnp.abs(p))) / spec.dt
                    # mirror solver.line_search exactly: on failure apply
                    # the LAST TRIED alpha (the loop has already halved it
                    # once past the exit test, so that is alpha * 2) and
                    # carry the energy evaluated at that applied step
                    alpha = 1.0
                    E_new = E0
                    ok = False
                    while alpha > spec.linesearch_min_alpha:
                        E_new = energy(x - alpha * p, **ek)
                        if float(E_new) < float(E0):
                            ok = True
                            break
                        alpha *= 0.5
                    if not ok:
                        alpha *= 2.0
                    x = x - alpha * p
                    E0 = E_new
                    p_prev = p
                    it += 1
                    tot_newton += 1
                    if delta < spec.newton_tol or it >= spec.max_newton_iter:
                        break
            final_deltas.append(delta)
            new_vel = (x - prev_pos) * (spec.damping / spec.dt)
            ref = st.ref_angle
            if spec.plastic:
                ref = stepper.update_ref_angle(spec, x, ref)
            st = st.replace(pos=x, vel=new_vel, ref_angle=ref,
                            proj_flag=pf, proj_dir=pd, gripper=gs)
        print(f"refresh={refresh}: newton={tot_newton} rebuilds={tot_rebuild}"
              f" cg={tot_cg} over {T} steps; final delta/tol "
              f"{[f'{d/spec.newton_tol:.2f}' for d in final_deltas]}")


if __name__ == "__main__":
    main()
