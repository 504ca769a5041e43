"""Host-driven Newton diagnostics at bench size on the real chip.

Replicates solver.newton_solve iteration-by-iteration with separately
jitted phases so ONE compile session yields: per-iteration |p|/dt (the
termination quantity), CG iteration counts, line-search alphas, contact
occupancy, and measured per-phase wall time (operator rebuild / residual /
CG solve / line search). This is the data that sizes the round-4 throughput
roadmap (VERDICT r4 items 1+3) without paying a full-program recompile per
config.

Usage: python scripts/probe_newton_tpu.py [cloth_N] [n_steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args):
    """block_until_ready is reliable from the second execution of a program
    on the axon tunnel (first-execution timings here are compile-skewed
    anyway); device_get of large pytrees would bill tunnel transfer time."""
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0


def main():
    cloth_N = int(sys.argv[1]) if len(sys.argv) > 1 else 70
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from thinshelllab_tpu.engine import elements, gripper, solver, stepper
    from thinshelllab_tpu.scenes import bench_scene

    sc = bench_scene.make(cloth_N=cloth_N, dtype=jnp.float32, hess_refresh=2)
    spec, params = sc.spec, sc.params
    print(f"NV={spec.NV} contacts cap={spec.contact.capacity} "
          f"newton_tol={spec.newton_tol} cg_tol={spec.cg_tol} "
          f"cg_max_iter={spec.cg_max_iter} max_newton={spec.max_newton_iter}")

    action = (jnp.asarray([[0.0, 0.0, -4e-4]], jnp.float32),
              jnp.zeros((1, 3), jnp.float32), jnp.zeros((1,), jnp.float32))

    @jax.jit
    def pre_step(state):
        gs = gripper.gripper_step(spec, state.gripper, *action)
        pos = gripper.write_bound_vertices(spec, state.pos, gs)
        contact, pf, pd = stepper.build_contacts(
            spec, params, pos, pos, state.proj_flag, state.proj_dir)
        return gs, pos, contact, pf, pd

    @jax.jit
    def op_of(pos, ref_angle, contact):
        groups = elements.all_groups(spec, params, pos, ref_angle, contact,
                                     with_hess=True, spd=True)
        return solver.prepare_solver_state(spec, groups, pos.dtype)

    @jax.jit
    def resid(pos, prev_pos, vel, ref_angle, contact):
        fg = elements.all_groups(spec, params, pos, ref_angle, contact,
                                 with_hess=False, spd=False)
        return elements.assemble_residual(spec, fg, pos, prev_pos, vel)

    @jax.jit
    def cg(st, F, x0):
        p, it = solver.solve_cg_prepared(spec, st, F, return_iters=True,
                                         x0=x0)
        return p, it

    from functools import partial

    @partial(jax.jit, static_argnames=())
    def energy_at(pos, alpha, p, prev_pos, vel, ref_angle, contact):
        return elements.total_energy(spec, params, pos - alpha * p,
                                     prev_pos=prev_pos, vel=vel,
                                     ref_angle=ref_angle, contact=contact)

    @jax.jit
    def finish(pos, prev_pos, state_ref):
        vel = (pos - prev_pos) * (spec.damping / spec.dt)
        new_ref, gate = stepper.update_ref_angle_gate(spec, pos, state_ref)
        return vel, (new_ref if spec.plastic else state_ref)

    state = sc.state0
    md = np.asarray(spec.mass)
    frozen = np.asarray(spec.frozen)

    for step in range(n_steps):
        gs, pos0, contact, pf, pd = pre_step(state)
        n_active = int(jax.device_get(contact.active.sum()))
        prev_pos = pos0
        vel = state.vel
        ref = state.ref_angle
        x_hat = pos0 + vel * spec.dt + (
            jnp.asarray(spec.gravity) + jnp.asarray(spec.ext_force)
            / jnp.asarray(md)[:, None]) * spec.dt ** 2
        pos = jnp.where(jnp.asarray(frozen), pos0, x_hat)
        E0 = float(jax.device_get(energy_at(pos, 0.0, jnp.zeros_like(pos),
                                            prev_pos, vel, ref, contact)))
        print(f"\nstep {step}: active contacts {n_active} / "
              f"{spec.contact.capacity}  E0={E0:.6e}")
        p_prev = jnp.zeros_like(pos)
        st = None
        for it in range(spec.max_newton_iter):
            t_op = 0.0
            if it % max(1, spec.hess_refresh) == 0:
                st, t_op = timed(op_of, pos, ref, contact)
            F, t_res = timed(resid, pos, prev_pos, vel, ref, contact)
            (p, cg_it), t_cg = timed(cg, st, F, p_prev)
            delta = float(jax.device_get(jnp.max(jnp.abs(p)))) / spec.dt
            # host-level backtracking line search (reference semantics)
            alpha, success, n_ls = 1.0, False, 0
            t_ls = 0.0
            while not success and alpha > spec.linesearch_min_alpha:
                E_dev, dt_ls = timed(energy_at, pos, alpha, p, prev_pos,
                                     vel, ref, contact)
                E = float(jax.device_get(E_dev))
                t_ls += dt_ls
                n_ls += 1
                success = E < E0
                if not success:
                    alpha *= 0.5
            applied = alpha if success else alpha * 2.0
            pos = pos - applied * p
            E0 = E
            p_prev = p
            cg_it = int(jax.device_get(cg_it))
            print(f"  it {it}: delta={delta:.3e} cg_iters={cg_it} "
                  f"alpha={applied:g} ls_evals={n_ls} E={E:.6e} "
                  f"t[op={t_op*1e3:.1f} res={t_res*1e3:.1f} "
                  f"cg={t_cg*1e3:.1f} ls={t_ls*1e3:.1f}]ms")
            if delta < spec.newton_tol:
                print(f"  -> converged at it {it}")
                break
        vel, ref = finish(pos, prev_pos, ref)
        import dataclasses
        try:
            state = dataclasses.replace(state, pos=pos, vel=vel,
                                        ref_angle=ref, proj_flag=pf,
                                        proj_dir=pd, gripper=gs)
        except TypeError:
            state = state.replace(pos=pos, vel=vel, ref_angle=ref,
                                  proj_flag=pf, proj_dir=pd, gripper=gs)


if __name__ == "__main__":
    main()
