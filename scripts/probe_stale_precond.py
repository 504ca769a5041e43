"""GO/NO-GO for carrying the adjoint BCR preconditioner across backward
steps (refresh every K): the factorization (batched jnp.linalg.inv custom
calls + level matmuls, ~12-16 ms/step in the round-5 on-chip trace) would
be rebuilt once per K adjoint steps instead of every step, at the price of
preconditioning step t's TRUE Hessian with the factorization of step
t+K's. GMRES iteration counts are hardware-independent, so this CPU probe
predicts the on-chip iteration-count penalty; the lever only pays if the
penalty is small vs the ~12 ms/step factorization saving.

Method: roll the bench scene T steps keeping every per-step state; for
each lag K in {0,1,2,4}, solve H_t z = g with the preconditioner built
from step min(t+K, T-1)'s state (the backward sweep walks t = T-1 .. 0,
so a refresh-every-K scheme preconditions with a LATER step's operator).

Usage: python scripts/probe_stale_precond.py [cloth_N] [T] [--cpu]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    sys.argv.remove("--cpu")

import jax.numpy as jnp
import numpy as np


def main():
    cloth_N = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from thinshelllab_tpu.engine import elements, gridsolve, solver, stepper
    from thinshelllab_tpu.ops import spd
    from thinshelllab_tpu.scenes import bench_scene

    sc = bench_scene.make(cloth_N=cloth_N, dtype=jnp.float32)
    spec, params = sc.spec, sc.params

    act = (jnp.asarray(np.array([[0.0, 0.0, -4e-4]]), jnp.float32),
           jnp.zeros((1, 3), jnp.float32), jnp.zeros((1,), jnp.float32))

    step = jax.jit(lambda s: stepper.time_step(spec, params, s, act)[0])
    st = jax.tree.map(jnp.asarray, sc.state0)
    states = []
    for _ in range(T):
        st = step(st)
        states.append(st)

    ns = elements.static_block_count(spec)
    grid_plan = gridsolve.build_grid_plan(spec)
    slot_lists = gridsolve.contact_coupling_slots(spec, grid_plan)

    def system(s):
        """(A, groups-state, preconditioner) of one step's TRUE Hessian --
        mirrors solver.solve_gmres's construction exactly."""
        contact, _, _ = stepper.build_contacts(
            spec, params, s.pos, s.pos, s.proj_flag, s.proj_dir)
        groups = elements.all_groups(spec, params, s.pos, s.ref_angle,
                                     contact, with_hess=True, spd=False)
        stt = solver.prepare_solver_state(spec, groups, jnp.float32)
        A, _ = solver._ops_from_state(spec, stt)
        Dinv = spd.abs_inv_3x3(stt["D"])
        dia_pc = gridsolve.add_contact_couplings(
            spec, grid_plan, slot_lists, stt["dia"],
            groups["idx"][ns:], groups["H"][ns:])
        pre = gridsolve.GridPreconditioner(spec, grid_plan, dia_pc, Dinv,
                                           stt.get("Dc"))
        return A, pre

    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(0, 1, (spec.NV, 3)), jnp.float32)
    g = jnp.where(jnp.asarray(spec.frozen), 0.0, g)

    systems = [system(s) for s in states]
    restart = min(spec.cg_max_iter, 64)

    for K in (0, 1, 2, 4):
        tot, worst, relw = 0, 0, 0.0
        for t in range(T):
            A, _ = systems[t]
            _, pre = systems[min(t + K, T - 1)]
            z, it = solver._gmres_loop(A, pre.apply, g, spec.cg_tol,
                                       restart, spec.cg_max_iter,
                                       return_iters=True)
            r = g - A(z)
            rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(g))
            tot += int(it)
            worst = max(worst, int(it))
            relw = max(relw, rel)
        print(f"lag K={K}: total iters={tot} (avg {tot/T:.1f}, "
              f"worst {worst})  worst rel_resid={relw:.3e}")


if __name__ == "__main__":
    main()
