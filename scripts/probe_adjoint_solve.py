"""Probe the backward-sweep linear solve: iterations + residual quality of
MINRES (and CG, for comparison) on the TRUE Hessian at a mid-rollout bench
state, at full size on the available accelerator.

Usage: python scripts/probe_adjoint_solve.py [cloth_N] [T]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    cloth_N = int(sys.argv[1]) if len(sys.argv) > 1 else 70
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from thinshelllab_tpu.engine import elements, solver, stepper
    from thinshelllab_tpu.scenes import bench_scene

    sc = bench_scene.make(cloth_N=cloth_N, dtype=jnp.float32)
    spec, params = sc.spec, sc.params

    dpos = np.zeros((T, 1, 3))
    dpos[:, 0, 2] = -4e-4
    acts = (jnp.asarray(dpos, jnp.float32), jnp.zeros((T, 1, 3), jnp.float32),
            jnp.zeros((T, 1), jnp.float32))

    @jax.jit
    def roll(a):
        st, _ = stepper.rollout(spec, params,
                                jax.tree.map(jnp.asarray, sc.state0), a)
        return st

    st = roll(acts)
    contact, _, _ = stepper.build_contacts(spec, params, st.pos, st.pos,
                                           st.proj_flag, st.proj_dir)

    @jax.jit
    def build_groups(pos, ref):
        return elements.all_groups(spec, params, pos, ref, contact,
                                   with_hess=True, spd=False)

    groups = build_groups(st.pos, st.ref_angle)
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(0, 1, (spec.NV, 3)), jnp.float32)
    g = jnp.where(jnp.asarray(spec.frozen), 0.0, g)

    mi = jax.jit(lambda G, b: solver.solve_minres(spec, G, b,
                                                  return_iters=True))
    cg = jax.jit(lambda G, b: solver.solve_cg(spec, G, b))

    def resid(G, z, b):
        stt = solver.prepare_solver_state(spec, G, b.dtype)
        A, _ = solver._ops_from_state(spec, stt)
        r = b - A(z)
        return float(jnp.linalg.norm(r) / jnp.linalg.norm(b))

    gm = jax.jit(lambda G, b: solver.solve_gmres(spec, G, b))
    zg = gm(groups, g)
    jax.block_until_ready(zg)
    t0 = time.time(); zg = gm(groups, g); jax.block_until_ready(zg)
    print(f"GMRES : rel_resid={resid(groups, zg, g):.3e}  "
          f"t={time.time()-t0:.3f}s")

    z, it = mi(groups, g)
    jax.block_until_ready(z)
    t0 = time.time(); z, it = mi(groups, g); jax.block_until_ready(z)
    print(f"MINRES: iters={int(it)}  rel_resid={resid(groups, z, g):.3e}  "
          f"t={time.time()-t0:.3f}s")


if __name__ == "__main__":
    main()
