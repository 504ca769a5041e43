"""Per-step (chaos-isolated) Newton-cap solution error, CPU f64.

probe_newton_drift.py showed END-TRAJECTORY drift between caps is
dominated by chaotic contact switching (cap-8 vs converged cap-30 already
differs 5e-2 at N=40 after 8 steps), the same amplification BASELINE.md
documents for f32-vs-f64 forward comparisons -- so trajectory drift cannot
certify a cap. This probe isolates per-step solve quality instead: roll
the ship (cap-8) trajectory; at every step, from the SAME incoming state,
run one time_step at cap k and at cap 30 (converged) and compare the
resulting positions. Reported in the Newton termination's own units
(|dx|_inf / dt) and relative to the step's displacement.

Usage: python scripts/probe_newton_step_err.py [cloth_N=40] [T=8]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def main():
    cloth_N = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from thinshelllab_tpu.engine import stepper
    from thinshelllab_tpu.scenes import bench_scene

    caps = (30, 8, 6, 5, 4)
    scenes = {
        cap: bench_scene.make(cloth_N=cloth_N, dtype=jnp.float64,
                              hess_refresh=8, fwd_tol=1e-3, solver="cg",
                              max_newton_iter=cap)
        for cap in caps
    }
    sc8 = scenes[8]

    dpos = np.zeros((T, 1, 3))
    dpos[:, 0, 2] = -4e-4
    act_t = lambda t: tuple(
        jnp.asarray(a, jnp.float64)
        for a in (dpos[t], np.zeros((1, 3)), np.zeros((1,))))

    steps = {
        cap: jax.jit(lambda st, a, spec=scenes[cap].spec,
                     params=scenes[cap].params:
                     stepper.time_step(spec, params, st, a)[0])
        for cap in caps
    }

    st = jax.tree.map(jnp.asarray, sc8.state0)
    errs = {cap: [] for cap in caps if cap != 30}
    for t in range(T):
        a = act_t(t)
        ref = steps[30](st, a)
        for cap in errs:
            out = steps[cap](st, a)
            dx = np.asarray(out.pos - ref.pos)
            disp = np.asarray(ref.pos - st.pos)
            errs[cap].append(
                (np.abs(dx).max() / sc8.spec.dt,
                 np.linalg.norm(dx) / max(np.linalg.norm(disp), 1e-300)))
        st = steps[8](st, a)  # advance along the ship trajectory
    for cap in sorted(errs, reverse=True):
        e = np.array(errs[cap])
        print(f"cap={cap}: max |dx|inf/dt {e[:,0].max():.3e}  "
              f"max rel-to-step-displacement {e[:,1].max():.3e}", flush=True)


if __name__ == "__main__":
    main()
