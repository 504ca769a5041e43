"""Trajectory drift of reduced Newton micro-iteration caps (CPU f64).

The bench's |p| termination is floored below f32 resolution, so the cap IS
the per-step iteration count (bench.py BENCH_NEWTON note). Before shipping
a lower cap as the default, this probe certifies solution quality the same
way the round-4 fwd_tol=1e-3 loosening was certified: run the bench
trajectory at f64 (so solver precision does not confound) with the ship
config (fwd_tol=1e-3, hess_refresh=8) and measure final-position relative
drift of cap k vs the cap-8 ship and vs a cap-30 (fully converged) run.
Drift at or below ~1e-5 relative is far under the f32 representation drift
the on-chip path already carries (BASELINE.md round-4 check: 5.2e-6
accepted for fwd_tol=1e-3).

Usage: python scripts/probe_newton_drift.py [cloth_N=40] [T=8]
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

    dpos = np.zeros((T, 1, 3))
    dpos[:, 0, 2] = -4e-4
    acts = (jnp.asarray(dpos, jnp.float64),
            jnp.zeros((T, 1, 3), jnp.float64), jnp.zeros((T, 1), jnp.float64))

    finals = {}
    for cap in (30, 8, 6, 5, 4, 3):
        sc = bench_scene.make(cloth_N=cloth_N, dtype=jnp.float64,
                              hess_refresh=8, fwd_tol=1e-3, solver="cg",
                              max_newton_iter=cap)

        @jax.jit
        def roll(a, spec=sc.spec, params=sc.params, s0=sc.state0):
            st, _ = stepper.rollout(spec, params,
                                    jax.tree.map(jnp.asarray, s0), a)
            return st.pos

        pos = np.asarray(roll(acts))
        finals[cap] = pos
        scale = np.linalg.norm(finals[30])
        rel8 = (np.linalg.norm(pos - finals[8]) / scale) if 8 in finals else 0
        rel30 = np.linalg.norm(pos - finals[30]) / scale
        print(f"cap={cap:2d}: rel drift vs cap30 {rel30:.3e}"
              f"  vs cap8 {rel8:.3e}", flush=True)


if __name__ == "__main__":
    main()
