"""Split timing: forward rollout vs fwd+bwd on the bench scene, plus
compile seconds for each program. Localizes regressions to the forward
step or the adjoint sweep (bench.py only reports the combined number).

Usage: python scripts/split_bench.py [cloth_N] [T] [reps]
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
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from thinshelllab_tpu.engine import adjoint, stepper
    from thinshelllab_tpu.scenes import bench_scene

    refresh = int(os.environ.get("BENCH_HESS_REFRESH", "2"))
    sc = bench_scene.make(cloth_N=cloth_N, dtype=jnp.float32,
                          hess_refresh=refresh)
    spec, params = sc.spec, sc.params

    dpos = np.zeros((T, 1, 3))
    dpos[:, 0, 2] = -4e-4
    acts = (jnp.asarray(dpos, jnp.float32),
            jnp.zeros((T, 1, 3), jnp.float32),
            jnp.zeros((T, 1), jnp.float32))

    def fwd(a):
        final, buffers = stepper.simulate(spec, params, sc.state0, a)
        return buffers["pos"][-1]

    def fwd_bwd(a):
        final, buffers = stepper.simulate(spec, params, sc.state0, a)
        seed_pos, seed_ar = sc.seed_loss(buffers)
        res = adjoint.backward(spec, params, buffers, seed_pos, seed_ar)
        return res.gripper_grad

    for name, fn in (("fwd", fwd), ("fwd+bwd", fwd_bwd)):
        run = jax.jit(fn)
        t0 = time.time()
        out = run(acts)
        jax.block_until_ready(out)
        c = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            out = run(acts)
        jax.block_until_ready(out)
        e = (time.time() - t0) / reps
        print(f"{name:8s} compile {c:7.1f}s  run {e:6.3f}s for {T} steps "
              f"({e / T * 1e3:7.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
