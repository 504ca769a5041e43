"""A/B: warm-started vs cold adjoint Krylov solves on the backward sweep.

Prints per-step iteration counts and the gripper-gradient relative
difference. Iteration counts are hardware-independent, so CPU runs of this
script validate the TPU win. Usage: python scripts/ab_warmstart.py [N] [T]
(pass --cpu first on a TPU-pinned image via scripts' force_cpu wrapper or
run under tests/conftest-style forcing)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from thinshelllab_tpu.engine import adjoint, stepper
    from thinshelllab_tpu.scenes import bench_scene

    sc = bench_scene.make(cloth_N=N, dtype=jnp.float32, hess_refresh=2)
    spec, params = sc.spec, sc.params
    dpos = np.zeros((T, 1, 3))
    dpos[:, 0, 2] = -4e-4
    acts = (jnp.asarray(dpos, jnp.float32),
            jnp.zeros((T, 1, 3), jnp.float32),
            jnp.zeros((T, 1), jnp.float32))

    final, buffers = jax.jit(
        lambda a: stepper.simulate(spec, params, sc.state0, a))(acts)
    jax.block_until_ready(buffers["pos"])
    seed_pos, seed_ar = sc.seed_loss(buffers)

    def bwd(warm):
        return jax.jit(lambda: adjoint.backward(
            spec, params, buffers, seed_pos, seed_ar,
            warm_start=warm, debug_iters=True))

    out = {}
    for warm in (False, True):
        run = bwd(warm)
        res = run()
        jax.block_until_ready(res.gripper_grad)
        t0 = time.time()
        res = run()
        jax.block_until_ready(res.gripper_grad)
        dt = time.time() - t0
        iters = np.asarray(res.pos_grad0)
        out[warm] = (res.gripper_grad, iters, dt)
        print(f"warm={warm}: iters/step {iters.tolist()} "
              f"total {int(iters.sum())}  bwd wall {dt:.2f}s")
    gg_c, _, _ = out[False]
    gg_w, _, _ = out[True]
    denom = float(jnp.max(jnp.abs(gg_c))) + 1e-30
    rel = float(jnp.max(jnp.abs(gg_w - gg_c))) / denom
    print(f"gripper_grad max rel diff {rel:.3e}")


if __name__ == "__main__":
    main()
