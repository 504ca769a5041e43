"""Compile-only memory analysis of the bench fwd+bwd program at a given
batch size: prints XLA's memory_analysis() (argument/output/temp/generated
code sizes in bytes) without running a step. Diagnoses the batched-rollout
collapse (round-5: batch=8 ran 50x below the batch-linear expectation with
hbm_util 0.0024 -- the HBM-capacity-spill signature) by showing how temp
allocation scales with BENCH_BATCH.

Usage: [BENCH_*size knobs] python scripts/mem_analysis.py [B ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".xla_bench_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from thinshelllab_tpu.engine import adjoint, stepper
    from thinshelllab_tpu.scenes import bench_scene

    cloth_N = int(os.environ.get("BENCH_CLOTH_N", "70"))
    T = int(os.environ.get("BENCH_STEPS", "8"))
    refresh = int(os.environ.get("BENCH_HESS_REFRESH", "8"))
    tape = os.environ.get("BENCH_TAPE_CONTACTS", "1") == "1"
    batches = [int(a) for a in sys.argv[1:]] or [1, 4, 8]

    sc = bench_scene.make(cloth_N=cloth_N, dtype=jnp.float32,
                          hess_refresh=refresh, fwd_tol=1e-3)
    spec, params = sc.spec, sc.params

    def fwd_bwd(acts):
        final, buffers = stepper.simulate(spec, params, sc.state0, acts,
                                          save_contacts=tape)
        seed_pos, seed_ar = sc.seed_loss(buffers)
        res = adjoint.backward(spec, params, buffers, seed_pos, seed_ar,
                               matmul_precision="solves")
        return res.gripper_grad, buffers["pos"][-1]

    for B in batches:
        dpos = np.zeros((B, T, 1, 3), np.float32)
        dpos[..., 2] = -4e-4
        acts = (jnp.asarray(dpos), jnp.zeros((B, T, 1, 3), jnp.float32),
                jnp.zeros((B, T, 1), jnp.float32))
        if B == 1:
            acts = jax.tree.map(lambda a: a[0], acts)
            run = jax.jit(fwd_bwd)
        else:
            run = jax.jit(jax.vmap(fwd_bwd))
        t0 = time.time()
        compiled = run.lower(acts).compile()
        dt = time.time() - t0
        try:
            ma = compiled.memory_analysis()
            out = {"B": B, "compile_s": round(dt, 1),
                   "temp_GB": round(ma.temp_size_in_bytes / 1e9, 3),
                   "arg_GB": round(ma.argument_size_in_bytes / 1e9, 3),
                   "out_GB": round(ma.output_size_in_bytes / 1e9, 3),
                   "code_MB": round(
                       ma.generated_code_size_in_bytes / 1e6, 1)}
        except Exception as e:
            out = {"B": B, "compile_s": round(dt, 1),
                   "memory_analysis_error": str(e)[:200]}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
