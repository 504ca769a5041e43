"""A/B harness: Pallas DIA SpMV vs the XLA padded-slices einsum, on the
real TPU with the bench scene's actual store (f32). Prints correctness and
per-apply wall time for both."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from thinshelllab_tpu.engine import elements, stepper
from thinshelllab_tpu.ops import dia_spmv
from thinshelllab_tpu.scenes import bench_scene

N = int(os.environ.get("AB_CLOTH_N", "70"))
REPS = int(os.environ.get("AB_REPS", "100"))

sc = bench_scene.make(cloth_N=N, dtype=jnp.float32, solver="cg")
spec, params = sc.spec, sc.params
state = sc.state0
pos = jnp.asarray(state.pos)
contact, _, _ = stepper.build_contacts(
    spec, params, pos, pos, jnp.asarray(state.proj_flag),
    jnp.asarray(state.proj_dir))
groups = elements.all_groups(spec, params, pos,
                             jnp.asarray(state.ref_angle), contact,
                             with_hess=True, spd=True)
dia = jax.jit(lambda g: elements.assemble_dia(spec, g, jnp.float32))(groups)
dia.block_until_ready()
plan = spec.dia
NV, NVp = spec.NV, plan.NVp
print(f"NV={NV} NVp={NVp} n_off={len(plan.offsets)} "
      f"store={dia.size * 4 / 1e6:.1f} MB")

rng = np.random.default_rng(0)
x2 = jnp.zeros((3, NVp), jnp.float32).at[:, : NV].set(
    jnp.asarray(rng.normal(size=(3, NV)), jnp.float32))


@jax.jit
def xla_apply(dia, x2):
    P = plan.max_abs_off
    xpad = jnp.concatenate(
        [jnp.zeros((3, P), x2.dtype), x2, jnp.zeros((3, P), x2.dtype)],
        axis=1)
    shifted = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(xpad, P + o, NVp, axis=1)
         for o in plan.offsets], axis=1)
    return jnp.einsum("oijn,jon->in", dia, shifted)


def bench(fn, *args):
    out = fn(*args)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    out.block_until_ready()
    return out, (time.perf_counter() - t0) / REPS


y_x, t_x = bench(xla_apply, dia, x2)
y_p, t_p = bench(lambda d, x: dia_spmv.dia_spmv(d, x, plan.offsets), dia, x2)
err = float(jnp.max(jnp.abs(y_p - y_x)) / (jnp.max(jnp.abs(y_x)) + 1e-30))
bw = dia.size * 4 / t_p / 1e9
print(f"xla    {t_x * 1e6:9.1f} us/apply")
print(f"pallas {t_p * 1e6:9.1f} us/apply  ({bw:.0f} GB/s store stream)")
print(f"rel err {err:.2e}")
assert err < 1e-5, err
