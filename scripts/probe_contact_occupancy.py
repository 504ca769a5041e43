"""Size the active-contact-compaction lever: per contact pair, how many of
the padded constraint slots are ACTIVE in a settled bench state, and which
split class (diag / mm / general gather-scatter) the pair lands in. The
per-CG-iteration contact matvec pays for the full padded capacity
(selection matmuls scale with slot count; gather/scatter with index
count), while only the active slots contribute -- the ratio bounds the
win from compacting active slots once per operator build.

Usage: python scripts/probe_contact_occupancy.py [cloth_N] [T] [--cpu]
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

    from thinshelllab_tpu.engine import elements, stepper
    from thinshelllab_tpu.scenes import bench_scene

    sc = bench_scene.make(cloth_N=cloth_N, dtype=jnp.float32)
    spec, params = sc.spec, sc.params

    act = (jnp.asarray(np.array([[0.0, 0.0, -4e-4]]), jnp.float32),
           jnp.zeros((1, 3), jnp.float32), jnp.zeros((1,), jnp.float32))
    step = jax.jit(lambda s: stepper.time_step(spec, params, s, act)[0])
    st = jax.tree.map(jnp.asarray, sc.state0)
    for _ in range(T):
        st = step(st)

    contact, _, _ = stepper.build_contacts(
        spec, params, st.pos, st.pos, st.proj_flag, st.proj_dir)
    active = np.asarray(contact.active)
    con = spec.contact
    split = elements.contact_static_split(spec)
    cls = {}
    if split is not None:
        diag_r, mm_r, gen_r = split
        for (cs, cnt, *_rest) in diag_r:
            cls[cs] = "diag"
        for (cs, cnt, *_rest) in mm_r:
            cls[cs] = "mm"
        for (cs, cnt) in gen_r:
            cls[cs] = "gen"
    tot_cap = tot_act = 0
    gen_cap = gen_act = 0
    for pi, (cq_start, count, fs, nf, is_self) in enumerate(con.pair_desc):
        a = int(active[cq_start : cq_start + count].sum())
        kind = cls.get(cq_start, "gen")
        tot_cap += count
        tot_act += a
        if kind == "gen":
            gen_cap += count
            gen_act += a
        print(f"pair {pi}: class={kind:4s} cap={count:6d} active={a:6d} "
              f"({100.0 * a / max(count, 1):5.1f}%) self={bool(is_self)}")
    print(f"TOTAL cap={tot_cap} active={tot_act} "
          f"({100.0 * tot_act / max(tot_cap, 1):5.1f}%)")
    print(f"GEN   cap={gen_cap} active={gen_act} "
          f"({100.0 * gen_act / max(gen_cap, 1):5.1f}%)")


if __name__ == "__main__":
    main()
