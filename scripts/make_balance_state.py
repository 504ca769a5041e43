"""Generate the bundled pre-grasped balancing warm start.

The reference ships this as `data/balance_state/` (half_gripper_dist -0.002,
loaded by Scene_balancing.load_all:202-222); we regenerate it with
scenes.balancing.make_grasped_state and bundle one npz.

Usage: python scripts/make_balance_state.py [--cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

p = argparse.ArgumentParser()
p.add_argument("--cpu", action="store_true")
args = p.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from thinshelllab_tpu.scenes import balancing  # noqa: E402
from thinshelllab_tpu.utils import checkpoint  # noqa: E402

on_tpu = jax.devices()[0].platform != "cpu"
scene = balancing.make(solver="cg" if on_tpu else "dense",
                       dtype=jnp.float32 if on_tpu else jnp.float64)
st = balancing.make_grasped_state(scene)
pos = np.asarray(st.pos)
assert np.all(np.isfinite(pos)), "grasp rollout diverged"
n_contacts = int(np.asarray(st.proj_flag).sum())
print("latched contact queries:", n_contacts)
assert n_contacts > 0, "gripper never reached the sheet"
path = balancing.bundled_state_path()
checkpoint.save_state(st, path)
print("saved", path)
sys.exit(0)
