"""Checkpoint / resume.

The reference has five mechanisms (SURVEY section 5); the TPU-native
equivalents here:
  1. sim state save/load (reference BaseScene.save_state/load_state: .pt of
     pos/vel) -> npz of the full SimState pytree
  2. full warm-start save_all/load_all (Scene_balancing:202-222: gripper
     bundle + state + latched projection flags) -> the same npz (SimState
     already contains gripper pose, pad locals, and latched proj state)
  3. best-trajectory npy (TrajAgent.save/load)
  4. SB3 checkpoints (delegated to SB3 when installed)
  5. per-generation CMA-ES trajectories (CMAESDriver.best_agent().save)
"""
from __future__ import annotations

import numpy as np

from ..core.spec import GripperState, SimState


def save_state(state: SimState, path: str):
    np.savez(
        path,
        pos=np.asarray(state.pos),
        vel=np.asarray(state.vel),
        ref_angle=np.asarray(state.ref_angle),
        proj_flag=np.asarray(state.proj_flag),
        proj_dir=np.asarray(state.proj_dir),
        g_pos=np.asarray(state.gripper.pos),
        g_rot=np.asarray(state.gripper.rot),
        g_dist=np.asarray(state.gripper.dist),
        g_pad_local=np.asarray(state.gripper.pad_local),
    )


def load_state(path: str) -> SimState:
    z = np.load(path)
    return SimState(
        pos=z["pos"],
        vel=z["vel"],
        ref_angle=z["ref_angle"],
        proj_flag=z["proj_flag"],
        proj_dir=z["proj_dir"],
        gripper=GripperState(
            pos=z["g_pos"], rot=z["g_rot"], dist=z["g_dist"],
            pad_local=z["g_pad_local"],
        ),
    )
