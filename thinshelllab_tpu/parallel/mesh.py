"""Multi-environment batching and multi-chip scale-out.

The reference's only parallelism is process-level env vectorization (SB3
make_vec_env subprocesses, training_env.py:64) and a serial CMA-ES
population loop (run_cmaes_all.py:174). TPU-native equivalents:

  * vmap the entire env step / rollout over a batch axis (one chip)
  * shard the batch over a 1-D device mesh with shard_map; rollouts are
    independent (pure DP) and reductions (population rewards, averaged
    gradients) ride ICI via psum/pmean collectives
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.spec import SimState
from ..engine import adjoint, stepper


def make_mesh(n_devices: int | None = None, axis: str = "env") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def batched_rollout(spec, params, state0: SimState, batched_actions):
    """vmap a full rollout over a leading batch axis of the actions.
    All envs share the same initial state and params."""
    f = lambda acts: stepper.rollout(spec, params, state0, acts)
    return jax.vmap(f)(batched_actions)


def batched_rollout_rewards(spec, params, state0, batched_actions, reward_fn):
    """CMA-ES style: evaluate a population of trajectories in one batched
    rollout, returning (B,) rewards."""

    def one(acts):
        _, buffers = stepper.simulate(spec, params, state0, acts)
        return reward_fn(buffers)

    return jax.vmap(one)(batched_actions)


def sharded_population_rewards(mesh: Mesh, spec, params, state0,
                               batched_actions, reward_fn):
    """Population evaluation sharded over the device mesh (batch must divide
    the mesh size). Rewards are all-gathered so every host sees all of them."""
    axis = mesh.axis_names[0]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def run(dp, dr, dd):
        return batched_rollout_rewards(spec, params, state0, (dp, dr, dd),
                                       reward_fn)

    return run(*batched_actions)


def sharded_train_step(mesh: Mesh, spec, params, state0, seed_fn,
                       batched_actions, traj, lr=1e-3):
    """One distributed trajectory-optimization step: each device rolls out
    its shard of perturbed trajectories, runs the adjoint, and the mean
    gripper gradient (pmean over ICI) updates the shared waypoint table.

    This is the multi-chip training step validated by dryrun_multichip."""
    axis = mesh.axis_names[0]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(dp, dr, dd, traj_rep):
        def one(acts):
            _, buffers = stepper.simulate(spec, params, state0, acts)
            seed_pos, seed_ar = seed_fn(buffers)
            res = adjoint.backward(spec, params, buffers, seed_pos, seed_ar)
            return res.gripper_grad, buffers["pos"][-1]

        gg, last_pos = jax.vmap(one)((dp, dr, dd))
        g_local = jnp.mean(gg, axis=0)
        g_mean = jax.lax.pmean(g_local, axis)
        new_traj = traj_rep - lr * g_mean
        loss_proxy = jax.lax.pmean(jnp.sum(last_pos**2), axis)
        return new_traj, loss_proxy

    return run(*batched_actions, traj)
