"""Gradient trajectory optimization driver.

Generic over TaskScenes: replaces the per-task reference drivers
(training/trajopt_{folding,lifting,...}.py) with one loop:

  rollout (lax.scan) -> reward -> seed adjoint loss -> backward sweep ->
  Adam step on the waypoint table -> motion-limit projection.

The rollout+backward pair is jitted once; each optimization iteration is two
device dispatches.
"""
from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..agent.traj_opt import TrajAgent
from ..engine import adjoint, stepper
from ..optim.adam import Adam
from ..scenes.base import TaskScene


class TrajOptDriver:
    def __init__(
        self,
        scene: TaskScene,
        tot_timestep: int,
        lr: float = 1e-3,
        max_dist: float = 0.015,
        vertical_only: bool = False,
        with_param_grad: bool = False,
        skip_steps: int = 0,
        accumulate_grad: bool = False,
        save_dir: Optional[str] = None,
        reward_name: str = "default",
        fwd_chunk: Optional[int] = None,
    ):
        self.scene = scene
        self.reward_name = reward_name
        # objective variant: matching seed when the scene defines one
        # (reference per-driver flags, e.g. trajopt_interact.py --sep /
        # trajopt_balancing.py --throwing select reward+loss pairs)
        self._seed_loss = scene.seed_for(reward_name)
        self.T = tot_timestep
        self.agent = TrajAgent(tot_timestep, scene.n_part,
                               max_moving_dist=scene.max_moving_dist)
        self.adam = Adam((tot_timestep, scene.n_part, 6), lr)
        self.adam_state = self.adam.init()
        self.max_dist = max_dist
        self.save_dir = save_dir
        self.history = []
        self.best_reward = -np.inf
        self.skip_steps = skip_steps
        self.accumulate_grad = accumulate_grad

        spec, params = scene.spec, scene.params

        def _forward(actions):
            return stepper.simulate(spec, params, scene.state0, actions)

        if fwd_chunk:
            # host-stitched rollout chunks (bit-identical; works around the
            # on-chip long-scan worker crash, stepper.simulate_chunked)
            def _forward(actions):  # noqa: F811
                return stepper.simulate_chunked(spec, params, scene.state0,
                                                actions, fwd_chunk)

        def _backward(buffers, seed_pos, seed_ar):
            return adjoint.backward(
                spec, params, buffers, seed_pos, seed_ar,
                vertical_only=vertical_only,
                with_param_grad=with_param_grad,
                skip_steps=skip_steps,
            )

        # simulate_chunked drives its own per-chunk jits from a host loop
        self._forward = _forward if fwd_chunk else jax.jit(_forward)
        self._backward = jax.jit(_backward)

    def iteration(self, render_cb=None):
        t0 = time.time()
        actions = self.agent.actions()
        final, buffers = self._forward(actions)
        reward = float(self.scene.reward(buffers, self.reward_name))

        seed_pos, seed_ar = self._seed_loss(buffers)
        res = self._backward(buffers, seed_pos, seed_ar)
        gg = res.gripper_grad
        if self.accumulate_grad:
            gg = np.asarray(gg)
            for step in range(self.T - 2, 1, -1):
                for j in range(self.scene.n_part):
                    if (
                        self.agent.calculate_dist(step + 1, self.max_dist, j)
                        > self.agent.max_moving_dist - 5e-5
                    ):
                        gg[step, j] += gg[step + 1, j]
            gg = jnp.asarray(gg)

        self.adam_state, new_traj = self.adam.step(
            self.adam_state, jnp.asarray(self.agent.traj), gg
        )
        self.agent.traj = np.array(new_traj)  # writable copy (fix_action mutates)
        self.agent.fix_action(self.max_dist)

        self.history.append(reward)
        if reward > self.best_reward:
            self.best_reward = reward
            if self.save_dir:
                os.makedirs(self.save_dir, exist_ok=True)
                self.agent.save(os.path.join(self.save_dir, "best_traj.npy"))
        if self.save_dir:
            np.save(os.path.join(self.save_dir, "plot_data.npy"),
                    np.asarray(self.history))
            # reference parity: reward-curve PNG refreshed every iteration
            # (trajopt_folding.py:141-142)
            from ..utils.plotting import save_reward_curve

            save_reward_curve(os.path.join(self.save_dir, "plot.png"),
                              self.history)
        if render_cb is not None:
            render_cb(buffers)
        return {
            "reward": reward,
            "wall_time": time.time() - t0,
            "grad_norm": float(jnp.linalg.norm(res.gripper_grad)),
            "param_grad": res.param_grad,
        }

    def run(self, iters: int, verbose=True):
        for i in range(iters):
            info = self.iteration()
            if verbose:
                print(
                    f"iter {i}: reward {info['reward']:.6f} "
                    f"|g| {info['grad_norm']:.4g} t {info['wall_time']:.2f}s"
                )
        return self.history
