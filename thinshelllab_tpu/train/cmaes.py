"""CMA-ES policy search with BATCHED population rollouts.

The reference (training/run_cmaes_all.py) evaluates its population serially
through the `cma` package; here the strategy itself is implemented natively
(standard (mu/mu_w, lambda)-CMA-ES with rank-1 + rank-mu updates) and the
whole population is evaluated as ONE vmapped rollout -- on a device mesh the
batch shards across chips (parallel/mesh.sharded_population_rewards).

Genome encoding matches the reference (:88-114): abs_step x 6 x n_part
deltas in [0,10] around 5, scaled by scaling = 5/(sub_steps*3e-4) for
positions and 5/(sub_steps*1e-2) for rotations, integrated into absolute
waypoints and motion-limited by fix_action(0.015).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..agent.traj_opt import TrajAgent
from ..engine import stepper
from ..scenes.base import TaskScene, effector_total_forces
from ..core.spec import GripperState, SimState


class CMAES:
    """Minimal, dependency-free CMA-ES (Hansen's standard parameterization)."""

    def __init__(self, x0, sigma0, popsize=None, seed=0):
        self.dim = len(x0)
        self.mean = np.asarray(x0, np.float64)
        self.sigma = float(sigma0)
        self.lam = popsize or 4 + int(3 * np.log(self.dim))
        self.mu = self.lam // 2
        w = np.log(self.mu + 0.5) - np.log(np.arange(1, self.mu + 1))
        self.weights = w / w.sum()
        self.mueff = 1.0 / np.sum(self.weights**2)
        n = self.dim
        self.cc = (4 + self.mueff / n) / (n + 4 + 2 * self.mueff / n)
        self.cs = (self.mueff + 2) / (n + self.mueff + 5)
        self.c1 = 2 / ((n + 1.3) ** 2 + self.mueff)
        self.cmu = min(
            1 - self.c1,
            2 * (self.mueff - 2 + 1 / self.mueff) / ((n + 2) ** 2 + self.mueff),
        )
        self.damps = 1 + 2 * max(0, np.sqrt((self.mueff - 1) / (n + 1)) - 1) + self.cs
        self.pc = np.zeros(n)
        self.ps = np.zeros(n)
        self.C = np.eye(n)
        self.B = np.eye(n)
        self.D = np.ones(n)
        self.chiN = np.sqrt(n) * (1 - 1 / (4 * n) + 1 / (21 * n * n))
        self.rng = np.random.default_rng(seed)
        self.gen = 0
        self.best_x = self.mean.copy()
        self.best_f = np.inf

    def ask(self):
        z = self.rng.standard_normal((self.lam, self.dim))
        y = z @ (self.B * self.D).T
        return self.mean[None, :] + self.sigma * y

    def tell(self, X, fitness):
        """fitness: to MINIMIZE (reference convention: negative reward)."""
        fitness = np.asarray(fitness)
        order = np.argsort(fitness)
        if fitness[order[0]] < self.best_f:
            self.best_f = fitness[order[0]]
            self.best_x = X[order[0]].copy()
        sel = X[order[: self.mu]]
        y = (sel - self.mean[None, :]) / self.sigma
        y_w = self.weights @ y
        self.mean = self.mean + self.sigma * y_w

        C_inv_sqrt = self.B @ np.diag(1.0 / self.D) @ self.B.T
        self.ps = (1 - self.cs) * self.ps + np.sqrt(
            self.cs * (2 - self.cs) * self.mueff
        ) * (C_inv_sqrt @ y_w)
        hsig = np.linalg.norm(self.ps) / np.sqrt(
            1 - (1 - self.cs) ** (2 * (self.gen + 1))
        ) / self.chiN < 1.4 + 2 / (self.dim + 1)
        self.pc = (1 - self.cc) * self.pc + hsig * np.sqrt(
            self.cc * (2 - self.cc) * self.mueff
        ) * y_w
        artmp = y
        self.C = (
            (1 - self.c1 - self.cmu) * self.C
            + self.c1
            * (
                np.outer(self.pc, self.pc)
                + (not hsig) * self.cc * (2 - self.cc) * self.C
            )
            + self.cmu * (artmp.T * self.weights) @ artmp
        )
        self.sigma = self.sigma * np.exp(
            (self.cs / self.damps) * (np.linalg.norm(self.ps) / self.chiN - 1)
        )
        self.gen += 1
        if self.gen % max(1, self.dim // 10) == 0:
            self.C = np.triu(self.C) + np.triu(self.C, 1).T
            d, B = np.linalg.eigh(self.C)
            self.D = np.sqrt(np.maximum(d, 1e-20))
            self.B = B

    @property
    def result(self):
        return type("R", (), {"xbest": self.best_x, "fbest": self.best_f})


def decode_genome(x, tot_timestep, abs_step, n_part, max_dist=0.015,
                  skip_first=0):
    """Genome -> motion-limited waypoint table (reference :98-114)."""
    agent = TrajAgent(tot_timestep, n_part)
    sub_steps = int(tot_timestep / abs_step)
    scaling = 5.0 / (sub_steps * 0.0003)
    scaling_angle = 5.0 / (sub_steps * 0.01)
    g = np.asarray(x).reshape(abs_step, n_part, 6)
    for ii in range(abs_step):
        for jj in range(sub_steps):
            if ii == 0 and jj == 0:
                continue
            i = ii * sub_steps + jj
            if i >= tot_timestep:
                break
            if i < skip_first:
                agent.traj[i] = agent.traj[i - 1]
                continue
            agent.traj[i, :, 0:3] = (
                agent.traj[i - 1, :, 0:3] + (g[ii, :, 0:3] - 5) / sub_steps / scaling
            )
            agent.traj[i, :, 3:6] = (
                agent.traj[i - 1, :, 3:6]
                + (g[ii, :, 3:6] - 5) / sub_steps / scaling_angle
            )
    agent.fix_action(max_dist)
    return agent


def rollout_stop_step(spec, params, buffers):
    """Early-stop accounting over a completed rollout tape: the first step
    whose state the reference would abort on (run_cmaes_all.py:124-161 via
    BaseScene.check_early_stop:1559-1584 -- any effector force component
    > 10 N, NaN positions, or contact lost after frame 10).

    EXACT parity with the reference's live per-step abort, not an
    approximation: check_early_stop's inputs (effector_total_forces and the
    NaN test) depend ONLY on positions and the gripper pose at step t --
    both on the tape -- so evaluating them post-hoc over the tape finds the
    identical first-bad step, and the cumsum latch reproduces 'no later
    step runs' semantics for the reward accounting. Asserted step-for-step
    against a serial check_early_stop replay in
    tests/test_training.py::test_rollout_stop_step_matches_serial_replay.

    Returns (stop_step, early)."""
    T = buffers["pos"].shape[0]
    if spec.gripper.n_part == 0:
        return T, False

    def force_at(t):
        st = SimState(
            pos=buffers["pos"][t], vel=buffers["pos"][t] * 0,
            ref_angle=buffers["ref_angle"][t],
            proj_flag=buffers["final_proj_flag"],
            proj_dir=buffers["final_proj_dir"],
            gripper=GripperState(
                pos=buffers["gripper_pos"][t],
                rot=buffers["gripper_rot"][t],
                dist=buffers["gripper_dist"][t],
                pad_local=buffers["pad_local"][t],
            ),
        )
        return effector_total_forces(spec, params, st)

    forces = jax.vmap(force_at)(jnp.arange(T))  # (T, n_part, 3)
    bad = jnp.any(jnp.abs(forces) > 10.0, axis=(1, 2))
    bad = bad | jnp.any(jnp.isnan(buffers["pos"]), axis=(1, 2))
    no_contact = (
        jnp.any(jnp.linalg.norm(forces, axis=2) < 0.2, axis=1)
        & (jnp.arange(T) > 10)
    )
    bad = bad | no_contact
    stopped = jnp.cumsum(bad.astype(jnp.int32)) > 0
    stop_step = jnp.sum(~stopped)
    return stop_step, jnp.any(bad)


@dataclasses.dataclass
class CMAESDriver:
    scene: TaskScene
    tot_timestep: int
    abs_step: int
    pop_size: int = 8
    sigma: float = 1.0
    reward_name: str = "default"
    max_dist: float = 0.002
    seed: int = 0
    skip_first: int = 0
    mesh: object = None  # jax.sharding.Mesh: shard the population over chips

    def __post_init__(self):
        n_part = self.scene.n_part
        self.es = CMAES(
            np.full(self.abs_step * 6 * n_part, 5.0), self.sigma,
            popsize=self.pop_size, seed=self.seed,
        )
        spec, params = self.scene.spec, self.scene.params
        reward_fn = self.scene.rewards[self.reward_name]

        def eval_one(actions):
            final, buffers = stepper.simulate(spec, params, self.scene.state0,
                                              actions)
            task_reward = reward_fn(buffers)
            stop_step, early = rollout_stop_step(spec, params, buffers)
            reward = stop_step / self.tot_timestep * 0.1
            reward = reward + jnp.where(early, 0.0, task_reward + 5.0)
            return reward

        if self.mesh is not None:
            # shard the population over the device mesh; rewards gather back
            from jax.sharding import PartitionSpec as P

            axis = self.mesh.axis_names[0]
            self._batch_eval = jax.jit(
                jax.shard_map(
                    lambda a, b, c: jax.vmap(eval_one)((a, b, c)),
                    mesh=self.mesh,
                    in_specs=(P(axis), P(axis), P(axis)),
                    out_specs=P(axis),
                    check_vma=False,
                )
            )
            self._batch_eval_packed = False
        else:
            self._batch_eval = jax.jit(jax.vmap(eval_one))
            self._batch_eval_packed = True
        self.history = []

    def _genomes_to_actions(self, X):
        acts = [
            decode_genome(x, self.tot_timestep, self.abs_step,
                          self.scene.n_part, skip_first=self.skip_first).actions()
            for x in X
        ]
        return tuple(jnp.stack([a[i] for a in acts]) for i in range(3))

    def generation(self):
        X = self.es.ask()
        actions = self._genomes_to_actions(X)
        if self._batch_eval_packed:
            rewards = np.asarray(self._batch_eval(actions))
        else:
            rewards = np.asarray(self._batch_eval(*actions))
        self.es.tell(X, -rewards)
        self.history.extend((-rewards).tolist())
        return {
            "best_reward": -self.es.best_f,
            "gen_best": float(rewards.max()),
            "gen_mean": float(rewards.mean()),
        }

    def best_agent(self):
        return decode_genome(self.es.result.xbest, self.tot_timestep,
                             self.abs_step, self.scene.n_part,
                             skip_first=self.skip_first)
