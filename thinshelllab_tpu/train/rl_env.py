"""Gymnasium environment over the TPU-native simulator.

Mirrors the reference training/RL_env.py: Box action space of +-0.001 per
(part x [dpos, drot]) dimension, the subsampled observation vector
(BaseScene.get_observation_kernel), reward = exp(instantaneous task reward),
termination on time limit or early-stop. The jitted step makes each env
interaction one device dispatch; `BatchedEnv` runs N environments as one
vmapped state batch (the TPU replacement for SB3's subprocess vec envs,
training_env.py:64).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

try:
    import gymnasium
    from gymnasium import spaces

    _GYM = True
except Exception:  # pragma: no cover
    gymnasium = object
    _GYM = False

from ..engine import stepper
from ..scenes import registry
from ..scenes.base import check_early_stop, observation


def _state_buffers(scene, state):
    """Wrap a single state as a T=1 buffer dict for the buffer-based reward
    functions (instantaneous reward, as the reference RL env computes)."""
    return {
        "pos": state.pos[None],
        "ref_angle": state.ref_angle[None],
        "gripper_pos": state.gripper.pos[None],
        "gripper_rot": state.gripper.rot[None],
        "gripper_dist": state.gripper.dist[None],
        "pad_local": state.gripper.pad_local[None],
    }


class Env(gymnasium.Env if _GYM else object):
    metadata = {"render_modes": []}

    def __init__(self, sys_name="folding", time_step=100, reward_name=None,
                 Kb=100.0, mu=1.0, scene=None, **scene_kwargs):
        if scene is None:
            scene = registry.make_scene(sys_name, kb=Kb,
                                        mu_cloth_elastic=mu, **scene_kwargs)
        self.scene = scene
        self.spec = scene.spec
        self.n_part = scene.n_part
        self.n_actions = 6 * max(self.n_part, 1)
        self.time_limit = time_step
        self.reward_fn = registry.resolve_reward(scene, reward_name)

        obs0 = observation(self.spec, jax.tree.map(jnp.asarray, scene.state0))
        self.n_observations = int(obs0.shape[0])
        if _GYM:
            self.action_space = spaces.Box(-0.001, 0.001,
                                           shape=(self.n_actions,),
                                           dtype=np.float32)
            self.observation_space = spaces.Box(-1000, 1000,
                                                shape=(self.n_observations,),
                                                dtype=np.float32)

        spec, params = scene.spec, scene.params

        def _step(state, dpos, drot):
            new_state, _ = stepper.time_step(spec, params, state,
                                             (dpos, drot,
                                              jnp.zeros((max(self.n_part, 1),),
                                                        spec.dtype)[: self.n_part]))
            obs = observation(spec, new_state)
            rew = self.reward_fn(_state_buffers(scene, new_state))
            stop = check_early_stop(spec, params, new_state, self.time_limit,
                                    rl=True) if self.n_part else False
            return new_state, obs, rew, stop

        self._step = jax.jit(_step)
        self.state = None
        self.t = 0

    def reset(self, seed=None, options=None):
        self.state = jax.tree.map(jnp.asarray, self.scene.state0)
        self.t = 0
        obs = np.asarray(observation(self.spec, self.state), np.float32)
        return obs, {}

    def step(self, action):
        a = np.asarray(action, np.float64).reshape(max(self.n_part, 1), 6)
        dpos = jnp.asarray(a[: self.n_part, 0:3], self.spec.dtype)
        drot = jnp.asarray(a[: self.n_part, 3:6], self.spec.dtype)
        self.t += 1
        self.state, obs, rew, stop = self._step(self.state, dpos, drot)
        reward = float(np.exp(float(rew)))
        done = bool(stop) or self.t >= self.time_limit
        obs = np.asarray(obs, np.float32)
        if done:
            obs = np.zeros_like(obs)
            reward = 0.0
        return obs, reward, done, done, {}

    def close(self):
        pass


class BatchedEnv:
    """N environments stepped as one vmapped batch on-device.

    Per-env termination matches the reference env (RL_env.py step):
    time limit OR check_early_stop (NaN / force-diverged states). Done
    environments auto-reset to the initial state (the SB3 vec-env
    convention), so envs may be at different episode times.

    API: reset() -> (N, obs); step((N, n_actions)) -> (obs, rew, done)."""

    def __init__(self, scene, n_envs: int, time_limit=100, reward_name=None):
        self.scene = scene
        self.n = n_envs
        self.time_limit = time_limit
        spec, params = scene.spec, scene.params
        reward_fn = registry.resolve_reward(scene, reward_name)
        n_part = scene.n_part
        s0 = jax.tree.map(jnp.asarray, scene.state0)

        def one(state, act, t):
            dpos = act[:, 0:3]
            drot = act[:, 3:6]
            new_state, _ = stepper.time_step(
                spec, params, state,
                (dpos, drot, jnp.zeros((n_part,), spec.dtype)),
            )
            rew = reward_fn(_state_buffers(scene, new_state))
            stop = (check_early_stop(spec, params, new_state, t, rl=True)
                    if n_part else jnp.asarray(False))
            done = stop | (t + 1 >= time_limit)
            # auto-reset: done envs restart from state0 with t = 0
            new_state = jax.tree.map(
                lambda a, b: jnp.where(done, b, a), new_state, s0)
            obs = observation(spec, new_state)
            new_t = jnp.where(done, 0, t + 1)
            return new_state, obs, rew, done, new_t

        self._step = jax.jit(jax.vmap(one))
        self.states = None
        self.t = None

    def reset(self):
        s0 = jax.tree.map(jnp.asarray, self.scene.state0)
        self.states = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (self.n,) + x.shape), s0
        )
        self.t = jnp.zeros((self.n,), jnp.int32)
        obs = jax.vmap(lambda s: observation(self.scene.spec, s))(self.states)
        return np.asarray(obs, np.float32)

    def step(self, actions):
        acts = jnp.asarray(actions, self.scene.spec.dtype).reshape(
            self.n, self.scene.n_part, 6
        )
        self.states, obs, rew, done, self.t = self._step(
            self.states, acts, self.t)
        return (np.asarray(obs, np.float32), np.exp(np.asarray(rew)),
                np.asarray(done))


def make_sb3_vec_env(sys_name, n_envs, **kwargs):
    """SB3-compatible vectorized env if stable_baselines3 is installed
    (parity with reference training_env.py); otherwise raises ImportError."""
    from stable_baselines3.common.env_util import make_vec_env

    return make_vec_env(lambda: Env(sys_name, **kwargs), n_envs=n_envs)


class EvalEnv(Env):
    """Evaluation wrapper returning the undiscounted per-step reward DELTA
    (reference training/RL_eval_env.py:20-43)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._last = 0.0

    def reset(self, seed=None, options=None):
        obs, info = super().reset(seed, options)
        self._last = 0.0
        return obs, info

    def step(self, action):
        obs, rew, done, trunc, info = super().step(action)
        # undo the exp() shaping and report the raw reward increment
        raw = float(np.log(max(rew, 1e-300))) if rew > 0 else self._last
        delta = raw - self._last
        self._last = raw
        return obs, delta, done, trunc, info
