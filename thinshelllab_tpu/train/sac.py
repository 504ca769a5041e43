"""Native SAC for BatchedEnv (used when stable-baselines3 is unavailable).

Provides the SAC option of the reference's SB3 trainer
(training/training_env.py:134-151, algo branch "SAC") as a from-scratch
JAX implementation: tanh-squashed Gaussian actor, twin Q critics with
polyak-averaged targets, automatic entropy-temperature tuning, numpy ring
replay buffer. Env interaction is one vmapped device dispatch per step.
"""
from __future__ import annotations

import pickle
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .ppo import _mlp_apply, _mlp_init

_LOG_STD_MIN, _LOG_STD_MAX = -20.0, 2.0


class SACState(NamedTuple):
    actor: list
    q1: list
    q2: list
    q1_targ: list
    q2_targ: list
    log_alpha: jnp.ndarray
    actor_opt: optax.OptState
    q_opt: optax.OptState
    alpha_opt: optax.OptState


def _squashed_gaussian(actor, obs, key):
    out = _mlp_apply(actor, obs)
    mean, log_std = jnp.split(out, 2, axis=-1)
    log_std = jnp.clip(log_std, _LOG_STD_MIN, _LOG_STD_MAX)
    std = jnp.exp(log_std)
    noise = jax.random.normal(key, mean.shape)
    pre = mean + noise * std
    act = jnp.tanh(pre)
    # log-prob with tanh correction
    logp = -0.5 * jnp.sum(
        noise**2 + 2 * log_std + jnp.log(2 * jnp.pi), axis=-1
    )
    logp = logp - jnp.sum(2 * (jnp.log(2.0) - pre - jax.nn.softplus(-2 * pre)),
                          axis=-1)
    return act, logp, jnp.tanh(mean)


class ReplayBuffer:
    def __init__(self, capacity, obs_dim, act_dim):
        self.capacity = capacity
        self.obs = np.zeros((capacity, obs_dim), np.float32)
        self.act = np.zeros((capacity, act_dim), np.float32)
        self.rew = np.zeros((capacity,), np.float32)
        self.obs2 = np.zeros((capacity, obs_dim), np.float32)
        self.done = np.zeros((capacity,), np.float32)
        self.ptr = 0
        self.size = 0

    def add_batch(self, obs, act, rew, obs2, done):
        n = obs.shape[0]
        idx = (self.ptr + np.arange(n)) % self.capacity
        self.obs[idx] = obs
        self.act[idx] = act
        self.rew[idx] = rew
        self.obs2[idx] = obs2
        self.done[idx] = done
        self.ptr = int((self.ptr + n) % self.capacity)
        self.size = int(min(self.size + n, self.capacity))

    def sample(self, rng, batch):
        idx = rng.integers(0, self.size, batch)
        return (self.obs[idx], self.act[idx], self.rew[idx], self.obs2[idx],
                self.done[idx])


class SACTrainer:
    def __init__(self, env, total_steps=100_000, lr=3e-4, gamma=0.99,
                 tau=0.005, batch_size=256, buffer_size=200_000,
                 start_steps=500, updates_per_step=1, hidden=64, seed=0,
                 action_scale=1e-3):
        self.env = env
        self.total_steps = total_steps
        self.gamma = gamma
        self.tau = tau
        self.batch_size = batch_size
        self.start_steps = start_steps
        self.updates_per_step = updates_per_step
        self.action_scale = action_scale
        obs_dim = env.reset().shape[1]
        act_dim = env.scene.n_part * 6
        self.act_dim = act_dim
        self.buffer = ReplayBuffer(buffer_size, obs_dim, act_dim)
        self.rng = np.random.default_rng(seed)
        key = jax.random.PRNGKey(seed)
        ka, k1, k2 = jax.random.split(key, 3)
        actor = _mlp_init(ka, [obs_dim, hidden, hidden, 2 * act_dim])
        q1 = _mlp_init(k1, [obs_dim + act_dim, hidden, hidden, 1])
        q2 = _mlp_init(k2, [obs_dim + act_dim, hidden, hidden, 1])
        self.actor_optimizer = optax.adam(lr)
        self.q_optimizer = optax.adam(lr)
        self.alpha_optimizer = optax.adam(lr)
        log_alpha = jnp.zeros(())
        self.state = SACState(
            actor=actor, q1=q1, q2=q2,
            q1_targ=jax.tree.map(jnp.copy, q1),
            q2_targ=jax.tree.map(jnp.copy, q2),
            log_alpha=log_alpha,
            actor_opt=self.actor_optimizer.init(actor),
            q_opt=self.q_optimizer.init((q1, q2)),
            alpha_opt=self.alpha_optimizer.init(log_alpha),
        )
        self.target_entropy = -float(act_dim)
        self.key = key
        self._update = jax.jit(self._update_fn)

    # ----------------------------------------------------------------- core

    def _update_fn(self, state: SACState, batch, key):
        obs, act, rew, obs2, done = batch
        k1, k2 = jax.random.split(key)
        alpha = jnp.exp(state.log_alpha)

        # critic target
        a2, logp2, _ = _squashed_gaussian(state.actor, obs2, k1)
        xa2 = jnp.concatenate([obs2, a2], axis=-1)
        q_targ = jnp.minimum(
            _mlp_apply(state.q1_targ, xa2)[:, 0],
            _mlp_apply(state.q2_targ, xa2)[:, 0],
        )
        backup = rew + self.gamma * (1.0 - done) * (q_targ - alpha * logp2)

        def q_loss_fn(qs):
            q1, q2 = qs
            xa = jnp.concatenate([obs, act], axis=-1)
            e1 = _mlp_apply(q1, xa)[:, 0] - backup
            e2 = _mlp_apply(q2, xa)[:, 0] - backup
            return jnp.mean(e1**2) + jnp.mean(e2**2)

        q_grads = jax.grad(q_loss_fn)((state.q1, state.q2))
        q_updates, q_opt = self.q_optimizer.update(
            q_grads, state.q_opt, (state.q1, state.q2))
        q1, q2 = optax.apply_updates((state.q1, state.q2), q_updates)

        def actor_loss_fn(actor):
            a, logp, _ = _squashed_gaussian(actor, obs, k2)
            xa = jnp.concatenate([obs, a], axis=-1)
            q = jnp.minimum(_mlp_apply(q1, xa)[:, 0],
                            _mlp_apply(q2, xa)[:, 0])
            return jnp.mean(alpha * logp - q), logp

        (a_grads, logp) = jax.grad(actor_loss_fn, has_aux=True)(state.actor)
        a_updates, actor_opt = self.actor_optimizer.update(
            a_grads, state.actor_opt, state.actor)
        actor = optax.apply_updates(state.actor, a_updates)

        def alpha_loss_fn(log_alpha):
            return -jnp.mean(
                jnp.exp(log_alpha) * (jax.lax.stop_gradient(logp)
                                      + self.target_entropy))

        al_grad = jax.grad(alpha_loss_fn)(state.log_alpha)
        al_update, alpha_opt = self.alpha_optimizer.update(
            al_grad, state.alpha_opt, state.log_alpha)
        log_alpha = optax.apply_updates(state.log_alpha, al_update)

        polyak = lambda t, s: jax.tree.map(
            lambda a, b: (1 - self.tau) * a + self.tau * b, t, s)
        return SACState(
            actor=actor, q1=q1, q2=q2,
            q1_targ=polyak(state.q1_targ, q1),
            q2_targ=polyak(state.q2_targ, q2),
            log_alpha=log_alpha, actor_opt=actor_opt, q_opt=q_opt,
            alpha_opt=alpha_opt,
        )

    # ------------------------------------------------------------- training

    def train(self, verbose=True, callback=None):
        """callback(steps_done) fires after each environment batch + updates
        (EvalCallback hook parity, reference training_env.py:86)."""
        env = self.env
        obs = env.reset()
        steps_done = 0
        while steps_done < self.total_steps:
            if steps_done < self.start_steps:
                act = self.rng.uniform(-1, 1, (env.n, self.act_dim))
            else:
                self.key, k = jax.random.split(self.key)
                a, _, _ = _squashed_gaussian(
                    self.state.actor, jnp.asarray(obs), k)
                act = np.asarray(a)
            obs2, rew, done = env.step(act * self.action_scale)
            # rew is already exp-shaped by the env (reference RL_env.py:205)
            self.buffer.add_batch(obs, act.astype(np.float32),
                                  rew.astype(np.float32), obs2,
                                  done.astype(np.float32))
            obs = obs2
            steps_done += env.n
            if self.buffer.size >= self.batch_size:
                for _ in range(self.updates_per_step):
                    self.key, k = jax.random.split(self.key)
                    batch = tuple(map(jnp.asarray,
                                      self.buffer.sample(self.rng,
                                                         self.batch_size)))
                    self.state = self._update(self.state, batch, k)
            if verbose and steps_done % (env.n * 16) == 0:
                print(f"steps {steps_done}: mean step reward "
                      f"{float(np.mean(rew)):.4f} "
                      f"alpha {float(np.exp(self.state.log_alpha)):.3f}",
                      flush=True)
            if callback is not None and steps_done % (env.n * 16) == 0:
                callback(steps_done)
        return self.state

    def act(self, obs):
        out = _mlp_apply(self.state.actor, jnp.asarray(obs))
        mean, _ = jnp.split(out, 2, axis=-1)
        return np.asarray(jnp.tanh(mean)) * self.action_scale

    def save(self, path):
        with open(path, "wb") as f:
            pickle.dump(jax.tree.map(np.asarray,
                                     (self.state.actor, self.state.q1,
                                      self.state.q2, self.state.log_alpha)),
                        f)

    def load(self, path):
        with open(path, "rb") as f:
            actor, q1, q2, log_alpha = pickle.load(f)
        to_j = lambda ps: [tuple(map(jnp.asarray, p)) for p in ps]
        self.state = self.state._replace(
            actor=to_j(actor), q1=to_j(q1), q2=to_j(q2),
            log_alpha=jnp.asarray(log_alpha))
