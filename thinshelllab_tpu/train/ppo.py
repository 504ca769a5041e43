"""Native PPO for BatchedEnv (used when stable-baselines3 is unavailable).

Replaces the reference's SB3 PPO path (training_env.py): a Gaussian MLP
policy + value head trained with clipped-surrogate PPO and GAE. All rollout
steps run as one vmapped env batch on-device; only the tiny policy update
loop touches host Python.
"""
from __future__ import annotations

import pickle
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _mlp_init(key, sizes):
    params = []
    for i in range(len(sizes) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        w = jax.random.normal(k1, (sizes[i], sizes[i + 1])) * jnp.sqrt(
            2.0 / sizes[i]
        )
        b = jnp.zeros(sizes[i + 1])
        params.append((w, b))
    return params


def _mlp_apply(params, x):
    for i, (w, b) in enumerate(params):
        x = x @ w + b
        if i < len(params) - 1:
            x = jnp.tanh(x)
    return x


class PPOState(NamedTuple):
    pi: list
    vf: list
    log_std: jnp.ndarray
    opt_state: optax.OptState


class PPOTrainer:
    def __init__(self, env, total_steps=100_000, horizon=64, lr=3e-4,
                 gamma=0.99, lam=0.95, clip=0.2, epochs=4, minibatches=4,
                 hidden=64, seed=0, action_scale=1e-3):
        self.env = env
        self.total_steps = total_steps
        self.horizon = horizon
        self.gamma = gamma
        self.lam = lam
        self.clip = clip
        self.epochs = epochs
        self.minibatches = minibatches
        self.action_scale = action_scale
        obs_dim = env.reset().shape[1]
        act_dim = env.scene.n_part * 6
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        self.optimizer = optax.adam(lr)
        pi = _mlp_init(k1, [obs_dim, hidden, hidden, act_dim])
        vf = _mlp_init(k2, [obs_dim, hidden, hidden, 1])
        log_std = jnp.full((act_dim,), -0.5)
        opt_state = self.optimizer.init((pi, vf, log_std))
        self.state = PPOState(pi, vf, log_std, opt_state)
        self.key = key
        self.act_dim = act_dim
        self._update = jax.jit(self._update_fn)

    # ---------------------------------------------------------------- core

    def _policy(self, pi, log_std, obs, key):
        mean = _mlp_apply(pi, obs)
        noise = jax.random.normal(key, mean.shape)
        act = mean + noise * jnp.exp(log_std)
        logp = -0.5 * jnp.sum(
            ((act - mean) / jnp.exp(log_std)) ** 2
            + 2 * log_std
            + jnp.log(2 * jnp.pi),
            axis=-1,
        )
        return act, logp

    def _logp(self, pi, log_std, obs, act):
        mean = _mlp_apply(pi, obs)
        return -0.5 * jnp.sum(
            ((act - mean) / jnp.exp(log_std)) ** 2
            + 2 * log_std
            + jnp.log(2 * jnp.pi),
            axis=-1,
        )

    def _update_fn(self, state: PPOState, batch):
        obs, act, adv, ret, logp_old = batch

        def loss_fn(params):
            pi, vf, log_std = params
            logp = self._logp(pi, log_std, obs, act)
            ratio = jnp.exp(logp - logp_old)
            clipped = jnp.clip(ratio, 1 - self.clip, 1 + self.clip)
            pg = -jnp.mean(jnp.minimum(ratio * adv, clipped * adv))
            v = _mlp_apply(vf, obs)[:, 0]
            vloss = jnp.mean((v - ret) ** 2)
            ent = jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
            return pg + 0.5 * vloss - 0.001 * ent

        grads = jax.grad(loss_fn)((state.pi, state.vf, state.log_std))
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, (state.pi, state.vf, state.log_std)
        )
        pi, vf, log_std = optax.apply_updates(
            (state.pi, state.vf, state.log_std), updates
        )
        return PPOState(pi, vf, log_std, opt_state)

    # ------------------------------------------------------------- training

    def train(self, verbose=True, callback=None):
        """callback(steps_done) is invoked after every policy update (the
        EvalCallback hook of the reference SB3 trainer, training_env.py:86)."""
        env = self.env
        steps_done = 0
        ep_rewards = []
        obs = env.reset()
        while steps_done < self.total_steps:
            traj = {k: [] for k in ("obs", "act", "rew", "val", "logp", "done")}
            for _ in range(self.horizon):
                self.key, k = jax.random.split(self.key)
                o = jnp.asarray(obs)
                act, logp = self._policy(self.state.pi, self.state.log_std, o, k)
                val = _mlp_apply(self.state.vf, o)[:, 0]
                scaled = np.asarray(
                    jnp.clip(act, -1, 1) * self.action_scale, np.float64
                )
                obs2, rew, done = env.step(scaled)  # env auto-resets done envs
                for key_, v in (("obs", o), ("act", act), ("rew", rew),
                                ("val", val), ("logp", logp), ("done", done)):
                    traj[key_].append(np.asarray(v))
                obs = obs2
                steps_done += env.n
                if done.any():
                    ep_rewards.append(float(np.sum(traj["rew"][-1])))
            # GAE with episode-boundary masking (done envs bootstrap to 0)
            rew = np.stack(traj["rew"])  # (H, N)
            val = np.stack(traj["val"])
            done_m = np.stack(traj["done"]).astype(rew.dtype)
            adv = np.zeros_like(rew)
            lastgaelam = 0.0
            for t in reversed(range(len(rew))):
                next_val = val[t + 1] if t + 1 < len(rew) else val[t]
                nonterm = 1.0 - done_m[t]
                delta = rew[t] + self.gamma * next_val * nonterm - val[t]
                lastgaelam = delta + self.gamma * self.lam * nonterm * lastgaelam
                adv[t] = lastgaelam
            ret = adv + val
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)
            flat = lambda x: jnp.asarray(np.concatenate(
                [np.asarray(a).reshape(env.n, -1) for a in x]
            ))
            obs_f = flat(traj["obs"])
            act_f = flat(traj["act"])
            adv_f = jnp.asarray(adv.reshape(-1))
            ret_f = jnp.asarray(ret.reshape(-1))
            logp_f = jnp.asarray(np.stack(traj["logp"]).reshape(-1))
            n = obs_f.shape[0]
            idx = np.arange(n)
            for _ in range(self.epochs):
                np.random.shuffle(idx)
                for mb in np.array_split(idx, self.minibatches):
                    batch = (obs_f[mb], act_f[mb], adv_f[mb], ret_f[mb],
                             logp_f[mb])
                    self.state = self._update(self.state, batch)
            if verbose:
                mean_r = float(np.mean(rew))
                print(f"steps {steps_done}: mean step reward {mean_r:.4f}",
                      flush=True)
            if callback is not None:
                callback(steps_done)
        return self.state

    def act(self, obs):
        mean = _mlp_apply(self.state.pi, jnp.asarray(obs))
        return np.asarray(jnp.clip(mean, -1, 1) * self.action_scale)

    def save(self, path):
        with open(path, "wb") as f:
            pickle.dump(jax.tree.map(np.asarray, self.state[:3]), f)

    def load(self, path):
        with open(path, "rb") as f:
            pi, vf, log_std = pickle.load(f)
        self.state = PPOState(
            [tuple(map(jnp.asarray, p)) for p in pi],
            [tuple(map(jnp.asarray, p)) for p in vf],
            jnp.asarray(log_std), self.state.opt_state,
        )
