"""Optimizers matching the reference semantics (optimizer/optim.py).

Adam_single: bias-corrected Adam over the (T, n_part, 6) trajectory table
with lr decay x discount every 10 steps (optim.py:37-81). Pure-jnp state.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    m: jnp.ndarray
    v: jnp.ndarray
    it: jnp.ndarray
    lr: jnp.ndarray


class Adam:
    def __init__(self, shape, lr, beta_1=0.9, beta_2=0.9999, eps=1e-8,
                 discount=0.9, dtype=jnp.float64):
        self.shape = shape
        self.beta_1 = beta_1
        self.beta_2 = beta_2
        self.eps = eps
        self.discount = discount
        self.lr0 = lr
        self.dtype = dtype

    def init(self) -> AdamState:
        return AdamState(
            m=jnp.zeros(self.shape, self.dtype),
            v=jnp.zeros(self.shape, self.dtype),
            it=jnp.zeros((), self.dtype),
            lr=jnp.asarray(self.lr0, self.dtype),
        )

    def step(self, state: AdamState, params, grads):
        b1, b2 = self.beta_1, self.beta_2
        m = b1 * state.m + (1 - b1) * grads
        v = b2 * state.v + (1 - b2) * grads * grads
        it = state.it + 1.0
        m_hat = m / (1 - b1**it)
        v_hat = v / (1 - b2**it)
        # note: reference divides by sqrt(v_hat + eps), not sqrt(v_hat)+eps
        new_params = params - state.lr * m_hat / jnp.sqrt(v_hat + self.eps)
        lr = jnp.where(jnp.mod(it, 10.0) == 0, state.lr * self.discount,
                       state.lr)
        return AdamState(m=m, v=v, it=it, lr=lr), new_params


class SGD:
    def __init__(self, lr):
        self.lr = lr

    def init(self):
        return ()

    def step(self, state, params, grads):
        return state, params - self.lr * grads
