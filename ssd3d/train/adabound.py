"""AdaBound optimizer as an optax transform.

The reference ships AdaBound (lib/utils/tf_ops/adabound/adabound.py) though
no shipped config selects it; provided here for capability parity and usable
via SOLVER.TYPE='AdaBound'. Adam with step-dependent bounds on the effective
per-parameter learning rate that converge toward `final_lr` (SGD-like)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AdaBoundState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates


def adabound(learning_rate, final_lr: float = 0.1, b1: float = 0.9,
             b2: float = 0.999, eps: float = 1e-8, gamma: float = 1e-3):
    def init(params):
        return AdaBoundState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree.map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads
        )
        c = count.astype(jnp.float32)
        bc1 = 1 - b1 ** c
        bc2 = 1 - b2 ** c
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        step_size = lr * jnp.sqrt(bc2) / bc1
        lower = final_lr * (1 - 1 / (gamma * c + 1))
        upper = final_lr * (1 + 1 / (gamma * c))

        def upd(m, v):
            denom = jnp.sqrt(v) + eps
            eta = jnp.clip(step_size / denom, lower, upper)
            return -eta * m

        updates = jax.tree.map(upd, mu, nu)
        return updates, AdaBoundState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)
