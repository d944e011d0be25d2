"""LR and BN-momentum schedules (reference trainer_utils.py:7-21).

Both are piecewise-constant on SOLVER.STEPS boundaries:
    lr(k)         = BASE_LR * GAMMA^(#boundaries passed)
    bn_decay(k)   = min(BN_DECAY_CLIP, 1 - BN_INIT_DECAY * RATE^(#passed))
(bn_decay is the moving-average momentum of batch norm.)
"""

from __future__ import annotations

import jax.numpy as jnp


def piecewise_values(step, boundaries, values):
    step = jnp.asarray(step)
    idx = jnp.sum(
        step >= jnp.asarray(boundaries, jnp.int32).reshape(-1)
    ) if len(boundaries) else 0
    return jnp.asarray(values)[idx]


def learning_rate(solver_cfg, step):
    steps = list(solver_cfg.STEPS)
    values = [
        solver_cfg.BASE_LR * (solver_cfg.GAMMA ** i) for i in range(len(steps) + 1)
    ]
    return piecewise_values(step, steps, values)


def bn_momentum(solver_cfg, step):
    steps = list(solver_cfg.STEPS)
    values = [
        min(
            solver_cfg.BN_DECAY_CLIP,
            1.0 - solver_cfg.BN_INIT_DECAY * (solver_cfg.BN_DECAY_DECAY_RATE ** i),
        )
        for i in range(len(steps) + 1)
    ]
    return piecewise_values(step, steps, values)
