"""LR schedules with warmup-factor ramp.

Parity with `diffnext/engine/lr_scheduler.py:21-76`: constant, cosine-decay
(to ``lr_min``) and multi-step (gamma decay at milestones), each with a
linear warmup where the LR ramps from ``warmup_factor * lr`` to ``lr`` over
``warmup_steps``. Returned objects are optax-style ``schedule(step) -> lr``.
"""

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def _warmup(step, base_lr, warmup_steps, warmup_factor):
    if warmup_steps <= 0:
        return base_lr
    alpha = jnp.minimum(step / warmup_steps, 1.0)
    factor = warmup_factor * (1 - alpha) + alpha
    return base_lr * factor


def constant_lr(lr: float, warmup_steps: int = 0, warmup_factor: float = 0.001):
    def schedule(step):
        return _warmup(step, lr, warmup_steps, warmup_factor)

    return schedule


def cosine_lr(lr: float, max_steps: int, lr_min: float = 0.0,
              warmup_steps: int = 0, warmup_factor: float = 0.001):
    def schedule(step):
        t = jnp.clip((step - warmup_steps) / max(max_steps - warmup_steps, 1),
                     0.0, 1.0)
        decay = lr_min + 0.5 * (lr - lr_min) * (1 + jnp.cos(np.pi * t))
        return jnp.where(step < warmup_steps,
                         _warmup(step, lr, warmup_steps, warmup_factor), decay)

    return schedule


def multistep_lr(lr: float, milestones: Sequence[int], gamma: float = 0.1,
                 warmup_steps: int = 0, warmup_factor: float = 0.001):
    ms = jnp.asarray(list(milestones))

    def schedule(step):
        n = jnp.sum(step >= ms)
        decayed = lr * gamma**n
        return jnp.where(step < warmup_steps,
                         _warmup(step, lr, warmup_steps, warmup_factor), decayed)

    return schedule
