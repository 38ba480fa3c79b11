"""Exponential moving average of parameters.

Parity with `diffnext/engine/model_ema.py:22-41`: fp32 shadow copy, default
decay 0.99 (configs use 0.98/0.97), updated every ``update_every`` steps.
Functional: the EMA tree lives beside the train state and updates under jit.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    params: any
    decay: jnp.ndarray
    update_every: int


def ema_init(params, decay: float = 0.99, update_every: int = 100) -> EMAState:
    # explicit copy: astype(f32) on f32 params aliases the buffer, which a
    # donated train step would delete out from under the shadow tree
    shadow = jax.tree.map(lambda p: jnp.array(p, jnp.float32, copy=True), params)
    return EMAState(shadow, jnp.float32(decay), update_every)


def ema_update(state: EMAState, params, step) -> EMAState:
    """Blend in current params when step hits the update interval."""
    do = (step % state.update_every) == 0

    def blend(e, p):
        new = e * state.decay + p.astype(jnp.float32) * (1.0 - state.decay)
        return jnp.where(do, new, e)

    return state._replace(params=jax.tree.map(blend, state.params, params))
