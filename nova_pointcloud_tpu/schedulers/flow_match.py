"""Flow-matching (rectified flow) Euler scheduler, pure jnp.

Behavioral parity with the reference CFM scheduler
(`diffnext/schedulers/scheduling_cfm.py:35-140`): shifted sigmas
``shift*s/(1+(shift-1)*s)``, logit-normal training-timestep sampling,
``add_noise = s*noise + (1-s)*x`` and Euler step ``x += pred*(s_{i+1}-s_i)``.

Functional style: ``set_timesteps`` returns an immutable schedule whose sigma
table (with a trailing 0) is indexed by the scan step counter. Training
``add_noise`` also returns the model-facing continuous timestep so no state is
stashed on the scheduler (the reference stores ``self.timestep/self.sigma``).
"""

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FlowMatchSchedule:
    """Immutable Euler schedule. ``sigmas`` has S+1 entries ending in 0."""

    timesteps: np.ndarray  # (S,) float32
    sigmas: np.ndarray  # (S+1,) float32
    num_inference_steps: int


def _apply_shift(sigmas: np.ndarray, shift: float) -> np.ndarray:
    return shift * sigmas / (1 + (shift - 1) * sigmas)


@dataclasses.dataclass(frozen=True)
class FlowMatchEulerScheduler:
    """Rectified-flow Euler scheduler."""

    num_train_timesteps: int = 1000
    shift: float = 1.0
    use_dynamic_shifting: bool = False
    prediction_type: str = "flow"  # model target = noise - x0

    # -- training ---------------------------------------------------------
    def sample_timesteps(self, key: jax.Array, shape: Tuple[int, ...]) -> jax.Array:
        """Logit-normal timesteps: sigmoid(N(0,1))·T (`scheduling_cfm.py:87-90`)."""
        dist = jax.nn.sigmoid(jax.random.normal(key, shape))
        return (dist * self.num_train_timesteps).astype(jnp.int32)

    def train_sigmas(self) -> np.ndarray:
        """Per-train-timestep sigma table (descending in t like the reference)."""
        s = np.arange(1, self.num_train_timesteps + 1, dtype=np.float32)[::-1]
        s = s / self.num_train_timesteps
        if not self.use_dynamic_shifting:
            s = _apply_shift(s, self.shift)
        return s.astype(np.float32)

    def add_noise(self, x0: jax.Array, noise: jax.Array,
                  t: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Forward process; returns (x_t, model_timestep).

        Matches `scheduling_cfm.py:106-117`: ``x_t = s*noise + (1-s)*x0`` with
        the model conditioned on ``s * num_train_timesteps``.
        """
        table = jnp.asarray(self.train_sigmas())
        sigma = table[t]
        model_t = sigma * self.num_train_timesteps
        sigma = sigma.reshape(sigma.shape + (1,) * (x0.ndim - sigma.ndim)).astype(x0.dtype)
        return sigma * noise + (1.0 - sigma) * x0, model_t

    def target(self, x0: jax.Array, noise: jax.Array) -> jax.Array:
        """Flow-matching regression target (``transformer_3d.py:91``)."""
        return noise - x0

    # -- inference --------------------------------------------------------
    def set_timesteps(self, num_inference_steps: int, shift: Optional[float] = None,
                      mu: Optional[float] = None) -> FlowMatchSchedule:
        """Reference recipe (scheduling_cfm.py:92-103): linspace over t between
        the first/last entries of the *shifted* train table, then re-shift."""
        shift = self.shift if shift is None else shift
        if self.use_dynamic_shifting:
            sigma_max = 1.0
            sigma_min = 1.0 / self.num_train_timesteps
        else:
            sigma_max = float(_apply_shift(np.float32(1.0), shift))
            sigma_min = float(_apply_shift(
                np.float32(1.0 / self.num_train_timesteps), shift))
        t_max = sigma_max * self.num_train_timesteps
        t_min = sigma_min * self.num_train_timesteps
        ts = np.linspace(t_max, t_min, num_inference_steps, dtype=np.float32)
        sigmas = ts / self.num_train_timesteps
        if self.use_dynamic_shifting:
            if mu is None:
                raise ValueError("use_dynamic_shifting=True requires mu.")
            sigmas = math.exp(mu) / (math.exp(mu) + (1 / sigmas - 1) ** 1.0)
        else:
            sigmas = _apply_shift(sigmas, shift)
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        timesteps = (sigmas[:-1] * self.num_train_timesteps).astype(np.float32)
        return FlowMatchSchedule(timesteps=timesteps, sigmas=sigmas,
                                 num_inference_steps=num_inference_steps)

    def step(self, model_output: jax.Array, step_index: jax.Array, sample: jax.Array,
             schedule: FlowMatchSchedule) -> jax.Array:
        """Euler step: x += pred * (sigma_{i+1} - sigma_i)."""
        sigmas = jnp.asarray(schedule.sigmas)
        dt = (sigmas[step_index + 1] - sigmas[step_index]).astype(sample.dtype)
        return sample + model_output * dt

    def scale_noise(self, sample: jax.Array, step_index: jax.Array, noise: jax.Array,
                    schedule: FlowMatchSchedule) -> jax.Array:
        """Inference-side forward noising (`scheduling_cfm.py:119-123`)."""
        sigma = jnp.asarray(schedule.sigmas)[step_index].astype(sample.dtype)
        return sigma * noise + (1.0 - sigma) * sample
