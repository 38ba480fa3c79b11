"""DDPM scheduler as pure jnp functions over precomputed tables.

Behavioral parity with the reference DDPM port
(`diffnext/schedulers/scheduling_ddpm.py:75-354`): five beta schedules,
zero-terminal-SNR rescale, all six variance types (fixed_small[_log],
fixed_large[_log], learned, learned_range — the learned pair split a
2C-channel model output), epsilon/sample/v prediction,
leading/linspace/trailing timestep spacing, uniform train-timestep
sampling, add_noise and get_velocity.

TPU-first differences: no hidden mutable state. ``set_timesteps`` returns an
immutable :class:`DDPMSchedule`; ``step`` takes the step index explicitly so the
whole reverse process is a single ``lax.scan`` body. All tables are host numpy
at construction and become jnp constants when closed over under ``jit``.
"""

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def betas_for_alpha_bar(num_steps: int, max_beta: float = 0.999,
                        transform: str = "cosine") -> np.ndarray:
    """Discretize a continuous alpha-bar function into betas (Glide cosine)."""
    if transform == "cosine":
        alpha_bar = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2  # noqa: E731
    elif transform == "exp":
        alpha_bar = lambda t: math.exp(t * -12.0)  # noqa: E731
    else:
        raise ValueError(f"Unsupported alpha transform: {transform}")
    t = np.arange(num_steps, dtype=np.float64)
    betas = 1.0 - np.array([alpha_bar((i + 1) / num_steps) / alpha_bar(i / num_steps)
                            for i in t])
    return np.minimum(betas, max_beta).astype(np.float32)


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Rescale betas so the terminal SNR is exactly zero (arXiv 2305.08891)."""
    alphas_bar_sqrt = np.sqrt(np.cumprod(1.0 - betas))
    a0, aT = alphas_bar_sqrt[0], alphas_bar_sqrt[-1]
    alphas_bar_sqrt = (alphas_bar_sqrt - aT) * (a0 / (a0 - aT))
    alphas_bar = alphas_bar_sqrt**2
    alphas = np.concatenate([alphas_bar[:1], alphas_bar[1:] / alphas_bar[:-1]])
    return (1.0 - alphas).astype(np.float32)


def make_betas(schedule: str, num_steps: int, beta_start: float, beta_end: float,
               trained_betas=None) -> np.ndarray:
    if trained_betas is not None:
        return np.asarray(trained_betas, dtype=np.float32)
    if schedule == "linear":
        return np.linspace(beta_start, beta_end, num_steps, dtype=np.float32)
    if schedule == "scaled_linear":
        return np.linspace(beta_start**0.5, beta_end**0.5, num_steps,
                           dtype=np.float32) ** 2
    if schedule == "squaredcos_cap_v2":
        return betas_for_alpha_bar(num_steps)
    if schedule == "sigmoid":
        x = np.linspace(-6, 6, num_steps)
        return (1 / (1 + np.exp(-x)) * (beta_end - beta_start) + beta_start).astype(np.float32)
    raise NotImplementedError(f"beta schedule {schedule!r}")


@dataclasses.dataclass(frozen=True)
class DDPMSchedule:
    """Immutable inference schedule: index with the scan step counter."""

    timesteps: np.ndarray  # (S,) int64, descending
    num_inference_steps: int


@dataclasses.dataclass(frozen=True)
class DDPMScheduler:
    """Denoising diffusion probabilistic models, functional style."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.0001
    beta_end: float = 0.02
    beta_schedule: str = "linear"
    variance_type: str = "fixed_small"
    clip_sample: bool = True
    clip_sample_range: float = 1.0
    prediction_type: str = "epsilon"
    timestep_spacing: str = "leading"
    steps_offset: int = 0
    rescale_betas_zero_snr: bool = False
    trained_betas: Optional[Sequence[float]] = None

    init_noise_sigma: float = dataclasses.field(default=1.0, init=False)

    def __post_init__(self):
        betas = make_betas(self.beta_schedule, self.num_train_timesteps,
                           self.beta_start, self.beta_end, self.trained_betas)
        if self.rescale_betas_zero_snr:
            betas = rescale_zero_terminal_snr(betas)
        object.__setattr__(self, "betas", betas)
        object.__setattr__(self, "alphas_cumprod",
                           np.cumprod(1.0 - betas).astype(np.float32))

    # -- training ---------------------------------------------------------
    def sample_timesteps(self, key: jax.Array, shape: Tuple[int, ...]) -> jax.Array:
        """Uniform integer timesteps (`scheduling_ddpm.py:179-180`)."""
        return jax.random.randint(key, shape, 0, self.num_train_timesteps)

    def _gather(self, table: np.ndarray, t: jax.Array, ndim: int) -> jax.Array:
        v = jnp.asarray(table)[t]
        return v.reshape(v.shape + (1,) * (ndim - v.ndim))

    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        """q(x_t | x_0): sqrt(a_bar)·x0 + sqrt(1-a_bar)·noise."""
        a = self._gather(self.alphas_cumprod, t, x0.ndim)
        return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise

    def get_velocity(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        a = self._gather(self.alphas_cumprod, t, x0.ndim)
        return jnp.sqrt(a) * noise - jnp.sqrt(1.0 - a) * x0

    # -- inference --------------------------------------------------------
    def set_timesteps(self, num_inference_steps: int) -> DDPMSchedule:
        """Discrete reverse-process timesteps (Table 2, arXiv 2305.08891)."""
        T, S = self.num_train_timesteps, num_inference_steps
        if self.timestep_spacing == "linspace":
            ts = np.linspace(0, T - 1, S).round()[::-1].astype(np.int64)
        elif self.timestep_spacing == "leading":
            ts = (np.arange(S) * (T // S)).round()[::-1].astype(np.int64) + self.steps_offset
        elif self.timestep_spacing == "trailing":
            ts = np.arange(T, 0, -(T / S)).round().astype(np.int64) - 1
        else:
            raise ValueError(f"{self.timestep_spacing} is not supported.")
        return DDPMSchedule(timesteps=ts, num_inference_steps=S)

    def predict_x0(self, model_output: jax.Array, t: jax.Array, sample: jax.Array) -> jax.Array:
        a_t = self._gather(self.alphas_cumprod, t, sample.ndim)
        b_t = 1.0 - a_t
        if self.prediction_type == "epsilon":
            x0 = (sample - jnp.sqrt(b_t) * model_output) / jnp.sqrt(a_t)
        elif self.prediction_type == "sample":
            x0 = model_output
        elif self.prediction_type == "v_prediction":
            x0 = jnp.sqrt(a_t) * sample - jnp.sqrt(b_t) * model_output
        else:
            raise ValueError(f"Unsupported prediction type {self.prediction_type}.")
        if self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)
        return x0

    def step(
        self,
        model_output: jax.Array,
        t: jax.Array,
        sample: jax.Array,
        key: Optional[jax.Array] = None,
        schedule: Optional[DDPMSchedule] = None,
        noise: Optional[jax.Array] = None,
    ) -> jax.Array:
        """One reverse step x_t -> x_{t-1} (formula 7, arXiv 2006.11239).

        ``t`` may be traced. ``prev_t`` is derived from the schedule stride so
        the body is shape-static and scannable. Supply either ``key`` or
        pre-drawn ``noise`` for the stochastic term.

        For ``variance_type`` in ("learned", "learned_range") the model
        output carries 2C channels on the LAST axis (channels-last
        convention; the reference chunks dim=1, `scheduling_ddpm.py:270-272`):
        the first half is the prediction, the second the variance head.
        """
        predicted_variance = None
        if self.variance_type in ("learned", "learned_range"):
            if model_output.shape[-1] == sample.shape[-1] * 2:
                model_output, predicted_variance = jnp.split(
                    model_output, 2, axis=-1)

        S = schedule.num_inference_steps if schedule else self.num_train_timesteps
        stride = self.num_train_timesteps // S
        prev_t = t - stride

        table = jnp.asarray(self.alphas_cumprod)
        a_t = self._gather(self.alphas_cumprod, t, sample.ndim)
        a_prev = jnp.where(prev_t >= 0, table[jnp.maximum(prev_t, 0)], 1.0)
        a_prev = a_prev.reshape(a_t.shape)
        b_t, b_prev = 1.0 - a_t, 1.0 - a_prev
        cur_alpha = a_t / a_prev
        cur_beta = 1.0 - cur_alpha

        x0 = self.predict_x0(model_output, t, sample)
        x0_coeff = jnp.sqrt(a_prev) * cur_beta / b_t
        xt_coeff = jnp.sqrt(cur_alpha) * b_prev / b_t
        prev_sample = x0_coeff * x0 + xt_coeff * sample

        # formula (6)/(7) posterior variance, log-clamped like the reference
        variance = jnp.clip(b_prev / b_t * cur_beta, 1e-20, None)
        if self.variance_type == "fixed_small":
            std = jnp.sqrt(variance)
        elif self.variance_type == "fixed_small_log":
            std = jnp.exp(0.5 * jnp.log(variance))
        elif self.variance_type == "fixed_large":
            std = jnp.sqrt(cur_beta)
        elif self.variance_type == "fixed_large_log":
            # Glide max_log: std = exp(0.5 * log beta_t) == sqrt(beta_t).
            # The reference computes log(beta_t) ** 0.5 instead
            # (`scheduling_ddpm.py:227,310`) — sqrt of a NEGATIVE log for any
            # beta < 1, i.e. NaN; we implement the Glide intent (SURVEY §7:
            # fix known reference bugs, don't replicate).
            std = jnp.exp(0.5 * jnp.log(jnp.clip(cur_beta, 1e-20, None)))
        elif self.variance_type == "learned":
            if predicted_variance is None:
                raise ValueError("variance_type 'learned' needs a 2C-channel "
                                 "model output (prediction | variance).")
            std = jnp.sqrt(jnp.clip(predicted_variance, 1e-20, None))
        elif self.variance_type == "learned_range":
            # improved-DDPM (arXiv 2102.09672 eq. 15): the variance head is
            # in [-1, 1]; interpolate between the posterior (min) and beta_t
            # (max) LOG variances (`scheduling_ddpm.py:229-233,306-307`).
            if predicted_variance is None:
                raise ValueError("variance_type 'learned_range' needs a "
                                 "2C-channel model output.")
            frac = (predicted_variance + 1.0) / 2.0
            min_log = jnp.log(variance)
            max_log = jnp.log(jnp.clip(cur_beta, 1e-20, None))
            std = jnp.exp(0.5 * (frac * max_log + (1.0 - frac) * min_log))
        else:
            raise NotImplementedError(f"variance_type {self.variance_type!r}")
        if noise is None:
            noise = (jax.random.normal(key, sample.shape, sample.dtype)
                     if key is not None else jnp.zeros_like(sample))
        add = jnp.where(t > 0, std, 0.0)
        return prev_sample + add * noise
