"""Adaptive LayerNorm variants (flax.linen).

Behavioral parity with `diffnext/models/normalization.py:24-62`:
AdaLayerNormZero (optional LoRA-rank projection, extra gate stats),
AdaLayerNorm, and AdaLayerNormSingle (shared learned bias added to a shared
conditioning vector). Params are fp32; compute follows the input dtype.
"""

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class AdaLayerNormZero(nn.Module):
    """LayerNorm modulated by (scale, shift[, gates...]) projected from z."""

    dim: int
    rank: Optional[int] = None
    num_stats: int = 2
    eps: Optional[float] = 1e-6  # None = no normalization (`normalization.py:31`)

    @nn.compact
    def __call__(self, x: jax.Array, z: jax.Array) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
        h = nn.silu(z)
        if self.rank:
            h = nn.Dense(self.rank, use_bias=False, name="lora")(h)
        stats = nn.Dense(self.num_stats * self.dim, name="proj",
                         kernel_init=nn.initializers.zeros)(h)
        stats = tuple(jnp.split(stats, self.num_stats, axis=-1))
        y = x if self.eps is None else nn.LayerNorm(
            epsilon=self.eps, use_bias=False, use_scale=False)(x)
        y = y * (1.0 + stats[0]) + stats[1]
        return y, stats[2:]


class AdaLayerNorm(nn.Module):
    """AdaLayerNormZero without extra gates; returns the tensor only."""

    dim: int
    rank: Optional[int] = None
    eps: Optional[float] = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array, z: jax.Array) -> jax.Array:
        return AdaLayerNormZero(self.dim, self.rank, num_stats=2, eps=self.eps,
                                name="ada")(x, z)[0]


class AdaLayerNormSingle(nn.Module):
    """AdaLN with a shared learned bias added to shared conditioning stats."""

    dim: int
    num_stats: int = 2
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array, z: jax.Array) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
        bias = self.param("bias", nn.initializers.normal(self.dim**-0.5),
                          (self.num_stats, self.dim))
        if z.shape[-1] == self.dim:
            stats = z + bias.astype(z.dtype)  # z: (..., num_stats, dim)
            stats = tuple(stats[..., i, :] for i in range(self.num_stats))
        else:
            stats = z + bias.reshape(-1).astype(z.dtype)
            stats = tuple(jnp.split(stats, self.num_stats, axis=-1))
        y = nn.LayerNorm(epsilon=self.eps, use_bias=False, use_scale=False)(x)
        y = y * (1.0 + stats[0]) + stats[1]
        return y, stats[2:]
