"""VAE latent distributions + temporal tiling.

Parity with `diffnext/models/autoencoders/modeling_utils.py`:
- DiagonalGaussian with the odd-channel padding trick (`:43-44`)
- IdentityDistribution (`:27-34`)
- temporal tiled encode/decode over fixed windows with overlap (`:56-83`)

Channels-last layout throughout: images (B, H, W, C), videos (B, T, H, W, C).
"""

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class DiagonalGaussian(NamedTuple):
    """mean/logvar split from the last (channel) axis."""

    mean: jax.Array
    logvar: jax.Array

    @classmethod
    def from_params(cls, z: jax.Array) -> "DiagonalGaussian":
        c = z.shape[-1]
        if c % 2:  # odd-channel trick (`modeling_utils.py:43-44`)
            z = jnp.concatenate([z, jnp.broadcast_to(z[..., -1:],
                                                     z.shape[:-1] + (c - 2,))],
                                axis=-1)
        mean, logvar = jnp.split(z.astype(jnp.float32), 2, axis=-1)
        return cls(mean, jnp.clip(logvar, -30.0, 20.0))

    @property
    def std(self) -> jax.Array:
        return jnp.exp(0.5 * self.logvar)

    def sample(self, key: jax.Array, dtype=None) -> jax.Array:
        eps = jax.random.normal(key, self.mean.shape, jnp.float32)
        out = self.mean + self.std * eps
        return out.astype(dtype) if dtype is not None else out

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self) -> jax.Array:
        """KL(q || N(0, I)) summed over non-batch axes."""
        return 0.5 * jnp.sum(self.mean**2 + jnp.exp(self.logvar)
                             - 1.0 - self.logvar,
                             axis=tuple(range(1, self.mean.ndim)))


class IdentityDistribution(NamedTuple):
    parameters: jax.Array

    def sample(self, key: Optional[jax.Array] = None, dtype=None) -> jax.Array:
        return self.parameters

    def mode(self) -> jax.Array:
        return self.parameters


def tiled_temporal_apply(fn: Callable, x: jax.Array, min_t: int, ovr_t: int,
                         out_ovr_t: int) -> jax.Array:
    """Apply ``fn`` over overlapping temporal windows and stitch.

    x: (B, T, H, W, C). Windows start every ``min_t - ovr_t`` frames with
    length ``min_t``; each non-first output drops its first ``out_ovr_t``
    frames (`modeling_utils.py:63-83`). Window starts are static (shapes are),
    so this unrolls into a fixed set of fn calls under jit.
    """
    t = x.shape[1]
    if t <= min_t:
        return fn(x)
    tiles = []
    for i, start in enumerate(range(0, t, min_t - ovr_t)):
        if start + min_t > t:
            break
        out = fn(x[:, start: start + min_t])
        tiles.append(out[:, out_ovr_t:] if i else out)
    return jnp.concatenate(tiles, axis=1)
