"""CogVideoX causal 3D KL VAE (flax, channels-last).

Behavioral parity with `diffnext/models/autoencoders/autoencoder_kl_cogvideox.py`:
- causal Conv3d via front replication padding (`:28-47`; the memory-chunked
  forward there is a CUDA OOM workaround we don't need on TPU)
- AdaGroupNorm: GroupNorm modulated by the (resized) decoder input latents,
  with the first-frame special-cased temporal interpolation (`:50-67`)
- Resize: spatial stride-2 conv downsample with optional temporal
  first-frame-preserving avg-pool (`:70-100`), mirrored 2x upsampling with
  first-frame spatial-only (`:86-89`)
- encoder: first two stages downsample spatiotemporally (mode 2), third
  spatially (mode 1) (`:159-162`); decoder mirrors with latent conditioning
- temporal tiling 17-frame / 5-latent windows (`:227`)
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nova_pointcloud_tpu.models.autoencoders.autoencoder_kl_opensora import (
    CausalConv3d,
)
from nova_pointcloud_tpu.models.autoencoders.modeling_utils import (
    DiagonalGaussian,
    tiled_temporal_apply,
)


def _resize_latent_to(z: jax.Array, t: int, h: int, w: int) -> jax.Array:
    """Nearest-resize z to (t, h, w) with first-frame temporal split (`:61-66`)."""
    b, _, _, _, c = z.shape
    if t > 1 and t % 2 == 1:
        first = jax.image.resize(z[:, :1], (b, 1, h, w, c), "nearest")
        rest = jax.image.resize(z[:, 1:], (b, t - 1, h, w, c), "nearest")
        return jnp.concatenate([first, rest], axis=1)
    return jax.image.resize(z, (b, t, h, w, c), "nearest")


class AdaGroupNorm(nn.Module):
    """GroupNorm with optional latent-conditioned scale/shift (`:50-67`)."""

    dim: int
    z_dim: Optional[int] = None
    num_groups: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, z: Optional[jax.Array] = None) -> jax.Array:
        h = nn.GroupNorm(self.num_groups, epsilon=1e-6, name="norm")(x)
        if self.z_dim is None or z is None:
            return h
        z = _resize_latent_to(z, x.shape[1], x.shape[2], x.shape[3])
        scale = CausalConv3d(self.dim, (1, 1, 1), dtype=self.dtype,
                             name="scale")(z)
        shift = CausalConv3d(self.dim, (1, 1, 1), dtype=self.dtype,
                             name="shift")(z)
        return h * scale + shift


class CogResBlock(nn.Module):
    """AdaGN -> SiLU -> causal conv, x2, + shortcut (`:103-121`)."""

    out_dim: int
    z_dim: Optional[int] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, z: Optional[jax.Array] = None) -> jax.Array:
        shortcut = x
        if x.shape[-1] != self.out_dim:
            shortcut = CausalConv3d(self.out_dim, (1, 1, 1), dtype=self.dtype,
                                    name="conv_shortcut")(x)
        h = AdaGroupNorm(x.shape[-1], self.z_dim, dtype=self.dtype,
                         name="norm1")(x, z)
        h = CausalConv3d(self.out_dim, (3, 3, 3), dtype=self.dtype,
                         name="conv1")(nn.silu(h))
        h = AdaGroupNorm(self.out_dim, self.z_dim, dtype=self.dtype,
                         name="norm2")(h, z)
        h = CausalConv3d(self.out_dim, (3, 3, 3), dtype=self.dtype,
                         name="conv2")(nn.silu(h))
        return h + shortcut


class CogResize(nn.Module):
    """Down/upsample (`:70-100`). mode: 1 = spatial, 2 = spatiotemporal."""

    dim: int
    mode: int
    down: bool
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, h, w, c = x.shape
        if self.down:
            if self.mode == 2 and t > 1:
                # first-frame-preserving temporal avg-pool (`:82-85`)
                rest = x[:, 1:]
                t2 = (t - 1) // 2
                rest = rest[:, : 2 * t2].reshape(b, t2, 2, h, w, c).mean(axis=2)
                x = jnp.concatenate([x[:, :1], rest], axis=1)
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
            bt = x.shape[0] * x.shape[1]
            y = x.reshape((bt,) + x.shape[2:])
            y = nn.Conv(self.dim, (3, 3), strides=2, padding="VALID",
                        dtype=self.dtype, name="conv")(y)
            return y.reshape((b, x.shape[1]) + y.shape[1:])
        # upsample
        if self.mode == 2 and t > 1:
            first = jnp.repeat(jnp.repeat(x[:, :1], 2, 2), 2, 3)
            rest = jnp.repeat(jnp.repeat(jnp.repeat(x[:, 1:], 2, 1), 2, 2), 2, 3)
            x = jnp.concatenate([first, rest], axis=1)
        else:
            x = jnp.repeat(jnp.repeat(x, 2, 2), 2, 3)
        bt = x.shape[0] * x.shape[1]
        y = x.reshape((bt,) + x.shape[2:])
        y = nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(y)
        return y.reshape((b, x.shape[1]) + y.shape[1:])


class CogEncoder(nn.Module):
    out_dim: int
    block_dims: Sequence[int]
    block_depth: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = CausalConv3d(self.block_dims[0], (3, 3, 3), dtype=self.dtype,
                         name="conv_in")(x)
        for i, dim in enumerate(self.block_dims):
            for j in range(self.block_depth):
                h = CogResBlock(dim, dtype=self.dtype,
                                name=f"down_{i}_res_{j}")(h)
            mode = 2 if i < 2 else (1 if i < len(self.block_dims) - 1 else 0)
            if mode:
                h = CogResize(dim, mode, True, self.dtype,
                              name=f"down_{i}_resize")(h)
        for j in range(2):
            h = CogResBlock(self.block_dims[-1], dtype=self.dtype,
                            name=f"mid_res_{j}")(h)
        h = AdaGroupNorm(self.block_dims[-1], dtype=self.dtype,
                         name="conv_norm_out")(h)
        return CausalConv3d(2 * self.out_dim, (3, 3, 3), dtype=self.dtype,
                            name="conv_out")(nn.silu(h))


class CogDecoder(nn.Module):
    """Latent-conditioned decoder: every AdaGN sees the input latents."""

    latent_dim: int
    out_dim: int
    block_dims: Sequence[int]  # encoder order
    block_depth: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        dims = list(reversed(self.block_dims))
        h = CausalConv3d(dims[0], (3, 3, 3), dtype=self.dtype, name="conv_in")(z)
        for j in range(2):
            h = CogResBlock(dims[0], self.latent_dim, dtype=self.dtype,
                            name=f"mid_res_{j}")(h, z)
        for i, dim in enumerate(dims):
            for j in range(self.block_depth + 1):
                h = CogResBlock(dim, self.latent_dim, dtype=self.dtype,
                                name=f"up_{i}_res_{j}")(h, z)
            mode = 2 if i < 2 else (1 if i < len(dims) - 1 else 0)
            if mode:
                h = CogResize(dim, mode, False, self.dtype,
                              name=f"up_{i}_resize")(h)
        h = AdaGroupNorm(dims[-1], self.latent_dim, dtype=self.dtype,
                         name="conv_norm_out")(h, z)
        return CausalConv3d(self.out_dim, (3, 3, 3), dtype=self.dtype,
                            name="conv_out")(nn.silu(h))


class AutoencoderKLCogVideoX(nn.Module):
    """CogVideoX causal 3D KL VAE (`:202-261`)."""

    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 512)
    layers_per_block: int = 3
    latent_channels: int = 16
    scaling_factor: float = 0.7
    shift_factor: Optional[float] = None
    sample_min_t: int = 17
    latent_min_t: int = 5
    dtype: Any = None

    def setup(self):
        self.encoder = CogEncoder(self.latent_channels, self.block_out_channels,
                                  self.layers_per_block, self.dtype)
        self.decoder = CogDecoder(self.latent_channels, self.out_channels,
                                  self.block_out_channels,
                                  self.layers_per_block, self.dtype)

    def scale(self, x: jax.Array) -> jax.Array:
        if self.shift_factor:
            x = x - self.shift_factor
        return x * self.scaling_factor

    def unscale(self, x: jax.Array) -> jax.Array:
        x = x / self.scaling_factor
        return x + self.shift_factor if self.shift_factor else x

    def encode(self, x: jax.Array) -> DiagonalGaussian:
        image = x.ndim == 4
        if image:
            x = x[:, None]
        z = tiled_temporal_apply(self.encoder, x, self.sample_min_t, 1, 0)
        if image:
            z = z[:, 0]
        return DiagonalGaussian.from_params(z)

    def decode(self, z: jax.Array) -> jax.Array:
        image = z.ndim == 4
        if image:
            z = z[:, None]
        x = tiled_temporal_apply(self.decoder, z, self.latent_min_t, 0, 1)
        return x[:, 0] if image else x

    def __call__(self, x: jax.Array, key: Optional[jax.Array] = None):
        dist = self.encode(x)
        zz = dist.sample(key) if key is not None else dist.mode()
        return self.decode(zz.astype(x.dtype)), dist
