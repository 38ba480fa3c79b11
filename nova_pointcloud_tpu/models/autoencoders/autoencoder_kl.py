"""SD-style 2D KL VAE (flax, NHWC).

Behavioral parity with `diffnext/models/autoencoders/autoencoder_kl.py`:
4 down/up UNet res stages, mid block with single-head attention, quant /
post-quant convs, double_z diagonal-Gaussian or identity latents, and latent
scale_/unscale_ with scaling_factor/shift_factor.
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nova_pointcloud_tpu.models.autoencoders.modeling_utils import (
    DiagonalGaussian,
    IdentityDistribution,
)


class VAEAttention(nn.Module):
    """Single-head spatial self-attention with GroupNorm (`autoencoder_kl.py:29-47`).

    Explicit to_q/k/v/out projections so HF/reference torch checkpoints map
    1:1 (load_torch_vae_weights).
    """

    dim: int
    num_heads: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from nova_pointcloud_tpu.ops.attention import sdpa

        b, h, w, c = x.shape
        y = nn.GroupNorm(32, epsilon=1e-6, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        heads, hd = self.num_heads, self.dim // self.num_heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(self.dim, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(self.dim, dtype=self.dtype, name="to_v")(y)
        q, k, v = [t.reshape(b, h * w, heads, hd).transpose(0, 2, 1, 3)
                   for t in (q, k, v)]
        o = sdpa(q, k, v).transpose(0, 2, 1, 3).reshape(b, h * w, self.dim)
        y = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(o)
        return y.reshape(b, h, w, c)


class ResBlock(nn.Module):
    """GroupNorm-SiLU-Conv x2 with shortcut (`autoencoder_kl.py:64-79`)."""

    out_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        shortcut = x
        if x.shape[-1] != self.out_dim:
            shortcut = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype,
                               name="conv_shortcut")(x)
        h = nn.silu(nn.GroupNorm(32, epsilon=1e-6, name="norm1")(x))
        h = nn.Conv(self.out_dim, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.silu(nn.GroupNorm(32, epsilon=1e-6, name="norm2")(h))
        h = nn.Conv(self.out_dim, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        return h + shortcut


class Downsample(nn.Module):
    """Asymmetric-pad stride-2 conv (`autoencoder_kl.py:50-61`)."""

    dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.dim, (3, 3), strides=2, padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    """Nearest 2x + conv (`autoencoder_kl.py:59-61`)."""

    dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


class MidBlock(nn.Module):
    dim: int
    depth: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = ResBlock(self.dim, self.dtype, name="resnets_0")(x)
        for i in range(self.depth):
            a = VAEAttention(self.dim, dtype=self.dtype, name=f"attentions_{i}")(x)
            x = ResBlock(self.dim, self.dtype, name=f"resnets_{i + 1}")(x + a)
        return x


class Encoder(nn.Module):
    out_dim: int
    block_dims: Sequence[int]
    block_depth: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Conv(self.block_dims[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        for i, dim in enumerate(self.block_dims):
            for j in range(self.block_depth):
                h = ResBlock(dim, self.dtype, name=f"down_{i}_res_{j}")(h)
            if i < len(self.block_dims) - 1:
                h = Downsample(dim, self.dtype, name=f"down_{i}_resize")(h)
        h = MidBlock(self.block_dims[-1], dtype=self.dtype, name="mid_block")(h)
        h = nn.silu(nn.GroupNorm(32, epsilon=1e-6, name="conv_norm_out")(h))
        return nn.Conv(self.out_dim, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class Decoder(nn.Module):
    out_dim: int
    block_dims: Sequence[int]  # encoder order; reversed internally
    block_depth: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        dims = list(reversed(self.block_dims))
        h = nn.Conv(dims[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)
        h = MidBlock(dims[0], dtype=self.dtype, name="mid_block")(h)
        for i, dim in enumerate(dims):
            for j in range(self.block_depth + 1):
                h = ResBlock(dim, self.dtype, name=f"up_{i}_res_{j}")(h)
            if i < len(dims) - 1:
                h = Upsample(dim, self.dtype, name=f"up_{i}_resize")(h)
        h = nn.silu(nn.GroupNorm(32, epsilon=1e-6, name="conv_norm_out")(h))
        return nn.Conv(self.out_dim, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """2D KL VAE; encode -> distribution params, decode <- latents."""

    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 16
    scaling_factor: float = 0.18215
    shift_factor: Optional[float] = None
    double_z: bool = True
    use_quant_conv: bool = True
    use_post_quant_conv: bool = True
    dtype: Any = None

    def setup(self):
        z_dim = (1 + self.double_z) * self.latent_channels
        self.encoder = Encoder(z_dim, self.block_out_channels,
                               self.layers_per_block, self.dtype)
        self.decoder = Decoder(self.out_channels, self.block_out_channels,
                               self.layers_per_block, self.dtype)
        if self.use_quant_conv:
            self.quant_conv = nn.Conv(z_dim, (1, 1), dtype=self.dtype)
        if self.use_post_quant_conv:
            self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1),
                                           dtype=self.dtype)

    # latent scaling (`autoencoder_kl.py:198-206`)
    def scale(self, x: jax.Array) -> jax.Array:
        if self.shift_factor:
            x = x - self.shift_factor
        return x * self.scaling_factor

    def unscale(self, x: jax.Array) -> jax.Array:
        x = x / self.scaling_factor
        return x + self.shift_factor if self.shift_factor else x

    def encode(self, x: jax.Array):
        z = self.encoder(x)
        if self.use_quant_conv:
            z = self.quant_conv(z)
        if self.double_z:
            return DiagonalGaussian.from_params(z)
        return IdentityDistribution(z)

    def decode(self, z: jax.Array) -> jax.Array:
        if self.use_post_quant_conv:
            z = self.post_quant_conv(z)
        return self.decoder(z)

    def __call__(self, x: jax.Array, key: Optional[jax.Array] = None):
        """Full round trip (used for init); returns (recon, dist)."""
        dist = self.encode(x)
        z = dist.sample(key) if key is not None else dist.mode()
        return self.decode(z.astype(x.dtype)), dist
