"""LTX-Video causal 3D KL VAE (flax, channels-last).

Behavioral parity with `diffnext/models/autoencoders/autoencoder_kl_ltx.py`:
- causal / symmetric-time Conv3d (`:29-42`)
- RMSNorm in fp32 (`:45-50`)
- residual pixel-shuffle Downsample (space/time-to-depth + group-mean
  shortcut, `:114-129`) and Upsample (depth-to-space + channel-repeat
  shortcut, first (r-1) frames dropped, `:132-147`)
- spatial patchify p=4 into channels at the encoder stem (`:212-216`)
- encoder emits latent_channels+1 (shared logvar via the odd-channel
  DiagonalGaussian trick, `:206,`modeling_utils.py:43-44`)
- timestep-conditioned decoder: per-UpBlock TimeEmbed, final
  scale_shift_table, learnable timestep_scale (`:223-247`)
- per-channel latents_mean/std scaling buffers (`:276-292`)
- the reference's `tiled_decoder(temb=)` bug (`:308`) is fixed by threading
  temb through the tiling closure.
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from einops import rearrange

from nova_pointcloud_tpu.models.autoencoders.modeling_utils import (
    DiagonalGaussian,
    tiled_temporal_apply,
)
from nova_pointcloud_tpu.models.embeddings import timestep_freq_embed


class LTXConv3d(nn.Module):
    """3D conv; time pad is replicate front (causal) or symmetric."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    causal: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kt, kh, kw = self.kernel
        if kt > 1:
            if self.causal:
                front = jnp.repeat(x[:, :1], kt - 1, axis=1)
                x = jnp.concatenate([front, x], axis=1)
            else:
                half = (kt - 1) // 2
                front = jnp.repeat(x[:, :1], half, axis=1)
                back = jnp.repeat(x[:, -1:], half, axis=1)
                x = jnp.concatenate([front, x, back], axis=1)
        pad = [(0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)]
        return nn.Conv(self.features, self.kernel, padding=pad,
                       dtype=self.dtype, name="conv")(x)


def rms_norm(x: jax.Array) -> jax.Array:
    """Parameter-free RMSNorm over channels, fp32 accumulate (`:45-50`)."""
    ms = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(ms + 1e-8)).astype(x.dtype)


class TimeEmbed(nn.Module):
    """Freq embed -> SiLU MLP (`:53-73`)."""

    embed_dim: int
    freq_dim: int = 256

    @nn.compact
    def __call__(self, temb: jax.Array) -> jax.Array:
        x = timestep_freq_embed(temb, self.freq_dim) if temb.ndim == 1 else temb
        h = nn.Dense(self.embed_dim, name="fc1")(x)
        return nn.Dense(self.embed_dim, name="fc2")(nn.silu(h))


class LTXResBlock(nn.Module):
    """RMS -> (adaLN from temb) -> conv x2 + shortcut (`:76-94`)."""

    out_dim: int
    causal: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, temb: Optional[jax.Array] = None) -> jax.Array:
        shortcut = x
        stats = None
        if not self.causal and temb is not None:
            table = self.param("scale_shift_table",
                               nn.initializers.normal(x.shape[-1] ** -0.5),
                               (4, x.shape[-1]))
            s = temb + table.reshape(-1)
            stats = jnp.split(s[:, None, None, None, :], 4, axis=-1)
        h = rms_norm(x)
        if stats is not None:
            h = h * (1 + stats[1]) + stats[0]
        h = LTXConv3d(self.out_dim, causal=self.causal, dtype=self.dtype,
                      name="conv1")(nn.silu(h))
        h = rms_norm(h)
        if stats is not None:
            h = h * (1 + stats[3]) + stats[2]
        h = LTXConv3d(self.out_dim, causal=self.causal, dtype=self.dtype,
                      name="conv2")(nn.silu(h))
        return h + shortcut


class LTXDownsample(nn.Module):
    """Residual space/time-to-depth downsample (`:114-129`)."""

    dim: int
    out_dim: int
    stride: Tuple[int, int, int]
    causal: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        r, p, q = self.stride
        vol = r * p * q
        if r > 1:
            front = jnp.repeat(x[:, :1], r - 1, axis=1)
            x = jnp.concatenate([front, x], axis=1)
        patch = "b (t r) (h p) (w q) c -> b t h w (c r p q)"
        shortcut = rearrange(x, patch, r=r, p=p, q=q)
        group = (self.dim * vol) // self.out_dim
        shortcut = shortcut.reshape(shortcut.shape[:-1] + (self.out_dim, group))
        shortcut = jnp.mean(shortcut, axis=-1)
        h = LTXConv3d(self.out_dim // vol, causal=self.causal,
                      dtype=self.dtype, name="conv")(x)
        return rearrange(h, patch, r=r, p=p, q=q) + shortcut


class LTXUpsample(nn.Module):
    """Residual depth-to-space upsample (`:132-147`)."""

    dim: int
    out_dim: int
    stride: Tuple[int, int, int] = (2, 2, 2)
    causal: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        r, p, q = self.stride
        vol = r * p * q
        unpatch = "b t h w (c r p q) -> b (t r) (h p) (w q) c"
        repeats = (self.out_dim * vol) // self.dim
        shortcut = rearrange(jnp.tile(x, (1, 1, 1, 1, repeats)),
                             unpatch, r=r, p=p, q=q)
        h = LTXConv3d(self.out_dim * vol, causal=self.causal,
                      dtype=self.dtype, name="conv")(x)
        h = rearrange(h, unpatch, r=r, p=p, q=q)
        if r > 1:
            h, shortcut = h[:, r - 1:], shortcut[:, r - 1:]
        return h + shortcut


class LTXEncoder(nn.Module):
    """(B, T, Hp, Wp, C) -> (B, T', H', W', latent+1) (`:197-221`)."""

    out_dim: int
    block_dims: Sequence[int]  # len 5
    block_depths: Sequence[int]  # len 5
    patch_size: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pz = self.patch_size
        h = rearrange(x, "b t (h p) (w q) c -> b t h w (c q p)", p=pz, q=pz)
        h = LTXConv3d(self.block_dims[0], dtype=self.dtype, name="conv_in")(h)
        strides = [(1, 2, 2), (2, 1, 1), (2, 2, 2), (2, 2, 2)]
        for i, stride in enumerate(strides):
            for j in range(self.block_depths[i]):
                h = LTXResBlock(self.block_dims[i], dtype=self.dtype,
                                name=f"down_{i}_res_{j}")(h)
            h = LTXDownsample(self.block_dims[i], self.block_dims[i + 1],
                              stride, dtype=self.dtype,
                              name=f"down_{i}_resize")(h)
        for j in range(self.block_depths[-1]):
            h = LTXResBlock(self.block_dims[-1], dtype=self.dtype,
                            name=f"mid_res_{j}")(h)
        h = rms_norm(h)
        return LTXConv3d(self.out_dim + 1, dtype=self.dtype, name="conv_out")(
            nn.silu(h))


class LTXDecoder(nn.Module):
    """Timestep-conditioned decoder (`:224-247`)."""

    out_dim: int
    block_dims: Sequence[int]  # len 4, encoder order
    block_depths: Sequence[int]  # len 4
    patch_size: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, z: jax.Array, temb: jax.Array) -> jax.Array:
        dims = list(reversed(self.block_dims))
        pz = self.patch_size
        timestep_scale = self.param("timestep_scale",
                                    lambda k: jnp.float32(1000.0))
        freq = timestep_freq_embed(temb.astype(jnp.float32) * timestep_scale, 256)

        h = LTXConv3d(dims[0], causal=False, dtype=self.dtype, name="conv_in")(z)
        mid_temb = TimeEmbed(dims[0] * 4, name="mid_time_embed")(freq)
        for j in range(self.block_depths[-1]):
            h = LTXResBlock(dims[0], causal=False, dtype=self.dtype,
                            name=f"mid_res_{j}")(h, mid_temb)
        # the reference builds len(dims)-1 up blocks (`:227-229` zips the
        # reversed dims against block_depths[:-1]; mid consumes depths[-1]),
        # ending at dims[-1] channels: 2^3 temporal / 2^3*patch spatial, the
        # exact inverse of the encoder
        for i, (dim, depth) in enumerate(zip(dims, self.block_depths[:-1])):
            out = dim // 2
            h = LTXUpsample(dim, out, dtype=self.dtype,
                            name=f"up_{i}_resize")(h)
            up_temb = TimeEmbed(out * 4, name=f"up_{i}_time_embed")(freq)
            for j in range(depth):
                h = LTXResBlock(out, causal=False, dtype=self.dtype,
                                name=f"up_{i}_res_{j}")(h, up_temb)
        h = rms_norm(h)
        last = dims[-1]
        table = self.param("scale_shift_table", nn.initializers.normal(1.0),
                           (2, last))
        final_temb = TimeEmbed(last * 2, name="time_embed")(freq)
        s = final_temb + table.reshape(-1)
        shift, scale = jnp.split(s[:, None, None, None, :], 2, axis=-1)
        h = h * (1 + scale) + shift
        h = LTXConv3d(self.out_dim * pz**2, causal=False, dtype=self.dtype,
                      name="conv_out")(nn.silu(h))
        return rearrange(h, "b t h w (c q p) -> b t (h p) (w q) c", p=pz, q=pz)


class AutoencoderKLLTXVideo(nn.Module):
    """LTX causal 3D KL VAE (`:253-312`)."""

    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 1024, 2048)
    layers_per_block: Tuple[int, ...] = (4, 6, 6, 2, 2)
    decoder_block_out_channels: Tuple[int, ...] = (128, 256, 512, 1024)
    decoder_layers_per_block: Tuple[int, ...] = (5, 5, 5, 5)
    latent_channels: int = 128
    scaling_factor: float = 1.0
    shift_factor: Optional[float] = None
    use_latent_stats: bool = False  # per-channel latents_mean/std buffers
    patch_size: int = 4
    sample_min_t: int = 249
    latent_min_t: int = 32
    dtype: Any = None

    def setup(self):
        self.encoder = LTXEncoder(self.latent_channels, self.block_out_channels,
                                  self.layers_per_block, self.patch_size,
                                  self.dtype)
        self.decoder = LTXDecoder(self.out_channels,
                                  self.decoder_block_out_channels,
                                  self.decoder_layers_per_block,
                                  self.patch_size, self.dtype)
        if self.use_latent_stats:
            self.shift_factors = self.param("shift_factors",
                                            nn.initializers.zeros,
                                            (self.latent_channels,))
            self.scaling_factors = self.param("scaling_factors",
                                              nn.initializers.ones,
                                              (self.latent_channels,))

    def scale(self, x: jax.Array) -> jax.Array:
        if self.use_latent_stats:
            return (x - self.shift_factors) * self.scaling_factors
        if self.shift_factor:
            x = x - self.shift_factor
        return x * self.scaling_factor

    def unscale(self, x: jax.Array) -> jax.Array:
        if self.use_latent_stats:
            return x / self.scaling_factors + self.shift_factors
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

    def decode(self, z: jax.Array, temb: Optional[jax.Array] = None) -> jax.Array:
        image = z.ndim == 4
        if image:
            z = z[:, None]
        if temb is None:
            temb = jnp.zeros((z.shape[0],), jnp.float32)
        # fix of the reference bug at `:308`: temb threads through tiling
        x = tiled_temporal_apply(lambda w: self.decoder(w, temb), z,
                                 self.latent_min_t, 0, 1)
        return x[:, 0] if image else x

    def __call__(self, x: jax.Array, key: Optional[jax.Array] = None):
        dist = self.encode(x)
        z = dist.sample(key) if key is not None else dist.mode()
        return self.decode(z.astype(x.dtype)), dist
