"""OpenSoraPlan-style causal 3D KL VAE (flax, channels-last).

Behavioral parity with `diffnext/models/autoencoders/autoencoder_kl_opensora.py`:
- causal Conv3d via front replication padding on time (`:30-40`)
- mixed 2D/3D stages selected by block-type strings, with the 2D->3D frame
  fold/unfold at the stage transition (`:88-90,166-167`)
- frame-windowed (per-frame spatial) attention in the mid block (`:55-67`)
- spatiotemporal stride-2 downsampling with asymmetric spatial padding
  (`:87-91`), trilinear x2 upsampling with the first-frame special case
  (`:82-86`), spatial-only upsampling for (1,3,3) stages (`:92-93,186`)
- temporal tiling: 17-frame encode / 5-latent decode windows, overlap 1
  (`:229`, modeling_utils.TilingMixin)

Layout: videos are (B, T, H, W, C); 2D phases run frames folded into batch.
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nova_pointcloud_tpu.models.autoencoders.modeling_utils import (
    DiagonalGaussian,
    tiled_temporal_apply,
)


def fold_time(x: jax.Array) -> Tuple[jax.Array, int]:
    """(B, T, H, W, C) -> ((B*T, H, W, C), T)."""
    b, t = x.shape[:2]
    return x.reshape((b * t,) + x.shape[2:]), t


def unfold_time(x: jax.Array, t: int) -> jax.Array:
    return x.reshape((-1, t) + x.shape[1:])


class CausalConv3d(nn.Module):
    """3D conv, causal on time via front replication pad (`:30-40`)."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    spatial_pad: Optional[int] = None  # None = kh//2 (SAME for stride 1)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kt, kh, kw = self.kernel
        if kt > 1:
            front = jnp.repeat(x[:, :1], kt - 1, axis=1)
            x = jnp.concatenate([front, x], axis=1)
        ph = self.spatial_pad if self.spatial_pad is not None else kh // 2
        pw = self.spatial_pad if self.spatial_pad is not None else kw // 2
        pad = [(0, 0), (ph, ph), (pw, pw)]
        return nn.Conv(self.features, self.kernel, strides=self.strides,
                       padding=pad, dtype=self.dtype, name="conv")(x)


class Conv2dStage(nn.Module):
    """2D conv applied frame-wise on folded video / plain images."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: int = 1
    padding: Any = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(self.features, self.kernel, strides=self.strides,
                       padding=self.padding, dtype=self.dtype, name="conv")(x)


class ResBlock(nn.Module):
    """GN-SiLU-Conv x2, 2D or causal-3D by ``three_d`` (`:97-112`)."""

    out_dim: int
    three_d: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        conv = (lambda f, k, name: CausalConv3d(f, (k,) * 3, dtype=self.dtype,
                                                name=name)) if self.three_d \
            else (lambda f, k, name: Conv2dStage(f, (k, k), padding=k // 2,
                                                 dtype=self.dtype, name=name))
        shortcut = x
        if x.shape[-1] != self.out_dim:
            shortcut = conv(self.out_dim, 1, "conv_shortcut")(x)
        h = nn.silu(nn.GroupNorm(32, epsilon=1e-6, name="norm1")(x))
        h = conv(self.out_dim, 3, "conv1")(h)
        h = nn.silu(nn.GroupNorm(32, epsilon=1e-6, name="norm2")(h))
        h = conv(self.out_dim, 3, "conv2")(h)
        return h + shortcut


class FrameAttention(nn.Module):
    """Per-frame spatial attention (frame windows, `:41-66`).

    Explicit to_q/to_k/to_v/to_out projections matching the reference's
    `Attention` module 1:1 so OpenSoraPlan torch checkpoints load directly
    (the flax-MHA form used in round 1 had an incompatible split-head
    parameterization plus an extra out projection).
    """

    dim: int
    num_heads: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        video = x.ndim == 5
        y = nn.GroupNorm(32, epsilon=1e-6, name="group_norm")(x)
        if video:
            y, t = fold_time(y)
        b, h, w, c = y.shape
        hd = c // self.num_heads
        y = y.reshape(b, h * w, c)
        q = nn.Dense(self.dim, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(self.dim, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(self.dim, dtype=self.dtype, name="to_v")(y)
        if self.num_heads > 1:
            q = q.reshape(b, h * w, self.num_heads, hd)
            k = k.reshape(b, h * w, self.num_heads, hd)
            v = v.reshape(b, h * w, self.num_heads, hd)
            o = nn.dot_product_attention(q, k, v, dtype=self.dtype)
            o = o.reshape(b, h * w, c)
        else:
            logits = jnp.einsum("bqd,bkd->bqk", q, k) * (c ** -0.5)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            o = jnp.einsum("bqk,bkd->bqd", probs.astype(v.dtype), v)
        y = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(o)
        y = y.reshape(b, h, w, c)
        return unfold_time(y, t) if video else y


class MidBlock(nn.Module):
    dim: int
    three_d: bool = False
    depth: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = ResBlock(self.dim, self.three_d, self.dtype, name="resnets_0")(x)
        for i in range(self.depth):
            a = FrameAttention(self.dim, dtype=self.dtype,
                               name=f"attentions_{i}")(x)
            x = ResBlock(self.dim, self.three_d, self.dtype,
                         name=f"resnets_{i + 1}")(x + a)
        return x


class Downsample(nn.Module):
    """Stride-2 with asymmetric right/bottom pad; 3D also halves time causally."""

    dim: int
    three_d: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.three_d:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
            return CausalConv3d(self.dim, (3, 3, 3), strides=(2, 2, 2),
                                spatial_pad=0, dtype=self.dtype, name="resize")(x)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return Conv2dStage(self.dim, (3, 3), strides=2, padding="VALID",
                           dtype=self.dtype, name="resize")(x)


class Upsample(nn.Module):
    """x2 upsampling: 2D nearest / 3D trilinear with first-frame case /
    spatial-only for (1,3,3) stages (`:81-94,186`)."""

    dim: int
    mode: str  # "2d" | "3d_trilinear" | "3d_spatial"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.mode == "2d":
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            return Conv2dStage(self.dim, (3, 3), padding=1, dtype=self.dtype,
                               name="resize")(x)
        b, t, h, w, c = x.shape
        if self.mode == "3d_spatial":
            x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
            return CausalConv3d(self.dim, (1, 3, 3), dtype=self.dtype,
                                name="resize")(x)
        # trilinear: frame 0 spatial-only, frames 1: temporal+spatial
        first = jax.image.resize(x[:, :1], (b, 1, 2 * h, 2 * w, c), "trilinear")
        if t > 1:
            rest = jax.image.resize(x[:, 1:], (b, 2 * (t - 1), 2 * h, 2 * w, c),
                                    "trilinear")
            x = jnp.concatenate([first, rest], axis=1)
        else:
            x = first
        return CausalConv3d(self.dim, (3, 3, 3), dtype=self.dtype,
                            name="resize")(x)


def _is3d(block_type: str) -> bool:
    return "2D" not in block_type


class Encoder(nn.Module):
    """Mixed 2D/3D encoder (`:147-173`); input (B, T, H, W, C)."""

    out_dim: int
    block_types: Sequence[str]
    block_dims: Sequence[int]
    block_depth: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h, t = fold_time(x)
        h = Conv2dStage(self.block_dims[0], (3, 3), padding=1,
                        dtype=self.dtype, name="conv_in")(h)
        folded = True
        for i, (btype, dim) in enumerate(zip(self.block_types, self.block_dims)):
            stage_3d = _is3d(btype)
            if stage_3d and folded:
                h, folded = unfold_time(h, t), False
            for j in range(self.block_depth):
                h = ResBlock(dim, stage_3d, self.dtype,
                             name=f"down_{i}_res_{j}")(h)
            if i < len(self.block_dims) - 1:
                down_3d = _is3d(self.block_types[i + 1])
                if down_3d and folded:
                    h, folded = unfold_time(h, t), False
                h = Downsample(dim, down_3d, self.dtype,
                               name=f"down_{i}_resize")(h)
                t = h.shape[1] if not folded else t
        last_3d = _is3d(self.block_types[-1])
        h = MidBlock(self.block_dims[-1], last_3d, dtype=self.dtype,
                     name="mid_block")(h)
        h = nn.silu(nn.GroupNorm(32, epsilon=1e-6, name="conv_norm_out")(h))
        if last_3d:
            h = CausalConv3d(self.out_dim, (3, 3, 3), dtype=self.dtype,
                             name="conv_out")(h)
        else:
            h = Conv2dStage(self.out_dim, (3, 3), padding=1, dtype=self.dtype,
                            name="conv_out")(h)
            h = unfold_time(h, t)
        return h


class Decoder(nn.Module):
    """Mixed 3D/2D decoder (`:176-201`); latents (B, T', H', W', C)."""

    out_dim: int
    block_types: Sequence[str]  # encoder order; reversed here like `:181`
    block_dims: Sequence[int]
    block_depth: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        dims = list(reversed(self.block_dims))
        types = list(reversed(self.block_types))
        deep_3d = _is3d(types[0])
        h = (CausalConv3d(dims[0], (3, 3, 3), dtype=self.dtype, name="conv_in")
             if deep_3d else Conv2dStage(dims[0], (3, 3), padding=1,
                                         dtype=self.dtype, name="conv_in"))(z)
        h = MidBlock(dims[0], deep_3d, dtype=self.dtype, name="mid_block")(h)
        folded = not deep_3d
        t = h.shape[1] if not folded else None
        for i, (btype, dim) in enumerate(zip(types, dims)):
            stage_3d = _is3d(btype)
            if not stage_3d and not folded:
                h, t_cur = fold_time(h)
                folded, t = True, t_cur
            for j in range(self.block_depth + 1):
                h = ResBlock(dim, stage_3d, self.dtype, name=f"up_{i}_res_{j}")(h)
            if i < len(dims) - 1:
                if stage_3d:
                    # the reference gives the upsampler a (1,3,3) kernel (=>
                    # spatial-only repeat upsample) at the last two positions
                    # (`:188` kernel_size = 3 if i < len-2 else (1,3,3);
                    # Resize `:76-79` maps kt==1 to spatial mode)
                    mode = "3d_trilinear" if i < len(dims) - 2 else "3d_spatial"
                    h = Upsample(dim, mode, self.dtype, name=f"up_{i}_resize")(h)
                else:
                    h = Upsample(dim, "2d", self.dtype, name=f"up_{i}_resize")(h)
        h = nn.silu(nn.GroupNorm(32, epsilon=1e-6, name="conv_norm_out")(h))
        last_3d = _is3d(types[-1])
        if last_3d:
            return CausalConv3d(self.out_dim, (3, 3, 3), dtype=self.dtype,
                                name="conv_out")(h)
        h = Conv2dStage(self.out_dim, (3, 3), padding=1, dtype=self.dtype,
                        name="conv_out")(h)
        return unfold_time(h, t)


class AutoencoderKLOpenSora(nn.Module):
    """Causal 3D KL VAE with temporal tiling (`:204-268`)."""

    in_channels: int = 3
    out_channels: int = 3
    down_block_types: Tuple[str, ...] = ("DownEncoderBlock2D",
                                         "DownEncoderBlock3D",
                                         "DownEncoderBlock3D",
                                         "DownEncoderBlock3D")
    up_block_types: Tuple[str, ...] = ("UpDecoderBlock2D",
                                       "UpDecoderBlock3D",
                                       "UpDecoderBlock3D",
                                       "UpDecoderBlock3D")
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 16
    scaling_factor: float = 0.18215
    shift_factor: Optional[float] = None
    sample_min_t: int = 17
    latent_min_t: int = 5
    dtype: Any = None

    def setup(self):
        self.encoder = Encoder(2 * self.latent_channels, self.down_block_types,
                               self.block_out_channels, self.layers_per_block,
                               self.dtype)
        self.decoder = Decoder(self.out_channels, self.up_block_types,
                               self.block_out_channels, self.layers_per_block,
                               self.dtype)
        self.quant_conv = CausalConv3d(2 * self.latent_channels, (1, 1, 1),
                                       dtype=self.dtype)
        self.post_quant_conv = CausalConv3d(self.latent_channels, (1, 1, 1),
                                            dtype=self.dtype)

    def scale(self, x: jax.Array) -> jax.Array:
        if self.shift_factor:
            x = x - self.shift_factor
        return x * self.scaling_factor

    def unscale(self, x: jax.Array) -> jax.Array:
        x = x / self.scaling_factor
        return x + self.shift_factor if self.shift_factor else x

    def encode(self, x: jax.Array) -> DiagonalGaussian:
        """x: (B, T, H, W, C) or (B, H, W, C) single image."""
        image = x.ndim == 4
        if image:
            x = x[:, None]
        z = tiled_temporal_apply(self.encoder, x, self.sample_min_t, 1, 1)
        z = self.quant_conv(z)
        if image:
            z = z[:, 0]
        return DiagonalGaussian.from_params(z)

    def decode(self, z: jax.Array) -> jax.Array:
        image = z.ndim == 4
        if image:
            z = z[:, None]
        z = self.post_quant_conv(z)
        x = tiled_temporal_apply(self.decoder, z, self.latent_min_t, 1, 1)
        return x[:, 0] if image else x

    def decode_window(self, z: jax.Array) -> jax.Array:
        """Decode ONE temporal window (<= latent_min_t latents), no tiling.

        post_quant_conv is a 1x1x1 causal conv (pointwise in time), so
        splitting windows before it is exact; the image processor loops
        windows through separate jit programs so only one window's decoder
        activations live in HBM at a time (a single program holding every
        window of a 33-frame 480p decode exhausts a 16GB chip).
        """
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jax.Array, key: Optional[jax.Array] = None):
        dist = self.encode(x)
        z = dist.sample(key) if key is not None else dist.mode()
        return self.decode(z.astype(x.dtype)), dist
