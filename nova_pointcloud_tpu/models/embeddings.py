"""Positional / conditioning embeddings (flax.linen + pure jnp helpers).

Behavioral parity with `diffnext/models/embeddings.py`:
- RotaryEmbed3D: 3-axis RoPE with head_dim split d/8 + 2x((d-d/8)/2)
  (`embeddings.py:27-67`); implemented as pure cos/sin tables + an apply fn so
  XLA fuses it into the attention matmuls (the reference torch.compiles it).
- PosEmbed (2D sincos, `:70-91`), VideoPosEmbed (+time MLP, `:94-115`),
- MotionEmbed (flow/fps sincos->MLP, `:118-136`),
- PatchEmbed (+patchify/unpatchify, `:139-166`),
- TextEmbed (learned null-prompt bank + proj + LN, train dropout, `:169-206`),
- LabelEmbed (class embeds with CFG dropout, `:209-223`),
- MaskTokens (bos/mask tokens; the mask *logic* lives in ops/masking.py).
"""

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Rotary 3D
# ---------------------------------------------------------------------------


def rope_axis_dims(head_dim: int) -> Tuple[int, int, int]:
    """Split head_dim across (t, h, w): d/8 + 2x((d - d/8)/2)."""
    dt = head_dim // 8
    ds = (head_dim - dt) // 2
    return dt, ds, ds


def rope_positions(t: int, hw: Tuple[int, int]) -> jax.Array:
    """Dense (1, t*h*w, 3) grid of (t, y, x) positions (`embeddings.py:52-57`)."""
    h, w = hw
    tt, yy, xx = jnp.meshgrid(jnp.arange(t), jnp.arange(h), jnp.arange(w),
                              indexing="ij")
    pos = jnp.stack([tt, yy, xx], axis=-1).reshape(1, -1, 3)
    return pos.astype(jnp.float32)


def rope_weights(pos: jax.Array, head_dim: int, theta: float = 10000.0,
                 pad: int = 0) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for 3-axis RoPE.

    pos: (B, L, 3). Returns (cos, sin), each (B, 1, pad+L, head_dim//2).
    ``pad`` prepends zero positions for a conditioning prefix (text tokens),
    matching the ``pad`` argument at `embeddings.py:59-61`.
    """
    if pad:
        zeros = jnp.zeros(pos.shape[:1] + (pad, 3), pos.dtype)
        pos = jnp.concatenate([zeros, pos], axis=1)
    parts_cos, parts_sin = [], []
    for i, d_axis in enumerate(rope_axis_dims(head_dim)):
        scale = jnp.arange(0, d_axis, 2, dtype=jnp.float32) / d_axis
        inv_freq = 1.0 / (theta ** scale)  # (d_axis/2,)
        angle = pos[..., i:i + 1] * inv_freq  # (B, L, d_axis/2)
        parts_cos.append(jnp.cos(angle))
        parts_sin.append(jnp.sin(angle))
    cos = jnp.concatenate(parts_cos, axis=-1)[:, None]
    sin = jnp.concatenate(parts_sin, axis=-1)[:, None]
    return cos, sin


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate interleaved pairs: (x0, x1) -> (c*x0 - s*x1, s*x0 + c*x1).

    x: (B, H, L, D); cos/sin: (B, 1, L, D/2). Matches ApplyFunc at
    `embeddings.py:30-43`.
    """
    shape = x.shape
    xp = x.reshape(shape[:-1] + (shape[-1] // 2, 2))
    x0, x1 = xp[..., 0], xp[..., 1]
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    out = jnp.stack([cos * x0 - sin * x1, sin * x0 + cos * x1], axis=-1)
    return out.reshape(shape)


def gather_rope(cos: jax.Array, sin: jax.Array, ids: jax.Array,
                pad: int = 0) -> Tuple[jax.Array, jax.Array]:
    """Select RoPE rows for a token-id subset (decode path).

    cos/sin: (B, 1, L, D/2) tables WITHOUT prefix; ids: (B, P) into L.
    Returns tables of length pad+P with zero-angle prefix rows.
    """
    def sel(w, prefix_value):
        g = jnp.take_along_axis(w[:, 0], ids[..., None], axis=1)[:, None]
        if pad:
            prefix_shape = g.shape[:2] + (pad, g.shape[-1])
            g = jnp.concatenate([jnp.full(prefix_shape, prefix_value, g.dtype), g],
                                axis=2)
        return g

    return sel(cos, 1.0), sel(sin, 0.0)  # zero angle: cos=1, sin=0


# ---------------------------------------------------------------------------
# Sincos absolute embeddings
# ---------------------------------------------------------------------------


def sincos_2d(dim: int, h: int, w: int, base_hw: Tuple[int, int]) -> np.ndarray:
    """2D sincos table (h*w, dim) (`embeddings.py:78-88`)."""
    quarter = dim // 4
    freq = 1.0 / (10000 ** (np.arange(quarter, dtype=np.float32) / quarter))
    grid_h = np.arange(h, dtype=np.float32) * (base_hw[0] / h)
    grid_w = np.arange(w, dtype=np.float32) * (base_hw[1] / w)
    gw, gh = np.meshgrid(grid_w, grid_h)  # indexing="xy"
    fw = gw.reshape(-1, 1) * freq[None]
    fh = gh.reshape(-1, 1) * freq[None]
    return np.concatenate([np.sin(fw), np.cos(fw), np.sin(fh), np.cos(fh)],
                          axis=-1).astype(np.float32)


def sincos_time(num: int, base_t: int, freq_dim: int = 128) -> np.ndarray:
    """Per-frame sincos (num, 1, 2*freq_dim) (`embeddings.py:103-110`)."""
    freq = 1.0 / (10000 ** (np.arange(freq_dim, dtype=np.float32) / freq_dim))
    grid = np.arange(num, dtype=np.float32) / (num / base_t)
    f = grid[:, None, None] * freq[None, None, :]
    return np.concatenate([np.sin(f), np.cos(f)], axis=-1).astype(np.float32)


def timestep_freq_embed(timestep: jax.Array, freq_dim: int = 256) -> jax.Array:
    """Sinusoidal diffusion-timestep features (`diffusion_mlp.py:65-71`)."""
    half = freq_dim // 2
    log_theta = math.log(10000.0)
    freq = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-log_theta / half))
    emb = timestep[..., None].astype(jnp.float32) * freq
    return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)


class PosEmbed(nn.Module):
    """Additive 2D sincos position embedding."""

    dim: int
    base_size: Tuple[int, int] = (16, 16)

    @nn.compact
    def __call__(self, x: jax.Array, hw: Optional[Tuple[int, int]] = None) -> jax.Array:
        h, w = hw or self.base_size
        table = jnp.asarray(sincos_2d(self.dim, h, w, self.base_size))
        return x + table.astype(x.dtype)


class VideoPosEmbed(nn.Module):
    """2D sincos space + learned-MLP time embedding (`embeddings.py:94-115`)."""

    dim: int
    base_size: Tuple[int, int, int] = (16, 16, 16)  # (t, h, w)

    def setup(self):
        self.time_fc1 = nn.Dense(self.dim, name="time_fc1")
        self.time_fc2 = nn.Dense(self.dim, name="time_fc2")
        # torch-default eps (reference embeddings.py:99 LayerNorm(dim))
        self.time_norm = nn.LayerNorm(epsilon=1e-5, name="time_norm")

    def time_embed(self, num_frames: int) -> jax.Array:
        """(num_frames, 1, dim) learned projection of time sincos."""
        sincos = jnp.asarray(sincos_time(num_frames, self.base_size[0]))
        return self.time_norm(self.time_fc2(nn.silu(self.time_fc1(sincos))))

    def __call__(self, x: jax.Array, hw: Optional[Tuple[int, int]] = None,
                 add_time: bool = True) -> jax.Array:
        # x: (B, T, N, D) or (B, N, D)
        if x.ndim == 4 and add_time:
            te = self.time_embed(x.shape[1])
            x = x + te[None].astype(x.dtype)
        h, w = hw or self.base_size[1:]
        table = jnp.asarray(sincos_2d(self.dim, h, w, self.base_size[1:]))
        return x + table.astype(x.dtype)


class MotionEmbed(nn.Module):
    """Flow/fps conditioning tokens (`embeddings.py:118-136`)."""

    dim: int
    base_flow: float = 5.0
    base_fps: float = 12.0
    freq_dim: int = 128

    def _one(self, values: jax.Array, name: str) -> jax.Array:
        values = values.reshape(values.shape[0])  # accept (B,) or (B, 1)
        freq = 1.0 / (10000 ** (jnp.arange(self.freq_dim, dtype=jnp.float32)
                                / self.freq_dim))
        f = values[:, None, None].astype(jnp.float32) * freq[None, None]
        sincos = jnp.concatenate([jnp.sin(f), jnp.cos(f)], axis=-1)
        h = nn.Dense(self.dim, name=f"{name}_fc1")(sincos)
        return nn.Dense(self.dim, name=f"{name}_fc2")(nn.silu(h))

    @nn.compact
    def __call__(self, batch: int, flow: Optional[jax.Array] = None,
                 fps: Optional[jax.Array] = None) -> jax.Array:
        flow = jnp.full((batch,), self.base_flow) if flow is None else flow
        fps = jnp.full((batch,), self.base_fps) if fps is None else fps
        return jnp.concatenate([self._one(flow, "flow"), self._one(fps, "fps")],
                               axis=1)


# ---------------------------------------------------------------------------
# Patch embedding
# ---------------------------------------------------------------------------


def patchify(x: jax.Array, patch_size: int) -> jax.Array:
    """(B, H, W, C) -> (B, h*w, p*p*C) with NOVA's (p_h, p_w, C) layout.

    Matches `PatchEmbed.patchify` (`embeddings.py:152-154`), which flattens
    (patch_h, patch_w, channels) innermost in that order.
    """
    b, h, w, c = x.shape
    p = patch_size
    x = x.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // p) * (w // p), p * p * c)


def unpatchify(x: jax.Array, patch_size: int, hw: Tuple[int, int]) -> jax.Array:
    """(B, h*w, p*p*C) -> (B, H, W, C), inverse of :func:`patchify`."""
    b, n, d = x.shape
    p = patch_size
    h, w = hw
    c = d // (p * p)
    x = x.reshape(b, h, w, p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * p, w * p, c)


class PatchEmbed(nn.Module):
    """Linear patch projection; channels-last (TPU conv layout)."""

    embed_dim: int
    patch_size: int

    @nn.compact
    def __call__(self, x: jax.Array, pre_patchified: bool = False) -> jax.Array:
        # (B, H, W, C) or (B, T, H, W, C) -> tokens (B[, T], N, D)
        if pre_patchified:  # (B, N, p*p*C) already in patch space
            return nn.Dense(self.embed_dim, name="proj")(x)
        video = x.ndim == 5
        if video:
            b, t = x.shape[:2]
            x = x.reshape((b * t,) + x.shape[2:])
        tokens = patchify(x, self.patch_size)
        tokens = nn.Dense(self.embed_dim, name="proj")(tokens)
        if video:
            tokens = tokens.reshape(b, t, tokens.shape[1], self.embed_dim)
        return tokens


# ---------------------------------------------------------------------------
# Text / label conditioning
# ---------------------------------------------------------------------------


class TextEmbed(nn.Module):
    """Project encoder hidden states into the model dim (`embeddings.py:169-206`).

    Holds a learned *null prompt* bank used for (a) padding beyond each
    prompt's length, (b) CFG negative embeddings, (c) train-time dropout.
    """

    token_dim: int
    embed_dim: int
    num_tokens: int = 256
    dropout: float = 0.1
    max_positions: int = 512

    def setup(self):
        self.null_prompt = self.param("null_prompt", nn.initializers.normal(0.02),
                                      (self.max_positions, self.token_dim))
        self.proj = nn.Dense(self.embed_dim, name="proj")
        # torch-default eps (reference embeddings.py:175)
        self.norm = nn.LayerNorm(epsilon=1e-5, name="norm")

    def null_bank(self) -> jax.Array:
        return self.null_prompt

    def pad_embeds(self, embeds: jax.Array, lengths: Optional[jax.Array] = None) -> jax.Array:
        """Replace positions >= length with the null bank rows."""
        bank = self.null_bank()[: embeds.shape[1]].astype(embeds.dtype)
        if lengths is None:
            return embeds
        idx = jnp.arange(embeds.shape[1])[None, :, None]
        keep = idx < lengths[:, None, None]
        return jnp.where(keep, embeds, bank[None])

    def null_embeds(self, batch: int, length: Optional[int] = None) -> jax.Array:
        bank = self.null_bank()[: (length or self.num_tokens)]
        return jnp.broadcast_to(bank[None], (batch,) + bank.shape)

    def drop_prompts(self, embeds: jax.Array, rng: jax.Array) -> jax.Array:
        """Train-time CFG dropout: whole prompts -> null bank rows."""
        bank = self.null_bank()[: embeds.shape[1]].astype(embeds.dtype)
        drop = jax.random.uniform(rng, (embeds.shape[0], 1, 1)) < self.dropout
        return jnp.where(drop, bank[None], embeds)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.norm(self.proj(x))


class LabelEmbed(nn.Module):
    """Class-label embedding with a null class for CFG (`embeddings.py:209-223`)."""

    embed_dim: int
    num_classes: int = 1000
    dropout: float = 0.1

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 rng: Optional[jax.Array] = None) -> jax.Array:
        if input_ids.ndim == 1:
            input_ids = input_ids[:, None]
        table = self.param("weight", nn.initializers.normal(0.02),
                           (self.num_classes + (self.dropout > 0), self.embed_dim))
        if rng is not None and self.dropout > 0:
            keep = jax.random.uniform(rng, input_ids.shape) > self.dropout
            input_ids = jnp.where(keep, input_ids, self.num_classes)
        # torch-default eps (reference embeddings.py:216)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(table[input_ids])


class MaskTokens(nn.Module):
    """Learned BOS / mask tokens (`embeddings.py:232-234`)."""

    embed_dim: int

    def setup(self):
        self.bos_token = self.param("bos_token", nn.initializers.normal(0.02),
                                    (1, self.embed_dim))
        self.mask_token = self.param("mask_token", nn.initializers.normal(0.02),
                                     (1, self.embed_dim))

    def apply_mask(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        """x*(1-mask) + mask_token*mask; mask (B, N, 1), 1 = masked."""
        mask = mask.astype(x.dtype)
        return x * (1.0 - mask) + self.mask_token.astype(x.dtype) * mask

    def bos(self, shape: Sequence[int]) -> jax.Array:
        """Broadcast the BOS token to (..., embed_dim)."""
        return jnp.broadcast_to(self.bos_token, tuple(shape) + (self.embed_dim,))

    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        return self.apply_mask(x, mask)
