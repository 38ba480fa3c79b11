"""Full Diffusion Transformer (DiT) — alternative decoder architecture.

Parity with `diffnext/models/diffusion_transformer.py:30-151` (defined in the
reference as an alternative to the DiffusionMLP head, never wired in): AdaLN-
Zero or AdaLN-Single conditioned attention+MLP blocks with RoPE, an optional
spatiotemporal-guidance skip path (`:74-110` stg_skip), timestep embedding,
and a patchified head.
"""

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nova_pointcloud_tpu.models.diffusion_mlp import Projector
from nova_pointcloud_tpu.models.embeddings import (
    apply_rope,
    rope_positions,
    rope_weights,
    timestep_freq_embed,
)
from nova_pointcloud_tpu.models.normalization import AdaLayerNormSingle, AdaLayerNormZero
from nova_pointcloud_tpu.ops.attention import attention


class DiTBlock(nn.Module):
    """AdaLN-Zero gated attention + MLP block (`diffusion_transformer.py:44-110`)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    single_ada: bool = False  # AdaLayerNormSingle (shared bias) variant
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, z: jax.Array,
                 rope: Optional[Tuple[jax.Array, jax.Array]] = None,
                 stg_skip: bool = False) -> jax.Array:
        norm_cls = AdaLayerNormSingle if self.single_ada else AdaLayerNormZero
        h, (gate_attn,) = norm_cls(self.dim, num_stats=3, name="norm1")(x, z)
        if stg_skip:  # spatiotemporal-guidance perturbed path: identity attn
            attn_out = h
        else:
            b, l, _ = h.shape
            head_dim = self.dim // self.num_heads
            qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(h)
            qkv = qkv.reshape(b, l, 3, self.num_heads, head_dim)
            q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
            if rope is not None:
                q, k = apply_rope(q, *rope), apply_rope(k, *rope)
            o = attention(q, k, v)
            attn_out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(
                o.transpose(0, 2, 1, 3).reshape(b, l, self.dim))
        x = x + attn_out * gate_attn
        h, (gate_mlp,) = norm_cls(self.dim, num_stats=3, name="norm2")(x, z)
        h = Projector(self.dim, int(self.dim * self.mlp_ratio), self.dim,
                      dtype=self.dtype, name="mlp")(h)
        return x + h * gate_mlp


class DiffusionTransformer(nn.Module):
    """Patch tokens + timestep + condition -> denoised patch tokens."""

    depth: int = 12
    embed_dim: int = 768
    num_heads: int = 12
    cond_dim: Optional[int] = None
    out_dim: int = 16
    base_size: Tuple[int, int] = (16, 16)
    rotary: bool = True
    single_ada: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, timestep: jax.Array,
                 z: Optional[jax.Array] = None,
                 stg_skip: bool = False) -> jax.Array:
        """x: (B, N, in_dim) noisy patch tokens; z: (B, N, cond_dim)|None."""
        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="patch_proj")(x)
        t = Projector(256, self.embed_dim, self.embed_dim, dtype=self.dtype,
                      name="time_embed")(
            timestep_freq_embed(timestep, 256).astype(h.dtype))
        cond = t[:, None] if t.ndim == 2 else t
        if z is not None:
            cond = cond + Projector(z.shape[-1], self.embed_dim,
                                    self.embed_dim, dtype=self.dtype,
                                    name="cond_embed")(z)
        if self.single_ada:
            # shared stats projection; blocks add their learned bias
            # (`diffusion_transformer.py` AdaLayerNormSingle usage)
            cond = nn.Dense(3 * self.embed_dim, dtype=self.dtype,
                            name="shared_ada_proj")(nn.silu(cond))
        rope = None
        if self.rotary:
            pos = rope_positions(1, self.base_size)
            rope = rope_weights(pos, self.embed_dim // self.num_heads)
        for i in range(self.depth):
            skip = stg_skip and i == self.depth // 2
            h = DiTBlock(self.embed_dim, self.num_heads,
                         single_ada=self.single_ada, dtype=self.dtype,
                         name=f"blocks_{i}")(h, cond, rope, skip)
        h, _ = AdaLayerNormZero(self.embed_dim, num_stats=2, name="norm")(h, cond)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="head")(h)
