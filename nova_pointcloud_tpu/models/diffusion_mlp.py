"""Per-token non-quantized diffusion head ("1D token-wise diffusion").

Behavioral parity with `diffnext/models/diffusion_mlp.py:26-99`: 6 AdaLN-gated
MLP blocks conditioned on (timestep, z), final AdaLN + linear head.

TPU-first difference: the reference gathers a dynamic-size token subset by
``pred_ids`` and scatters predictions back (`diffusion_mlp.py:89-99`). Here the
*caller* hands in a fixed-size padded token slice (ops/masking.pred_slice) and
handles the masked scatter — the head itself is a dense shape-static stack
that vmaps/scans cleanly over diffusion steps and CFG passes.
"""

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from nova_pointcloud_tpu.models.embeddings import timestep_freq_embed
from nova_pointcloud_tpu.models.normalization import AdaLayerNormZero


class Projector(nn.Module):
    """fc1 -> SiLU -> fc2 (`diffusion_mlp.py:26-36`)."""

    dim: int
    mlp_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(self.mlp_dim or self.dim, dtype=self.dtype, name="fc1")(x)
        return nn.Dense(self.out_dim or self.dim, dtype=self.dtype, name="fc2")(nn.silu(h))


class DiffusionBlock(nn.Module):
    """AdaLN-zero gated residual MLP block (`diffusion_mlp.py:39-53`)."""

    dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, z: jax.Array) -> jax.Array:
        h, (gate,) = AdaLayerNormZero(self.dim, num_stats=3, name="norm1")(x, z)
        h = Projector(self.dim, self.dim, self.dim, dtype=self.dtype, name="proj")(h)
        return nn.LayerNorm(name="norm2")(h) * gate + x


class TimeCondEmbed(nn.Module):
    """Fused timestep + condition embedding (`diffusion_mlp.py:56-75`)."""

    cond_dim: int
    embed_dim: int
    freq_dim: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, timestep: jax.Array, z: jax.Array) -> jax.Array:
        freq = timestep_freq_embed(timestep, self.freq_dim).astype(z.dtype)
        t = Projector(self.freq_dim, self.embed_dim, self.embed_dim,
                      dtype=self.dtype, name="timestep_proj")(freq)
        if t.ndim == z.ndim - 1:
            t = t[:, None]
        return Projector(self.cond_dim, self.embed_dim, self.embed_dim,
                         dtype=self.dtype, name="condition_proj")(z) + t


class DiffusionMLP(nn.Module):
    """Dense per-token diffusion head.

    Inputs: x (B, P, in_dim) noisy patch tokens; timestep (B,) or (B, P);
    z (B, P, cond_dim) AR-transformer conditioning. Output (B, P, in_dim).
    """

    depth: int
    embed_dim: int
    cond_dim: int
    out_dim: int  # = patch_size**2 * image_dim (or point patch dim)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, timestep: jax.Array, z: jax.Array) -> jax.Array:
        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="patch_proj")(x)
        zc = TimeCondEmbed(self.cond_dim, self.embed_dim, dtype=self.dtype,
                           name="time_cond_embed")(timestep, z)
        for i in range(self.depth):
            h = DiffusionBlock(self.embed_dim, dtype=self.dtype, name=f"blocks_{i}")(h, zc)
        h, _ = AdaLayerNormZero(self.embed_dim, num_stats=2, name="norm")(h, zc)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="head")(h)
