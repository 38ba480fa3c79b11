"""Encoder-decoder Vision Transformer (flax.linen), the NOVA workhorse.

Behavioral parity with `diffnext/models/vision_transformer.py:28-146`:
- post-sublayer LayerNorm blocks: x = x + LN(Attn(x)); x = x + LN(MLP(x))
- optional conditioning prefix ``c`` concatenated in front of the tokens
- MAE-style split: the first ``encoder_depth`` blocks see only *visible*
  tokens; mask tokens are reinserted before the remaining blocks
- per-block KV cache for frame-by-frame temporal AR decode
- 3-axis RoPE applied to q/k when position tables are given

TPU-first differences:
- the visible-token gather/scatter (`vision_transformer.py:133-143`) becomes
  key-side attention masking over the full static-length sequence + a select
  that restores masked rows after the encoder half — numerically identical,
  shape-static (see ops/masking.visibility_bias)
- the torch.cat KV cache becomes a preallocated KVCache with
  dynamic_update_slice (ops/attention.py)
"""

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nova_pointcloud_tpu.models.embeddings import apply_rope
from nova_pointcloud_tpu.ops import masking
from nova_pointcloud_tpu.ops.attention import KVCache, attention, cached_attention


class MLP(nn.Module):
    dim: int
    mlp_ratio: float = 4.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="fc1")(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(nn.gelu(h, approximate=False))


class Attention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_impl: str = "auto"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, bias: Optional[jax.Array] = None,
                 rope: Optional[Tuple[jax.Array, jax.Array]] = None,
                 cache: Optional[KVCache] = None,
                 cache_index: Optional[jax.Array] = None,
                 ) -> Tuple[jax.Array, Optional[KVCache]]:
        b, l, _ = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, l, 3, self.num_heads, head_dim)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
        if rope is not None:
            cos, sin = rope
            q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        if cache is not None:
            o, cache = cached_attention(q, k, v, cache, cache_index, bias)
        else:
            o = attention(q, k, v, bias, impl=self.attn_impl)
        o = o.transpose(0, 2, 1, 3).reshape(b, l, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(o), cache


class Block(nn.Module):
    """Post-sublayer-norm transformer block (`vision_transformer.py:67-92`)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    attn_impl: str = "auto"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, bias=None, rope=None, cache=None, cache_index=None):
        attn = Attention(self.dim, self.num_heads, self.qkv_bias,
                         self.attn_impl, dtype=self.dtype, name="attn")
        h, cache = attn(x, bias, rope, cache, cache_index)
        x = x + nn.LayerNorm(name="norm1")(h)
        x = x + nn.LayerNorm(name="norm2")(MLP(self.dim, self.mlp_ratio, dtype=self.dtype, name="mlp")(x))
        return x, cache


class VisionTransformer(nn.Module):
    """Encoder-decoder ViT over pre-embedded tokens.

    The caller owns patch/pos embedding (like `transformer_3d.py` which calls
    ``video_encoder.patch_embed`` explicitly); this module is pure sequence
    modeling so image/video/point-cloud frontends all share it.
    """

    depth: int
    embed_dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    encoder_depth: Optional[int] = None
    attn_impl: str = "auto"
    remat: bool = False
    dtype: Any = None

    @property
    def enc_depth(self) -> int:
        return self.depth // 2 if self.encoder_depth is None else self.encoder_depth

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, N, D) token embeddings
        c: Optional[jax.Array] = None,  # (B, Lc, D) conditioning prefix
        visible: Optional[jax.Array] = None,  # (B, N) 1=visible, None=all
        rope: Optional[Tuple[jax.Array, jax.Array]] = None,  # prefix-padded
        bias: Optional[jax.Array] = None,  # additive attn bias (block-causal)
        caches: Optional[List[KVCache]] = None,
        cache_index: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Optional[List[KVCache]]]:
        c_len = 0 if c is None else c.shape[1]
        x_tokens = x
        h = x if c is None else jnp.concatenate([c, x], axis=1)

        enc_bias = bias
        use_split = visible is not None and self.enc_depth > 0
        if use_split:
            vis_bias = masking.visibility_bias(visible, prefix_len=c_len,
                                               dtype=jnp.float32)
            enc_bias = vis_bias if bias is None else bias + vis_bias

        block = lambda i: Block(self.embed_dim, self.num_heads, self.mlp_ratio,  # noqa: E731
                                attn_impl=self.attn_impl, dtype=self.dtype,
                                name=f"blocks_{i}")
        if self.remat and caches is None:
            block_cls = nn.remat(Block, static_argnums=())
            block = lambda i: block_cls(self.embed_dim, self.num_heads,  # noqa: E731
                                        self.mlp_ratio, attn_impl=self.attn_impl,
                                        dtype=self.dtype, name=f"blocks_{i}")

        new_caches = [] if caches is not None else None
        for i in range(self.enc_depth):
            cache_i = caches[i] if caches is not None else None
            h, cache_i = block(i)(h, enc_bias, rope, cache_i, cache_index)
            if new_caches is not None:
                new_caches.append(cache_i)

        if use_split:
            # restore mask-token rows exactly as the scatter at
            # vision_transformer.py:141-143 (masked rows never entered the
            # encoder half there; here they computed garbage we now discard)
            vis = visible[..., None].astype(h.dtype)
            tail = h[:, c_len:] * vis + x_tokens.astype(h.dtype) * (1.0 - vis)
            h = tail if c is None else jnp.concatenate([h[:, :c_len], tail], axis=1)

        for i in range(self.enc_depth, self.depth):
            cache_i = caches[i] if caches is not None else None
            h, cache_i = block(i)(h, bias, rope, cache_i, cache_index)
            if new_caches is not None:
                new_caches.append(cache_i)

        out = h if c is None else h[:, c_len:]
        return nn.LayerNorm(name="norm")(out), new_caches

    def init_caches(self, batch: int, max_len: int,
                    dtype=jnp.bfloat16) -> List[KVCache]:
        head_dim = self.embed_dim // self.num_heads
        return [KVCache.create(batch, self.num_heads, max_len, head_dim, dtype)
                for _ in range(self.depth)]
