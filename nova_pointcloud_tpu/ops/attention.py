"""Attention primitives for TPU.

Replaces the reference's torch SDPA / flash_attn / flex_attention trio
(`diffnext/models/vision_transformer.py:63`, `models/flex_attention.py`,
`text_encoders/phi.py:126-137`) with:

- :func:`sdpa` — an XLA-fused reference implementation (fp32 softmax),
- :func:`flash_attention` — a Pallas TPU kernel for the training hot path
  (see ops/pallas/flash_attention.py), selected via ``impl=``,
- KV-cache helpers for decode with *preallocated static-size* caches updated
  by ``dynamic_update_slice`` (the torch.cat-growing cache at
  `vision_transformer.py:55-60` is hostile to XLA's static shapes).
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def sdpa(q: jax.Array, k: jax.Array, v: jax.Array,
         bias: Optional[jax.Array] = None,
         scale: Optional[float] = None) -> jax.Array:
    """Scaled dot-product attention. q,k,v: (B, H, L, D); bias broadcastable
    to (B, H, Lq, Lk). Softmax in fp32 for bf16 inputs."""
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    # guard fully-masked rows (all -inf) against NaN softmax
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.where(jnp.isnan(probs), 0.0, probs).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def attention(q: jax.Array, k: jax.Array, v: jax.Array,
              bias: Optional[jax.Array] = None, impl: str = "auto") -> jax.Array:
    """Dispatch to the best attention implementation for the platform.

    impl: "auto" (Pallas flash at long sequences on TPU, else XLA SDPA),
    "pallas", "sdpa"/"xla", or "ring"/"ring:<axis>" — sequence-parallel
    ring attention over the ambient mesh's <axis> (default "sequence"),
    for t2v token counts that outgrow one chip (parallel/ring_attention).
    """
    if impl.startswith("ring"):
        from nova_pointcloud_tpu.parallel.ring_attention import (
            ring_attention_auto)

        axis = impl.split(":", 1)[1] if ":" in impl else "sequence"
        return ring_attention_auto(q, k, v, bias=bias, axis=axis)
    if impl in ("auto", "pallas") and _use_pallas(q, k, bias, impl):
        from nova_pointcloud_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, bias=bias)
    return sdpa(q, k, v, bias)


def _use_pallas(q: jax.Array, k: jax.Array, bias, impl: str) -> bool:
    if impl == "pallas":
        return True
    if impl in ("sdpa", "xla"):
        return False
    if jax.default_backend() != "tpu":
        return False
    # threshold kept at 1024 by END-TO-END measurement: the isolated core
    # favors XLA at L~1k (1.16 vs 1.71 ms/layer) and flash from 2k up
    # (1.5-1.75x), but the full t2i sampler runs 0.598 samples/s with flash
    # at its 1056-key encoder vs 0.455 with XLA — in context, flash's
    # avoided f32 score materialization frees HBM bandwidth the isolated
    # microbench doesn't account for.
    if k.shape[-2] < 1024:
        return False
    # VMEM gate: the kernel keeps whole-length K and V resident per (b, h)
    # program, upcast to f32 inside the body. Past ~half of VMEM the Mosaic
    # allocation fails at compile time, so fall back to XLA (which tiles)
    # instead of crashing dispatch; ring attention is the intended path for
    # sequences that genuinely outgrow one chip.
    if 2 * k.shape[-2] * k.shape[-1] * 4 > 8 * 1024 * 1024:
        return False
    if bias is None:
        return True
    # kernel supports key bias (.., 1, 1, Lk) and shared full bias
    # (1, 1, Lq, Lk) — the trailing dims must MATCH (not merely broadcast to)
    # the score shape, or the BlockSpecs inside the kernel misalign.
    if bias.ndim != 4 or bias.shape[1] != 1:
        return False
    if bias.shape[-1] != k.shape[-2]:
        return False
    return bias.shape[2] == 1 or (
        bias.shape[0] == 1 and bias.shape[2] == q.shape[-2])


def make_flax_attention_fn(impl: str = "auto"):
    """``attention_fn`` for ``nn.MultiHeadDotProductAttention`` that routes
    through this module's dispatcher: XLA SDPA at short sequences /
    with attention dropout, the Pallas flash kernel at >=1024 keys on TPU (threshold set end-to-end on v5e).

    Lets flax-parameterized models (identical checkpoints) pick up the fused
    kernel without touching their parameter trees. Replaces the reference's
    hardwired torch SDPA (`vision_transformer.py:63`).
    """

    def attention_fn(query, key, value, bias=None, mask=None,
                     broadcast_dropout=True, dropout_rng=None,
                     dropout_rate=0.0, deterministic=False, dtype=None,
                     precision=None, **kwargs):
        import flax.linen as nn

        q = jnp.moveaxis(query, -2, -3)  # (B, L, H, D) -> (B, H, L, D)
        k = jnp.moveaxis(key, -2, -3)
        b = bias
        if mask is not None:
            mb = jnp.where(mask, 0.0, -jnp.inf)
            b = mb if b is None else b + mb
        has_dropout = (not deterministic) and dropout_rate > 0.0
        # A user-supplied bias may be a LEARNED parameter; the pallas kernel
        # declares zero bias cotangents (masks are constants in NOVA) and
        # would silently freeze it during training — keep explicit biases on
        # the XLA path. Mask-derived biases (constants) still ride pallas.
        if has_dropout or bias is not None or not _use_pallas(q, k, b, impl):
            return nn.dot_product_attention(
                query, key, value, bias=bias, mask=mask,
                broadcast_dropout=broadcast_dropout, dropout_rng=dropout_rng,
                dropout_rate=dropout_rate, deterministic=deterministic,
                dtype=dtype, precision=precision)
        from nova_pointcloud_tpu.ops.pallas.flash_attention import (
            flash_attention)

        v = jnp.moveaxis(value, -2, -3)
        out = flash_attention(q, k, v, bias=b)
        return jnp.moveaxis(out, -3, -2)

    return attention_fn


class KVCache(NamedTuple):
    """Preallocated per-layer KV cache: k/v (B, H, S_max, D)."""

    k: jax.Array
    v: jax.Array

    @classmethod
    def create(cls, batch: int, num_heads: int, max_len: int, head_dim: int,
               dtype=jnp.bfloat16) -> "KVCache":
        shape = (batch, num_heads, max_len, head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    def update(self, k_new: jax.Array, v_new: jax.Array,
               index: jax.Array) -> "KVCache":
        """Write new keys/values at [index : index+L)."""
        k = jax.lax.dynamic_update_slice(self.k, k_new.astype(self.k.dtype),
                                         (0, 0, index, 0))
        v = jax.lax.dynamic_update_slice(self.v, v_new.astype(self.v.dtype),
                                         (0, 0, index, 0))
        return KVCache(k, v)


def cached_attention(q: jax.Array, k_new: jax.Array, v_new: jax.Array,
                     cache: KVCache, index: jax.Array,
                     bias: Optional[jax.Array] = None,
                     ) -> Tuple[jax.Array, KVCache]:
    """Decode attention over a static cache with a validity length mask.

    ``index`` is the current fill position; queries attend to all cached
    positions < index + L_new. Returns (output, updated cache).
    """
    lq = q.shape[2]
    cache = cache.update(k_new, v_new, index)
    max_len = cache.k.shape[2]
    pos = jnp.arange(max_len)
    length_bias = jnp.where(pos < index + lq, 0.0, -jnp.inf)[None, None, None, :]
    if bias is not None:
        pad = max_len - bias.shape[-1]
        if pad:
            bias = jnp.pad(bias, [(0, 0)] * (bias.ndim - 1) + [(0, pad)])
        length_bias = length_bias + bias
    out = sdpa(q, cache.k.astype(q.dtype), cache.v.astype(q.dtype), length_bias)
    return out, cache
