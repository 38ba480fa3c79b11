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

_MOE_QUANTIZE_WARNED = False


def _warn_moe_quantize_once():
    # quantize=True with num_experts>1 serves the dense bf16 MoE path (no
    # fused-int8 MLP kernel, no MLP act-stats calibration) — make the
    # silent fallback visible without breaking the config.
    global _MOE_QUANTIZE_WARNED
    if not _MOE_QUANTIZE_WARNED:
        _MOE_QUANTIZE_WARNED = True
        import logging

        logging.getLogger(__name__).warning(
            "quantize=True with num_experts>1: MoE blocks serve the dense "
            "bf16 MLP path (int8 fused MLP + its calibration are skipped).")


class MLP(nn.Module):
    dim: int
    mlp_ratio: float = 4.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="fc1")(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(nn.gelu(h, approximate=False))


class Attention(nn.Module):
    """``quantize`` switches the qkv/out projections (~1/3 of block matmul
    FLOPs) to int8 at serving time. Profiling (round 3): the t2i sampler is
    98% encode_image_step — the 48-layer ViT pass — so the attention
    projections are the largest bf16 matmuls left on the t2i/t2v serving
    path. The attention core itself stays bf16 (RoPE / visibility-bias /
    KV-cache live in XLA or the flash kernel). Param tree unchanged.

    ``attn_core``: "bf16" (default) or "int8" — precision of the calibrated
    static-softmax kernel's score matmul (flash_attention_static a_q/a_k;
    takes effect only after calibrate() has sown the q/k amax)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_impl: str = "auto"
    quantize: bool = False
    dtype: Any = None
    attn_core: str = "bf16"

    def setup(self):
        self.qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias,
                            dtype=self.dtype)
        self.proj = nn.Dense(self.dim, dtype=self.dtype)

    def _int8_proj(self, x: jax.Array, dense: nn.Dense, qname: str) -> jax.Array:
        """Serving projection: q8(x) @ int8-kernel, prequantized weights from
        the "qparams" collection when provided, else quantized in-graph."""
        from nova_pointcloud_tpu.ops.quantization import (QuantizedWeight,
                                                          int8_matmul,
                                                          quantize_weight)

        qv = self.get_variable("qparams", f"{qname}_q", None)
        if qv is not None:
            qw = QuantizedWeight(qv, self.get_variable("qparams", f"{qname}_s"))
        else:
            qw = quantize_weight(dense.variables["params"]["kernel"])
        y = int8_matmul(x, qw, self.dtype or x.dtype)
        bias = dense.variables["params"].get("bias")
        return y if bias is None else y + bias.astype(y.dtype)

    def __call__(self, x: jax.Array, bias: Optional[jax.Array] = None,
                 rope: Optional[Tuple[jax.Array, jax.Array]] = None,
                 cache: Optional[KVCache] = None,
                 cache_index: Optional[jax.Array] = None,
                 ) -> Tuple[jax.Array, Optional[KVCache]]:
        b, l, _ = x.shape
        head_dim = self.dim // self.num_heads
        use_int8 = (self.quantize and not self.is_initializing()
                    and jax.default_backend() == "tpu")
        qkv = self._int8_proj(x, self.qkv, "qkv") if use_int8 else self.qkv(x)
        qkv = qkv.reshape(b, l, 3, self.num_heads, head_dim)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
        if rope is not None:
            cos, sin = rope
            q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        if (self.quantize and not self.is_initializing()
                and self.is_mutable_collection("act_stats")
                and cache is None):
            # calibration: record the max attention logit; serving uses it
            # as the static softmax offset (flash_attention_static)
            s = jnp.einsum("bhqd,bhkd->bhqk",
                           q.astype(jnp.float32) * head_dim ** -0.5,
                           k.astype(jnp.float32))
            if bias is not None:
                s = s + bias
            self.sow("act_stats", "a_smax",
                     jnp.max(s).astype(jnp.float32),
                     reduce_fn=jnp.maximum,
                     init_fn=lambda: jnp.float32(-1e30))
            # q/k amax (post-rope) -> static per-tensor scales for the int8
            # score core (flash_attention_static a_q/a_k); recorded always,
            # used only when attn_core == "int8"
            for name, t in (("a_q", q), ("a_k", k)):
                self.sow("act_stats", name,
                         jnp.max(jnp.abs(t)).astype(jnp.float32),
                         reduce_fn=jnp.maximum,
                         init_fn=lambda: jnp.zeros((), jnp.float32))
        smax = self.get_variable("qparams", "a_smax", None)
        key_bias = (bias is None or (bias.ndim == 4 and bias.shape[1] == 1
                                     and bias.shape[2] == 1))
        # The calibrated static-softmax kernel only engages when the impl
        # policy allows Pallas: attn_impl="xla" stays a working escape hatch
        # after calibrate(), and "ring:*" keeps its sharded dispatcher.
        if (use_int8 and smax is not None and cache is None and key_bias
                and self.attn_impl in ("auto", "pallas")):
            from nova_pointcloud_tpu.ops.pallas.flash_attention import (
                flash_attention_static)

            aq = ak = None
            if self.attn_core == "int8":
                aq = self.get_variable("qparams", "a_q", None)
                ak = self.get_variable("qparams", "a_k", None)
            o = flash_attention_static(q, k, v, smax, bias, a_q=aq, a_k=ak)
        elif cache is not None:
            o, cache = cached_attention(q, k, v, cache, cache_index, bias)
        else:
            o = attention(q, k, v, bias, impl=self.attn_impl)
        o = o.transpose(0, 2, 1, 3).reshape(b, l, self.dim)
        out = self._int8_proj(o, self.proj, "proj") if use_int8 \
            else self.proj(o)
        return out, cache


class Block(nn.Module):
    """Post-sublayer-norm transformer block (`vision_transformer.py:67-92`).

    ``quantize`` switches the MLP sub-block (2/3 of block matmul FLOPs) to
    the int8 fused-Pallas serving path (one VMEM-resident kernel:
    q8 -> W1 -> gelu -> q8 -> W2 -> post-LN -> residual). Serving only —
    construct with quantize=True from sampling pipelines/benches, never for
    training (the kernel is forward-only). The param tree is unchanged, so
    bf16 checkpoints serve quantized with no conversion."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    attn_impl: str = "auto"
    quantize: bool = False
    dtype: Any = None
    attn_core: str = "bf16"
    num_experts: int = 0  # >1: MoE MLP (models/moe.py), expert-parallel ready

    def setup(self):
        self.attn = Attention(self.dim, self.num_heads, self.qkv_bias,
                              self.attn_impl, quantize=self.quantize,
                              dtype=self.dtype, attn_core=self.attn_core)
        # torch nn.LayerNorm default eps (reference vision_transformer.py:
        # 72-74 uses plain LayerNorm(dim)); flax's default is 1e-6
        self.norm1 = nn.LayerNorm(epsilon=1e-5)
        self.norm2 = nn.LayerNorm(epsilon=1e-5)
        if self.num_experts > 1:
            from nova_pointcloud_tpu.models.moe import MoEMLP
            if self.quantize:
                _warn_moe_quantize_once()
            self.mlp = MoEMLP(self.dim, self.num_experts, self.mlp_ratio,
                              dtype=self.dtype, name="moe")
        else:
            self.mlp = MLP(self.dim, self.mlp_ratio, dtype=self.dtype)

    def _fused_mlp(self, x: jax.Array) -> jax.Array:
        from nova_pointcloud_tpu.ops.pallas.fused_block import (
            fused_int8_mlp_postln)
        from nova_pointcloud_tpu.ops.quantization import quantize_weight

        mp = self.mlp.variables["params"]
        np2 = self.norm2.variables["params"]
        q1 = self.get_variable("qparams", "fc1_q", None)
        if q1 is not None:
            s1 = self.get_variable("qparams", "fc1_s")
            q2 = self.get_variable("qparams", "fc2_q")
            s2 = self.get_variable("qparams", "fc2_s")
        else:
            q1, s1 = quantize_weight(mp["fc1"]["kernel"])
            q2, s2 = quantize_weight(mp["fc2"]["kernel"])
        return fused_int8_mlp_postln(x, q1, s1, mp["fc1"]["bias"], q2, s2,
                                     mp["fc2"]["bias"], np2["scale"],
                                     np2["bias"],
                                     a_x=self.get_variable(
                                         "qparams", "a_x", None),
                                     a_gelu=self.get_variable(
                                         "qparams", "a_gelu", None),
                                     ln_eps=1e-5)

    def _calibration_mlp(self, x: jax.Array) -> jax.Array:
        """XLA mirror of the fused int8 MLP that records the two quant-site
        activation ranges ("a_x" block input, "a_gelu" post-gelu) into the
        mutable "act_stats" collection (ops/quantization.merge_act_scales).
        Attention stays the regular bf16 path at serving, so only the MLP
        sub-block needs mirroring. Backend-agnostic."""
        from nova_pointcloud_tpu.ops.quantization import (int8_matmul,
                                                          quantize_weight)

        def record(name, v):
            self.sow("act_stats", name,
                     jnp.max(jnp.abs(v)).astype(jnp.float32),
                     reduce_fn=jnp.maximum,
                     init_fn=lambda: jnp.zeros((), jnp.float32))

        mp = self.mlp.variables["params"]
        xf = x.astype(jnp.float32)
        record("a_x", xf)
        a = int8_matmul(xf, quantize_weight(mp["fc1"]["kernel"]),
                        jnp.float32) + mp["fc1"]["bias"]
        a = jax.nn.gelu(a, approximate=False)
        record("a_gelu", a)
        o = int8_matmul(a, quantize_weight(mp["fc2"]["kernel"]),
                        jnp.float32) + mp["fc2"]["bias"]
        return (xf + self.norm2(o)).astype(x.dtype)

    def __call__(self, x, bias=None, rope=None, cache=None, cache_index=None):
        h, cache = self.attn(x, bias, rope, cache, cache_index)
        x = x + self.norm1(h)
        if self.num_experts > 1:  # MoE: dense path only (no fused-int8 MLP)
            return x + self.norm2(self.mlp(x)), cache
        if (self.quantize and not self.is_initializing()
                and self.is_mutable_collection("act_stats")):
            return self._calibration_mlp(x), cache
        if (self.quantize and not self.is_initializing()
                and jax.default_backend() == "tpu"):
            return self._fused_mlp(x), cache
        x = x + self.norm2(self.mlp(x))
        return x, cache


class _ViTScanBody(nn.Module):
    """nn.scan adapter over one Block: carry=(h, bias, rope, index), xs=cache."""

    dim: int
    num_heads: int
    mlp_ratio: float
    attn_impl: str
    remat: bool = False
    quantize: bool = False
    dtype: Any = None
    attn_core: str = "bf16"
    num_experts: int = 0

    @nn.compact
    def __call__(self, carry, cache):
        h, bias, rope, cache_index = carry
        cls = nn.remat(Block, static_argnums=()) if (self.remat and
                                                     cache is None) else Block
        blk = cls(self.dim, self.num_heads, self.mlp_ratio,
                  attn_impl=self.attn_impl, quantize=self.quantize,
                  dtype=self.dtype, attn_core=self.attn_core,
                  num_experts=self.num_experts, name="block")
        h, new_cache = blk(h, bias, rope, cache, cache_index)
        return (h, bias, rope, cache_index), new_cache


class VisionTransformer(nn.Module):
    """Encoder-decoder ViT over pre-embedded tokens.

    The caller owns patch/pos embedding (like `transformer_3d.py` which calls
    ``video_encoder.patch_embed`` explicitly); this module is pure sequence
    modeling so image/video/point-cloud frontends all share it.

    Layers are nn.scan block stacks (one compiled block per half), so a d32
    model compiles like a d1 model. KV caches carry a leading (layers,) axis
    and ride the scan as xs/ys.
    """

    depth: int
    embed_dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    encoder_depth: Optional[int] = None
    attn_impl: str = "auto"
    remat: bool = False
    quantize: bool = False  # int8 fused MLP serving path (see Block)
    dtype: Any = None
    pp_runner: Any = None  # pipeline-parallel stack runner (training)
    attn_core: str = "bf16"  # static-softmax score-matmul precision (Attention)
    num_experts: int = 0  # >1: MoE blocks (models/moe.py)

    @property
    def enc_depth(self) -> int:
        return self.depth // 2 if self.encoder_depth is None else self.encoder_depth

    def _stack(self, name: str, length: int, h, bias, rope, cache, cache_index):
        if (self.pp_runner is not None and cache is None
                and not self.is_initializing()):
            if self.num_experts > 1:
                raise NotImplementedError(
                    "MoE blocks + pipeline parallelism: route experts over "
                    "the 'expert' mesh axis instead (EP x TP x DP)")
            # pipeline-parallel path (training / no KV caches): run the
            # scanned stack through the GPipe/interleaved ppermute ring.
            # bias rides per-microbatch when batch-leading; rope broadcasts.
            depth_params = self.variables["params"][name]["block"]
            has_bias, has_rope = bias is not None, rope is not None
            extras = ([bias] if has_bias else []) + (list(rope) if has_rope
                                                     else [])
            dim, heads, ratio = self.embed_dim, self.num_heads, self.mlp_ratio
            impl, dtype = self.attn_impl, self.dtype

            def block_apply(p, hh, *ex):
                b = ex[0] if has_bias else None
                r = tuple(ex[1 if has_bias else 0:]) if has_rope else None
                out, _ = Block(dim, heads, ratio, attn_impl=impl,
                               dtype=dtype).apply({"params": p}, hh, b, r,
                                                  None, None)
                return out

            return self.pp_runner(block_apply, depth_params, h, extras), None
        body = nn.scan(
            _ViTScanBody,
            variable_axes={"params": 0, "qparams": 0, "act_stats": 0,
                           "aux_loss": 0},
            split_rngs={"params": True},
            length=length,
            metadata_params={nn.meta.PARTITION_NAME: None},
        )(self.embed_dim, self.num_heads, self.mlp_ratio, self.attn_impl,
          self.remat, self.quantize, self.dtype, self.attn_core,
          self.num_experts, name=name)
        (h, *_), new_cache = body((h, bias, rope, cache_index), cache)
        return h, new_cache

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, N, D) token embeddings
        c: Optional[jax.Array] = None,  # (B, Lc, D) conditioning prefix
        visible: Optional[jax.Array] = None,  # (B, N) 1=visible, None=all
        rope: Optional[Tuple[jax.Array, jax.Array]] = None,  # prefix-padded
        bias: Optional[jax.Array] = None,  # additive attn bias (block-causal)
        caches: Optional[Tuple[KVCache, KVCache]] = None,  # (enc, dec) stacked
        cache_index: Optional[jax.Array] = None,
        visible_bucket: Optional[int] = None,  # static gather size (see below)
    ) -> Tuple[jax.Array, Optional[Tuple[KVCache, KVCache]]]:
        c_len = 0 if c is None else c.shape[1]
        x_tokens = x
        h = x if c is None else jnp.concatenate([c, x], axis=1)

        use_split = visible is not None and self.enc_depth > 0
        use_gather = (use_split and visible_bucket is not None
                      and visible_bucket < x.shape[1]
                      and bias is None and caches is None)

        enc_cache = caches[0] if caches is not None else None
        dec_cache = caches[1] if caches is not None else None

        if use_gather:
            # bucketed visible-token gather: the reference's encoder half only
            # processes visible tokens (`vision_transformer.py:133-143`); the
            # masking-only path below spends full-sequence FLOPs on rows it
            # then discards. Here visible tokens are physically gathered into
            # a STATIC-size bucket (callers bound the visible count: train
            # mask ratios >= 0.7 => <= 0.3N visible), padded lanes are biased
            # out of the keys, and outputs scatter back — numerically equal
            # to the masking path, ~(N/bucket)x fewer encoder-half FLOPs.
            # INVARIANT (caller-enforced, tests/test_mae_gather.py): the
            # per-sample visible count never exceeds visible_bucket; tokens
            # beyond the bucket would silently bypass the encoder half.
            # Both call sites guarantee it by construction — the sampler's
            # searchsorted phase plan (pipelines/nova.py) and the train
            # bucket round((1-TRAIN_MASK_RATIO_MIN)*Ni) (models/nova.py).
            k = visible_bucket
            b, n = visible.shape
            order = jnp.argsort(1.0 - visible, axis=1, stable=True)
            ids = order[:, :k].astype(jnp.int32)
            nvis = jnp.sum(visible, axis=1).astype(jnp.int32)
            valid = (jnp.arange(k)[None] < nvis[:, None]).astype(jnp.float32)
            xg = jnp.take_along_axis(x_tokens, ids[..., None], axis=1)
            hg = xg if c is None else jnp.concatenate([c, xg], axis=1)
            g_bias = masking.visibility_bias(valid, prefix_len=c_len,
                                             dtype=jnp.float32)
            rope_g = None
            if rope is not None:
                from nova_pointcloud_tpu.models.embeddings import gather_rope

                cos, sin = rope
                if cos.shape[0] == 1 and b > 1:
                    cos = jnp.broadcast_to(cos, (b,) + cos.shape[1:])
                    sin = jnp.broadcast_to(sin, (b,) + sin.shape[1:])
                rope_g = gather_rope(cos[:, :, c_len:], sin[:, :, c_len:],
                                     ids, pad=c_len)
            h_enc, _ = self._stack("enc_layers", self.enc_depth, hg, g_bias,
                                   rope_g, None, cache_index)
            upd = h_enc[:, c_len:] * valid[..., None].astype(h_enc.dtype)
            onehot = jax.nn.one_hot(ids, n, dtype=h_enc.dtype)
            onehot = onehot * valid[..., None].astype(h_enc.dtype)  # (B,K,N)
            scattered = jnp.einsum("bkn,bkd->bnd", onehot, upd)
            covered = jnp.max(onehot, axis=1)[..., None]  # == visible
            tail = scattered + x_tokens.astype(h_enc.dtype) * (1.0 - covered)
            h = tail if c is None else jnp.concatenate(
                [h_enc[:, :c_len], tail], axis=1)
        else:
            enc_bias = bias
            if use_split:
                vis_bias = masking.visibility_bias(visible, prefix_len=c_len,
                                                   dtype=jnp.float32)
                enc_bias = vis_bias if bias is None else bias + vis_bias
            h, enc_cache = self._stack("enc_layers", self.enc_depth, h,
                                       enc_bias, rope, enc_cache, cache_index)
            if use_split:
                # restore mask-token rows exactly as the scatter at
                # vision_transformer.py:141-143 (masked rows never entered the
                # encoder half there; here they computed garbage we discard)
                vis = visible[..., None].astype(h.dtype)
                tail = h[:, c_len:] * vis + x_tokens.astype(h.dtype) * (1.0 - vis)
                h = tail if c is None else jnp.concatenate(
                    [h[:, :c_len], tail], axis=1)

        h, dec_cache = self._stack("dec_layers", self.depth - self.enc_depth,
                                   h, bias, rope, dec_cache, cache_index)

        out = h if c is None else h[:, c_len:]
        new_caches = (enc_cache, dec_cache) if caches is not None else None
        # torch-default eps (reference vision_transformer.py:114)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(out), new_caches

    def init_caches(self, batch: int, max_len: int,
                    dtype=jnp.float32) -> Tuple[KVCache, KVCache]:
        """Stacked (layers, B, H, S, D) caches for (encoder, decoder) halves."""
        head_dim = self.embed_dim // self.num_heads

        def make(n_layers):
            shape = (n_layers, batch, self.num_heads, max_len, head_dim)
            return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

        return make(self.enc_depth), make(self.depth - self.enc_depth)
