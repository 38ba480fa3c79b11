"""Int8 quantized matmul path (w8a8) for serving.

v5e's MXU runs int8 at 2x the bf16 rate; the flagship t2pc pipeline is
compute-bound in its MLP matmuls, so a dynamic-activation / per-channel-weight
int8 path is the main headroom beyond ~60% bf16 MFU. Symmetric quantization:

    y = (q(x) @ q(W)) * s_x * s_w,   q(v) = round(v / s) in [-127, 127]

Weights are quantized once (per output channel); activations per token at
runtime. Accumulation in int32, rescale in fp32. Not used in training.
"""

from typing import Any, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class QuantizedWeight(NamedTuple):
    values: jax.Array  # int8 (in, out)
    scales: jax.Array  # f32 (out,)


def quantize_weight(w: jax.Array) -> QuantizedWeight:
    """Per-output-channel symmetric int8 quantization of (in, out) kernels."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scales = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w / scales), -127, 127).astype(jnp.int8)
    return QuantizedWeight(q, scales)


def quantize_activations(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-token (last-dim) symmetric int8 quantization."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scales = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x / scales), -127, 127).astype(jnp.int8)
    return q, scales


def int8_matmul(x: jax.Array, wq: QuantizedWeight,
                out_dtype=jnp.bfloat16) -> jax.Array:
    """x (..., in) @ int8 weights -> (..., out) with int32 accumulation."""
    xq, sx = quantize_activations(x)
    acc = jax.lax.dot_general(xq, wq.values, (((xq.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * sx * wq.scales).astype(out_dtype)


def quantize_weight_nd(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """quantize_weight for kernels with leading stack axes: (..., in, out) ->
    int8 (..., in, out) + scales (..., out). Used for nn.scan block stacks."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
    scales = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w / scales), -127, 127).astype(jnp.int8)
    return q, jnp.squeeze(scales, axis=-2)


def _is_preln_block(tree) -> bool:
    keys = {"attn", "fc1", "fc2", "norm1", "norm2"}
    return isinstance(tree, dict) and keys <= set(tree.keys())


def _is_diffusion_block(tree) -> bool:
    """A models/diffusion_mlp.DiffusionBlock param subtree."""
    return (isinstance(tree, dict)
            and {"norm1", "proj", "norm2"} <= set(tree.keys())
            and isinstance(tree.get("proj"), dict) and "fc1" in tree["proj"]
            and isinstance(tree.get("norm1"), dict) and "proj" in tree["norm1"])


def _quantize_diffusion_block(bp) -> dict:
    """DiffusionBlock -> q-leaves for fused_int8_diffusion_block."""
    q = {}
    q["stats_q"], q["stats_s"] = quantize_weight_nd(
        bp["norm1"]["proj"]["kernel"])
    q["fc1_q"], q["fc1_s"] = quantize_weight_nd(bp["proj"]["fc1"]["kernel"])
    q["fc2_q"], q["fc2_s"] = quantize_weight_nd(bp["proj"]["fc2"]["kernel"])
    return q


def _is_vit_block(tree) -> bool:
    """A models/vit.Block param subtree (post-LN, MLP under 'mlp')."""
    keys = {"attn", "mlp", "norm1", "norm2"}
    return (isinstance(tree, dict) and keys <= set(tree.keys())
            and isinstance(tree.get("mlp"), dict) and "fc1" in tree["mlp"])


def _quantize_vit_block(bp) -> dict:
    """ViT Block (optionally depth-stacked) -> serving q-leaves: the fused
    int8 post-LN MLP (models/vit.Block._fused_mlp) plus int8 qkv/out
    projections (models/vit.Attention._int8_proj; nested at the attn module
    path). The attention CORE stays bf16 (bias/RoPE/KV-cache live in XLA
    or the flash kernel)."""
    q = {}
    q["fc1_q"], q["fc1_s"] = quantize_weight_nd(bp["mlp"]["fc1"]["kernel"])
    q["fc2_q"], q["fc2_s"] = quantize_weight_nd(bp["mlp"]["fc2"]["kernel"])
    attn = {}
    attn["qkv_q"], attn["qkv_s"] = quantize_weight_nd(
        bp["attn"]["qkv"]["kernel"])
    attn["proj_q"], attn["proj_s"] = quantize_weight_nd(
        bp["attn"]["proj"]["kernel"])
    q["attn"] = attn
    return q


def _quantize_preln_block(bp) -> dict:
    """One PreLNBlock param subtree (optionally depth-stacked) -> serving
    q-leaves read by the fused Pallas path (models/pointcloud.PreLNBlock)."""
    a = bp["attn"]

    def heads_to_mat(k):  # (..., D, H, hd) -> (..., D, D)
        return k.reshape(k.shape[:-2] + (-1,))

    wqkv = jnp.concatenate(
        [heads_to_mat(a[n]["kernel"]) for n in ("query", "key", "value")],
        axis=-1)  # (..., D, 3D)
    out_k = a["out"]["kernel"]  # (..., H, hd, D) -> (..., D, D)
    out_k = out_k.reshape(out_k.shape[:-3]
                          + (out_k.shape[-3] * out_k.shape[-2],
                             out_k.shape[-1]))
    q = {}
    q["wqkv_q"], q["wqkv_s"] = quantize_weight_nd(wqkv)
    q["out_q"], q["out_s"] = quantize_weight_nd(out_k)
    q["fc1_q"], q["fc1_s"] = quantize_weight_nd(bp["fc1"]["kernel"])
    q["fc2_q"], q["fc2_s"] = quantize_weight_nd(bp["fc2"]["kernel"])
    return q


def quantize_serving_params(params) -> dict:
    """Build the "qparams" collection: pre-quantized int8 weights for every
    PreLNBlock in the tree, at the block's module path.

    Quantizing in-graph per forward re-reads every fp32 kernel each diffusion
    step (~2.3GB/step at the 0.6B flagship); passing this collection to
    ``model.apply({"params": p, "qparams": q}, ...)`` hoists the quantization
    out of the sampling scan so XLA runs it once per pipeline call."""
    if _is_preln_block(params):
        return _quantize_preln_block(params)
    if _is_vit_block(params):
        return _quantize_vit_block(params)
    if _is_diffusion_block(params):
        return _quantize_diffusion_block(params)
    if isinstance(params, dict):
        out = {}
        for k, v in params.items():
            sub = quantize_serving_params(v)
            if sub:
                out[k] = sub
        return out
    return {}


# Calibrated static activation scales -----------------------------------------
#
# The fused serving kernels quantize activations per row by default (a max
# reduce over the lane dim before every int8 matmul). A calibration pass over
# a real sampling trajectory records per-site max|activation| instead; with
# those folded into qparams the kernels switch to per-tensor static scales
# (ops/pallas/fused_block._quant_static) and skip the reduce — measured ~12%
# of the fused-MLP pass at flagship shapes. Site names sown by
# PreLNBlock._calibration_forward (models/pointcloud.py).
ACT_SITE_NAMES = (
    "a_ln1", "a_av", "a_ln2", "a_mid",  # PreLNBlock (models/pointcloud.py)
    "a_x", "a_gelu",                    # ViT Block MLP (models/vit.py)
    "a_z", "a_h", "a_silu",             # DiffusionBlock (models/diffusion_mlp.py)
    "a_q", "a_k",                       # q/k amax post-rope (vit.Attention;
                                        # int8 static score core)
    "a_smax",                           # max attention logit (vit.Attention;
)                                       # static softmax offset, NOT an amax —
                                        # margin does not apply


# q/k are per-tensor extreme-value stats of an attention projection — unlike
# the post-LN bulk sites their amax is content-sensitive (a 2x-shifted prompt
# set measured ~1.37x drift vs <=1.16x for every post-LN site;
# tests/test_calibration_shift.py). Extra serving headroom keeps shifted
# prompts inside the int8 score core's envelope at a ~0.3-bit quantization
# cost (the core is opt-in, parity-tested at this margin).
QK_EXTRA_MARGIN = 1.2


def merge_act_scales(qparams, act_stats, margin: float = 1.0):
    """Fold a calibration run's activation stats into a qparams tree.

    ``act_stats`` is the mutable "act_stats" collection sown by a
    calibration forward: per-site max|activation| scalars ((depth,) under
    scanned stacks). Returns a new qparams tree whose block entries carry
    additional ``a_*`` leaves; the fused kernels use calibrated static
    scales whenever these are present. ``margin`` multiplies the recorded
    amax (>1 adds clipping headroom for activations beyond the calibration
    distribution)."""

    def merge(q, s):
        if not isinstance(s, dict):
            return q
        out = dict(q) if isinstance(q, dict) else {}
        for k, v in s.items():
            if k in ACT_SITE_NAMES:
                if k == "a_smax":
                    m = 1.0  # logit, not an amax
                elif k in ("a_q", "a_k"):
                    m = margin * QK_EXTRA_MARGIN
                else:
                    m = margin
                out[k] = jnp.asarray(v, jnp.float32) * m
            else:
                out[k] = merge(out.get(k, {}), v)
        return out

    return merge(qparams, act_stats)


def max_merge_stats(a, b):
    """Running max of two act_stats trees (across calibration steps).

    Union-merges: a key present in only one tree is kept as-is (different
    forward paths — e.g. the NOVA encoder vs the diffusion head — sow
    different subtrees)."""
    if isinstance(a, dict) or isinstance(b, dict):
        out = {}
        for k in set(a) | set(b):
            if k in a and k in b:
                out[k] = max_merge_stats(a[k], b[k])
            else:
                out[k] = a[k] if k in a else b[k]
        return out
    return jnp.maximum(a, b)


class Int8Dense(nn.Module):
    """Dense whose matmul runs int8; params stored fp32 and quantized in-graph
    (XLA folds the weight quantization into a constant at serving time)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        y = int8_matmul(x, quantize_weight(kernel), self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y
