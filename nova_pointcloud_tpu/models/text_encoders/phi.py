"""Phi-style frozen text encoder (flax).

Behavioral parity with `diffnext/models/text_encoders/phi.py:61-200`: Phi-2
decoder used as a *prompt encoder* — token embed, parallel attention+MLP
blocks with a shared pre-LN, partial rotary embedding on a leading slice of
each head, causal attention, final LN, returning last hidden states. The
reference's FlashAttention-2/SDPA split becomes a single fused attention via
ops/attention (XLA or Pallas); the growing rotary cache becomes static tables.

Weights come from a HF Phi checkpoint via :func:`load_torch_phi_weights`
(torch CPU -> numpy -> param tree); tests run a tiny random config.
"""

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nova_pointcloud_tpu.ops.attention import sdpa


@dataclasses.dataclass(frozen=True)
class PhiConfig:
    """Mirror of the HF PhiConfig fields we need (phi-2 defaults)."""

    vocab_size: int = 51200
    hidden_size: int = 2560
    intermediate_size: int = 10240
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    partial_rotary_factor: float = 0.4
    rope_theta: float = 10000.0
    layer_norm_eps: float = 1e-5
    max_position_embeddings: int = 2048

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim * self.partial_rotary_factor)


def _phi_rope(positions: jax.Array, rotary_dim: int, theta: float):
    """cos/sin tables (L, rotary_dim) in HF half-split layout."""
    inv = 1.0 / (theta ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32)
                           / rotary_dim))
    angle = positions[:, None].astype(jnp.float32) * inv  # (L, rd/2)
    emb = jnp.concatenate([angle, angle], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _apply_phi_rope(x: jax.Array, cos: jax.Array, sin: jax.Array,
                    rotary_dim: int) -> jax.Array:
    """Rotate the first ``rotary_dim`` dims (HF rotate_half convention)."""
    rot, rest = x[..., :rotary_dim], x[..., rotary_dim:]
    half = rotary_dim // 2
    r1, r2 = rot[..., :half], rot[..., half:]
    rotated = jnp.concatenate([-r2, r1], axis=-1)
    cos = cos[None, None].astype(x.dtype)
    sin = sin[None, None].astype(x.dtype)
    rot = rot * cos + rotated * sin
    return jnp.concatenate([rot, rest], axis=-1)


class PhiAttention(nn.Module):
    config: PhiConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, mask_bias: jax.Array) -> jax.Array:
        cfg = self.config
        b, l, _ = x.shape
        shape = (b, l, cfg.num_attention_heads, cfg.head_dim)
        q = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="v_proj")(x)
        q, k, v = [t.reshape(shape).transpose(0, 2, 1, 3) for t in (q, k, v)]
        cos, sin = _phi_rope(jnp.arange(l), cfg.rotary_dim, cfg.rope_theta)
        q = _apply_phi_rope(q, cos, sin, cfg.rotary_dim)
        k = _apply_phi_rope(k, cos, sin, cfg.rotary_dim)
        o = sdpa(q, k, v, mask_bias)
        o = o.transpose(0, 2, 1, 3).reshape(b, l, cfg.hidden_size)
        return nn.Dense(cfg.hidden_size, dtype=self.dtype, name="dense")(o)


class PhiBlock(nn.Module):
    """Parallel attention + MLP with shared input LN (phi architecture)."""

    config: PhiConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, mask_bias: jax.Array) -> jax.Array:
        cfg = self.config
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="input_layernorm")(x)
        attn = PhiAttention(cfg, self.dtype, name="self_attn")(h, mask_bias)
        m = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        m = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(
            nn.gelu(m, approximate=True))
        return x + attn + m


class _PhiScanBody(nn.Module):
    config: PhiConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, _):
        x, mask_bias = carry
        x = PhiBlock(self.config, self.dtype, name="block")(x, mask_bias)
        return (x, mask_bias), None


class PhiEncoderModel(nn.Module):
    """Token ids -> last hidden states (`phi.py:160-200`)."""

    config: PhiConfig = PhiConfig()
    dtype: Any = None

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None) -> jax.Array:
        cfg = self.config
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="embed_tokens")(
            input_ids)
        l = input_ids.shape[1]
        causal = jnp.tril(jnp.ones((l, l)))
        bias = jnp.where(causal > 0, 0.0, -jnp.inf)[None, None]
        if attention_mask is not None:
            key_bias = jnp.where(attention_mask > 0, 0.0, -jnp.inf)
            bias = bias + key_bias[:, None, None, :]
        body = nn.scan(_PhiScanBody, variable_axes={"params": 0},
                       split_rngs={"params": True},
                       length=cfg.num_hidden_layers,
                       metadata_params={nn.meta.PARTITION_NAME: None})(
            cfg, self.dtype, name="layers")
        (x, _), _ = body((x, bias), None)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                            name="final_layernorm")(x)


def load_torch_phi_weights(model: PhiEncoderModel, state_dict) -> dict:
    """Map a HF PhiModel state_dict (torch tensors or numpy) to our params.

    Stacks per-layer weights along the scan axis. Keys follow HF naming:
    model.embed_tokens / model.layers.N.{input_layernorm,self_attn.{q,k,v}_proj,
    self_attn.dense,mlp.fc1,mlp.fc2} / model.final_layernorm.
    """
    cfg = model.config

    def get(name):
        t = state_dict[name]
        return np.asarray(t.float().numpy() if hasattr(t, "float") else t)

    def stacked(fmt, transpose=False):
        ws = [get(fmt.format(i)) for i in range(cfg.num_hidden_layers)]
        out = np.stack(ws)
        return out.transpose(0, 2, 1) if transpose else out

    p = {
        "embed_tokens": {"embedding": get("model.embed_tokens.weight")},
        "final_layernorm": {"scale": get("model.final_layernorm.weight"),
                            "bias": get("model.final_layernorm.bias")},
        "layers": {"block": {
            "input_layernorm": {
                "scale": stacked("model.layers.{}.input_layernorm.weight"),
                "bias": stacked("model.layers.{}.input_layernorm.bias")},
            "self_attn": {
                **{name: {"kernel": stacked(
                    f"model.layers.{{}}.self_attn.{name}.weight", True),
                    "bias": stacked(f"model.layers.{{}}.self_attn.{name}.bias")}
                   for name in ("q_proj", "k_proj", "v_proj", "dense")}},
            "fc1": {"kernel": stacked("model.layers.{}.mlp.fc1.weight", True),
                    "bias": stacked("model.layers.{}.mlp.fc1.bias")},
            "fc2": {"kernel": stacked("model.layers.{}.mlp.fc2.weight", True),
                    "bias": stacked("model.layers.{}.mlp.fc2.bias")},
        }},
    }
    return jax.tree.map(jnp.asarray, p)


class PhiTextEncoder:
    """Host-side wrapper: tokenizer + jitted encoder, DummyTextEncoder API."""

    def __init__(self, model: PhiEncoderModel, params, tokenizer,
                 num_tokens: int = 256):
        self.model, self.params = model, params
        self.tokenizer, self.num_tokens = tokenizer, num_tokens
        self.host_offload = False  # weights parked in pinned host memory
        self._encode = jax.jit(
            lambda p, ids, mask: model.apply({"params": p}, ids, mask))

    def encode(self, prompts):
        enc = self.tokenizer(list(prompts), padding="max_length",
                             truncation=True, max_length=self.num_tokens,
                             return_tensors="np")
        params = self.params
        if self.host_offload:
            # stream the 2.7B Phi weights into HBM only for this call
            # (diffusers enable_model_cpu_offload semantics)
            from nova_pointcloud_tpu.utils.offload import to_device

            params = to_device(params)
        out = self._encode(params, jnp.asarray(enc["input_ids"]),
                           jnp.asarray(enc["attention_mask"]))
        lengths = np.asarray(enc["attention_mask"]).sum(-1).astype(np.int32)
        return np.asarray(out), lengths
