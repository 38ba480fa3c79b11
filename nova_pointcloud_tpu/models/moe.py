"""Mixture-of-Experts MLP with expert-parallel sharding (beyond parity).

The reference has no MoE; this is a TPU-native capability extension in the
spirit of the repo's pipeline/ring-attention layers: scaling the ViT MLP
FLOPs without scaling per-token compute. Design follows the Switch
Transformer / GShard static-capacity formulation, which is the idiomatic
XLA shape-static MoE:

- the router picks top-k experts per token; tokens are placed into fixed
  per-expert capacity buckets (C slots) via one-hot dispatch/combine
  einsums — no dynamic shapes, no sorting, everything MXU-friendly
- expert weights are stacked on a leading (E, ...) axis; sharding that
  axis over an ``expert`` mesh axis (parallel/sharding.tp_spec_for_param)
  gives expert parallelism — XLA lowers the dispatch einsum to the
  all_to_all exchange, no communication code here
- the load-balancing auxiliary loss (Switch eq. 4) is sown into the
  ``aux_loss`` collection; training pipelines apply with
  ``mutable=["aux_loss"]`` and add it to the total

Composes with the repo's other axes: the expert hidden dim also carries
the Megatron TP annotation (w1 column-, w2 row-parallel), so EP x TP x DP
works from PartitionSpecs alone.
"""

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class MoEMLP(nn.Module):
    """Drop-in MoE replacement for vit.MLP (same (B, N, D) -> (B, N, D)).

    ``capacity_factor`` > 1 leaves headroom over perfectly-balanced routing;
    tokens overflowing an expert's C slots are dropped (standard Switch
    behavior — the residual connection in the enclosing Block carries them
    through unchanged).

    Masked-AR training caveat: capacity C is sized over the full static
    sequence length N. In the NOVA image encoder's MAE split the encoder
    half sees only visible tokens, but when the MoE runs over a padded or
    mask-scattered sequence the router spends slots on rows whose outputs
    are discarded; at mask ratios >= 0.7 scale ``capacity_factor`` by
    ~1/(1 - mask_ratio) to keep visible-token load near nominal.
    """

    dim: int
    num_experts: int
    mlp_ratio: float = 4.0
    top_k: int = 2
    capacity_factor: float = 1.25
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, N, D = x.shape
        E = self.num_experts
        k = min(self.top_k, E)
        H = int(self.dim * self.mlp_ratio)
        C = max(1, int(math.ceil(k * N * self.capacity_factor / E)))

        xf = x.astype(jnp.float32)
        # router in f32 (routing decisions are precision-sensitive)
        logits = nn.Dense(E, use_bias=False, dtype=jnp.float32,
                          name="router")(xf)  # (B, N, E)
        probs = jax.nn.softmax(logits, axis=-1)
        gate, idx = jax.lax.top_k(probs, k)  # (B, N, k)
        gate = gate / jnp.maximum(gate.sum(-1, keepdims=True), 1e-9)
        onehot = jax.nn.one_hot(idx, E, dtype=jnp.float32)  # (B, N, k, E)

        # position-in-expert via cumsum over the (N, k) slot order per batch
        # row; slots past capacity C are dropped (keep=0)
        flat = onehot.reshape(B, N * k, E)
        pos = jnp.cumsum(flat, axis=1) - flat  # tokens ahead in the bucket
        keep = jnp.where(pos < C, flat, 0.0)
        pos_oh = jax.nn.one_hot(pos.reshape(B, N, k, E).astype(jnp.int32), C,
                                dtype=jnp.float32)  # (B, N, k, E, C)
        pos_oh = pos_oh * keep.reshape(B, N, k, E)[..., None]
        dispatch = pos_oh.sum(2)  # (B, N, E, C): each (e, c) slot <= 1 token
        combine = (gate[..., None, None] * pos_oh).sum(2)  # (B, N, E, C)

        # expert FFN over the capacity buckets, experts stacked on axis 0
        w1 = self.param("w1", nn.initializers.lecun_normal(), (E, D, H),
                        jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros, (E, H), jnp.float32)
        w2 = self.param("w2", nn.initializers.lecun_normal(), (E, H, D),
                        jnp.float32)
        b2 = self.param("b2", nn.initializers.zeros, (E, D), jnp.float32)
        cdt = self.dtype or x.dtype
        xin = jnp.einsum("bnec,bnd->ebcd", dispatch, xf)  # (E, B, C, D)
        h = jnp.einsum("ebcd,edh->ebch", xin.astype(cdt), w1.astype(cdt))
        h = nn.gelu(h.astype(jnp.float32) + b1[:, None, None], approximate=False)
        out = jnp.einsum("ebch,ehd->ebcd", h.astype(cdt), w2.astype(cdt))
        out = out.astype(jnp.float32) + b2[:, None, None]
        y = jnp.einsum("bnec,ebcd->bnd", combine, out)

        # Switch load-balancing loss (eq. 4): E * sum_e f_e * P_e == 1 at
        # uniform. f is the PRE-capacity-drop dispatch fraction — computing
        # it from `keep` would cap an overloaded expert's fraction at
        # capacity and shrink the loss exactly when routing is imbalanced.
        f = onehot.sum((0, 1, 2)) / max(B * N * k, 1)
        p = probs.mean((0, 1))
        aux = E * jnp.sum(f * p)
        self.sow("aux_loss", "load_balance", aux,
                 reduce_fn=jnp.add,
                 init_fn=lambda: jnp.zeros((), jnp.float32))
        return y.astype(x.dtype)
