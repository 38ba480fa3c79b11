"""Ring attention: exact sequence-parallel attention over a mesh axis.

Scales video training past a single chip's memory for long token sequences
(SURVEY §2.6: the reference handles long context only algorithmically; this
is the TPU-native sequence-parallel extension). Each device holds a
contiguous (B, H, L/P, D) shard of q/k/v; K/V shards rotate around the ring
via ``jax.lax.ppermute`` while every device accumulates its queries' output
with the online-softmax recurrence (same math as the Pallas flash kernel,
but across devices) — so the full (L, L) score matrix never exists on any
one chip and the collectives ride the ICI ring.

Use under ``shard_map`` with q/k/v sharded on the sequence axis:

    mesh = create_mesh({"data": 1, "sequence": 8})
    out = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name="sequence"),
        mesh=mesh,
        in_specs=P(None, None, "sequence", None),
        out_specs=P(None, None, "sequence", None))(q, k, v)

Causal/block-causal masking: pass ``bias`` sharded like k over the key axis
(B, 1, 1, L/P) — it rotates with the K/V shards. Full (Lq, Lk) biases should
use the q-sharded / k-sharded form (B or 1, 1, Lq/P, L) and are applied via
``bias_fn`` taking the current ring source index.
"""

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, axis_name: str,
                   key_bias: Optional[jax.Array] = None,
                   bias_fn: Optional[Callable[[int], jax.Array]] = None,
                   scale: Optional[float] = None) -> jax.Array:
    """q, k, v: (B, H, Ls, D) local sequence shards -> (B, H, Ls, D).

    key_bias: (B, 1, 1, Ls) additive bias for the LOCAL key shard (rotates
    with k/v). bias_fn(src): extra additive bias against the shard that
    originated on device ``src`` (e.g. block-causal), broadcastable to
    (B, H, Ls_q, Ls_k); ``src`` is a traced int32.
    """
    p = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    qf = q.astype(jnp.float32) * scale
    perm = [(i, (i + 1) % p) for i in range(p)]  # shards move to the right

    def step(carry, i):
        o, m, l, kb, vb, bb = carry
        src = (me - i) % p  # ring source of the current k/v shard
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, kb.astype(jnp.float32))
        if bb is not None:
            s = s + bb.astype(jnp.float32)
        if bias_fn is not None:
            s = s + bias_fn(src).astype(jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        m_new = jnp.maximum(m_new, NEG_INF)  # all-masked guard
        pexp = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(pexp, axis=-1, keepdims=True)
        o_new = o * alpha + jnp.einsum("bhqk,bhkd->bhqd", pexp,
                                       vb.astype(jnp.float32))
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        if bb is not None:
            bb = jax.lax.ppermute(bb, axis_name, perm)
        return (o_new, m_new, l_new, kb, vb, bb), None

    b, h, lq, d = q.shape
    o0 = jnp.zeros((b, h, lq, d), jnp.float32)
    m0 = jnp.full((b, h, lq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, lq, 1), jnp.float32)
    (o, m, l, *_), _ = jax.lax.scan(
        step, (o0, m0, l0, k, v, key_bias), jnp.arange(p))
    o = o / jnp.where(l == 0.0, 1.0, l)  # fully-masked rows -> zeros
    return o.astype(q.dtype)


def make_ring_attention(mesh, axis_name: str = "sequence"):
    """shard_map-wrapped ring attention over full (B, H, L, D) arrays."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    spec = P(None, None, axis_name, None)

    @partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec),
             out_specs=spec, check_rep=False)
    def run(q, k, v):
        return ring_attention(q, k, v, axis_name)

    return run
