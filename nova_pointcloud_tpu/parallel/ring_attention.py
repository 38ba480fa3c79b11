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


def _context_mesh():
    """The Mesh from an enclosing ``with mesh:`` block, or None."""
    try:
        from jax._src.mesh import thread_resources

        m = thread_resources.env.physical_mesh
        return m if m.devices.size else None
    except Exception:  # pragma: no cover - jax internals moved
        return None


def ring_attention_auto(q: jax.Array, k: jax.Array, v: jax.Array,
                        bias: Optional[jax.Array] = None,
                        axis: str = "sequence", mesh=None) -> jax.Array:
    """Config-selectable entry (ops/attention impl="ring"): shard q/k/v on
    the ``axis`` of the ambient mesh and run the ring. Falls back to a
    single-device softmax when no mesh with that axis is active, so the
    same model config runs unsharded on one chip.

    bias: full additive bias broadcastable to (B, H, L, L), replicated;
    each device slices its (q-shard, ring-source k-shard) tile per hop —
    this is how the t2v block-causal mask rides the ring.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = mesh if mesh is not None else _context_mesh()
    p = 1 if mesh is None else int(mesh.shape.get(axis, 1))
    if p <= 1:
        # no sequence axis: plain fused softmax attention
        from nova_pointcloud_tpu.ops.attention import sdpa

        return sdpa(q, k, v, bias)
    if q.shape[2] % p:
        raise ValueError(f"sequence length {q.shape[2]} not divisible by "
                         f"mesh axis {axis!r} of size {p}")
    spec = P(None, None, axis, None)
    ls = q.shape[2] // p
    if bias is None:
        return make_ring_attention(mesh, axis)(q, k, v)
    bias = jnp.broadcast_to(
        bias, (bias.shape[0], bias.shape[1], q.shape[2], q.shape[2]))
    b_spec = P(None, None, None, None)

    @partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec, b_spec),
             out_specs=spec, check_rep=False)
    def run(q, k, v, bias):
        me = jax.lax.axis_index(axis)

        def bias_fn(src):
            return jax.lax.dynamic_slice(
                bias, (0, 0, me * ls, src * ls),
                (bias.shape[0], bias.shape[1], ls, ls))

        return ring_attention(q, k, v, axis, bias_fn=bias_fn)

    return run(q, k, v, bias)
