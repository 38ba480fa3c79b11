"""Fused flash attention for TPU (Pallas).

Replaces the reference's torch SDPA / flash_attn kernels on the NOVA image /
video encoder hot path (`vision_transformer.py:63`, `phi.py:126-137`): online
softmax over K/V blocks so the (Lq, Lk) score matrix never materializes in
HBM.

Supported bias forms (covers every NOVA use):
- None
- key bias (B, Lk): visibility / cache-length masking broadcast over queries
  (ops/masking.visibility_bias, ops/attention.cached_attention)
- full bias (Lq, Lk): block-causal teacher forcing, shared across batch

Forward-only by design: inference is the latency-critical path; training
attention stays on XLA (fused + differentiable). The dispatcher in
ops/attention.py only routes here when jax runs on TPU.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, kbias_ref, fbias_ref, o_ref,
                  *, blk_k: int, sm_scale: float, num_k: int):
    q = q_ref[0].astype(jnp.float32) * sm_scale  # (blk_q, d)
    blk_q, d = q.shape

    def body(i, carry):
        o_acc, m, l = carry
        k = k_ref[0, pl.ds(i * blk_k, blk_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * blk_k, blk_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if kbias_ref is not None:
            s = s + kbias_ref[0, 0, pl.ds(i * blk_k, blk_k)][None, :]
        if fbias_ref is not None:
            s = s + fbias_ref[0, :, pl.ds(i * blk_k, blk_k)]
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=1, keepdims=True)
        o_new = o_acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return o_new, m_new, l_new

    o0 = jnp.zeros((blk_q, d), jnp.float32)
    m0 = jnp.full((blk_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((blk_q, 1), jnp.float32)
    o, m, l = jax.lax.fori_loop(0, num_k, body, (o0, m0, l0))
    # fully-masked rows: l == 0 -> emit zeros (parity with ops/attention.sdpa)
    o = o / jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("blk_q", "blk_k"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    bias: Optional[jax.Array] = None,
                    blk_q: int = 256, blk_k: int = 512) -> jax.Array:
    """q, k, v: (B, H, L, D) -> (B, H, Lq, D).

    bias: None | (B, 1, 1, Lk) key bias | (1, 1, Lq, Lk) full bias
    (other broadcastable shapes fall back to dense XLA attention upstream).
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    orig_lq = lq

    key_bias = full_bias = None
    if bias is not None:
        if bias.ndim != 4:
            raise ValueError(f"bias must be 4D, got {bias.shape}")
        if bias.shape[1] != 1:
            raise ValueError("per-head bias unsupported in the pallas kernel")
        if bias.shape[2] == 1:  # (B or 1, 1, 1, Lk)
            key_bias = jnp.broadcast_to(bias[:, 0, 0, :], (b, lk))
        elif bias.shape[0] == 1:  # (1, 1, Lq, Lk)
            full_bias = bias[0, 0]
        else:
            raise ValueError(f"unsupported bias shape {bias.shape}")

    blk_q = min(blk_q, lq)
    blk_k = min(blk_k, lk)
    pad_q = (-lq) % blk_q
    pad_k = (-lk) % blk_k
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        lq += pad_q
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        kb = key_bias if key_bias is not None else jnp.zeros((b, lk), jnp.float32)
        key_bias = jnp.pad(kb, ((0, 0), (0, pad_k)), constant_values=NEG_INF)
        if full_bias is not None:
            full_bias = jnp.pad(full_bias, ((0, 0), (0, pad_k)),
                                constant_values=NEG_INF)
        lk += pad_k
    if full_bias is not None and pad_q:
        full_bias = jnp.pad(full_bias, ((0, pad_q), (0, 0)))

    bh = b * h
    qf = q.reshape(bh, lq, d)
    kf = k.reshape(bh, lk, d)
    vf = v.reshape(bh, lk, d)
    num_k = lk // blk_k
    grid = (bh, lq // blk_q)

    in_specs = [
        pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qf, kf, vf]
    if key_bias is not None:
        kb = jnp.repeat(key_bias.astype(jnp.float32), h, axis=0)  # (B*H, Lk)
        kb = kb[:, None, :]  # unit middle dim keeps the block tiling legal
        in_specs.append(pl.BlockSpec((1, 1, lk), lambda i, j: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(kb)
    if full_bias is not None:
        in_specs.append(pl.BlockSpec((1, blk_q, lk), lambda i, j: (0, j, 0),
                                     memory_space=pltpu.VMEM))
        args.append(full_bias.astype(jnp.float32)[None])

    def kernel(*refs):
        pos = 3
        kbias_ref = fbias_ref = None
        if key_bias is not None:
            kbias_ref = refs[pos]
            pos += 1
        if full_bias is not None:
            fbias_ref = refs[pos]
            pos += 1
        _flash_kernel(refs[0], refs[1], refs[2], kbias_ref, fbias_ref,
                      refs[-1], blk_k=blk_k, sm_scale=d**-0.5, num_k=num_k)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * lq * lk * d,
            bytes_accessed=bh * (lq + 2 * lk) * d * q.dtype.itemsize,
            transcendentals=bh * lq * lk,
        ),
    )(*args)
    out = out.reshape(b, h, lq, d)
    return out[:, :, :orig_lq]
