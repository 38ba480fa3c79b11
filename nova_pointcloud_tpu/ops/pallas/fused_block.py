"""Fused Pallas serving kernel for the point-cloud transformer block MLP.

The flagship t2pc sampler spends its time in 48 PreLN blocks at (B*CFG=128,
N=128 tokens, D=1024). XLA runs the int8 MLP at ~45ms/pass (plus ~5ms of
LayerNorm) against a ~33ms int8 matmul bound; the gap is HBM round trips for
LayerNorm, activation quantization, relu, and the residual. This kernel fuses
the whole MLP sub-block into one VMEM-resident pass (read x once, write y
once), measured 42.8ms/pass at flagship shapes on v5e:

    y = x + dequant(relu(dequant(q8(LN(x)) @ W1q) + b1) @ W2q) + b2

Replaces the reference's per-op eager torch path
(`transformer_pointcloud_nova.py:590-598` TransformerEncoderLayer). Serving
only (forward); training uses the XLA path. Weight layout matches
ops/quantization.quantize_weight (per-output-channel symmetric int8).

The attention sub-block has two serving forms:
- `fused_attention_block`: the ENTIRE sub-block (LN -> int8 QKV -> per-head
  softmax(qk^T)v via static lane slices -> int8 out-proj -> residual) as one
  VMEM-resident kernel — the default whenever the per-program footprint fits
  (attention_block_vmem_bytes), e.g. the patched flagship at T=128.
- the split path (`fused_ln_int8_matmul` QKV kernel -> XLA attention core ->
  `int8_matmul_residual`) for long sequences (per-point tokens, T>=1024)
  where scores/qkv would overflow VMEM.
A whole-layer kernel (attention+MLP in one) was measured SLOWER than the
two-kernel split at flagship shapes (110 vs 105 ms/48-layer pass): 12MB of
resident int8 weights leaves too little VMEM for input/output pipelining.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The serving kernels quantize with the SAME function as the XLA path and
# the calibration mirror (pure jnp, Pallas-lowerable), so a rounding/clip
# change can never desync them.
from nova_pointcloud_tpu.ops.quantization import (
    quantize_activations as _quant_rows)


def _ln(x, scale, bias, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _row2(a):
    """Scalars/vectors as (1, L) f32 for TPU-legal VMEM layouts."""
    return jnp.asarray(a, jnp.float32).reshape(1, -1)


def _const_spec(shape):
    """BlockSpec for a grid-invariant operand (weights, scales, biases)."""
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _check_act_scales(**sites):
    """Calibrated static amax scalars must be given all-or-none per kernel;
    a partially-merged qparams tree (one site never sown during calibration)
    would otherwise crash at trace time with an opaque asarray(None) error."""
    given = {k: v is not None for k, v in sites.items()}
    if any(given.values()) and not all(given.values()):
        missing = [k for k, g in given.items() if not g]
        raise ValueError(
            f"static activation scales are all-or-none: got "
            f"{[k for k, g in given.items() if g]} but {missing} is None — "
            f"was this site sown during pipeline.calibrate()?")


def _quant_static(x, amax):
    """Per-tensor symmetric int8 with a CALIBRATED static amax (scalar).

    Skips the per-row |x| max reduce — measured ~12% of the fused-MLP pass
    at flagship shapes (ablation: per-row 42.3ms vs static 37.4ms per
    48-layer pass). The scale comes from a calibration run over a real
    sampling trajectory (ops/quantization.merge_act_scales); outliers beyond
    the calibrated range clip at +-127, which is the standard static-quant
    tradeoff and is guarded by the int8-vs-bf16 sampled-CD regression."""
    s = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x * jax.lax.reciprocal(s)), -127,
                 127).astype(jnp.int8)
    return q, s


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (max err 1.5e-7): Mosaic has no
    lowering for lax.erf, but exp lowers fine."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _silu(x):
    # explicit logistic: guaranteed-lowerable primitives only
    return x / (1.0 + jnp.exp(-x))


def _mlp_kernel(x_ref, lns_ref, lnb_ref, w1_ref, s1_ref, b1_ref,
                w2_ref, s2_ref, b2_ref, *rest, static_acts=False):
    if static_acts:
        a1_ref, a2_ref, o_ref = rest
    else:
        (o_ref,) = rest
    x = x_ref[...].astype(jnp.float32)  # (TM, D)
    h = _ln(x, lns_ref[0].astype(jnp.float32), lnb_ref[0].astype(jnp.float32))
    if static_acts:
        q, sx = _quant_static(h, a1_ref[0, 0])
    else:
        q, sx = _quant_rows(h)
    a = jax.lax.dot_general(q, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    a = a.astype(jnp.float32) * sx * s1_ref[0] + b1_ref[0]
    a = jnp.maximum(a, 0.0)  # relu (reference TransformerEncoderLayer default)
    if static_acts:
        q2, sx2 = _quant_static(a, a2_ref[0, 0])
    else:
        q2, sx2 = _quant_rows(a)
    o = jax.lax.dot_general(q2, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    o = o.astype(jnp.float32) * sx2 * s2_ref[0] + b2_ref[0]
    o_ref[...] = (x + o).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m",))
def fused_ln_int8_mlp(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                      w1q: jax.Array, s1: jax.Array, b1: jax.Array,
                      w2q: jax.Array, s2: jax.Array, b2: jax.Array,
                      a_in=None, a_mid=None,
                      block_m: int = 256) -> jax.Array:
    """x (..., D) bf16 -> x + MLP(LN(x)) with int8 matmuls, one fused pass.

    w1q (D, F) int8 with per-channel scales s1 (F,); w2q (F, D) / s2 (D,).
    VMEM budget at D=1024, F=4096, block_m=256: 8MB weights + ~3MB
    activations (fits the ~16MB/core budget).

    ``a_in`` / ``a_mid``: optional CALIBRATED per-tensor activation amax
    scalars for the two quant sites (post-LN input, post-relu mid); when
    given the kernel skips the per-row amax reduce (_quant_static).
    """
    orig_shape = x.shape
    d = x.shape[-1]
    f = w1q.shape[1]
    xf = x.reshape(-1, d)
    m = xf.shape[0]
    pad = (-m) % block_m
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    rows = xf.shape[0]
    _check_act_scales(a_in=a_in, a_mid=a_mid)
    static_acts = a_in is not None

    in_specs = [
        pl.BlockSpec((block_m, d), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        _const_spec((1, d)), _const_spec((1, d)),
        _const_spec((d, f)), _const_spec((1, f)), _const_spec((1, f)),
        _const_spec((f, d)), _const_spec((1, d)), _const_spec((1, d)),
    ]
    operands = [xf, _row2(ln_scale), _row2(ln_bias), w1q, _row2(s1),
                _row2(b1), w2q, _row2(s2), _row2(b2)]
    if static_acts:
        in_specs += [_const_spec((1, 1)), _const_spec((1, 1))]
        operands += [_row2(a_in), _row2(a_mid)]

    out = pl.pallas_call(
        functools.partial(_mlp_kernel, static_acts=static_acts),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(rows // block_m,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((block_m, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * d * f,
            bytes_accessed=2 * rows * d * 2 + (d * f * 2),
            transcendentals=0,
        ),
    )(*operands)
    if pad:
        out = out[:m]
    return out.reshape(orig_shape)


def _ln_matmul_kernel(x_ref, lns_ref, lnb_ref, w_ref, s_ref, b_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)  # (TM, D)
    h = _ln(x, lns_ref[0].astype(jnp.float32), lnb_ref[0].astype(jnp.float32))
    q, sx = _quant_rows(h)
    a = jax.lax.dot_general(q, w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    o_ref[...] = (a.astype(jnp.float32) * sx * s_ref[0]
                  + b_ref[0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m",))
def fused_ln_int8_matmul(x: jax.Array, ln_scale: jax.Array,
                         ln_bias: jax.Array, wq: jax.Array, s: jax.Array,
                         b: jax.Array, block_m: int = 256) -> jax.Array:
    """LN(x) -> per-row int8 quant -> one int8 matmul, fused in VMEM.

    x (..., D); wq (D, O) int8 with per-channel scales s (O,). Returns
    (..., O) in x.dtype. Serving path for the QKV projection: O = 3D, the
    (B, T, 3D) output is head-split by the caller (XLA reshape is free).
    """
    orig_shape = x.shape
    d = x.shape[-1]
    o_dim = wq.shape[1]
    xf = x.reshape(-1, d)
    m = xf.shape[0]
    pad = (-m) % block_m
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    rows = xf.shape[0]

    out = pl.pallas_call(
        _ln_matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, o_dim), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(rows // block_m,),
            in_specs=[
                pl.BlockSpec((block_m, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, o_dim), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, o_dim), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, o_dim), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_m, o_dim), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * d * o_dim,
            bytes_accessed=rows * (d + o_dim) * 2 + d * o_dim,
            transcendentals=0,
        ),
    )(xf, _row2(ln_scale), _row2(ln_bias), wq, _row2(s), _row2(b))
    if pad:
        out = out[:m]
    return out.reshape(orig_shape[:-1] + (o_dim,))


def _matmul_res_kernel(x_ref, res_ref, w_ref, s_ref, b_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)  # (TM, D_in)
    q, sx = _quant_rows(x)
    a = jax.lax.dot_general(q, w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    a = a.astype(jnp.float32) * sx * s_ref[0] + b_ref[0]
    o_ref[...] = (res_ref[...].astype(jnp.float32) + a).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m",))
def int8_matmul_residual(x: jax.Array, residual: jax.Array, wq: jax.Array,
                         s: jax.Array, b: jax.Array,
                         block_m: int = 256) -> jax.Array:
    """residual + (q8(x) @ wq) * sx * s + b, fused in VMEM.

    x (..., D_in); residual (..., D_out); wq (D_in, D_out) int8. The serving
    path for the attention out-projection (+ residual add, saving one HBM
    round trip)."""
    d_in = x.shape[-1]
    d_out = wq.shape[1]
    xf = x.reshape(-1, d_in)
    rf = residual.reshape(-1, d_out)
    m = xf.shape[0]
    pad = (-m) % block_m
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
        rf = jnp.pad(rf, ((0, pad), (0, 0)))
    rows = xf.shape[0]


    out = pl.pallas_call(
        _matmul_res_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, d_out), residual.dtype),
        grid_spec=pl.GridSpec(
            grid=(rows // block_m,),
            in_specs=[
                pl.BlockSpec((block_m, d_in), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_m, d_out), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d_in, d_out), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d_out), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d_out), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_m, d_out), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * d_in * d_out,
            bytes_accessed=rows * (d_in + 2 * d_out) * 2 + d_in * d_out,
            transcendentals=0,
        ),
    )(xf, rf, wq, _row2(s), _row2(b))
    if pad:
        out = out[:m]
    return out.reshape(residual.shape)


def _attn_core_head(qh, kh, vh, scale, core, smax=None):
    """One head's softmax(q k^T) v with a selectable matmul precision.

    core="f32" is the round-2 behavior. "bf16" runs both core matmuls at
    the MXU's 2x bf16 rate (logit rounding ~0.4% of row amax). "int8" runs
    them at the 4x int8 rate: q (scale folded in) and k quantize per row so
    the logit scale factors as sq_i * sk_j; for p@v the value-row scales
    sv_j fold INTO p before quantizing it (sum_j p_ij sv_j (v_jd / sv_j)
    telescopes), so one per-row quant of p' = p * sv recovers exact algebra
    up to int8 rounding. ``smax``: calibrated max-logit offset — skips the
    per-row max reduce of a safe softmax; logits above it clip at +20
    exactly like flash_attention_static.
    """
    if core == "int8":
        q8, sq = _quant_rows(qh * scale)
        k8, sk = _quant_rows(kh)
        s = jax.lax.dot_general(q8, k8, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        s = s.astype(jnp.float32) * sq * sk.reshape(1, -1)
    elif core == "bf16":
        s = jax.lax.dot_general(qh.astype(jnp.bfloat16),
                                kh.astype(jnp.bfloat16),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
    else:
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
    if smax is None:
        p = jax.nn.softmax(s, axis=-1)
    else:
        e = jnp.exp(jnp.minimum(s - smax, 20.0))
        # guard rows whose logits sit far below the calibrated global max
        # (every exp underflows to 0): match flash_attention's static
        # kernels, which clamp the denominator instead of emitting 0/0
        p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    if core == "int8":
        v8, sv = _quant_rows(vh)
        p8, sp = _quant_rows(p * sv.reshape(1, -1))
        o = jax.lax.dot_general(p8, v8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return o.astype(jnp.float32) * sp
    if core == "bf16":
        return jax.lax.dot_general(p.astype(jnp.bfloat16),
                                   vh.astype(jnp.bfloat16),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    return jax.lax.dot_general(p, vh, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _attn_block_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                       wo_ref, so_ref, bo_ref, *rest, num_heads,
                       static_acts=False, core="f32", static_smax=False):
    refs = list(rest)
    o_ref = refs.pop()
    ain_ref = aav_ref = smax_ref = None
    if static_acts:
        ain_ref, aav_ref = refs[0], refs[1]
        refs = refs[2:]
    if static_smax:
        (smax_ref,) = refs
    sb, t, d = x_ref.shape  # sb samples per program
    hd = d // num_heads
    x = x_ref[...].astype(jnp.float32).reshape(sb * t, d)
    h = _ln(x, lns_ref[0].astype(jnp.float32), lnb_ref[0].astype(jnp.float32))
    if static_acts:
        q8, sx = _quant_static(h, ain_ref[0, 0])
    else:
        q8, sx = _quant_rows(h)
    qkv = jax.lax.dot_general(q8, wqkv_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    qkv = qkv.astype(jnp.float32) * sx * sqkv_ref[0] + bqkv_ref[0]  # (sb*T, 3D)
    scale = hd ** -0.5
    smax = smax_ref[0, 0] if static_smax else None
    outs = []
    for b in range(sb):
        qkv_b = jax.lax.slice(qkv, (b * t, 0), ((b + 1) * t, 3 * d))
        heads_out = []
        for i in range(num_heads):
            qh = jax.lax.slice(qkv_b, (0, i * hd), (t, (i + 1) * hd))
            kh = jax.lax.slice(qkv_b, (0, d + i * hd), (t, d + (i + 1) * hd))
            vh = jax.lax.slice(qkv_b, (0, 2 * d + i * hd),
                               (t, 2 * d + (i + 1) * hd))
            heads_out.append(_attn_core_head(qh, kh, vh, scale, core, smax))
        outs.append(jnp.concatenate(heads_out, axis=-1))
    av = jnp.concatenate(outs, axis=0)  # (sb*T, D)
    if static_acts:
        q8o, sxo = _quant_static(av, aav_ref[0, 0])
    else:
        q8o, sxo = _quant_rows(av)
    o = jax.lax.dot_general(q8o, wo_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    o = o.astype(jnp.float32) * sxo * so_ref[0] + bo_ref[0]
    o_ref[...] = (x + o).reshape(sb, t, d).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "core"))
def fused_attention_block(x: jax.Array, ln_scale: jax.Array,
                          ln_bias: jax.Array, wqkv_q: jax.Array,
                          wqkv_s: jax.Array, bqkv: jax.Array,
                          wo_q: jax.Array, wo_s: jax.Array, bo: jax.Array,
                          num_heads: int, a_in=None, a_av=None,
                          core: str = "f32", a_smax=None) -> jax.Array:
    """The entire PreLN attention sub-block as ONE VMEM-resident kernel:

        y = x + W_o q8(softmax(q k^T / sqrt(hd)) v) + b_o,
        with (q|k|v) = q8(LN(x)) @ Wqkv_int8 * scales + b_qkv

    vs the previous serving path (fused LN+QKV kernel -> XLA attention core
    -> fused out-proj kernel), this removes the (B, T, 3D) qkv and (B, T, D)
    attention-output HBM round trips entirely — at flagship shapes
    (B=128, T=128, D=1024, 48 layers) that is ~0.27GB of traffic per layer
    pass. Grid is one program per sample; weights stay VMEM-resident across
    the grid. Per-head slicing is static (lane offsets multiple of hd).

    x: (B, T, D); wqkv_q (D, 3D) int8 + per-channel scales wqkv_s (3D,);
    wo_q (D, D) int8 + wo_s (D,). Serving/forward only.

    Two samples share one program when batch and VMEM allow (256-row
    projection matmuls pipeline better on the MXU: measured ~8% faster on
    the attention pass at flagship shapes, bitwise-identical output).

    ``a_in`` / ``a_av``: optional calibrated per-tensor activation amax for
    the post-LN input and the attention-output quant sites (_quant_static).
    ``core``: precision of the attention-core matmuls — "f32" (exact),
    "bf16" (2x MXU rate), "int8" (4x; per-row q/k/p' quant, see
    _attn_core_head). ``a_smax``: calibrated max-logit offset replacing the
    safe-softmax row max (recorded by PreLNBlock._calibration_forward).

    ``NOVA_ATTN_SB``: env override for samples-per-program (the grid block
    over the batch). Auto picks 2 when the footprint fits the 14MB gate;
    the override bypasses the gate for on-chip block-shape sweeps (values
    that don't divide the batch fall back to auto). Output is bitwise
    identical across sb — only the grid/pipelining changes. Read at trace
    time: use a fresh process per setting (jit caches don't key on it).
    """
    b, t, d = x.shape
    sb = 2 if (b % 2 == 0
               and attention_block_vmem_bytes(t, d, 2) <= 14 * 2**20) else 1
    try:
        sb_env = int(os.environ.get("NOVA_ATTN_SB", "0"))
    except ValueError:  # empty/malformed: fall back to auto, as documented
        sb_env = 0
    if sb_env > 0 and b % sb_env == 0:
        # the override may push past the 14MB pipelining heuristic for
        # sweeps, but never past the physical ~16MB scoped-VMEM limit —
        # that is a guaranteed compile error, not an experiment
        if attention_block_vmem_bytes(t, d, sb_env) <= int(15.5 * 2**20):
            sb = sb_env
        else:
            import sys

            print(f"# NOVA_ATTN_SB={sb_env} exceeds the 16MB VMEM limit at "
                  f"(T={t}, D={d}); using sb={sb}", file=sys.stderr)
    _check_act_scales(a_in=a_in, a_av=a_av)
    static_acts = a_in is not None
    static_smax = a_smax is not None

    in_specs = [
        pl.BlockSpec((sb, t, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        _const_spec((1, d)), _const_spec((1, d)),
        _const_spec((d, 3 * d)), _const_spec((1, 3 * d)), _const_spec((1, 3 * d)),
        _const_spec((d, d)), _const_spec((1, d)), _const_spec((1, d)),
    ]
    operands = [x, _row2(ln_scale), _row2(ln_bias), wqkv_q, _row2(wqkv_s),
                _row2(bqkv), wo_q, _row2(wo_s), _row2(bo)]
    if static_acts:
        in_specs += [_const_spec((1, 1)), _const_spec((1, 1))]
        operands += [_row2(a_in), _row2(a_av)]
    if static_smax:
        in_specs += [_const_spec((1, 1))]
        operands += [_row2(a_smax)]

    kernel = functools.partial(_attn_block_kernel, num_heads=num_heads,
                               static_acts=static_acts, core=core,
                               static_smax=static_smax)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(b // sb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((sb, t, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * d * 4 * d + 4 * b * t * t * d,
            bytes_accessed=2 * b * t * d * 2 + 4 * d * d,
            transcendentals=b * t * t,
        ),
    )(*operands)


def attention_block_vmem_bytes(t: int, d: int, sb: int = 1) -> int:
    """Estimated per-program VMEM footprint of fused_attention_block with
    ``sb`` samples per program.

    x f32 + qkv f32 + av f32 + one head's scores (compiler keeps ~2 alive)
    + int8 weights + f32 scale/bias rows. Callers gate on this against the
    ~16MB/core budget (observed: t=1024, d=768 compiles to an 18.25M request
    and is rejected; t=128, d=1024 fits comfortably)."""
    return (sb * (4 * t * d          # x (f32 working copy)
                  + 4 * t * 3 * d    # dequantized qkv
                  + 4 * t * d)       # concatenated head outputs
            + 2 * 4 * t * t          # scores/probs in flight
            + 4 * d * d              # wqkv + wo int8
            + 4 * 10 * max(d, 128))  # scale/bias rows, sx columns, slack


def _mlp_postln_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                       lns_ref, lnb_ref, *rest, static_acts=False,
                       ln_eps=1e-6):
    if static_acts:
        ax_ref, ag_ref, o_ref = rest
    else:
        (o_ref,) = rest
    x = x_ref[...].astype(jnp.float32)  # (TM, D)
    if static_acts:
        q, sx = _quant_static(x, ax_ref[0, 0])
    else:
        q, sx = _quant_rows(x)
    a = jax.lax.dot_general(q, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    a = a.astype(jnp.float32) * sx * s1_ref[0] + b1_ref[0]
    # exact gelu (NOVA ViT parity: nn.gelu(approximate=False), models/vit.py)
    a = 0.5 * a * (1.0 + _erf(a * (2.0 ** -0.5)))
    if static_acts:
        q2, sx2 = _quant_static(a, ag_ref[0, 0])
    else:
        q2, sx2 = _quant_rows(a)
    o = jax.lax.dot_general(q2, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    o = o.astype(jnp.float32) * sx2 * s2_ref[0] + b2_ref[0]
    o = _ln(o, lns_ref[0].astype(jnp.float32), lnb_ref[0].astype(jnp.float32),
            eps=ln_eps)
    o_ref[...] = (x + o).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "ln_eps"))
def fused_int8_mlp_postln(x: jax.Array, w1q: jax.Array, s1: jax.Array,
                          b1: jax.Array, w2q: jax.Array, s2: jax.Array,
                          b2: jax.Array, ln_scale: jax.Array,
                          ln_bias: jax.Array, a_x=None, a_gelu=None,
                          block_m: int = 256,
                          ln_eps: float = 1e-6) -> jax.Array:
    """Post-sublayer-norm MLP residual, one VMEM-resident int8 pass:

        y = x + LN(gelu(q8(x) @ W1q) @ W2q)

    The NOVA ViT block's MLP sub-block (`models/vit.py` Block: post-norm,
    exact gelu — vs the pc PreLNBlock's pre-norm relu handled by
    fused_ln_int8_mlp). Serving/forward only; same quantize_weight layout.

    ``a_x`` / ``a_gelu``: optional calibrated per-tensor activation amax for
    the block-input and post-gelu quant sites (_quant_static).
    """
    orig_shape = x.shape
    d = x.shape[-1]
    f = w1q.shape[1]
    xf = x.reshape(-1, d)
    m = xf.shape[0]
    pad = (-m) % block_m
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    rows = xf.shape[0]
    _check_act_scales(a_x=a_x, a_gelu=a_gelu)
    static_acts = a_x is not None

    in_specs = [
        pl.BlockSpec((block_m, d), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        _const_spec((d, f)), _const_spec((1, f)), _const_spec((1, f)),
        _const_spec((f, d)), _const_spec((1, d)), _const_spec((1, d)),
        _const_spec((1, d)), _const_spec((1, d)),
    ]
    operands = [xf, w1q, _row2(s1), _row2(b1), w2q, _row2(s2), _row2(b2),
                _row2(ln_scale), _row2(ln_bias)]
    if static_acts:
        in_specs += [_const_spec((1, 1)), _const_spec((1, 1))]
        operands += [_row2(a_x), _row2(a_gelu)]

    out = pl.pallas_call(
        functools.partial(_mlp_postln_kernel, static_acts=static_acts,
                          ln_eps=ln_eps),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(rows // block_m,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((block_m, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * d * f,
            bytes_accessed=2 * rows * d * 2 + 2 * d * f,
            transcendentals=rows * f,
        ),
    )(*operands)
    if pad:
        out = out[:m]
    return out.reshape(orig_shape)


def _diffusion_block_kernel(x_ref, zc_ref, ws_ref, ss_ref, bs_ref,
                            w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                            n2s_ref, n2b_ref, *rest, static_acts=False,
                            n2_eps=1e-6):
    if static_acts:
        az_ref, ah_ref, as_ref, o_ref = rest
    else:
        (o_ref,) = rest
    d = x_ref.shape[-1]
    x = x_ref[...].astype(jnp.float32)  # (TM, D)
    z = zc_ref[...].astype(jnp.float32)
    z = _silu(z)
    if static_acts:
        qz, sz = _quant_static(z, az_ref[0, 0])
    else:
        qz, sz = _quant_rows(z)
    stats = jax.lax.dot_general(qz, ws_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    stats = stats.astype(jnp.float32) * sz * ss_ref[0] + bs_ref[0]  # (TM, 3D)
    t = x.shape[0]
    scale = jax.lax.slice(stats, (0, 0), (t, d))
    shift = jax.lax.slice(stats, (0, d), (t, 2 * d))
    gate = jax.lax.slice(stats, (0, 2 * d), (t, 3 * d))
    h = _ln(x, 1.0, 0.0) * (1.0 + scale) + shift  # AdaLN-zero (no ln affine)
    if static_acts:
        qh, sh = _quant_static(h, ah_ref[0, 0])
    else:
        qh, sh = _quant_rows(h)
    a = jax.lax.dot_general(qh, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    a = a.astype(jnp.float32) * sh * s1_ref[0] + b1_ref[0]
    a = _silu(a)  # Projector activation (diffusion_mlp.py:26-36)
    if static_acts:
        qa, sa = _quant_static(a, as_ref[0, 0])
    else:
        qa, sa = _quant_rows(a)
    o = jax.lax.dot_general(qa, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    o = o.astype(jnp.float32) * sa * s2_ref[0] + b2_ref[0]
    # the AdaLN above keeps eps=1e-6 (reference AdaLayerNormZero eps=1e-6);
    # norm2 is a plain torch LayerNorm in the reference -> its own eps
    o = _ln(o, n2s_ref[0].astype(jnp.float32), n2b_ref[0].astype(jnp.float32),
            eps=n2_eps)
    o_ref[...] = (o * gate + x).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "n2_eps"))
def fused_int8_diffusion_block(x: jax.Array, zc: jax.Array,
                               wstats_q: jax.Array, stats_s: jax.Array,
                               stats_b: jax.Array, w1q: jax.Array,
                               s1: jax.Array, b1: jax.Array, w2q: jax.Array,
                               s2: jax.Array, b2: jax.Array,
                               n2_scale: jax.Array, n2_bias: jax.Array,
                               a_z=None, a_h=None, a_silu=None,
                               block_m: int = 256,
                               n2_eps: float = 1e-6) -> jax.Array:
    """One DiffusionMLP block (`models/diffusion_mlp.DiffusionBlock`,
    reference `diffusion_mlp.py:39-53`) as a single VMEM-resident int8 pass:

        (scale|shift|gate) = q8(silu(zc)) @ Wstats + b
        h = LN_noaffine(x) * (1 + scale) + shift
        h = q8(silu(q8(h) @ W1 + b1)) @ W2 + b2
        y = LN_affine(h) * gate + x

    This is the inner 25-step token-diffusion loop of every sampler (t2i /
    t2v / masked-AR pc) — it runs 25 x ar_steps times per sample.

    ``a_z`` / ``a_h`` / ``a_silu``: optional calibrated per-tensor activation
    amax for the three quant sites (post-silu cond, post-AdaLN hidden,
    post-silu mid; _quant_static).
    """
    orig_shape = x.shape
    d = x.shape[-1]
    xf = x.reshape(-1, d)
    zf = zc.reshape(-1, d)
    m = xf.shape[0]
    pad = (-m) % block_m
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
        zf = jnp.pad(zf, ((0, pad), (0, 0)))
    rows = xf.shape[0]
    _check_act_scales(a_z=a_z, a_h=a_h, a_silu=a_silu)
    static_acts = a_z is not None

    in_specs = [
        pl.BlockSpec((block_m, d), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_m, d), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        _const_spec((d, 3 * d)), _const_spec((1, 3 * d)), _const_spec((1, 3 * d)),
        _const_spec((d, d)), _const_spec((1, d)), _const_spec((1, d)),
        _const_spec((d, d)), _const_spec((1, d)), _const_spec((1, d)),
        _const_spec((1, d)), _const_spec((1, d)),
    ]
    operands = [xf, zf, wstats_q, _row2(stats_s), _row2(stats_b),
                w1q, _row2(s1), _row2(b1), w2q, _row2(s2), _row2(b2),
                _row2(n2_scale), _row2(n2_bias)]
    if static_acts:
        in_specs += [_const_spec((1, 1)), _const_spec((1, 1)), _const_spec((1, 1))]
        operands += [_row2(a_z), _row2(a_h),
                     _row2(a_silu)]

    out = pl.pallas_call(
        functools.partial(_diffusion_block_kernel, static_acts=static_acts,
                          n2_eps=n2_eps),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(rows // block_m,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((block_m, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * d * 5 * d,
            bytes_accessed=3 * rows * d * 2 + 5 * d * d,
            transcendentals=2 * rows * d,
        ),
    )(*operands)
    if pad:
        out = out[:m]
    return out.reshape(orig_shape)
