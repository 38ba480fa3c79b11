"""Attention-core precision variants of the fused pc attention kernel.

Round-4 perf work (VERDICT r3 next #2): the fused_attention_block core
matmuls previously ran f32 (1/2 MXU rate at best); "bf16" runs them at the
full bf16 rate and "int8" at the 4x int8 rate, with the calibrated a_smax
logit offset replacing the safe-softmax row max. These tests bound each
variant's numeric error against the f32 core in interpret mode — the
perf A/B runs on the real chip (bench.py --attn-core).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl  # noqa: F401
from jax.experimental.pallas import tpu as pltpu

from nova_pointcloud_tpu.ops.quantization import quantize_weight
import pytest


def _operands(seed=7, B=2, T=64, D=256):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    x = (jax.random.normal(ks[0], (B, T, D), jnp.float32) * 0.3
         ).astype(jnp.bfloat16)
    lns = jax.random.normal(ks[1], (D,)) * 0.1 + 1.0
    lnb = jax.random.normal(ks[2], (D,)) * 0.1
    qkv_w = quantize_weight(jax.random.normal(ks[3], (D, 3 * D)) * 0.05)
    bqkv = jax.random.normal(ks[4], (3 * D,)) * 0.01
    out_w = quantize_weight(jax.random.normal(ks[5], (D, D)) * 0.05)
    bo = jax.random.normal(ks[5], (D,)) * 0.01
    return x, lns, lnb, qkv_w, bqkv, out_w, bo


def _run(core, a_smax=None):
    from nova_pointcloud_tpu.ops.pallas.fused_block import fused_attention_block

    x, lns, lnb, qkv_w, bqkv, out_w, bo = _operands()
    with pltpu.force_tpu_interpret_mode():
        return np.asarray(fused_attention_block(
            x, lns, lnb, qkv_w.values, qkv_w.scales, bqkv,
            out_w.values, out_w.scales, bo, num_heads=4,
            core=core, a_smax=a_smax), np.float32)


def test_bf16_core_close_to_f32():
    ref = _run("f32")
    got = _run("bf16")
    rel = np.abs(got - ref).mean() / np.abs(ref).mean()
    assert rel < 1e-2, rel


def test_int8_core_close_to_f32():
    ref = _run("f32")
    got = _run("int8")
    rel = np.abs(got - ref).mean() / np.abs(ref).mean()
    assert rel < 3e-2, rel


def test_static_smax_exact_when_calibrated():
    """With a CORRECT calibrated max logit, the static-offset softmax is the
    same function as the safe softmax (offset cancels in the ratio)."""
    x, lns, lnb, qkv_w, bqkv, out_w, bo = _operands()
    # compute the true max logit through the same int8 projection math
    from nova_pointcloud_tpu.ops.quantization import int8_matmul

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + 1e-6) * lns + lnb
    qkv = int8_matmul(h, qkv_w, jnp.float32) + bqkv
    D, H = 256, 4
    hd = D // H
    q, k, _ = [a.reshape(2, 64, H, hd) for a in jnp.split(qkv, 3, -1)]
    smax = jnp.max(jnp.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, k))

    ref = _run("f32")
    got = _run("f32", a_smax=jnp.float32(smax))
    np.testing.assert_allclose(got, ref, atol=5e-3, rtol=5e-3)


def test_int8_core_with_undershot_smax_stays_finite():
    """Calibration undershoot: logits 10 above the offset clip at +20 —
    output must stay finite and close (the flash_attention_static contract)."""
    got = _run("int8", a_smax=jnp.float32(-10.0))
    assert np.isfinite(got).all()
    ref = _run("f32")
    rel = np.abs(got - ref).mean() / np.abs(ref).mean()
    assert rel < 5e-2, rel


@pytest.mark.full
def test_model_level_attn_core_variants_agree():
    """PreLNBlock serving output is insensitive to the core choice at the
    model level (CPU: exercises plumbing + calibration path, not Pallas)."""
    from nova_pointcloud_tpu.models.pointcloud import NOVAPointCloudTransformer

    outs = {}
    for core in ("f32", "bf16"):
        model = NOVAPointCloudTransformer(
            arch="pc_d2w64", point_cloud_size=64, patch_size=1,
            text_token_dim=32, dropout=0.0, quantize=True, attn_core=core)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 3))
        t = jnp.zeros((2,), jnp.int32)
        text = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32))
        params = jax.jit(model.init)(
            {"params": jax.random.PRNGKey(2),
             "dropout": jax.random.PRNGKey(3)}, x, t, text)["params"]
        outs[core] = np.asarray(
            model.apply({"params": params}, x, t, text, deterministic=True))
    # on CPU the fused path is bypassed, so both must be identical — this
    # guards that the flag does not leak into the non-fused math
    np.testing.assert_array_equal(outs["f32"], outs["bf16"])
