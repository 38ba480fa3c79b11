"""Fused Pallas serving-block kernel vs the XLA int8 path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from nova_pointcloud_tpu.models.pointcloud import PreLNBlock
from nova_pointcloud_tpu.ops.pallas.fused_block import (
    fused_ln_int8_matmul, fused_ln_int8_mlp, int8_matmul_residual)
from nova_pointcloud_tpu.ops.quantization import int8_matmul, quantize_weight
import pytest


def test_fused_mlp_matches_xla_int8_path():
    key = jax.random.PRNGKey(0)
    d, f = 256, 1024
    x = jax.random.normal(key, (2, 64, d), jnp.float32) * 0.5
    ks = jax.random.split(key, 6)
    lns = jax.random.normal(ks[0], (d,)) * 0.1 + 1.0
    lnb = jax.random.normal(ks[1], (d,)) * 0.1
    w1 = jax.random.normal(ks[2], (d, f)) * 0.05
    b1 = jax.random.normal(ks[3], (f,)) * 0.01
    w2 = jax.random.normal(ks[4], (f, d)) * 0.05
    b2 = jax.random.normal(ks[5], (d,)) * 0.01
    q1, q2 = quantize_weight(w1), quantize_weight(w2)

    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    h = (x - mu) * jax.lax.rsqrt(var + 1e-6) * lns + lnb
    a = jnp.maximum(int8_matmul(h, q1, jnp.float32) + b1, 0)
    ref = x + int8_matmul(a, q2, jnp.float32) + b2

    with pltpu.force_tpu_interpret_mode():
        out = fused_ln_int8_mlp(x, lns, lnb, q1.values, q1.scales, b1,
                                q2.values, q2.scales, b2, block_m=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_fused_ln_matmul_matches_xla_int8():
    key = jax.random.PRNGKey(2)
    d, o = 256, 768
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (2, 64, d), jnp.float32) * 0.5
    lns = jax.random.normal(ks[1], (d,)) * 0.1 + 1.0
    lnb = jax.random.normal(ks[1], (d,)) * 0.1
    w = jax.random.normal(ks[2], (d, o)) * 0.05
    b = jax.random.normal(ks[3], (o,)) * 0.01
    qw = quantize_weight(w)

    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    h = (x - mu) * jax.lax.rsqrt(var + 1e-6) * lns + lnb
    ref = int8_matmul(h, qw, jnp.float32) + b

    with pltpu.force_tpu_interpret_mode():
        out = fused_ln_int8_matmul(x, lns, lnb, qw.values, qw.scales, b,
                                   block_m=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_int8_matmul_residual_matches_xla_int8():
    key = jax.random.PRNGKey(3)
    d_in, d_out = 192, 128
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (2, 48, d_in), jnp.float32) * 0.5
    res = jax.random.normal(ks[1], (2, 48, d_out), jnp.float32)
    w = jax.random.normal(ks[2], (d_in, d_out)) * 0.05
    b = jax.random.normal(ks[3], (d_out,)) * 0.01
    qw = quantize_weight(w)
    ref = res + int8_matmul(x, qw, jnp.float32) + b

    with pltpu.force_tpu_interpret_mode():
        out = int8_matmul_residual(x, res, qw.values, qw.scales, b,
                                   block_m=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.full
def test_preln_block_prequantized_matches_ingraph(monkeypatch):
    """Serving with the precomputed "qparams" collection == quantizing
    in-graph (same int8 math, hoisted out of the sampling scan)."""
    from nova_pointcloud_tpu.ops.quantization import quantize_serving_params

    key = jax.random.PRNGKey(4)
    blk = PreLNBlock(dim=128, num_heads=4, dropout=0.0, quantize=True)
    x = jax.random.normal(key, (2, 32, 128), jnp.float32) * 0.3
    params = blk.init(key, x)["params"]
    qp = quantize_serving_params(params)
    assert set(qp) == {"wqkv_q", "wqkv_s", "out_q", "out_s",
                       "fc1_q", "fc1_s", "fc2_q", "fc2_s"}

    import nova_pointcloud_tpu.models.pointcloud as pc_mod
    monkeypatch.setattr(pc_mod.jax, "default_backend", lambda: "tpu")
    with pltpu.force_tpu_interpret_mode():
        ref = blk.apply({"params": params}, x)
        out = blk.apply({"params": params, "qparams": qp}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_preln_block_fused_path_matches_xla(monkeypatch):
    """The quantize=True serving path (fused Pallas kernels, incl. int8
    attention projections) tracks the XLA int8-MLP/bf16-attention path with
    the same params. Exercised on CPU by faking the TPU backend gate inside
    interpret mode. Tolerance covers the extra attention-projection
    quantization (absent from the XLA path); end-to-end quality of the int8
    path is guarded by the CD/EMD sweep in scripts/eval_pc_quality.py."""
    key = jax.random.PRNGKey(1)
    blk = PreLNBlock(dim=128, num_heads=4, dropout=0.0, quantize=True)
    x = jax.random.normal(key, (2, 32, 128), jnp.float32) * 0.3
    params = blk.init(key, x)["params"]
    ref = blk.apply({"params": params}, x)  # XLA path (backend is cpu)

    import nova_pointcloud_tpu.models.pointcloud as pc_mod
    monkeypatch.setattr(pc_mod.jax, "default_backend", lambda: "tpu")
    with pltpu.force_tpu_interpret_mode():
        out = blk.apply({"params": params}, x)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).mean()
    assert err.mean() / scale < 2e-2, (err.mean(), scale)
    assert err.max() / scale < 2e-1, (err.max(), scale)


def test_fused_attention_block_matches_split_path():
    """One-kernel attention sub-block == (LN+QKV kernel, XLA core, out-proj
    kernel). Internal f32 scores/softmax vs the split path's bf16 softmax
    give a small expected delta; both quantize activations per-row."""
    from nova_pointcloud_tpu.ops.pallas.fused_block import fused_attention_block

    B, T, D, H = 2, 64, 256, 4
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 6)
    x = (jax.random.normal(ks[0], (B, T, D), jnp.float32) * 0.3
         ).astype(jnp.bfloat16)
    lns = jax.random.normal(ks[1], (D,)) * 0.1 + 1.0
    lnb = jax.random.normal(ks[2], (D,)) * 0.1
    qkv_w = quantize_weight(jax.random.normal(ks[3], (D, 3 * D)) * 0.05)
    bqkv = jax.random.normal(ks[4], (3 * D,)) * 0.01
    out_w = quantize_weight(jax.random.normal(ks[5], (D, D)) * 0.05)
    bo = jax.random.normal(ks[5], (D,)) * 0.01

    with pltpu.force_tpu_interpret_mode():
        qkv = fused_ln_int8_matmul(x, lns, lnb, qkv_w.values, qkv_w.scales,
                                   bqkv, block_m=64)
        hd = D // H
        q, k, v = [a.reshape(B, T, H, hd) for a in jnp.split(qkv, 3, axis=-1)]
        q = q * (hd ** -0.5)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        av = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, D)
        ref = int8_matmul_residual(av, x, out_w.values, out_w.scales, bo,
                                   block_m=64)
        out = fused_attention_block(x, lns, lnb, qkv_w.values, qkv_w.scales,
                                    bqkv, out_w.values, out_w.scales, bo,
                                    num_heads=H)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    scale = np.abs(np.asarray(ref, np.float32)).mean()
    assert err.mean() / scale < 2e-2, (err.mean(), scale)


def test_fused_attention_block_static_smax_far_row_is_finite():
    """A serving row whose logits sit ~90+ below the calibrated global max
    has every exp underflow to 0 — the static-smax softmax must clamp its
    denominator (0/0 NaN would poison the residual stream)."""
    from nova_pointcloud_tpu.ops.pallas.fused_block import fused_attention_block

    B, T, D, H = 1, 64, 256, 4
    ks = jax.random.split(jax.random.PRNGKey(11), 5)
    x = (jax.random.normal(ks[0], (B, T, D), jnp.float32) * 0.3
         ).astype(jnp.bfloat16)
    lns = jnp.ones((D,))
    lnb = jnp.zeros((D,))
    qkv_w = quantize_weight(jax.random.normal(ks[1], (D, 3 * D)) * 0.05)
    bqkv = jnp.zeros((3 * D,))
    out_w = quantize_weight(jax.random.normal(ks[2], (D, D)) * 0.05)
    bo = jnp.zeros((D,))
    with pltpu.force_tpu_interpret_mode():
        out = fused_attention_block(x, lns, lnb, qkv_w.values, qkv_w.scales,
                                    bqkv, out_w.values, out_w.scales, bo,
                                    num_heads=H, core="bf16",
                                    a_smax=jnp.float32(120.0))
    out = np.asarray(out, np.float32)
    assert np.isfinite(out).all()
    # with every softmax weight underflowed the block contributes ~nothing:
    # output falls back to the residual input
    np.testing.assert_allclose(out, np.asarray(x, np.float32),
                               atol=np.abs(np.asarray(bo)).max() + 0.15)


def test_fused_attention_block_sb_override_is_bitwise(monkeypatch):
    """NOVA_ATTN_SB only changes the grid blocking, never the math: sb=1 and
    sb=2 outputs must be bitwise identical (each sample's program is
    independent). Fresh trace per setting (the override is read at trace
    time), forced here by clearing jax caches."""
    from nova_pointcloud_tpu.ops.pallas.fused_block import fused_attention_block

    B, T, D, H = 4, 32, 256, 4
    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    x = (jax.random.normal(ks[0], (B, T, D), jnp.float32) * 0.3
         ).astype(jnp.bfloat16)
    lns = jax.random.normal(ks[1], (D,)) * 0.1 + 1.0
    lnb = jax.random.normal(ks[2], (D,)) * 0.1
    qkv_w = quantize_weight(jax.random.normal(ks[3], (D, 3 * D)) * 0.05)
    bqkv = jax.random.normal(ks[4], (3 * D,)) * 0.01
    out_w = quantize_weight(jax.random.normal(ks[5], (D, D)) * 0.05)
    bo = jax.random.normal(ks[5], (D,)) * 0.01

    outs = []
    for sb in ("1", "2"):
        monkeypatch.setenv("NOVA_ATTN_SB", sb)
        fused_attention_block.clear_cache()
        with pltpu.force_tpu_interpret_mode():
            outs.append(np.asarray(
                fused_attention_block(x, lns, lnb, qkv_w.values, qkv_w.scales,
                                      bqkv, out_w.values, out_w.scales, bo,
                                      num_heads=H), np.float32))
    monkeypatch.delenv("NOVA_ATTN_SB")
    fused_attention_block.clear_cache()
    np.testing.assert_array_equal(outs[0], outs[1])


def test_fused_mlp_static_acts_matches_xla_static_math():
    """Calibrated static activation scales == per-tensor static quant math."""
    key = jax.random.PRNGKey(21)
    d, f = 256, 1024
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (2, 64, d), jnp.float32) * 0.5
    lns = jax.random.normal(ks[1], (d,)) * 0.1 + 1.0
    lnb = jax.random.normal(ks[2], (d,)) * 0.1
    w1 = jax.random.normal(ks[3], (d, f)) * 0.05
    b1 = jax.random.normal(ks[4], (f,)) * 0.01
    w2 = jax.random.normal(ks[5], (f, d)) * 0.05
    b2 = jax.random.normal(ks[5], (d,)) * 0.01
    q1, q2 = quantize_weight(w1), quantize_weight(w2)

    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    h = (x - mu) * jax.lax.rsqrt(var + 1e-6) * lns + lnb
    a_in = jnp.max(jnp.abs(h)) * 1.05  # calibrated amax with headroom

    def static_q(v, amax):
        s = jnp.maximum(amax / 127.0, 1e-8)
        return jnp.clip(jnp.round(v / s), -127, 127).astype(jnp.int8), s

    qh, sh = static_q(h, a_in)
    a = qh.astype(jnp.float32) @ w1q_deq(q1) * sh + b1
    a = jnp.maximum(a, 0.0)
    a_mid = jnp.max(jnp.abs(a)) * 1.05
    qa, sa = static_q(a, a_mid)
    ref = x + (qa.astype(jnp.float32) @ w1q_deq(q2)) * sa + b2

    with pltpu.force_tpu_interpret_mode():
        out = fused_ln_int8_mlp(x, lns, lnb, q1.values, q1.scales, b1,
                                q2.values, q2.scales, b2,
                                a_in=a_in, a_mid=a_mid, block_m=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def w1q_deq(qw):
    """int8 weight -> effective fp matrix (values * per-channel scales)."""
    return qw.values.astype(jnp.float32) * qw.scales


def test_preln_block_calibration_and_static_serving(monkeypatch):
    """apply(mutable=["act_stats"]) sows the four quant-site ranges; merging
    them into qparams switches the fused kernels to static scales with
    output close to the dynamic per-row path."""
    from nova_pointcloud_tpu.ops.quantization import (merge_act_scales,
                                                      quantize_serving_params)

    key = jax.random.PRNGKey(22)
    blk = PreLNBlock(dim=128, num_heads=4, dropout=0.0, quantize=True)
    x = jax.random.normal(key, (2, 32, 128), jnp.float32) * 0.3
    params = blk.init(key, x)["params"]

    y_cal, vs = blk.apply({"params": params}, x, mutable=["act_stats"])
    stats = vs["act_stats"]
    sites = {"a_ln1", "a_av", "a_ln2", "a_mid", "a_smax"}
    assert set(stats) == sites
    # amax sites are positive; a_smax is a LOGIT (any sign)
    assert all(float(v) > 0 for k, v in stats.items() if k != "a_smax")

    qp = quantize_serving_params(params)
    qp_static = merge_act_scales(qp, stats, margin=1.05)
    assert set(qp_static) - set(qp) == sites

    import nova_pointcloud_tpu.models.pointcloud as pc_mod
    monkeypatch.setattr(pc_mod.jax, "default_backend", lambda: "tpu")
    with pltpu.force_tpu_interpret_mode():
        dyn = blk.apply({"params": params, "qparams": qp}, x)
        stat = blk.apply({"params": params, "qparams": qp_static}, x)
    dyn, stat = np.asarray(dyn, np.float32), np.asarray(stat, np.float32)
    scale = np.abs(dyn).mean()
    assert np.abs(stat - dyn).mean() / scale < 3e-2
    # the calibration mirror itself tracks the serving math
    assert np.abs(np.asarray(y_cal) - dyn).mean() / scale < 3e-2


def test_pipeline_calibrate_cpu_smoke():
    """Pipeline.calibrate records (depth,)-shaped per-layer scales through
    the scanned stack and the sampler keeps working afterwards."""
    from nova_pointcloud_tpu.models.pointcloud import NOVAPointCloudTransformer
    from nova_pointcloud_tpu.pipelines.pointcloud_gen import (
        NOVAPointCloudGenerationPipeline)
    from nova_pointcloud_tpu.schedulers import DDPMScheduler

    n = 64
    model = NOVAPointCloudTransformer(
        arch="pc_d2w64", point_cloud_size=n, patch_size=4,
        text_token_dim=16, dropout=0.0, quantize=True)
    x = jnp.zeros((2, n, 3))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, 4, 16)))["params"]
    pipe = NOVAPointCloudGenerationPipeline(
        model, params, DDPMScheduler(beta_schedule="squaredcos_cap_v2"))
    embeds = np.random.RandomState(0).randn(4, 4, 16).astype(np.float32)
    stats = pipe.calibrate(prompt_embeds=embeds, num_points=n,
                           num_diffusion_steps=3)
    leaves = stats["blocks"]["layers"]["block"]
    assert set(leaves) == {"a_ln1", "a_av", "a_ln2", "a_mid", "a_smax"}
    assert all(v.shape == (2,) for v in leaves.values())
    assert all((v > 0).all() for k, v in leaves.items() if k != "a_smax")
    out = pipe(prompt_embeds=embeds, num_points=n, num_diffusion_steps=2,
               guidance_scale=5.0)
    assert out.point_clouds.shape == (2, n, 3)
    assert np.isfinite(out.point_clouds).all()


def test_vit_block_calibration_and_static_serving(monkeypatch):
    """vit.Block sows a_x/a_gelu under mutable act_stats; merged qparams run
    the fused post-LN MLP with static scales close to the dynamic path."""
    from nova_pointcloud_tpu.models.vit import Block
    from nova_pointcloud_tpu.ops.quantization import (merge_act_scales,
                                                      quantize_serving_params)

    key = jax.random.PRNGKey(31)
    blk = Block(dim=128, num_heads=4, quantize=True)
    x = jax.random.normal(key, (2, 32, 128), jnp.float32) * 0.3
    params = blk.init(key, x)["params"]
    (_, _), vs = blk.apply({"params": params}, x, mutable=["act_stats"])
    stats = vs["act_stats"]
    assert set(stats) == {"a_x", "a_gelu", "attn"}
    assert set(stats["attn"]) == {"a_smax", "a_q", "a_k"}
    qp = quantize_serving_params(params)
    qp_static = merge_act_scales(qp, stats, margin=1.05)

    import nova_pointcloud_tpu.models.vit as vit_mod
    monkeypatch.setattr(vit_mod.jax, "default_backend", lambda: "tpu")
    with pltpu.force_tpu_interpret_mode():
        dyn, _ = blk.apply({"params": params, "qparams": qp}, x)
        stat, _ = blk.apply({"params": params, "qparams": qp_static}, x)
    dyn, stat = np.asarray(dyn, np.float32), np.asarray(stat, np.float32)
    assert np.abs(stat - dyn).mean() / np.abs(dyn).mean() < 3e-2

    # int8 score core: same calibrated qparams, attn_core="int8" switches
    # the static kernel's q k^T matmul to int8 with the a_q/a_k scales
    blk8 = vit_mod.Block(dim=128, num_heads=4, quantize=True,
                         attn_core="int8")
    with pltpu.force_tpu_interpret_mode():
        stat8, _ = blk8.apply({"params": params, "qparams": qp_static}, x)
    stat8 = np.asarray(stat8, np.float32)
    assert np.abs(stat8 - dyn).mean() / np.abs(dyn).mean() < 4e-2


def test_diffusion_block_calibration_and_static_serving(monkeypatch):
    """DiffusionBlock sows a_z/a_h/a_silu; merged qparams serve static."""
    from nova_pointcloud_tpu.models.diffusion_mlp import DiffusionBlock
    from nova_pointcloud_tpu.ops.quantization import (merge_act_scales,
                                                      quantize_serving_params)

    key = jax.random.PRNGKey(32)
    d = 128
    x = jax.random.normal(key, (2, 24, d), jnp.float32) * 0.5
    z = jax.random.normal(jax.random.PRNGKey(33), (2, 24, d), jnp.float32)
    blk = DiffusionBlock(d, quantize=True)
    params = blk.init(key, x, z)["params"]
    params["norm1"]["proj"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(34), (d, 3 * d)) * 0.05  # give zero-init signal

    _, vs = blk.apply({"params": params}, x, z, mutable=["act_stats"])
    stats = vs["act_stats"]
    assert set(stats) == {"a_z", "a_h", "a_silu"}
    qp = quantize_serving_params(params)
    qp_static = merge_act_scales(qp, stats, margin=1.05)

    import nova_pointcloud_tpu.models.diffusion_mlp as dm_mod
    monkeypatch.setattr(dm_mod.jax, "default_backend", lambda: "tpu")
    with pltpu.force_tpu_interpret_mode():
        dyn = blk.apply({"params": params, "qparams": qp}, x, z)
        stat = blk.apply({"params": params, "qparams": qp_static}, x, z)
    dyn, stat = np.asarray(dyn, np.float32), np.asarray(stat, np.float32)
    assert np.abs(stat - dyn).mean() / np.abs(dyn).mean() < 3e-2


def test_fused_int8_mlp_postln_matches_xla_math():
    """Post-LN gelu MLP kernel == unfused int8 math (ViT Block serving)."""
    from nova_pointcloud_tpu.ops.pallas.fused_block import fused_int8_mlp_postln

    key = jax.random.PRNGKey(11)
    d, f = 256, 1024
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (2, 64, d), jnp.float32) * 0.5
    w1 = jax.random.normal(ks[1], (d, f)) * 0.05
    b1 = jax.random.normal(ks[2], (f,)) * 0.01
    w2 = jax.random.normal(ks[3], (f, d)) * 0.05
    b2 = jax.random.normal(ks[4], (d,)) * 0.01
    lns = jax.random.normal(ks[5], (d,)) * 0.1 + 1.0
    lnb = jax.random.normal(ks[5], (d,)) * 0.1
    q1, q2 = quantize_weight(w1), quantize_weight(w2)

    a = int8_matmul(x, q1, jnp.float32) + b1
    a = jax.nn.gelu(a, approximate=False)
    h = int8_matmul(a, q2, jnp.float32) + b2
    mu = h.mean(-1, keepdims=True)
    var = ((h - mu) ** 2).mean(-1, keepdims=True)
    ref = x + ((h - mu) * jax.lax.rsqrt(var + 1e-6) * lns + lnb)

    with pltpu.force_tpu_interpret_mode():
        out = fused_int8_mlp_postln(x, q1.values, q1.scales, b1,
                                    q2.values, q2.scales, b2, lns, lnb,
                                    block_m=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_vit_block_quantized_serving_matches_xla(monkeypatch):
    """models/vit.Block with quantize=True (fused int8 post-LN MLP) tracks
    the bf16 XLA block, and the pre-quantized qparams collection matches
    in-graph quantization exactly."""
    from nova_pointcloud_tpu.models.vit import Block
    from nova_pointcloud_tpu.ops.quantization import quantize_serving_params

    key = jax.random.PRNGKey(12)
    x = jax.random.normal(key, (2, 32, 128), jnp.float32) * 0.3
    ref_blk = Block(dim=128, num_heads=4)
    params = ref_blk.init(key, x)["params"]
    ref, _ = ref_blk.apply({"params": params}, x)

    q_blk = Block(dim=128, num_heads=4, quantize=True)
    import nova_pointcloud_tpu.models.vit as vit_mod
    monkeypatch.setattr(vit_mod.jax, "default_backend", lambda: "tpu")
    with pltpu.force_tpu_interpret_mode():
        out, _ = q_blk.apply({"params": params}, x)
        qp = quantize_serving_params(params)
        assert set(qp) == {"fc1_q", "fc1_s", "fc2_q", "fc2_s", "attn"}
        assert set(qp["attn"]) == {"qkv_q", "qkv_s", "proj_q", "proj_s"}
        out_pre, _ = q_blk.apply({"params": params, "qparams": qp}, x)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).mean()
    assert err.mean() / scale < 2e-2, (err.mean(), scale)
    np.testing.assert_allclose(np.asarray(out_pre), np.asarray(out),
                               atol=1e-5, rtol=1e-5)


def test_fused_diffusion_block_matches_xla(monkeypatch):
    """DiffusionBlock quantize=True (one-kernel AdaLN-zero + silu MLP +
    gated residual) tracks the XLA block; qparams == in-graph quant."""
    from nova_pointcloud_tpu.models.diffusion_mlp import DiffusionBlock
    from nova_pointcloud_tpu.ops.quantization import quantize_serving_params

    key = jax.random.PRNGKey(13)
    d = 128
    x = jax.random.normal(key, (2, 24, d), jnp.float32) * 0.5
    z = jax.random.normal(jax.random.PRNGKey(14), (2, 24, d), jnp.float32)
    ref_blk = DiffusionBlock(d)
    params = ref_blk.init(key, x, z)["params"]
    # zero-init stats proj makes the block an identity; give it signal
    params["norm1"]["proj"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(15), (d, 3 * d)) * 0.05
    ref = ref_blk.apply({"params": params}, x, z)

    q_blk = DiffusionBlock(d, quantize=True)
    import nova_pointcloud_tpu.models.diffusion_mlp as dm_mod
    monkeypatch.setattr(dm_mod.jax, "default_backend", lambda: "tpu")
    with pltpu.force_tpu_interpret_mode():
        out = q_blk.apply({"params": params}, x, z)
        qp = quantize_serving_params(params)
        assert set(qp) == {"stats_q", "stats_s", "fc1_q", "fc1_s",
                           "fc2_q", "fc2_s"}
        out_pre = q_blk.apply({"params": params, "qparams": qp}, x, z)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).mean()
    assert err.mean() / scale < 3e-2, (err.mean(), scale)
    np.testing.assert_allclose(np.asarray(out_pre), np.asarray(out),
                               atol=1e-5, rtol=1e-5)


def test_diffusion_mlp_quantized_serving_matches_xla(monkeypatch):
    """Full DiffusionMLP head with quantize=True tracks the XLA head."""
    from nova_pointcloud_tpu.models.diffusion_mlp import DiffusionMLP

    key = jax.random.PRNGKey(16)
    d = 128
    x = jax.random.normal(key, (2, 16, 12), jnp.float32)
    t = jnp.full((2,), 500.0)
    z = jax.random.normal(jax.random.PRNGKey(17), (2, 16, d), jnp.float32)
    ref_m = DiffusionMLP(2, d, cond_dim=d, out_dim=12)
    params = ref_m.init(key, x, t, z)["params"]
    for i in range(2):  # give the zero-init AdaLN stats projections signal
        params[f"blocks_{i}"]["norm1"]["proj"]["kernel"] = (
            jax.random.normal(jax.random.PRNGKey(20 + i), (d, 3 * d)) * 0.05)
    ref = ref_m.apply({"params": params}, x, t, z)

    q_m = DiffusionMLP(2, d, cond_dim=d, out_dim=12, quantize=True)
    import nova_pointcloud_tpu.models.diffusion_mlp as dm_mod
    monkeypatch.setattr(dm_mod.jax, "default_backend", lambda: "tpu")
    with pltpu.force_tpu_interpret_mode():
        out = q_m.apply({"params": params}, x, t, z)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).mean() + 1e-6
    assert err.mean() / scale < 5e-2, (err.mean(), scale)


@pytest.mark.full
def test_nova_encode_step_static_serving_close_to_dynamic(monkeypatch):
    """encode_image_step with calibrated static scales (MLP sites + static
    softmax offset) tracks the dynamic int8 path when calibration covers the
    input distribution — the guard for the t2i/t2v static serving default."""
    from nova_pointcloud_tpu.models.nova import NOVATransformer
    from nova_pointcloud_tpu.ops.quantization import (merge_act_scales,
                                                      quantize_serving_params)
    from nova_pointcloud_tpu.pipelines.builder import init_transformer
    from nova_pointcloud_tpu.schedulers import FlowMatchEulerScheduler

    m = NOVATransformer(
        arch=("vit_d2w64", "vit_d2w64", "mlp_d2w64"), image_dim=4,
        image_base_size=(8, 8), video_base_size=(1, 2, 2), patch_size=2,
        text_token_dim=32, text_token_len=8,
        noise_scheduler=FlowMatchEulerScheduler(), quantize=True)
    p = init_transformer(m, seed=0, batch=1)
    ni, pd = m.num_image_tokens, m.patch_dim
    nb = 4
    canvas = 0.3 * jax.random.normal(jax.random.PRNGKey(3), (nb, ni, pd))
    mask = (jax.random.uniform(jax.random.PRNGKey(4), (nb, ni, 1)) > 0.5
            ).astype(jnp.float32)
    cond = 0.3 * jax.random.normal(jax.random.PRNGKey(5), (nb, 8, 64))

    def enc(variables, mutable=False):
        tokens = m.apply(variables, canvas, method=m.tokens_from_patches)
        kw = dict(mutable=["act_stats"]) if mutable else {}
        return m.apply(variables, tokens, mask, cond,
                       method=m.encode_image_step, **kw)

    _, vs = enc({"params": p}, mutable=True)
    qp = quantize_serving_params(p)
    qps = merge_act_scales(qp, vs["act_stats"], margin=1.05)

    import nova_pointcloud_tpu.models.vit as vit_mod
    monkeypatch.setattr(vit_mod.jax, "default_backend", lambda: "tpu")
    with pltpu.force_tpu_interpret_mode():
        z_d = np.asarray(enc({"params": p, "qparams": qp}), np.float32)
        z_s = np.asarray(enc({"params": p, "qparams": qps}), np.float32)
    rel = np.abs(z_s - z_d).mean() / np.abs(z_d).mean()
    assert rel < 5e-2, rel


def test_partial_static_scales_raise_diagnosably():
    """A partially-merged qparams tree (one calibration site never sown)
    must raise a calibration-pointing ValueError, not an opaque
    asarray(None) TypeError at trace time."""
    import pytest

    from nova_pointcloud_tpu.ops.pallas.fused_block import (
        fused_attention_block, fused_int8_diffusion_block, fused_ln_int8_mlp)

    d, f = 64, 128
    x = jnp.zeros((4, 8, d), jnp.bfloat16)
    xf = jnp.zeros((4, d), jnp.bfloat16)
    w1 = jnp.zeros((d, f), jnp.int8)
    w2 = jnp.zeros((f, d), jnp.int8)
    ones_d, ones_f = jnp.ones((d,)), jnp.ones((f,))
    with pytest.raises(ValueError, match="all-or-none"):
        fused_ln_int8_mlp(xf, ones_d, ones_d, w1, ones_f, ones_f,
                          w2, ones_d, ones_d, a_in=1.0, a_mid=None)
    with pytest.raises(ValueError, match="all-or-none"):
        fused_attention_block(x, ones_d, ones_d,
                              jnp.zeros((d, 3 * d), jnp.int8),
                              jnp.ones((3 * d,)), jnp.zeros((3 * d,)),
                              jnp.zeros((d, d), jnp.int8), ones_d, ones_d,
                              num_heads=2, a_in=None, a_av=2.0)
    with pytest.raises(ValueError, match="all-or-none"):
        fused_int8_diffusion_block(
            xf, xf, jnp.zeros((d, 3 * d), jnp.int8), jnp.ones((3 * d,)),
            jnp.zeros((3 * d,)), jnp.zeros((d, d), jnp.int8), ones_d, ones_d,
            jnp.zeros((d, d), jnp.int8), ones_d, ones_d, ones_d, ones_d,
            a_z=1.0, a_h=1.0, a_silu=None)
