"""Pallas flash attention vs reference SDPA (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from nova_pointcloud_tpu.ops.attention import sdpa


def run_flash(q, k, v, bias=None, **kw):
    from jax.experimental.pallas import tpu as pltpu

    from nova_pointcloud_tpu.ops.pallas.flash_attention import flash_attention

    with pltpu.force_tpu_interpret_mode():
        return flash_attention(q, k, v, bias=bias, **kw)


@pytest.fixture
def qkv():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    shape = (2, 3, 160, 64)  # non-multiple of block sizes -> padding path
    return [jax.random.normal(k, shape, jnp.float32) * 0.5 for k in ks]


def test_matches_sdpa_no_bias(qkv):
    q, k, v = qkv
    out = run_flash(q, k, v, blk_q=64, blk_k=64)
    ref = sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_matches_sdpa_key_bias(qkv):
    q, k, v = qkv
    visible = (jax.random.uniform(jax.random.PRNGKey(9), (2, 160)) > 0.4)
    bias = jnp.where(visible, 0.0, -jnp.inf)[:, None, None, :]
    out = run_flash(q, k, v, bias=bias, blk_q=64, blk_k=64)
    ref = sdpa(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_matches_sdpa_full_bias(qkv):
    q, k, v = qkv
    from nova_pointcloud_tpu.ops.masking import block_causal_bias

    bias = block_causal_bias((40, 40, 40, 40))[None, None]
    out = run_flash(q, k, v, bias=bias, blk_q=64, blk_k=64)
    ref = sdpa(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_fully_masked_rows_zero(qkv):
    q, k, v = qkv
    bias = jnp.full((2, 1, 1, 160), -jnp.inf)
    out = run_flash(q, k, v, bias=bias, blk_q=64, blk_k=64)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


# -- backward (custom VJP, Pallas recompute kernels) -------------------------

def grad_flash(q, k, v, bias=None):
    from jax.experimental.pallas import tpu as pltpu

    from nova_pointcloud_tpu.ops.pallas.flash_attention import flash_attention

    with pltpu.force_tpu_interpret_mode():
        return jax.grad(
            lambda q, k, v: jnp.sum(jnp.sin(
                flash_attention(q, k, v, bias=bias, blk_q=64, blk_k=64))),
            argnums=(0, 1, 2))(q, k, v)


def grad_sdpa(q, k, v, bias=None):
    return jax.grad(lambda q, k, v: jnp.sum(jnp.sin(sdpa(q, k, v, bias))),
                    argnums=(0, 1, 2))(q, k, v)


def assert_grads_close(g1, g2):
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=5e-3)


def test_grad_matches_sdpa_no_bias(qkv):
    q, k, v = qkv
    assert_grads_close(grad_flash(q, k, v), grad_sdpa(q, k, v))


def test_grad_matches_sdpa_key_bias(qkv):
    q, k, v = qkv
    visible = (jax.random.uniform(jax.random.PRNGKey(9), (2, 160)) > 0.4)
    bias = jnp.where(visible, 0.0, -jnp.inf)[:, None, None, :]
    assert_grads_close(grad_flash(q, k, v, bias), grad_sdpa(q, k, v, bias))


def test_grad_matches_sdpa_full_bias(qkv):
    q, k, v = qkv
    from nova_pointcloud_tpu.ops.masking import block_causal_bias

    bias = block_causal_bias((40, 40, 40, 40))[None, None]
    assert_grads_close(grad_flash(q, k, v, bias), grad_sdpa(q, k, v, bias))


def test_grad_fully_masked_rows_finite(qkv):
    """All-masked rows must not poison gradients with NaN/Inf."""
    q, k, v = qkv
    bias = jnp.full((2, 1, 1, 160), -jnp.inf)
    for g in grad_flash(q, k, v, bias):
        assert np.isfinite(np.asarray(g)).all()


def test_flash_attention_static_matches_sdpa():
    """Serving static-max kernel == SDPA (calibrated offset, ones-column
    denominator), with and without a key bias."""
    from nova_pointcloud_tpu.ops.attention import sdpa
    from nova_pointcloud_tpu.ops.pallas.flash_attention import (
        flash_attention_static)

    B, H, L, D = 2, 4, 96, 32
    key = jax.random.PRNGKey(40)
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (B, H, L, D), jnp.float32) * 0.5
    k = jax.random.normal(ks[1], (B, H, L, D), jnp.float32) * 0.5
    v = jax.random.normal(ks[2], (B, H, L, D), jnp.float32)
    smax = jnp.max(jnp.einsum("bhqd,bhkd->bhqk", q * D ** -0.5, k))

    ref = sdpa(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_static(q, k, v, smax, blk_q=48)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)

    # key bias (visibility): mask half the keys of sample 0
    bias = jnp.zeros((B, 1, 1, L))
    bias = bias.at[0, :, :, L // 2:].set(-1e30)
    ref_b = sdpa(q, k, v, bias)
    with pltpu.force_tpu_interpret_mode():
        out_b = flash_attention_static(q, k, v, smax, bias, blk_q=48)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(ref_b),
                               atol=2e-2, rtol=2e-2)


def test_flash_attention_static_int8_core_matches_sdpa():
    """int8 score core (calibrated static a_q/a_k scales) == SDPA within
    int8 rounding; with and without a key bias."""
    from nova_pointcloud_tpu.ops.attention import sdpa
    from nova_pointcloud_tpu.ops.pallas.flash_attention import (
        flash_attention_static)

    B, H, L, D = 2, 4, 96, 32
    ks = jax.random.split(jax.random.PRNGKey(43), 4)
    q = jax.random.normal(ks[0], (B, H, L, D), jnp.float32) * 0.5
    k = jax.random.normal(ks[1], (B, H, L, D), jnp.float32) * 0.5
    v = jax.random.normal(ks[2], (B, H, L, D), jnp.float32)
    smax = jnp.max(jnp.einsum("bhqd,bhkd->bhqk", q * D ** -0.5, k))
    a_q = jnp.max(jnp.abs(q)) * 1.05  # the merge_act_scales margin
    a_k = jnp.max(jnp.abs(k)) * 1.05

    ref = sdpa(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_static(q, k, v, smax, blk_q=48,
                                     a_q=a_q, a_k=a_k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=4e-2, rtol=4e-2)

    bias = jnp.zeros((B, 1, 1, L))
    bias = bias.at[0, :, :, L // 2:].set(-1e30)
    ref_b = sdpa(q, k, v, bias)
    with pltpu.force_tpu_interpret_mode():
        out_b = flash_attention_static(q, k, v, smax, bias, blk_q=48,
                                       a_q=a_q, a_k=a_k)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(ref_b),
                               atol=4e-2, rtol=4e-2)


def test_flash_attention_static_outlier_clip():
    """Scores beyond the calibrated max saturate (clip at +20) instead of
    overflowing: output stays finite and close to the true softmax."""
    from nova_pointcloud_tpu.ops.attention import sdpa
    from nova_pointcloud_tpu.ops.pallas.flash_attention import (
        flash_attention_static)

    B, H, L, D = 1, 2, 64, 32
    key = jax.random.PRNGKey(41)
    q = jax.random.normal(key, (B, H, L, D), jnp.float32)
    k = q * 3.0  # self-aligned: strong positive diagonal logits
    v = jax.random.normal(jax.random.PRNGKey(42), (B, H, L, D), jnp.float32)
    true_max = jnp.max(jnp.einsum("bhqd,bhkd->bhqk", q * D ** -0.5, k))
    smax = true_max - 10.0  # calibration UNDERSHOOT by 10 logits
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_static(q, k, v, smax, blk_q=64)
    assert np.isfinite(np.asarray(out)).all()
    ref = sdpa(q, k, v)
    err = np.abs(np.asarray(out) - np.asarray(ref)).mean()
    assert err < 5e-2, err


def test_rejects_or_broadcasts_mismatched_bias(qkv):
    """Bias shapes that only BROADCAST to (Lq, Lk): a last dim of 1 is
    materialized via broadcast_to (parity with sdpa); anything else raises
    loudly instead of misaligning the kernel's BlockSpecs."""
    q, k, v = qkv
    lq, lk = q.shape[2], k.shape[2]
    col = jax.random.normal(jax.random.PRNGKey(3), (1, 1, lq, 1))
    out = run_flash(q, k, v, bias=col, blk_q=64, blk_k=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(sdpa(q, k, v, col)),
                               atol=2e-3, rtol=2e-3)
    with pytest.raises(ValueError, match="last dim"):
        run_flash(q, k, v, bias=jnp.zeros((1, 1, lq, lk // 2)),
                  blk_q=64, blk_k=64)


def test_dispatcher_guards(monkeypatch):
    """_use_pallas: trailing bias dims must MATCH (Lq, Lk); whole-length K/V
    past the VMEM gate falls back to XLA instead of a Mosaic compile crash."""
    from nova_pointcloud_tpu.ops import attention as attn_mod

    monkeypatch.setattr(attn_mod.jax, "default_backend", lambda: "tpu")
    q = jnp.zeros((2, 4, 2048, 64), jnp.bfloat16)
    k = jnp.zeros((2, 4, 2048, 64), jnp.bfloat16)
    assert attn_mod._use_pallas(q, k, None, "auto")
    # broadcastable-but-mismatched biases -> sdpa
    assert not attn_mod._use_pallas(q, k, jnp.zeros((1, 1, 2048, 1)), "auto")
    assert not attn_mod._use_pallas(q, k, jnp.zeros((2, 1, 7, 2048)), "auto")
    # matching key bias and full bias -> pallas
    assert attn_mod._use_pallas(q, k, jnp.zeros((2, 1, 1, 2048)), "auto")
    assert attn_mod._use_pallas(q, k, jnp.zeros((1, 1, 2048, 2048)), "auto")
    # VMEM gate: 64k keys at d=64 would need ~32MB of resident K/V f32
    long_k = jnp.zeros((1, 1, 65536, 64), jnp.bfloat16)
    assert not attn_mod._use_pallas(q, long_k, None, "auto")


def test_flax_attention_fn_keeps_user_bias_on_xla(monkeypatch):
    """A user-supplied bias may be learnable; the pallas kernel's zero bias
    cotangent would silently freeze it, so the flax adapter must not route
    explicit biases to pallas even when every shape check passes."""
    from nova_pointcloud_tpu.ops import attention as attn_mod

    monkeypatch.setattr(attn_mod.jax, "default_backend", lambda: "tpu")
    called = {}

    def boom(*a, **kw):
        called["pallas"] = True
        raise AssertionError("pallas path must not be taken for user biases")

    import nova_pointcloud_tpu.ops.pallas.flash_attention as fa_mod

    monkeypatch.setattr(fa_mod, "flash_attention", boom)
    fn = attn_mod.make_flax_attention_fn("auto")
    B, L, H, D = 1, 1024, 2, 32
    x = jnp.zeros((B, L, H, D), jnp.float32)
    bias = jnp.zeros((B, 1, 1, L), jnp.float32)
    out = fn(x, x, x, bias=bias, deterministic=True)
    assert out.shape == (B, L, H, D) and "pallas" not in called
