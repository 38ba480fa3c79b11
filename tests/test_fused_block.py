"""Fused Pallas serving-block kernel vs the XLA int8 path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from nova_pointcloud_tpu.models.pointcloud import PreLNBlock
from nova_pointcloud_tpu.ops.pallas.fused_block import fused_ln_int8_mlp
from nova_pointcloud_tpu.ops.quantization import int8_matmul, quantize_weight


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


def test_preln_block_fused_path_matches_xla(monkeypatch):
    """The quantize=True serving path (Pallas kernel) == the XLA int8 path
    with the same params. Exercised on CPU by faking the TPU backend gate
    inside interpret mode."""
    key = jax.random.PRNGKey(1)
    blk = PreLNBlock(dim=128, num_heads=4, dropout=0.0, quantize=True)
    x = jax.random.normal(key, (2, 32, 128), jnp.float32) * 0.3
    params = blk.init(key, x)["params"]
    ref = blk.apply({"params": params}, x)  # XLA path (backend is cpu)

    import nova_pointcloud_tpu.models.pointcloud as pc_mod
    monkeypatch.setattr(pc_mod.jax, "default_backend", lambda: "tpu")
    with pltpu.force_tpu_interpret_mode():
        out = blk.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)
