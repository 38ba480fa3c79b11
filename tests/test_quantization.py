"""Int8 serving-path tests: fidelity + param-tree compatibility."""

import jax
import jax.numpy as jnp
import numpy as np

from nova_pointcloud_tpu.models.pointcloud import NOVAPointCloudTransformer
from nova_pointcloud_tpu.ops.quantization import (
    Int8Dense,
    int8_matmul,
    quantize_weight,
)


def test_int8_matmul_fidelity():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (64, 256))
    w = jax.random.normal(jax.random.PRNGKey(1), (256, 512)) * 0.05
    ref = x @ w
    out = int8_matmul(x, quantize_weight(w), jnp.float32)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_int8_dense_param_tree_matches_dense():
    """bf16 checkpoints must serve quantized without conversion."""
    import flax.linen as nn

    x = jnp.ones((2, 16))
    d = nn.Dense(8)
    q = Int8Dense(8)
    pd = d.init(jax.random.PRNGKey(0), x)["params"]
    pq = q.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(pd) == jax.tree_util.tree_structure(pq)
    assert all(a.shape == b.shape for a, b in
               zip(jax.tree.leaves(pd), jax.tree.leaves(pq)))


def test_quantized_model_close_to_bf16():
    """Same params, quantize on/off: outputs stay close."""
    common = dict(arch="pc_d2w64", point_cloud_size=64, patch_size=1,
                  text_token_dim=32, dropout=0.0)
    m_f = NOVAPointCloudTransformer(**common)
    m_q = NOVAPointCloudTransformer(quantize=True, **common)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 3))
    t = jnp.array([100, 500])
    text = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32))
    params = jax.jit(m_f.init)(jax.random.PRNGKey(2), x, t, text)["params"]
    # zero-init head would zero both outputs (0/0 rel); randomize it
    params["output_proj"]["kernel"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(3), params["output_proj"]["kernel"].shape)
    ref = m_f.apply({"params": params}, x, t, text)
    out = m_q.apply({"params": params}, x, t, text)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.1, rel
    assert bool(jnp.all(jnp.isfinite(out)))


def test_attn_impl_xla_escape_hatch_survives_calibration(monkeypatch):
    """attn_impl="xla" must keep routing around the Pallas kernel even once
    calibrated scales (qparams a_smax) are present — it is the documented
    escape hatch for Pallas miscompiles. On CPU the static kernel would
    raise, so this test fails if the dispatch ever hijacks the override."""
    from nova_pointcloud_tpu.models.vit import Attention

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 32))
    attn = Attention(32, 2, attn_impl="xla", quantize=True)
    params = jax.jit(attn.init)(jax.random.PRNGKey(1), x)["params"]
    qparams = {"a_smax": jnp.float32(4.0),
               "a_q": jnp.float32(1.0), "a_k": jnp.float32(1.0)}
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    out, _ = attn.apply({"params": params, "qparams": qparams}, x)
    assert np.isfinite(np.asarray(out)).all()
