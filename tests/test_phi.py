"""Phi text encoder tests, including numerical parity vs HF torch PhiModel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nova_pointcloud_tpu.models.text_encoders.phi import (
    PhiConfig,
    PhiEncoderModel,
    load_torch_phi_weights,
)

TINY = PhiConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                 num_hidden_layers=2, num_attention_heads=4,
                 max_position_embeddings=64)


def test_forward_shapes():
    model = PhiEncoderModel(TINY)
    ids = jnp.array([[1, 2, 3, 4, 0, 0]])
    mask = jnp.array([[1, 1, 1, 1, 0, 0]])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids, mask)["params"]
    out = jax.jit(model.apply)({"params": params}, ids, mask)
    assert out.shape == (1, 6, 64)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_parity_with_hf_phi():
    """Random HF torch PhiModel weights loaded into ours must match outputs."""
    torch = pytest.importorskip("torch")
    from transformers import PhiConfig as HFPhiConfig
    from transformers import PhiModel

    hf_cfg = HFPhiConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        partial_rotary_factor=0.4, max_position_embeddings=64,
        attention_dropout=0.0, embd_pdrop=0.0, resid_pdrop=0.0)
    torch.manual_seed(0)
    hf = PhiModel(hf_cfg).eval()

    ids = np.array([[5, 17, 42, 99, 3]], np.int64)
    with torch.no_grad():
        ref = hf(torch.as_tensor(ids)).last_hidden_state.numpy()

    model = PhiEncoderModel(TINY)
    sd = {k: v for k, v in hf.state_dict().items()}
    sd = {f"model.{k}": v for k, v in sd.items()}
    params = load_torch_phi_weights(model, sd)
    out = model.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)
