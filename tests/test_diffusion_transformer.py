"""Tests for the DiT alternative decoder."""

import jax
import jax.numpy as jnp
import numpy as np

from nova_pointcloud_tpu.models.diffusion_transformer import DiffusionTransformer


def make(single_ada=False):
    # head_dim 32: RoPE splits (4, 14, 14) stay even (d/8 + 2x(7d/16))
    model = DiffusionTransformer(depth=2, embed_dim=64, num_heads=2,
                                 cond_dim=64, out_dim=16, base_size=(4, 4),
                                 single_ada=single_ada)
    x = jnp.zeros((2, 16, 16))
    t = jnp.zeros((2,))
    z = jnp.zeros((2, 16, 64))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, z)["params"]
    return model, params


def test_forward():
    model, params = make()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16))
    t = jnp.array([100.0, 900.0])
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 64))
    out = jax.jit(model.apply)({"params": params}, x, t, z)
    assert out.shape == (2, 16, 16)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_stg_skip_changes_output():
    """The spatiotemporal-guidance path must differ from the normal path."""
    model, params = make()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16))
    t = jnp.array([500.0])
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 64)) * 2
    a = model.apply({"params": params}, x, t, z, stg_skip=False)
    b = model.apply({"params": params}, x, t, z, stg_skip=True)
    # adaLN-zero gates are 0 at init, so train one forward with perturbed
    # params to see a difference
    bumped = jax.tree.map(lambda p: p + 0.05, params)
    a = model.apply({"params": bumped}, x, t, z, stg_skip=False)
    b = model.apply({"params": bumped}, x, t, z, stg_skip=True)
    assert float(jnp.abs(a - b).max()) > 1e-5


def test_single_ada_variant():
    model, params = make(single_ada=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16))
    out = model.apply({"params": params}, x, jnp.array([10.0]),
                      jax.random.normal(jax.random.PRNGKey(1), (1, 16, 64)))
    assert bool(jnp.all(jnp.isfinite(out)))
