"""Bucketed visible-token gather == full-sequence masking (MAE encoder half)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nova_pointcloud_tpu.models.embeddings import rope_positions, rope_weights
from nova_pointcloud_tpu.models.vit import VisionTransformer


@pytest.mark.parametrize("use_rope", [False, True])
def test_gather_matches_masking(use_rope):
    depth, dim, heads = 4, 64, 2  # head_dim 32: valid d/8 rope split
    b, n, lc, bucket = 2, 24, 5, 8
    vit = VisionTransformer(depth, dim, heads)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, n, dim)) * 0.5
    c = jax.random.normal(jax.random.PRNGKey(1), (b, lc, dim)) * 0.5
    # visible counts differ per row and stay <= bucket
    visible = jnp.zeros((b, n)).at[0, :6].set(1.0).at[1, :3].set(1.0)
    # scramble which ids are visible (not just a prefix)
    perm = jax.random.permutation(jax.random.PRNGKey(2), n)
    visible = visible[:, perm]
    rope = None
    if use_rope:
        pos = rope_positions(1, (4, 6))
        rope = rope_weights(pos, dim // heads, pad=lc)
    params = jax.jit(vit.init)(jax.random.PRNGKey(3), x)["params"]

    ref, _ = vit.apply({"params": params}, x, c=c, visible=visible, rope=rope)
    out, _ = vit.apply({"params": params}, x, c=c, visible=visible, rope=rope,
                       visible_bucket=bucket)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_gather_bucket_full_size_noop():
    """bucket >= N falls back to the masking path (no behavior change)."""
    vit = VisionTransformer(2, 32, 2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 32))
    visible = jnp.asarray([[1, 0, 1, 0, 0, 1, 0, 0]], jnp.float32)
    params = jax.jit(vit.init)(jax.random.PRNGKey(1), x)["params"]
    a, _ = vit.apply({"params": params}, x, visible=visible)
    c, _ = vit.apply({"params": params}, x, visible=visible, visible_bucket=8)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)
