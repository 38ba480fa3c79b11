"""KV-cache correctness: cached frame-by-frame == teacher-forced block-causal."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from nova_pointcloud_tpu.models.vit import VisionTransformer
from nova_pointcloud_tpu.ops import masking


def test_cached_decode_matches_block_causal():
    """Feeding frames one at a time through KV caches must reproduce the
    teacher-forced pass with a block-causal mask (`transformer_3d.py:148`
    vs `:176-178` semantics)."""
    depth, dim, heads = 2, 64, 4
    vit = VisionTransformer(depth, dim, heads)
    b, nf, nv, lc = 2, 3, 4, 5  # batch, frames, tokens/frame, text len
    key = jax.random.PRNGKey(0)
    frames = jax.random.normal(key, (b, nf, nv, dim)) * 0.5
    c_text = jax.random.normal(jax.random.PRNGKey(1), (b, lc, dim)) * 0.5
    params = jax.jit(vit.init)(jax.random.PRNGKey(2),
                               frames.reshape(b, nf * nv, dim))["params"]

    # teacher-forced: full sequence with block-causal bias (text in block 0)
    bias = masking.block_causal_bias((nv,) * nf, lc)
    full, _ = vit.apply({"params": params}, frames.reshape(b, nf * nv, dim),
                        c=c_text, bias=bias)

    # cached: frame by frame; text prefix enters with frame 0
    caches = vit.init_caches(b, lc + nf * nv, dtype=jnp.float32)
    outs = []
    index = 0
    for t in range(nf):
        prefix = c_text if t == 0 else None
        out, caches = vit.apply({"params": params}, frames[:, t], c=prefix,
                                caches=caches, cache_index=jnp.int32(index))
        index += (lc if t == 0 else 0) + nv
        outs.append(out)
    cached = jnp.concatenate(outs, axis=1)

    np.testing.assert_allclose(np.asarray(cached), np.asarray(full),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.full
def test_cached_decode_matches_block_causal_t9():
    """Same equivalence at osp480's frame count (T=9, `nova_d48w1024_osp480`:
    video_base_size [9, 15, 24]) — the full-scale video configuration."""
    depth, dim, heads = 2, 32, 2
    vit = VisionTransformer(depth, dim, heads)
    b, nf, nv, lc = 1, 9, 6, 4
    key = jax.random.PRNGKey(3)
    frames = jax.random.normal(key, (b, nf, nv, dim)) * 0.5
    c_text = jax.random.normal(jax.random.PRNGKey(4), (b, lc, dim)) * 0.5
    params = jax.jit(vit.init)(jax.random.PRNGKey(5),
                               frames.reshape(b, nf * nv, dim))["params"]
    bias = masking.block_causal_bias((nv,) * nf, lc)
    full, _ = vit.apply({"params": params}, frames.reshape(b, nf * nv, dim),
                        c=c_text, bias=bias)

    caches = vit.init_caches(b, lc + nf * nv, dtype=jnp.float32)
    outs, index = [], 0
    for t in range(nf):
        prefix = c_text if t == 0 else None
        out, caches = vit.apply({"params": params}, frames[:, t], c=prefix,
                                caches=caches, cache_index=jnp.int32(index))
        index += (lc if t == 0 else 0) + nv
        outs.append(out)
    np.testing.assert_allclose(np.asarray(jnp.concatenate(outs, 1)),
                               np.asarray(full), atol=2e-5, rtol=2e-5)


def test_cache_isolation_between_sequences():
    """Separate cache objects must not leak state across generations."""
    vit = VisionTransformer(2, 64, 4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 64))
    params = jax.jit(vit.init)(jax.random.PRNGKey(1), x)["params"]

    def run(seed):
        caches = vit.init_caches(1, 8, dtype=jnp.float32)
        a = jax.random.normal(jax.random.PRNGKey(seed), (1, 4, 64))
        out, _ = vit.apply({"params": params}, a, caches=caches,
                           cache_index=jnp.int32(0))
        return out

    o1, o2 = run(3), run(3)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
