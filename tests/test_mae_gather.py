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


def test_bucket_invariant_holds_at_both_call_sites():
    """The gather path silently drops visible tokens if nvis > bucket
    (models/vit.py invariant note) — pin that both callers bound it.

    Sampler: at AR step i the visible count is starts[i]; the searchsorted
    phase plan must give starts[i] <= bucket inside every phase.
    Training: num_visible = round((1-ratio)*N) with ratio >= 0.7 must stay
    <= the train bucket round(0.3*N) for every sampled ratio.
    """
    from nova_pointcloud_tpu.ops import masking

    # sampler phase plan (mirror of pipelines/nova.py:163-176)
    for S, ni in [(64, 256), (16, 64), (25, 128), (64, 3240), (32, 1024)]:
        counts = masking.cosine_pred_counts(S, ni)
        starts, _ = masking.pred_boundaries(counts)
        s_cur = 0
        for frac in (8, 4, 2):
            bucket = ni // frac
            end = int(np.searchsorted(starts, bucket, side="right"))
            if end > s_cur:
                assert starts[end - 1] <= bucket, (S, ni, frac)
                s_cur = end

    # training bucket (mirror of models/nova.py:374)
    for ni in (64, 256, 3240):
        bucket = int(round((1.0 - masking.TRAIN_MASK_RATIO_MIN) * ni))
        for seed in range(50):
            mask, _ = masking.sample_train_mask(
                jax.random.PRNGKey(seed), 2, ni)
            nvis = int((1.0 - np.asarray(mask)).sum(axis=(1, 2)).max())
            assert nvis <= bucket, (ni, seed, nvis, bucket)
