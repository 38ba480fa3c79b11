"""Invariant tests for masked-AR scheduling ops."""

import jax
import jax.numpy as jnp
import numpy as np

from nova_pointcloud_tpu.ops import masking


def test_cosine_counts_sum():
    for steps, patches in [(64, 4096), (16, 256), (128, 1024), (4, 7)]:
        counts = masking.cosine_pred_counts(steps, patches)
        assert counts.sum() == patches
        assert counts.shape == (steps,)
        assert np.all(counts >= 0)


def test_pred_boundaries():
    counts = masking.cosine_pred_counts(64, 4096)
    starts, pad = masking.pred_boundaries(counts)
    assert starts[0] == 0
    assert starts[-1] + counts[-1] == 4096
    assert pad == counts.max()
    # padding overhead vs exact compute is modest (<2x)
    assert pad * 64 < 2.0 * 4096


def test_truncated_normal_bounds():
    x = masking.truncated_normal(jax.random.PRNGKey(0), 0.7, 1.0, loc=1.0,
                                 scale=0.25, shape=(10000,))
    assert float(x.min()) >= 0.7 and float(x.max()) <= 1.0
    assert 0.85 < float(x.mean()) < 0.95  # mass piles near 1.0


def test_sample_train_mask_invariants():
    mask, rank = masking.sample_train_mask(jax.random.PRNGKey(3), 4, 256)
    assert mask.shape == (4, 256, 1) and rank.shape == (4, 256)
    # rank is a permutation per row
    for b in range(4):
        assert sorted(np.asarray(rank[b]).tolist()) == list(range(256))
    # mask ratio in [0.7, 1.0]
    ratio = float(mask.mean())
    assert 0.69 <= ratio <= 1.0
    # all rows have the same visible count (single ratio per call, as reference)
    counts = np.asarray(mask.sum(axis=(1, 2)))
    assert np.all(counts == counts[0])


def test_pred_slice_and_scatter():
    key = jax.random.PRNGKey(0)
    order = masking.random_pred_order(key, 2, 100)
    counts = masking.cosine_pred_counts(10, 100)
    starts, pad = masking.pred_boundaries(counts)
    union = np.zeros((2, 100))
    for i in range(10):
        ids, valid = masking.pred_slice(order, jnp.asarray(starts[i]),
                                        jnp.asarray(counts[i]), pad)
        assert ids.shape == (2, pad) and valid.shape == (2, pad)
        assert float(valid.sum(axis=1)[0]) == counts[i]
        m = masking.scatter_mask(ids, valid, 100)
        union += np.asarray(m[..., 0])
    # every token predicted exactly once over all steps
    np.testing.assert_array_equal(union, np.ones((2, 100)))


def test_block_causal_bias():
    bias = masking.block_causal_bias((4, 4), text_len=3)
    assert bias.shape == (11, 11)
    b = np.asarray(bias)
    # text attends to text, frame0 attends to text+frame0, frame1 to all
    assert np.all(b[:7, :7] == 0)  # block 0 = text+frame0 mutual
    assert np.all(np.isinf(b[3:7, 7:]))  # frame0 can't see frame1
    assert np.all(b[7:, :] == 0)  # frame1 sees everything


def test_visibility_bias():
    visible = jnp.array([[1, 0, 1, 0]], dtype=jnp.float32)
    bias = masking.visibility_bias(visible, prefix_len=2)
    assert bias.shape == (1, 1, 1, 6)
    b = np.asarray(bias[0, 0, 0])
    assert np.all(b[:2] == 0) and b[2] == 0 and np.isinf(b[3]) and b[4] == 0


def test_pred_slices_cover_every_token_exactly_once():
    """Every AR step's slice must be exactly order[start:start+count] — a
    whole-window clamp in pred_slice used to shift the FINAL step when its
    count < pad_count (t2i defaults S=64, N=256: one token never predicted,
    one denoised twice)."""
    from nova_pointcloud_tpu.ops import masking

    for num_steps, n in [(64, 256), (16, 64), (25, 128), (64, 3240), (4, 7)]:
        counts = masking.cosine_pred_counts(num_steps, n)
        assert counts.sum() == n
        starts, pad_p = masking.pred_boundaries(counts)
        order = masking.random_pred_order(jax.random.PRNGKey(0), 2, n)
        seen = np.zeros((2, n), np.int32)
        for i in range(num_steps):
            ids, valid = masking.pred_slice(order, jnp.asarray(starts[i]),
                                            jnp.asarray(int(counts[i])), pad_p)
            ids, valid = np.asarray(ids), np.asarray(valid)
            for b in range(2):
                v = valid[b] > 0
                assert v.sum() == counts[i]
                np.testing.assert_array_equal(
                    np.sort(ids[b][v]),
                    np.sort(np.asarray(order)[b, starts[i]:starts[i] + counts[i]]))
                seen[b, ids[b][v]] += 1
        assert (seen == 1).all(), f"S={num_steps} N={n}: coverage {seen.min()}..{seen.max()}"
