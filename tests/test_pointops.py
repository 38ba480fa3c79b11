"""Tests for point-cloud geometry ops and losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nova_pointcloud_tpu.ops import losses, pointops


def test_cdist_matches_numpy():
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (2, 10, 3))
    b = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 3))
    d = pointops.cdist(a, b)
    expected = np.linalg.norm(np.asarray(a)[:, :, None] - np.asarray(b)[:, None], axis=-1)
    # matmul-based formula trades ~1e-2 abs accuracy for MXU speed (like
    # torch.cdist's mm backend); fine for nearest-neighbor ranking.
    np.testing.assert_allclose(d, expected, atol=5e-2)


def test_knn_ascending():
    pts = jax.random.normal(jax.random.PRNGKey(0), (1, 50, 3))
    d, idx = pointops.knn(pts, pts, 5)
    assert d.shape == (1, 50, 5) and idx.shape == (1, 50, 5)
    assert np.all(np.diff(np.asarray(d), axis=-1) >= -1e-6)
    np.testing.assert_array_equal(np.asarray(idx[0, :, 0]), np.arange(50))  # self first


def test_fps_spreads_points():
    """FPS on a cube's corners + center cluster must pick distinct corners."""
    corners = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                        [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1]], np.float32)
    cluster = np.random.RandomState(0).randn(100, 3).astype(np.float32) * 0.01 + 0.5
    pts = jnp.asarray(np.concatenate([corners, cluster]))[None]
    sampled = pointops.farthest_point_sampling(pts, 8, jax.random.PRNGKey(0))
    assert sampled.shape == (1, 8, 3)
    # at least 6 of 8 samples should be (near) distinct corners
    d = np.linalg.norm(np.asarray(sampled)[0][:, None] - corners[None], axis=-1)
    hits = (d.min(axis=1) < 0.1).sum()
    assert hits >= 6


def test_local_density():
    sparse = np.random.RandomState(0).rand(20, 3).astype(np.float32) * 10
    dense = np.random.RandomState(1).rand(20, 3).astype(np.float32) * 0.1
    pts = jnp.asarray(np.concatenate([sparse, dense]))[None]
    den = pointops.local_density(pts, 4)
    assert float(den[0, :20].mean()) > float(den[0, 20:].mean())


def test_adaptive_sampling_shapes():
    pts = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 3))
    up = pointops.adaptive_sampling(pts, 100, jax.random.PRNGKey(1))
    down = pointops.adaptive_sampling(pts, 32, jax.random.PRNGKey(2))
    assert up.shape == (2, 100, 3) and down.shape == (2, 32, 3)


def test_dynamic_partition():
    order, subset_ids = pointops.dynamic_partition(jax.random.PRNGKey(0), 2048, 16)
    assert order.shape == (16,) and subset_ids.shape == (16, 128)
    assert sorted(np.asarray(subset_ids).flatten().tolist()) == list(range(2048))
    assert sorted(np.asarray(order).tolist()) == list(range(16))
    with pytest.raises(ValueError):
        pointops.dynamic_partition(jax.random.PRNGKey(0), 100, 7)


class TestLosses:
    def test_chamfer_zero_on_identical(self):
        pts = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 3))
        np.testing.assert_allclose(losses.chamfer_distance(pts, pts), 0.0, atol=1e-6)

    def test_chamfer_permutation_invariant(self):
        pts = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 3))
        perm = jnp.asarray(np.random.RandomState(0).permutation(32))
        np.testing.assert_allclose(losses.chamfer_distance(pts, pts[:, perm]), 0.0, atol=1e-6)

    def test_sinkhorn_emd_close_to_hungarian(self):
        rng = np.random.RandomState(0)
        a = rng.randn(16, 3).astype(np.float32)
        b = (a + rng.randn(16, 3).astype(np.float32) * 0.1)
        sink = float(losses.sinkhorn_emd(jnp.asarray(a)[None], jnp.asarray(b)[None],
                                         epsilon=0.01, num_iters=200)[0])
        # hungarian on squared cost, mean-normalized like sinkhorn's 1/n mass
        from scipy.optimize import linear_sum_assignment

        cost = ((a[:, None] - b[None]) ** 2).sum(-1)
        r, c = linear_sum_assignment(cost)
        exact = cost[r, c].mean()
        assert sink == pytest.approx(exact, rel=0.25)

    def test_sinkhorn_differentiable(self):
        pts = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 3))
        tgt = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 3))
        g = jax.grad(lambda p: losses.sinkhorn_emd(p, tgt).sum())(pts)
        assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.abs(g).max()) > 0

    def test_masked_diffusion_mse(self):
        pred = jnp.ones((2, 8, 4))
        target = jnp.zeros((2, 8, 4))
        mask = jnp.zeros((2, 8, 1)).at[:, :4].set(1.0)
        loss = losses.masked_diffusion_mse(pred, target, mask)
        assert float(loss) == pytest.approx(1.0, rel=1e-4)

    def test_composite_loss_keys(self):
        key = jax.random.PRNGKey(0)
        pred = jax.random.normal(key, (2, 64, 3))
        tgt = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 3))
        _, subset_ids = pointops.dynamic_partition(jax.random.PRNGKey(2), 64, 4)
        out = losses.composite_pointcloud_loss(pred, tgt, pred, tgt, subset_ids)
        for k in ("loss", "loss_diffusion", "loss_chamfer", "loss_emd", "loss_ar"):
            assert k in out and np.isfinite(float(out[k]))


class TestMortonSort:
    def test_permutation_of_input(self):
        from nova_pointcloud_tpu.ops.pointops import morton_sort

        pts = jax.random.uniform(jax.random.PRNGKey(0), (2, 256, 3),
                                 minval=-1, maxval=1)
        s = morton_sort(pts)
        assert np.allclose(np.sort(np.asarray(pts).reshape(2, -1), axis=1),
                           np.sort(np.asarray(s).reshape(2, -1), axis=1))

    def test_improves_patch_locality(self):
        from nova_pointcloud_tpu.ops.pointops import morton_sort

        pts = jax.random.uniform(jax.random.PRNGKey(1), (2, 512, 3),
                                 minval=-1, maxval=1)
        s = np.asarray(morton_sort(pts)).reshape(2, 32, 16, 3)
        r = np.asarray(pts).reshape(2, 32, 16, 3)
        assert s.std(axis=2).mean() < 0.5 * r.std(axis=2).mean()

    def test_jits_and_is_idempotent(self):
        from nova_pointcloud_tpu.ops.pointops import morton_sort

        pts = jax.random.uniform(jax.random.PRNGKey(2), (1, 128, 3),
                                 minval=-1, maxval=1)
        s1 = jax.jit(morton_sort)(pts)
        s2 = morton_sort(s1)
        assert np.allclose(np.asarray(s1), np.asarray(s2))
