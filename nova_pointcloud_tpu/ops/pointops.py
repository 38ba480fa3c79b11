"""Point-cloud geometry ops as XLA device-side transforms.

Behavioral parity with the reference's partitioning utilities
(`diffnext/models/transformers/transformer_pointcloud_nova.py:63-152`):
dynamic partition into k subsets with a random generation order, kNN local
density, farthest point sampling, and feature-aware (kNN softmax)
interpolation — all reimplemented with static shapes so they run under jit.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared euclidean distances (B, N, M) via one MXU matmul.

    ||a-b||^2 = |a|^2 + |b|^2 - 2ab ; clamped at 0 for fp error.
    """
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)  # (B, N, 1)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)  # (B, M, 1)
    cross = jnp.einsum("bnd,bmd->bnm", a, b)
    return jnp.maximum(a2 + jnp.swapaxes(b2, -1, -2) - 2.0 * cross, 0.0)


def cdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Euclidean distance matrix (torch.cdist equivalent)."""
    return jnp.sqrt(pairwise_sqdist(a, b) + 1e-12)


def exact_min_sqdist(a: jax.Array, b: jax.Array, chunk: int = 256) -> jax.Array:
    """min_j ||a_i - b_j||^2, exact (direct differences), chunked over ``a``.

    The matmul formula loses ~1e-2 absolute accuracy to fp32 cancellation —
    fine for neighbor *ranking*, not for a loss's noise floor. This path is
    exact at fp32 and bounds memory at chunk*M*D. a: (B, N, D) -> (B, N).
    """
    batch, n, dim = a.shape
    pad = (-n) % chunk
    a_padded = jnp.pad(a, ((0, 0), (0, pad), (0, 0))) if pad else a
    a_chunks = a_padded.reshape(batch, -1, chunk, dim).transpose(1, 0, 2, 3)

    def one(ac):  # (B, chunk, D)
        d2 = jnp.sum((ac[:, :, None, :] - b[:, None, :, :]) ** 2, axis=-1)
        return jnp.min(d2, axis=-1)

    mins = jax.lax.map(one, a_chunks)  # (n_chunks, B, chunk)
    mins = mins.transpose(1, 0, 2).reshape(batch, -1)
    return mins[:, :n]


def knn(points: jax.Array, queries: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """k nearest neighbors of ``queries`` among ``points``.

    Returns (distances (B, Q, k), indices (B, Q, k)), ascending.
    """
    d = cdist(queries, points)
    neg_d, idx = jax.lax.top_k(-d, k)
    return -neg_d, idx


def local_density(points: jax.Array, k_neighbors: int = 8) -> jax.Array:
    """Mean kNN distance per point, excluding self (`...nova.py:81-89`)."""
    d, _ = knn(points, points, k_neighbors + 1)
    return jnp.mean(d[..., 1:], axis=-1)


@partial(jax.jit, static_argnames=("num_samples",))
def farthest_point_sampling(points: jax.Array, num_samples: int,
                            key: jax.Array) -> jax.Array:
    """Iterative FPS (`...nova.py:100-125`) as a fori_loop, O(N·S) but static.

    Unlike the reference (which keeps a full NxN distance matrix), we keep a
    single running min-distance vector — O(N) memory, same selection rule.
    Returns sampled points (B, S, D).
    """
    batch, n, _ = points.shape
    start = jax.random.randint(key, (batch,), 0, n)

    def gather_pts(idx):  # idx: (B,) -> (B, D)
        return jnp.take_along_axis(points, idx[:, None, None], axis=1)[:, 0]

    init_sel = jnp.zeros((batch, num_samples), jnp.int32).at[:, 0].set(start)
    init_min = jnp.linalg.norm(points - gather_pts(start)[:, None, :], axis=-1)

    def body(i, carry):
        sel, min_d = carry
        far = jnp.argmax(min_d, axis=1).astype(jnp.int32)
        sel = sel.at[:, i].set(far)
        new_d = jnp.linalg.norm(points - gather_pts(far)[:, None, :], axis=-1)
        return sel, jnp.minimum(min_d, new_d)

    sel, _ = jax.lax.fori_loop(1, num_samples, body, (init_sel, init_min))
    return jnp.take_along_axis(points, sel[..., None], axis=1)


def feature_aware_interpolation(points: jax.Array, target_size: int,
                                key: jax.Array, k: int = 8) -> jax.Array:
    """Downsample via kNN-softmax interpolation (`...nova.py:128-152`).

    Picks ``target_size`` random anchors, then blends ALL source points with
    softmax(-distance) weights per anchor — matching the reference's global
    softmax over the full distance row.
    """
    batch, n, _ = points.shape
    if n <= target_size:
        reps = target_size // n + 1
        tiled = jnp.tile(points, (1, reps, 1))
        return tiled[:, :target_size]
    idx = jax.random.permutation(key, n)[:target_size]
    anchors = points[:, idx]
    d = cdist(anchors, points)  # (B, T, N)
    w = jax.nn.softmax(-d, axis=-1)
    return jnp.einsum("btn,bnd->btd", w, points)


def adaptive_sampling(subset: jax.Array, target_size: int, key: jax.Array) -> jax.Array:
    """Resize a subset to ``target_size`` (`...nova.py:92-97`).

    Sparse subsets (fewer points than target) upsample via FPS-with-repeat;
    dense subsets downsample via feature-aware interpolation. The branch is on
    static shapes so it resolves at trace time.
    """
    if subset.shape[1] < target_size:
        reps = target_size // subset.shape[1] + 1
        tiled = jnp.tile(subset, (1, reps, 1))
        return tiled[:, :target_size]
    return feature_aware_interpolation(subset, target_size, key)


def dynamic_partition(key: jax.Array, num_points: int,
                      k: int = 20) -> Tuple[jax.Array, jax.Array]:
    """Random equal split into k subsets + random generation order.

    Matches `...nova.py:63-78` but returns index tensors instead of python
    lists: (order (k,), subset_ids (k, num_points//k)). The reference gives
    the last subset the remainder; we require divisibility (static shapes)
    and assert otherwise.
    """
    if num_points % k:
        raise ValueError(f"num_points={num_points} must divide into k={k} subsets")
    key_p, key_o = jax.random.split(key)
    perm = jax.random.permutation(key_p, num_points).astype(jnp.int32)
    subset_ids = perm.reshape(k, num_points // k)
    order = jax.random.permutation(key_o, k).astype(jnp.int32)
    return order, subset_ids


def morton_codes(points: jax.Array, bits: int = 10) -> jax.Array:
    """Z-order (Morton) codes for (…, N, 3) points in [-1, 1].

    Quantizes each axis to ``bits`` bits and interleaves them into one
    integer key whose ordering groups spatially nearby points. Pure bitwise
    jnp — jittable, static shapes, runs on the VPU.
    """
    q = jnp.clip((points + 1.0) * 0.5, 0.0, 1.0)
    q = (q * ((1 << bits) - 1)).astype(jnp.uint32)

    def spread(v: jax.Array) -> jax.Array:
        # insert two zero bits between each of the low `bits` bits
        out = jnp.zeros_like(v)
        for i in range(bits):
            out = out | (((v >> i) & 1) << (3 * i))
        return out

    x, y, z = q[..., 0], q[..., 1], q[..., 2]
    return (spread(x) | (spread(y) << 1) | (spread(z) << 2)).astype(jnp.uint32)


def morton_sort(points: jax.Array, bits: int = 10) -> jax.Array:
    """Sort (…, N, 3) points along N by Morton code.

    Token patchification is a plain reshape (`models/pointcloud_ar.py`); on
    randomly-ordered clouds that makes each patch a random global subset.
    Sorting by z-order first makes every patch a spatially compact group, so
    masked-AR over patch tokens reasons about local geometry — the intent of
    the reference's patch variant (`transformer_pointcloud_nova.py:305-328`).
    CD/EMD are order-invariant, so sorting never changes eval semantics.
    """
    codes = morton_codes(points, bits)
    order = jnp.argsort(codes, axis=-1)
    return jnp.take_along_axis(points, order[..., None], axis=-2)
