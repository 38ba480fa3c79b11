"""Masked-autoregressive scheduling primitives, all static-shape jnp.

Behavioral parity targets in the reference:
- cosine mask schedule -> per-AR-step prediction counts
  (`diffnext/pipelines/nova/pipeline_nova.py:129-132`)
- truncated-normal train mask ratio (`diffnext/models/embeddings.py:276-283`,
  scipy.stats.truncnorm there; inverse-CDF jnp here so it jits)
- random prediction order via argsort of uniforms (`embeddings.py:262-270`)
- block-causal additive attention bias over frame blocks with a text prefix
  (`embeddings.py:247-260`)

TPU-first: prediction sets are represented as a full permutation plus
cumulative boundaries, so every AR step gathers a fixed-size, compile-time
padded slice. No data-dependent shapes anywhere.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def cosine_pred_counts(num_steps: int, num_patches: int) -> np.ndarray:
    """Per-AR-step prediction counts from the cosine mask schedule.

    Counts are static (host numpy) and sum exactly to ``num_patches``.
    """
    ratios = np.cos(0.5 * np.pi * np.arange(num_steps + 1) / num_steps)
    lengths = np.round(ratios * num_patches).astype(np.int64)
    return lengths[:-1] - lengths[1:]


def pred_boundaries(counts: np.ndarray) -> Tuple[np.ndarray, int]:
    """Return (cumulative start offsets (S,), max padded count)."""
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return starts.astype(np.int32), int(counts.max())


def truncated_normal(key: jax.Array, lower: float, upper: float, loc: float = 0.0,
                     scale: float = 1.0, shape: Tuple[int, ...] = ()) -> jax.Array:
    """Truncated normal on [lower, upper] in *unstandardized* coordinates.

    jnp replacement for ``scipy.stats.truncnorm(a, b, loc, scale).rvs`` used at
    `embeddings.py:280`; jax.random.truncated_normal takes standardized bounds.
    """
    a = (lower - loc) / scale
    b = (upper - loc) / scale
    return jax.random.truncated_normal(key, a, b, shape) * scale + loc


# lower bound of the train mask ratio (`embeddings.py:280` truncnorm(0.7, 1));
# bounds the visible count for static gather buckets (models/vit.py)
TRAIN_MASK_RATIO_MIN = 0.7


def sample_train_mask(key: jax.Array, batch: int, num_tokens: int,
                      mask_ratios: Tuple[float, float, float] = (
                          TRAIN_MASK_RATIO_MIN, 1.0, 0.25),
                      ) -> Tuple[jax.Array, jax.Array]:
    """Sample the MAR-style training mask.

    Matches `embeddings.py:276-283`: one truncnorm(0.7, 1.0, sigma=0.25) mask
    ratio per call, visible set = first ``round((1-ratio)*N)`` of a random
    per-sample permutation.

    Static-shape scheme: returns
      mask:     (B, N, 1) float, 1 = masked (predicted), 0 = visible
      rank:     (B, N) int32, rank of each token in the random order
    The number of visible tokens is data (a threshold on ``rank``), never a
    shape.
    """
    lo, hi, sigma = mask_ratios
    key_ratio, key_order = jax.random.split(key)
    ratio = truncated_normal(key_ratio, lo, hi, loc=1.0, scale=sigma)
    num_visible = jnp.round((1.0 - ratio) * num_tokens).astype(jnp.int32)
    u = jax.random.uniform(key_order, (batch, num_tokens))
    order = jnp.argsort(u, axis=1)  # order[b, i] = token index at rank i
    rank = jnp.argsort(order, axis=1)  # rank[b, tok] = position in order
    mask = (rank >= num_visible).astype(jnp.float32)[..., None]
    return mask, rank


def random_pred_order(key: jax.Array, batch: int, num_tokens: int) -> jax.Array:
    """Random generation order per sample: (B, N) int32 token indices.

    Matches the argsort-of-uniform order at `embeddings.py:262-266`.
    """
    u = jax.random.uniform(key, (batch, num_tokens))
    return jnp.argsort(u, axis=1).astype(jnp.int32)


def pred_slice(order: jax.Array, start: jax.Array, count: jax.Array,
               pad_count: int) -> Tuple[jax.Array, jax.Array]:
    """Fixed-size slice of the generation order for one AR step.

    Returns (ids (B, P) int32, valid (B, P) float32). Invalid lanes point at
    the *first* id of the slice so scatters stay in-bounds; their writes are
    masked by ``valid``. ``pad_count`` is static.

    Indices are clamped PER LANE, not per window: a whole-window clamp
    (dynamic_slice at start = N - pad_count) silently shifts the final AR
    step's slice when pad_count > count — e.g. at the t2i defaults (S=64,
    N=256) the cosine counts give max 7 / last 6, so order[255] was never
    predicted (a permanently-zero canvas patch) and order[249] was denoised
    twice. Valid lanes always satisfy start + lane < N because the counts
    sum to N; only padding lanes hit the clamp.
    """
    batch, num_tokens = order.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (batch, pad_count), 1)
    idx = jnp.minimum(jnp.asarray(start, jnp.int32) + lane, num_tokens - 1)
    ids = jnp.take_along_axis(order, idx, axis=1)
    valid = (lane < count).astype(jnp.float32)
    ids = jnp.where(lane < count, ids, ids[:, :1])
    return ids, valid


def scatter_mask(ids: jax.Array, valid: jax.Array, num_tokens: int) -> jax.Array:
    """One-hot union of ids -> (B, N, 1) mask; duplicate-safe via max-scatter."""
    batch, pad = ids.shape
    onehot = jax.nn.one_hot(ids, num_tokens, dtype=valid.dtype)  # (B, P, N)
    return jnp.max(onehot * valid[..., None], axis=1)[..., None]


def block_causal_bias(frame_lens: Tuple[int, ...], text_len: int = 0,
                      dtype=jnp.float32) -> jax.Array:
    """Additive attention bias for block-causal temporal AR training.

    Matches `embeddings.py:247-260`: token i may attend to token j iff
    block(i) >= block(j); the text prefix (if any) lives in block 0.
    Returns (L, L) with 0 allowed / -inf disallowed, L = text_len + sum(frames).
    """
    blocks = [np.zeros(text_len, np.int32)] if text_len else []
    blocks += [np.full(n, i, np.int32) for i, n in enumerate(frame_lens)]
    d = np.concatenate(blocks)
    allowed = d[:, None] >= d[None, :]
    return jnp.where(jnp.asarray(allowed), 0.0, -jnp.inf).astype(dtype)


def visibility_bias(visible: jax.Array, prefix_len: int = 0,
                    dtype=jnp.float32) -> jax.Array:
    """Key-side bias excluding masked tokens from attention.

    TPU-native replacement for the reference's gather-then-attend encoder half
    (`vision_transformer.py:133-143`): instead of physically gathering visible
    tokens (dynamic shape), attend over the full sequence but bias masked keys
    to -inf. Query rows for masked tokens compute garbage and are overwritten
    by the caller, which is exactly equivalent to gather/scatter semantics.

    visible: (B, N) with 1 = visible. Returns (B, 1, 1, prefix+N) bias.
    """
    if prefix_len:
        ones = jnp.ones(visible.shape[:1] + (prefix_len,), visible.dtype)
        visible = jnp.concatenate([ones, visible], axis=1)
    bias = jnp.where(visible > 0, 0.0, -jnp.inf).astype(dtype)
    return bias[:, None, None, :]
