"""Gradient hygiene: NaN guards, per-layer clipping, monitors, adaptive LR.

Functional equivalents of the pc trainer's defensive machinery
(`/root/reference/train_newloss.py`):
- NaN/Inf gradient repair + skip (`:1017-1023,1130-1133`) ->
  ``sanitize_grads`` (zero non-finite leaves, report a counter metric)
- per-layer "smart" gradient clipping with group scales (`:1120-1192`) ->
  ``per_layer_clip`` (clip each leaf to scale*max_norm by path group)
- gradient monitoring / diagnosis ratios (`:1194-1281,1468-1549`) ->
  ``grad_stats`` (per-group norms returned as metrics, computed inside jit)
- adaptive LR on gradient explosion (`:1283-1326`) -> ``adaptive_lr_on_spike``
  (an optax transform that halves an LR multiplier when the global grad norm
  exceeds a threshold, recovering multiplicatively)
"""

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


def _path_str(path) -> str:
    return "/".join(getattr(k, "key", str(k)) for k in path)


def sanitize_grads(grads) -> Tuple[dict, jax.Array]:
    """Zero out non-finite gradient leaves; returns (grads, num_bad_leaves)."""
    leaves = jax.tree_util.tree_leaves(grads)
    bad = sum(jnp.any(~jnp.isfinite(g)).astype(jnp.int32) for g in leaves)

    def fix(g):
        return jnp.where(jnp.isfinite(g), g, 0.0)

    return jax.tree.map(fix, grads), bad


def grad_stats(grads, groups: Optional[Sequence[str]] = None) -> Dict[str, jax.Array]:
    """Global + per-group gradient norms as metrics (all inside jit)."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    total = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for _, g in flat))
    out = {"grad_norm": total}
    for g_name in groups or ():
        sq = [jnp.sum(g.astype(jnp.float32) ** 2) for p, g in flat
              if g_name in _path_str(p)]
        if sq:
            out[f"grad_norm/{g_name}"] = jnp.sqrt(sum(sq))
    return out


def per_layer_clip(max_norm: float,
                   group_scales: Optional[Dict[str, float]] = None
                   ) -> optax.GradientTransformation:
    """Clip each leaf's norm to ``max_norm * scale(group)``."""
    group_scales = dict(group_scales or {})

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        def clip(path, g):
            limit = max_norm
            ps = _path_str(path)
            for prefix, s in group_scales.items():
                if prefix in ps:
                    limit = max_norm * s
            n = jnp.linalg.norm(g.astype(jnp.float32))
            scale = jnp.minimum(1.0, limit / (n + 1e-6)).astype(g.dtype)
            return g * scale

        return jax.tree_util.tree_map_with_path(clip, updates), state

    return optax.GradientTransformation(init, update)


class AdaptiveLRState(NamedTuple):
    multiplier: jnp.ndarray


def adaptive_lr_on_spike(explode_norm: float = 50.0, decay: float = 0.5,
                         recover: float = 1.01, floor: float = 0.01
                         ) -> optax.GradientTransformation:
    """Scale updates down after gradient explosions, creep back up after."""

    def init(params):
        return AdaptiveLRState(jnp.float32(1.0))

    def update(updates, state, params=None):
        total = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                             for g in jax.tree_util.tree_leaves(updates)))
        mult = jnp.where(total > explode_norm, state.multiplier * decay,
                         jnp.minimum(state.multiplier * recover, 1.0))
        mult = jnp.maximum(mult, floor)
        scaled = jax.tree.map(lambda g: g * mult, updates)
        return scaled, AdaptiveLRState(mult)

    return optax.GradientTransformation(init, update)
