"""Optimizer construction: param groups via optax masks.

Parity with `diffnext/engine/engine_utils.py:53-72`: parameters are grouped by
(lr_scale, weight-decay) where norm/bias (ndim < 2) params get no weight
decay, and named submodule prefixes can carry an ``lr_scale``. Also gradient
clipping and grad accumulation (DeepSpeed-config equivalents).
"""

from typing import Callable, Dict, Optional, Union

import jax
import optax


def _path_str(path) -> str:
    return "/".join(getattr(k, "key", str(k)) for k in path)


def decay_mask(params):
    """True for params that receive weight decay (matrices only)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, p: p.ndim >= 2 and "norm" not in _path_str(path).lower(),
        params)


def lr_scale_mask(params, lr_scales: Dict[str, float]):
    """Per-param multiplicative lr scale from path-prefix rules."""
    def scale(path, p):
        s = 1.0
        ps = _path_str(path)
        for prefix, v in lr_scales.items():
            if ps.startswith(prefix) or f"/{prefix}" in ps:
                s = v
        return s

    return jax.tree_util.tree_map_with_path(scale, params)


def build_optimizer(
    params,
    learning_rate: Union[float, Callable],
    weight_decay: float = 0.0,
    betas=(0.9, 0.99),
    eps: float = 1e-8,
    grad_clip: Optional[float] = None,
    lr_scales: Optional[Dict[str, float]] = None,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW with norm-exempt decay, lr scaling, clipping and accumulation."""
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay, decay_mask(params)))
    if lr_scales:
        scales = lr_scale_mask(params, lr_scales)
        chain.append(optax.GradientTransformation(
            lambda p: optax.EmptyState(),
            lambda updates, state, params=None: (
                jax.tree.map(lambda u, s: u * s, updates, scales), state)))
    if callable(learning_rate):
        chain.append(optax.scale_by_schedule(lambda s: -learning_rate(s)))
    else:
        chain.append(optax.scale(-learning_rate))
    tx = optax.chain(*chain)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def count_params(params) -> int:
    """Total parameter count (`engine_utils.py:26-29`)."""
    import numpy as np

    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
