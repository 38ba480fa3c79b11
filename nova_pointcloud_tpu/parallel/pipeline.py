"""Pipeline parallelism: GPipe-style microbatch pipelining over a mesh axis.

The reference has no PP (SURVEY §2.6: DeepSpeed ZeRO-2 DP only); this is the
TPU-native extension for models whose layer stack outgrows one chip. It
exploits the repo-wide convention that every deep stack is an ``nn.scan``
BlockStack whose params carry a leading (depth,) axis: reshape that axis to
(stages, depth/stages), shard it over a "pipe" mesh axis, and run the classic
GPipe schedule — M microbatches flow through S stages over S+M-1 ticks, with
activations hopping stage-to-stage via ``jax.lax.ppermute`` so the transfers
ride neighbor ICI links.

Differentiable end to end (scan + ppermute have transpose rules), so the same
program serves forward and training. Bubble fraction is (S-1)/(S+M-1); pick
num_micro >= num_stages for >=50% pipeline utilization. For smaller bubbles,
``circular_pipelined_apply`` implements the interleaved ("circular",
Megatron-LM-style) schedule: V non-adjacent chunks per device, bubble
(S-1)/(M*V + S-1), same masked-scan + ppermute realization.

Composes with DP: put "data" on the microbatch dim of the inputs and "pipe"
on the stage axis of the params — XLA keeps grad all-reduces on "data"
orthogonal to the ppermute ring on "pipe".

Usage (see tests/test_pipeline_parallel.py):

    stacked = stack_stage_params(block_params, num_stages)     # (S, L/S, ...)
    run = make_pipelined_apply(block_apply, num_stages, mesh)
    out = run(stacked, microbatches)     # (M, mb, T, D) -> (M, mb, T, D)
"""

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8 top-level API; experimental path is deprecated
    _shard_map = jax.shard_map

    def shard_map(f, *, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _esm

    def shard_map(f, *, mesh, in_specs, out_specs):
        return _esm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                    check_rep=False)


def stack_stage_params(params, num_stages: int):
    """Reshape scanned-block params (depth, ...) -> (stages, depth/stages, ...)."""
    def reshape(p):
        depth = p.shape[0]
        if depth % num_stages:
            raise ValueError(f"depth {depth} not divisible by {num_stages} stages")
        return p.reshape((num_stages, depth // num_stages) + p.shape[1:])

    return jax.tree.map(reshape, params)


def unstack_stage_params(params):
    """Inverse of stack_stage_params: (S, L/S, ...) -> (depth, ...)."""
    return jax.tree.map(
        lambda p: p.reshape((p.shape[0] * p.shape[1],) + p.shape[2:]), params)


def stage_param_sharding(stacked_params, mesh: Mesh, axis: str = "pipe"):
    """NamedSharding tree placing the leading stage axis on ``axis``."""
    def spec(p):
        return NamedSharding(mesh, P(*([axis] + [None] * (p.ndim - 1))))

    return jax.tree.map(spec, stacked_params)


def pipelined_apply(block_apply: Callable, stage_params, x, extras=(), *,
                    num_stages: int, axis: str = "pipe",
                    remat: bool = False):
    """Run the GPipe schedule inside ``shard_map``.

    block_apply(layer_params, h) -> h applies ONE block (layer_params = one
    depth-slice of the param tree). stage_params: this device's local
    (1, L/S, ...) tree (leading stage axis stripped here). x: (M, mb, T, D)
    microbatches, replicated over ``axis``. Returns (M, mb, T, D), identical
    on every pipe member.

    remat=True checkpoints each block inside the stage scan, so training at
    flagship depth keeps only the per-block stage-boundary activations live
    (the per-layer intermediates are recomputed in the backward pass) —
    without it, grad-of-pipeline stores every layer's activations for every
    in-flight microbatch.

    extras: tuple of side inputs every block consumes alongside h (attention
    bias, rope tables, ...), each with a leading (M,) microbatch axis —
    block_apply(layer_params, h, *extra_slices). At tick t, stage s indexes
    its OWN in-flight microbatch (t - s), so per-sample extras stay aligned
    with the activations flowing through the ring.
    """
    local = jax.tree.map(lambda p: p[0], stage_params)  # (L/S, ...)
    s = jax.lax.axis_index(axis)
    num_micro = x.shape[0]
    ticks = num_micro + num_stages - 1
    perm = [(i, (i + 1) % num_stages) for i in range(num_stages)]
    apply_one = jax.checkpoint(block_apply) if remat else block_apply

    def stage_fn(h, ex):
        def body(h, layer_params):
            return apply_one(layer_params, h, *ex), None

        h, _ = jax.lax.scan(body, h, local)
        return h

    def tick(carry, t):
        h_prev, out = carry
        # stage 0 ingests microbatch t (clipped; bubble work is never read)
        x_in = jax.lax.dynamic_index_in_dim(
            x, jnp.clip(t, 0, num_micro - 1), 0, keepdims=False)
        h_in = jnp.where(s == 0, x_in, h_prev)
        m_idx = jnp.clip(t - s, 0, num_micro - 1)
        ex = jax.tree.map(
            lambda e: jax.lax.dynamic_index_in_dim(e, m_idx, 0,
                                                   keepdims=False), extras)
        h_out = stage_fn(h_in, ex)
        # the last stage owns microbatch t-(S-1) at tick t
        o_idx = jnp.clip(t - (num_stages - 1), 0, num_micro - 1)
        write = jnp.logical_and(s == num_stages - 1, t >= num_stages - 1)
        out = jnp.where(
            write,
            jax.lax.dynamic_update_index_in_dim(out, h_out, o_idx, 0),
            out)
        h_next = jax.lax.ppermute(h_out, axis, perm)
        return (h_next, out), None

    h0 = jnp.zeros_like(x[0])
    out0 = jnp.zeros_like(x)
    (_, out), _ = jax.lax.scan(tick, (h0, out0), jnp.arange(ticks))
    # outputs live on the last stage only; all_gather + static index
    # broadcasts them to every pipe member. (NOT a masked psum: psum's
    # transpose re-sums the already-replicated cotangent, scaling grads
    # by the pipe size; all_gather transposes correctly.)
    return jax.lax.all_gather(out, axis)[num_stages - 1]


def make_pipelined_apply(block_apply: Callable, num_stages: int, mesh: Mesh,
                         axis: str = "pipe", data_axis: str = None,
                         remat: bool = False):
    """shard_map-wrapped GPipe runner over full arrays.

    Returns run(stacked_params, x): stacked_params (S, L/S, ...) sharded on
    ``axis``; x (M, mb, ...) microbatches (any rank >= 2), optionally sharded
    on ``data_axis`` over mb. Differentiable in both arguments. ``remat``
    checkpoints per-block activations for flagship-depth training (see
    pipelined_apply). TP composes by closing a shard_map'd/sharded-matmul
    block_apply over a "tensor" mesh axis orthogonal to ``axis``.
    """
    if mesh.shape.get(axis, 0) != num_stages:
        raise ValueError(
            f"mesh axis {axis!r} has size {mesh.shape.get(axis)} but "
            f"num_stages={num_stages}; the ppermute ring requires them equal")

    def run(stacked_params, x, *extras):
        x_spec = P(None, data_axis, *([None] * (x.ndim - 2)))
        p_specs = jax.tree.map(
            lambda p: P(*([axis] + [None] * (p.ndim - 1))), stacked_params)
        # extras ride with the microbatch they belong to: (M, mb, ...) gets
        # mb sharded like x; microbatch-invariant extras (M, 1, ...) or
        # lower-rank stay replicated
        ex_specs = jax.tree.map(
            lambda e: P(None, data_axis, *([None] * (e.ndim - 2)))
            if e.ndim >= 2 and e.shape[1] == x.shape[1]
            else P(*([None] * e.ndim)), extras)
        fn = shard_map(
            lambda p, xx, ex: pipelined_apply(
                block_apply, p, xx, ex, num_stages=num_stages, axis=axis,
                remat=remat),
            mesh=mesh, in_specs=(p_specs, x_spec, ex_specs),
            out_specs=x_spec)
        return fn(stacked_params, x, tuple(extras))

    return run


def split_microbatches(batch: jax.Array, num_micro: int) -> jax.Array:
    """(B, ...) -> (M, B/M, ...) for the pipeline schedule."""
    b = batch.shape[0]
    if b % num_micro:
        raise ValueError(f"batch {b} not divisible by {num_micro} microbatches")
    return batch.reshape((num_micro, b // num_micro) + batch.shape[1:])


def merge_microbatches(batch: jax.Array) -> jax.Array:
    """Inverse of split_microbatches."""
    return batch.reshape((batch.shape[0] * batch.shape[1],) + batch.shape[2:])


def stack_circular_params(params, num_stages: int, num_chunks: int):
    """Reshape scanned-block params (depth, ...) -> (S, V, depth/(S*V), ...).

    Chunk v on device d holds logical stages [v*S + d], i.e. GLOBAL layer
    indices are laid out chunk-major then device-major: layer l belongs to
    device (l // chunk_len) % S at chunk (l // chunk_len) // S, where
    chunk_len = depth // (S*V).
    """
    def reshape(p):
        depth = p.shape[0]
        if depth % (num_stages * num_chunks):
            raise ValueError(
                f"depth {depth} not divisible by {num_stages} stages x "
                f"{num_chunks} chunks")
        lc = depth // (num_stages * num_chunks)
        # (V*S, lc, ...) with stage-major order v*S + d -> split to (V, S)
        p = p.reshape((num_chunks, num_stages, lc) + p.shape[1:])
        return jnp.swapaxes(p, 0, 1)  # (S, V, lc, ...)

    return jax.tree.map(reshape, params)


def circular_pipelined_apply(block_apply: Callable, stage_params, x,
                             extras=(), *,
                             num_stages: int, num_chunks: int,
                             axis: str = "pipe", remat: bool = False):
    """Interleaved ("circular") pipeline schedule inside ``shard_map``.

    Each device holds ``num_chunks`` (V) non-adjacent stage chunks; a
    microbatch hops the physical ring V times, so each tick runs 1/V of a
    GPipe stage and the bubble fraction drops from (S-1)/(M+S-1) to
    (S-1)/(M*V + S-1) (Megatron-LM interleaved schedule, realized as one
    masked lax.scan over ticks + a ppermute ring — no per-device program
    divergence, XLA-friendly).

    Conflict-free tick algebra: device d at tick t works iff u = t - d >= 0;
    with r = u mod S, q = u div S, its chunk is v = q mod V and the
    microbatch is m = (q div V)*S + r (active iff m < M). Device 0 ingests
    microbatch m fresh when v == 0, else consumes the ring loop-back.

    stage_params: this device's local (1, V, L/(S*V), ...) tree from
    stack_circular_params. x: (M, mb, T, D) microbatches.
    """
    local = jax.tree.map(lambda p: p[0], stage_params)  # (V, Lc, ...)
    s = jax.lax.axis_index(axis)
    num_micro = x.shape[0]
    S, V, M = num_stages, num_chunks, num_micro
    u_max = (M - 1) % S + S * ((V - 1) + ((M - 1) // S) * V)
    ticks = u_max + S
    perm = [(i, (i + 1) % S) for i in range(S)]
    apply_one = jax.checkpoint(block_apply) if remat else block_apply

    def chunk_fn(h, v, ex):
        chunk_params = jax.tree.map(
            lambda p: jax.lax.dynamic_index_in_dim(p, v, 0, keepdims=False),
            local)

        def body(h, layer_params):
            return apply_one(layer_params, h, *ex), None

        h, _ = jax.lax.scan(body, h, chunk_params)
        return h

    def tick(carry, t):
        h_prev, out = carry
        u = t - s
        r = jnp.mod(u, S)
        q = jnp.floor_divide(u, S)
        v = jnp.clip(jnp.mod(q, V), 0, V - 1)
        m = jnp.floor_divide(q, V) * S + r
        active = jnp.logical_and(u >= 0, m < M)
        m_c = jnp.clip(m, 0, M - 1)
        x_in = jax.lax.dynamic_index_in_dim(x, m_c, 0, keepdims=False)
        ingest = jnp.logical_and(s == 0, v == 0)
        h_in = jnp.where(ingest, x_in, h_prev)
        ex = jax.tree.map(
            lambda e: jax.lax.dynamic_index_in_dim(e, m_c, 0,
                                                   keepdims=False), extras)
        h_out = chunk_fn(h_in, v, ex)
        write = jnp.logical_and(
            jnp.logical_and(s == S - 1, v == V - 1), active)
        out = jnp.where(
            write,
            jax.lax.dynamic_update_index_in_dim(out, h_out, m_c, 0),
            out)
        h_next = jax.lax.ppermute(h_out, axis, perm)
        return (h_next, out), None

    h0 = jnp.zeros_like(x[0])
    out0 = jnp.zeros_like(x)
    (_, out), _ = jax.lax.scan(tick, (h0, out0), jnp.arange(ticks))
    return jax.lax.all_gather(out, axis)[num_stages - 1]


def make_circular_pipelined_apply(block_apply: Callable, num_stages: int,
                                  num_chunks: int, mesh: Mesh,
                                  axis: str = "pipe", data_axis: str = None,
                                  remat: bool = False):
    """shard_map-wrapped interleaved-pipeline runner over full arrays.

    run(stacked_params, x): stacked_params (S, V, L/(S*V), ...) from
    stack_circular_params, sharded on ``axis``; x (M, mb, ...).
    """
    if mesh.shape.get(axis, 0) != num_stages:
        raise ValueError(
            f"mesh axis {axis!r} has size {mesh.shape.get(axis)} but "
            f"num_stages={num_stages}; the ppermute ring requires them equal")

    def run(stacked_params, x, *extras):
        x_spec = P(None, data_axis, *([None] * (x.ndim - 2)))
        p_specs = jax.tree.map(
            lambda p: P(*([axis] + [None] * (p.ndim - 1))), stacked_params)
        ex_specs = jax.tree.map(
            lambda e: P(None, data_axis, *([None] * (e.ndim - 2)))
            if e.ndim >= 2 and e.shape[1] == x.shape[1]
            else P(*([None] * e.ndim)), extras)
        fn = shard_map(
            lambda p, xx, ex: circular_pipelined_apply(
                block_apply, p, xx, ex, num_stages=num_stages,
                num_chunks=num_chunks, axis=axis, remat=remat),
            mesh=mesh, in_specs=(p_specs, x_spec, ex_specs),
            out_specs=x_spec)
        return fn(stacked_params, x, tuple(extras))

    return run
