"""Pipeline parallelism: GPipe schedule == sequential stack, fwd and grad.

Runs on the 8-virtual-device CPU mesh (conftest). The reference has no PP
(SURVEY §2.6); these tests pin the TPU-native extension's semantics: the
pipelined program must be numerically identical to running the scanned block
stack sequentially, including through value_and_grad.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from nova_pointcloud_tpu.models.pointcloud import BlockStack, PreLNBlock
from nova_pointcloud_tpu.parallel import create_mesh
import pytest

from nova_pointcloud_tpu.parallel.pipeline import (
    make_pipelined_apply, merge_microbatches, split_microbatches,
    stack_stage_params, unstack_stage_params)

DEPTH, DIM, HEADS = 8, 32, 2
STAGES, MICRO = 4, 4


def _setup():
    stack = BlockStack(depth=DEPTH, dim=DIM, num_heads=HEADS, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, DIM))
    params = stack.init(jax.random.PRNGKey(1), x)["params"]
    block_params = params["layers"]["block"]  # leading (depth,) axis

    def block_apply(p, h):
        return PreLNBlock(DIM, HEADS, dropout=0.0).apply({"params": p}, h,
                                                         True)

    return stack, params, block_params, block_apply, x


def test_stack_unstack_roundtrip():
    _, _, block_params, _, _ = _setup()
    stacked = stack_stage_params(block_params, STAGES)
    leaf = jax.tree.leaves(stacked)[0]
    assert leaf.shape[:2] == (STAGES, DEPTH // STAGES)
    rt = unstack_stage_params(stacked)
    for a, b in zip(jax.tree.leaves(rt), jax.tree.leaves(block_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipelined_matches_sequential():
    stack, params, block_params, block_apply, x = _setup()
    ref = stack.apply({"params": params}, x)

    mesh = create_mesh({"pipe": STAGES, "data": 2})
    run = make_pipelined_apply(block_apply, STAGES, mesh, axis="pipe",
                               data_axis="data")
    stacked = stack_stage_params(block_params, STAGES)
    out = merge_microbatches(run(stacked, split_microbatches(x, MICRO)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pipelined_uneven_micro_vs_stages():
    """M != S still schedules correctly (more microbatches than stages)."""
    stack, params, block_params, block_apply, x = _setup()
    ref = stack.apply({"params": params}, x)
    mesh = create_mesh({"pipe": 2, "data": 2}, devices=jax.devices()[:4])
    run = make_pipelined_apply(block_apply, 2, mesh, axis="pipe",
                               data_axis="data")
    stacked = stack_stage_params(block_params, 2)
    out = merge_microbatches(run(stacked, split_microbatches(x, 4)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.full
def test_pipelined_grads_match_sequential():
    stack, params, block_params, block_apply, x = _setup()

    def ref_loss(bp):
        out = stack.apply({"params": {"layers": {"block": bp}}}, x)
        return jnp.mean(out ** 2)

    mesh = create_mesh({"pipe": STAGES, "data": 2})
    run = make_pipelined_apply(block_apply, STAGES, mesh, axis="pipe",
                               data_axis="data")

    def pp_loss(bp):
        out = run(stack_stage_params(bp, STAGES), split_microbatches(x, MICRO))
        return jnp.mean(out ** 2)

    ref_val, ref_grads = jax.value_and_grad(ref_loss)(block_params)
    pp_val, pp_grads = jax.value_and_grad(pp_loss)(block_params)
    np.testing.assert_allclose(float(pp_val), float(ref_val), rtol=1e-6)
    jax.tree_util.tree_map_with_path(
        lambda path, a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4,
            err_msg=str(path)),
        pp_grads, ref_grads)


def test_pp_dp_train_step():
    """One PP x DP train step on the full pc model's block stack: loss
    decreases and params stay finite (PP composes with the DP grad mean)."""
    import optax

    stack, params, block_params, block_apply, x = _setup()
    mesh = create_mesh({"pipe": 2, "data": 2}, devices=jax.devices()[:4])
    run = make_pipelined_apply(block_apply, 2, mesh, axis="pipe",
                               data_axis="data")
    target = jax.random.normal(jax.random.PRNGKey(3), x.shape)
    opt = optax.adam(1e-2)

    def loss_fn(bp):
        out = merge_microbatches(
            run(stack_stage_params(bp, 2), split_microbatches(x, 4)))
        return jnp.mean((out - target) ** 2)

    state = opt.init(block_params)
    bp = block_params

    @jax.jit
    def step(bp, state):
        loss, grads = jax.value_and_grad(loss_fn)(bp)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(bp, updates), state, loss

    losses = []
    for _ in range(5):
        bp, state, loss = step(bp, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert all(np.isfinite(l) for l in losses)


@pytest.mark.full
def test_pipelined_remat_grads_match():
    """remat=True recomputes in backward; values and grads must be identical
    to the non-remat pipeline (flagship-depth training memory mode)."""
    stack, params, block_params, block_apply, x = _setup()
    mesh = create_mesh({"pipe": STAGES, "data": 2})
    run = make_pipelined_apply(block_apply, STAGES, mesh, axis="pipe",
                               data_axis="data")
    run_r = make_pipelined_apply(block_apply, STAGES, mesh, axis="pipe",
                                 data_axis="data", remat=True)

    def loss(runner, bp):
        out = runner(stack_stage_params(bp, STAGES),
                     split_microbatches(x, MICRO))
        return jnp.mean(out ** 2)

    v1, g1 = jax.value_and_grad(lambda bp: loss(run, bp))(block_params)
    v2, g2 = jax.value_and_grad(lambda bp: loss(run_r, bp))(block_params)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-6)
    jax.tree_util.tree_map_with_path(
        lambda path, a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5,
            err_msg=str(path)),
        g2, g1)


def test_pp_tp_composition():
    """PP (ppermute ring over "pipe") composes with in-stage TP (Megatron
    MLP split over "tensor": column-parallel W1, row-parallel W2, psum).
    Forward and grads must match the unsharded sequential stack."""
    from functools import partial

    from nova_pointcloud_tpu.parallel.pipeline import (pipelined_apply,
                                                       shard_map)

    depth, dim, hidden, stages = 4, 16, 32, 2
    mesh = create_mesh({"pipe": stages, "tensor": 2},
                       devices=jax.devices()[:4])
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    w1 = jax.random.normal(ks[0], (depth, dim, hidden)) * 0.3
    w2 = jax.random.normal(ks[1], (depth, hidden, dim)) * 0.3
    x = jax.random.normal(ks[2], (4, 8, dim))
    params = {"w1": w1, "w2": w2}

    def ref_loss(p):
        h = x
        for i in range(depth):
            h = h + jnp.maximum(h @ p["w1"][i], 0) @ p["w2"][i]
        return jnp.mean(h ** 2)

    def block_apply(p, h):  # p holds the LOCAL tensor shards
        a = jnp.maximum(h @ p["w1"], 0)
        return h + jax.lax.psum(a @ p["w2"], "tensor")

    p_specs = {"w1": P("pipe", None, None, "tensor"),
               "w2": P("pipe", None, "tensor", None)}
    x_spec = P(None, None, None, None)
    fn = shard_map(
        partial(pipelined_apply, block_apply, num_stages=stages,
                axis="pipe"),
        mesh=mesh, in_specs=(p_specs, x_spec), out_specs=x_spec)

    def pp_loss(p):
        stacked = stack_stage_params(p, stages)
        out = fn(stacked, split_microbatches(x, 2))
        return jnp.mean(merge_microbatches(out) ** 2)

    ref_v, ref_g = jax.value_and_grad(ref_loss)(params)
    pp_v, pp_g = jax.value_and_grad(pp_loss)(params)
    np.testing.assert_allclose(float(pp_v), float(ref_v), rtol=1e-6)
    jax.tree_util.tree_map_with_path(
        lambda path, a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4,
            err_msg=str(path)),
        pp_g, ref_g)


@pytest.mark.full
def test_circular_pipeline_matches_sequential():
    """Interleaved (circular) schedule: V chunks per device, microbatches hop
    the ring V times. Must be numerically identical to the sequential stack,
    forward and grads, including remat."""
    from nova_pointcloud_tpu.parallel.pipeline import (
        make_circular_pipelined_apply, stack_circular_params)

    stack, params, block_params, block_apply, x = _setup()  # depth 8
    ref = stack.apply({"params": params}, x)

    mesh = create_mesh({"pipe": 2, "data": 2}, devices=jax.devices()[:4])
    run = make_circular_pipelined_apply(block_apply, num_stages=2,
                                        num_chunks=2, mesh=mesh,
                                        axis="pipe", data_axis="data")
    stacked = stack_circular_params(block_params, 2, 2)
    leaf = jax.tree.leaves(stacked)[0]
    assert leaf.shape[:3] == (2, 2, 2)  # (S, V, depth/(S*V))
    out = merge_microbatches(run(stacked, split_microbatches(x, 4)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    # grads (remat on — the flagship training configuration)
    run_r = make_circular_pipelined_apply(block_apply, num_stages=2,
                                          num_chunks=2, mesh=mesh,
                                          axis="pipe", data_axis="data",
                                          remat=True)

    def ref_loss(bp):
        out = stack.apply({"params": {"layers": {"block": bp}}}, x)
        return jnp.mean(out ** 2)

    def circ_loss(bp):
        out = run_r(stack_circular_params(bp, 2, 2),
                    split_microbatches(x, 4))
        return jnp.mean(out ** 2)

    ref_v, ref_g = jax.value_and_grad(ref_loss)(block_params)
    c_v, c_g = jax.value_and_grad(circ_loss)(block_params)
    np.testing.assert_allclose(float(c_v), float(ref_v), rtol=1e-6)
    jax.tree_util.tree_map_with_path(
        lambda path, a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4,
            err_msg=str(path)),
        c_g, ref_g)


def test_circular_pipeline_uneven_micro():
    """M not a multiple of S still schedules correctly."""
    from nova_pointcloud_tpu.parallel.pipeline import (
        make_circular_pipelined_apply, stack_circular_params)

    stack, params, block_params, block_apply, _ = _setup()
    x = jax.random.normal(jax.random.PRNGKey(5), (6, 16, DIM))
    ref = stack.apply({"params": params}, x)
    mesh = create_mesh({"pipe": 4, "data": 2})
    run = make_circular_pipelined_apply(block_apply, num_stages=4,
                                        num_chunks=2, mesh=mesh,
                                        axis="pipe", data_axis="data")
    stacked = stack_circular_params(block_params, 4, 2)  # lc = 1
    out = merge_microbatches(run(stacked, split_microbatches(x, 3)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
