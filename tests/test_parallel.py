"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from nova_pointcloud_tpu.models.pointcloud import NOVAPointCloudTransformer
from nova_pointcloud_tpu.parallel import (
    batch_sharding,
    create_mesh,
    local_shard_indices,
    make_sharded_train_step,
    param_sharding,
)
from nova_pointcloud_tpu.schedulers import DDPMScheduler


def test_mesh_creation():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    mesh = create_mesh()
    assert mesh.shape == {"data": 8, "tensor": 1}
    mesh = create_mesh({"data": -1, "tensor": 2})
    assert mesh.shape == {"data": 4, "tensor": 2}
    with pytest.raises(ValueError):
        create_mesh({"data": 3, "tensor": 2})


def test_local_shard_indices():
    idx = local_shard_indices(10, process_index=1, process_count=4)
    np.testing.assert_array_equal(idx, [1, 5, 9])


def make_pc(n_points=64):
    model = NOVAPointCloudTransformer(arch="pc_d2w64", point_cloud_size=n_points,
                                      patch_size=1, text_token_dim=32, dropout=0.0)
    x = jnp.zeros((2, n_points, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x,
                                 jnp.zeros((2,), jnp.int32),
                                 jnp.zeros((2, 8, 32)))["params"]
    return model, params


def test_tp_param_specs():
    mesh = create_mesh({"data": 4, "tensor": 2})
    model, params = make_pc()
    shardings = param_sharding(params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    specs = {"/".join(getattr(k, "key", str(k)) for k in path): s.spec
             for path, s in flat}
    # TP applies inside the block stacks only (embeds/cluster stay replicated)
    col = [s for p, s in specs.items() if "fc1/kernel" in p and "blocks" in p]
    assert col and all(s[-1] == "tensor" for s in col)
    row = [s for p, s in specs.items() if "fc2/kernel" in p and "blocks" in p]
    assert row and all(s[-2] == "tensor" for s in row)  # row = input (-2) dim
    outside = [s for p, s in specs.items()
               if "fc1/kernel" in p and "blocks" not in p]
    from jax.sharding import PartitionSpec as P0
    assert all(s == P0() for s in outside)
    # layernorms replicated
    ln = [s for p, s in specs.items() if "norm1/scale" in p]
    assert ln and all(s == P() for s in ln)


def test_sharded_train_step_runs_and_learns():
    """Full DP+TP+ZeRO train step on a 4x2 mesh: loss must go down."""
    mesh = create_mesh({"data": 4, "tensor": 2})
    model, params = make_pc()
    sched = DDPMScheduler(beta_schedule="squaredcos_cap_v2")

    def loss_fn(params, batch, key):
        k1, k2 = jax.random.split(key)
        pts, text = batch["points"], batch["text"]
        t = sched.sample_timesteps(k1, (pts.shape[0],))
        noise = jax.random.normal(k2, pts.shape)
        x_t = sched.add_noise(pts, noise, t)
        pred = model.apply({"params": params}, x_t, t, text)
        loss = jnp.mean((pred - noise) ** 2)
        return loss, {}

    opt = optax.adam(2e-3)
    with mesh:
        init_fn, step_fn = make_sharded_train_step(loss_fn, opt, mesh, params)
        opt_state = init_fn(params)
        key = jax.random.PRNGKey(0)
        pts = jax.random.normal(key, (8, 64, 3))
        pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        batch = {
            "points": jax.device_put(pts, batch_sharding(mesh, 3)),
            "text": jax.device_put(jnp.zeros((8, 8, 32)),
                                   batch_sharding(mesh, 3)),
        }
        losses = []
        for i in range(20):
            params, opt_state, metrics = step_fn(params, opt_state, batch,
                                                 jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    # verify a TP param actually ended up sharded over tensor axis
    leaf = params["blocks"]["layers"]["block"]["fc1"]["kernel"]
    assert "tensor" in str(leaf.sharding.spec)


def test_zero3_matches_replicated_params():
    """ZeRO-3 (params sharded over data + XLA per-use all-gather) must train
    identically to the replicated-params step, with 1/N param residency."""
    mesh = create_mesh({"data": 4, "tensor": 2})
    model, params = make_pc()
    sched = DDPMScheduler(beta_schedule="squaredcos_cap_v2")

    def loss_fn(params, batch, key):
        k1, k2 = jax.random.split(key)
        pts, text = batch["points"], batch["text"]
        t = sched.sample_timesteps(k1, (pts.shape[0],))
        noise = jax.random.normal(k2, pts.shape)
        x_t = sched.add_noise(pts, noise, t)
        pred = model.apply({"params": params}, x_t, t, text)
        return jnp.mean((pred - noise) ** 2), {}

    opt = optax.adam(2e-3)
    pts = jax.random.normal(jax.random.PRNGKey(0), (8, 64, 3))
    batch_host = {"points": pts, "text": jnp.zeros((8, 8, 32))}

    def train(zero3):
        p = params
        with mesh:
            init_fn, step_fn = make_sharded_train_step(
                loss_fn, opt, mesh, p, donate=False, zero3=zero3)
            opt_state = init_fn(p)
            batch = {k: jax.device_put(v, batch_sharding(mesh, 3))
                     for k, v in batch_host.items()}
            for i in range(3):
                p, opt_state, m = step_fn(p, opt_state, batch,
                                          jax.random.PRNGKey(i))
        return p, float(m["loss"])

    p_ref, loss_ref = train(zero3=False)
    p_z3, loss_z3 = train(zero3=True)
    assert loss_z3 == pytest.approx(loss_ref, rel=1e-5)
    # Adam normalizes by sqrt(v): on near-zero-grad leaves the f32
    # reduction-order noise between the two layouts is amplified to O(1e-6)
    # per step. Tolerance = 1% of one lr=2e-3 step.
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_z3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # a large non-TP-dim param is sharded over "data" (true ZeRO-3 residency)
    leaf = p_z3["blocks"]["layers"]["block"]["fc1"]["kernel"]
    assert "data" in str(leaf.sharding.spec)
    assert "tensor" in str(leaf.sharding.spec)  # composes with TP


def test_zero_opt_state_sharded():
    mesh = create_mesh({"data": 8, "tensor": 1})
    model, params = make_pc()

    def loss_fn(params, batch, key):
        out = model.apply({"params": params}, batch["points"],
                          jnp.zeros((batch["points"].shape[0],), jnp.int32),
                          batch["text"])
        return jnp.mean(out**2), {}

    with mesh:
        init_fn, _ = make_sharded_train_step(loss_fn, optax.adam(1e-3), mesh,
                                             params)
        opt_state = init_fn(params)
    mu_leaf = opt_state[0].mu["blocks"]["layers"]["block"]["fc1"]["kernel"]
    assert "data" in str(mu_leaf.sharding.spec)
